package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt linear (double-exponential) smoothing forecast in exact
  * fixed-point integers — the workhorse short-horizon forecaster
  * (traffic, volume, spend), deterministic enough to hash-match across
  * engines: values are scaled to micro-units, the smoothing constants
  * are exact rationals `α = aNum/aDen`, `β = bNum/bDen`, and every
  * division is the PORTABLE signed floor-toward-zero
  * `sign(x)·(|x| div d)` — written out explicitly on both the Spark and
  * oracle sides, so neither engine's native integer-division convention
  * (truncate vs floor on negatives) can leak in.
  *
  * Recurrence (classic Holt):
  *   l₂ = y₂, b₂ = y₂ − y₁ (keys with < 2 observations are dropped —
  *   a trend is undefined); for t ≥ 3:
  *   lₜ = (aNum·yₜ + (aDen−aNum)·(lₜ₋₁+bₜ₋₁)) idiv aDen
  *   bₜ = (bNum·(lₜ−lₜ₋₁) + (bDen−bNum)·bₜ₋₁) idiv bDen
  * Forecast h steps out: `l_T + h·b_T`.
  *
  * The recurrence is inherently sequential PER KEY; it runs as one
  * `aggregate` (higher-order fold) over the key's day-sorted value
  * array — inside whole-stage codegen, no driver loop, no UDF. The
  * array is bounded by the key's calendar span (the
  * [[TimeSeries.gapFillInterpolate]] bound: a multi-decade single key
  * is a data bug this surfaces). One grouped collect + one narrow
  * explode for the horizon rows.
  *
  * Overflow budget (documented, required): |y|·10⁶·max(aDen,bDen) and
  * the level/trend magnitudes must stay below 2⁶³ — daily values to
  * ~10¹² with the default micro-scaling and single-digit denominators.
  */
object Forecast {

  /** `daily`: one row per (key, day, value), integral values. Returns
    * one row per (key, horizon step h = 1..`horizon`):
    * `(key, n_days, last_day, level_micro, trend_micro, h,
    * forecast_day, forecast_micro)`.
    */
  def holtLinear(daily: DataFrame, keyCol: String, dayCol: String,
                 valCol: String, horizon: Int,
                 alphaNum: Int = 2, alphaDen: Int = 10,
                 betaNum: Int = 1, betaDen: Int = 10): DataFrame = {
    require(horizon >= 1, s"horizon must be positive, got $horizon")
    require(alphaNum >= 0 && alphaNum <= alphaDen && alphaDen >= 1,
      s"alpha must be a rational in [0,1], got $alphaNum/$alphaDen")
    require(betaNum >= 0 && betaNum <= betaDen && betaDen >= 1,
      s"beta must be a rational in [0,1], got $betaNum/$betaDen")

    // portable signed integer division: sign(x) * (|x| div d)
    def idiv(x: String, d: Long): String =
      s"(CASE WHEN ($x) < 0 THEN -((-($x)) div $d) ELSE ($x) div $d END)"
    val aN = alphaNum.toLong; val aD = alphaDen.toLong
    val bN = betaNum.toLong; val bD = betaDen.toLong
    // l' appears twice (as the new level and inside the new trend) —
    // pure arithmetic, recomputed rather than aliased because a lambda
    // struct field cannot reference a sibling field being built
    val lNext = idiv(s"$aN * y + ${aD - aN} * (acc.l + acc.b)", aD)
    val step =
      s"""(acc, y) -> CASE
         |  WHEN acc.t = 0 THEN named_struct(
         |    't', CAST(1 AS BIGINT), 'l', y, 'b', CAST(0 AS BIGINT))
         |  WHEN acc.t = 1 THEN named_struct(
         |    't', CAST(2 AS BIGINT), 'l', y, 'b', y - acc.l)
         |  ELSE named_struct('t', acc.t + CAST(1 AS BIGINT),
         |    'l', $lNext,
         |    'b', ${idiv(s"$bN * ($lNext - acc.l) + ${bD - bN} * acc.b", bD)})
         |  END""".stripMargin.replace("\n", " ")

    val fitted = daily
      .select(col(keyCol), col(dayCol).cast("date").as("__day"),
        (col(valCol).cast("long") * 1000000L).as("__y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), max(col("__day")).as("last_day"),
        expr("aggregate(transform(array_sort(collect_list(" +
          "struct(__day, __y))), p -> p.__y), " +
          "named_struct('t', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT), " +
          s"'b', CAST(0 AS BIGINT)), $step)").as("__st"))
      .filter(col("n_days") >= 2)
      .select(col(keyCol), col("n_days"), col("last_day"),
        col("__st.l").as("level_micro"), col("__st.b").as("trend_micro"))
    fitted
      .withColumn("h",
        explode(array((1 to horizon).map(h => lit(h.toLong)): _*)))
      .select(col(keyCol), col("n_days"), col("last_day"),
        col("level_micro"), col("trend_micro"), col("h"),
        date_add(col("last_day"), col("h").cast("int")).as("forecast_day"),
        (col("level_micro") + col("h") * col("trend_micro"))
          .as("forecast_micro"))
  }
}
