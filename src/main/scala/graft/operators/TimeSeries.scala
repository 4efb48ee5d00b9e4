package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series regularization: densify an irregular daily series
  * onto each key's full day grid, then fill the gaps two ways — step
  * (forward-fill) and linear interpolation — the standard prep before any
  * rolling-window feature or per-day reporting join over sparse
  * observations.
  *
  * Determinism contract: observations are INTEGER units (e.g. cents) so
  * the fills are exact; interpolation is the one double-typed column,
  * computed as `round(prev + ((next - prev) * dayssince) / dayspan, 2)` —
  * an exact integer product, one IEEE division, one addition, one
  * half-up round, the identical op sequence in any engine.
  *
  * Scale shape: the grid explode is bounded by each key's own span (never
  * the global calendar), the observation join is one (key, day) hash
  * join, and both fills are ONE window pass per direction over
  * key-partitioned data — no self-join, no per-gap subquery. At 100 TB
  * keys are independent; skew only arises from a single key with a
  * multi-decade span, which is a data bug this surfaces rather than
  * hides.
  */
object TimeSeries {

  /** `daily`: one row per observed `(key, day, value)` — `day` a
    * day-truncated timestamp, `value` integral. Returns the dense grid
    * `(key, day, observed, ffill, interp)`: `observed` null on gap days,
    * `ffill` the last observed value at-or-before, `interp` the linear
    * interpolation between the surrounding observations (null before the
    * first / after the last — exactly the rows where a slope is
    * undefined; the grid spans min..max per key, so only leading rows of
    * a key can have null `ffill`).
    */
  def gapFillInterpolate(daily: DataFrame, keyCol: String, dayCol: String,
                         valCol: String): DataFrame = {
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__d0"), max(col(dayCol)).as("__d1"))
      .select(col(keyCol),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as(dayCol))
    val j = grid.join(daily, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol), col(valCol).as("observed"))
    val back = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val markedDay = when(col("observed").isNotNull, col(dayCol))
    j.select(col(keyCol), col(dayCol), col("observed"),
        last(col("observed"), ignoreNulls = true).over(back).as("ffill"),
        last(markedDay, ignoreNulls = true).over(back).as("__pd"),
        first(col("observed"), ignoreNulls = true).over(fwd).as("__nv"),
        first(markedDay, ignoreNulls = true).over(fwd).as("__nd"))
      .select(col(keyCol), col(dayCol), col("observed"), col("ffill"),
        when(col("observed").isNotNull, col("observed").cast("double"))
          .when(col("ffill").isNotNull && col("__nv").isNotNull,
            round(col("ffill") +
              ((col("__nv") - col("ffill")) *
                datediff(col(dayCol), col("__pd"))) /
                datediff(col("__nd"), col("__pd")), 2))
          .otherwise(lit(null).cast("double")).as("interp"))
  }

  /** Exact CUSUM-style change-point detection per group: over a series of
    * `(day, value)` observations (one row per day — pre-aggregate first),
    * find the day that maximizes the absolute cumulative deviation from a
    * homogeneous rate,
    *
    *   S_d = | D·cum_d − d·T |
    *
    * (D = days observed, T = total, d = day index, cum_d = running sum) —
    * the integer cross-multiplied form of `|cum_d/T − d/D|`, so the
    * argmax is engine-exact with no division anywhere. Ties break to the
    * SMALLEST day (the q231 KS argmax rule). Returns one row per group:
    * `(group, n_days, total, at_day, s_max)`.
    *
    * Overflow budget (BIGINT): needs `D·T < 2⁶³` — satisfied to ~10⁹ days
    * of ~10⁹-unit daily totals.
    *
    * Scale shape: one group-partitioned window pass for index + running
    * sum, one grouped total, one grouped max, one argmax join — shuffle ∝
    * series rows, groups independent. The window is per-GROUP, never a
    * one-partition global sort.
    */
  def changePoint(daily: DataFrame, groupCol: String, dayCol: String,
                  valCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dayCol))
    val d = daily
      .select(col(groupCol), col(dayCol), col(valCol).cast("long").as("__v"))
      .withColumn("__idx", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("__v")).over(w))
    val tot = d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_days"), sum(col("__v")).as("total"))
    val s = d.join(tot, Seq(groupCol))
      .select(col(groupCol), col(dayCol), col("n_days"), col("total"),
        abs(col("n_days") * col("__cum") - col("__idx") * col("total"))
          .as("__s"))
    val m = s.groupBy(col(groupCol)).agg(max(col("__s")).as("s_max"))
    s.join(m, Seq(groupCol)).filter(col("__s") === col("s_max"))
      .groupBy(col(groupCol), col("n_days"), col("total"), col("s_max"))
      .agg(min(col(dayCol)).as("at_day"))
      .select(col(groupCol), col("n_days"), col("total"), col("at_day"),
        col("s_max"))
  }

  /** Two-level binary segmentation — the multiple-change-point
    * extension of [[changePoint]]: find each series' best split, then
    * the best split WITHIN each resulting half (the classic binary
    * segmentation recursion, unrolled to depth 2 — each level is the
    * same integer CUSUM argmax with the smallest-day tie rule, so the
    * whole tree replays in SQL). Emits one `level=1` row per group
    * (side −1) and one `level=2` row per non-empty half (side 0 =
    * at-or-before the top split, side 1 = after), each with its own
    * segment-local `n_days`, `total`, `at_day`, `s_max`.
    *
    * Scale shape: [[changePoint]] twice — the second call over the same
    * rows with the side bit appended to the key (groups only get finer;
    * no new shuffle class, no driver state).
    */
  def binarySegment(daily: DataFrame, groupCol: String, dayCol: String,
                    valCol: String): DataFrame = {
    val l1 = changePoint(daily, groupCol, dayCol, valCol)
    val sided = daily
      .join(l1.select(col(groupCol), col("at_day").as("__cp1")), Seq(groupCol))
      .withColumn("__side",
        when(col(dayCol) <= col("__cp1"), lit(0L)).otherwise(lit(1L)))
      // the level-2 key is a STRUCT (group, side), not a string encoding:
      // a concat_ws/split round-trip corrupts grouping for group values
      // containing the separator and silently string-coerces non-string
      // group columns — struct grouping is lossless and typed
      .withColumn("__gk",
        struct(col(groupCol).as("g"), col("__side").as("side")))
    val l2 = changePoint(
        sided.select(col("__gk"), col(dayCol), col(valCol)),
        "__gk", dayCol, valCol)
      .withColumn(groupCol, col("__gk").getField("g"))
      .withColumn("side", col("__gk").getField("side"))
      .select(col(groupCol), lit(2L).as("level"), col("side"),
        col("n_days"), col("total"), col("at_day"), col("s_max"))
    l1.select(col(groupCol), lit(1L).as("level"), lit(-1L).as("side"),
        col("n_days"), col("total"), col("at_day"), col("s_max"))
      .unionByName(l2)
  }

  /** Exact sample autocorrelation per group at lags `1..maxLag`:
    *
    *   r_k = Σ_{d≤D−k} (c_d − μ)(c_{d+k} − μ) / Σ (c_d − μ)²
    *
    * — correlation WITHOUT a square root (numerator and denominator share
    * the same series), so multiplying every deviation through by D turns
    * both sums into exact BIGINTs: `num_k = Σ(D·c_d − T)(D·c_{d+k} − T)`,
    * `den = Σ(D·c_d − T)²`, emitted as the exact rational `(num, den)`
    * with a 6-dp double ride-along (both < 2⁵³ at the documented budget,
    * so the IEEE division is engine-identical). The seasonality detector:
    * a weekly cycle shows as a positive spike at lag 7.
    *
    * Requires one row per `(group, day)` (pre-aggregate first; the day
    * index comes from a row_number over the group's days). Overflow
    * budget: `D·max|value|` must stay under ~3·10⁹ so the squared
    * deviations sum within BIGINT.
    *
    * Scale shape: one group-window pass for the index, one grouped total,
    * one explode (`maxLag` rows per observation), one equi-join on
    * `(group, idx)` — shuffle ∝ rows·maxLag, groups independent; no
    * self-join per lag, no driver state. Lags with no pairs (k ≥ D) are
    * absent.
    */
  def acf(daily: DataFrame, groupCol: String, dayCol: String,
          valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be positive, got $maxLag")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(dayCol))
    val d = daily
      .select(col(groupCol), col(dayCol), col(valCol).cast("long").as("__v"))
      .withColumn("__idx", row_number().over(w).cast("long"))
    val tot = d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__t"))
    val dev = d.join(tot, Seq(groupCol))
      .select(col(groupCol), col("__idx"),
        (col("__n") * col("__v") - col("__t")).as("__dev"))
    val den = dev.groupBy(col(groupCol))
      .agg(sum(col("__dev") * col("__dev")).as("den"))
    val lhs = dev
      .withColumn("lag", explode(array((1 to maxLag).map(k => lit(k.toLong)): _*)))
      .select(col(groupCol), col("lag"), (col("__idx") + col("lag")).as("__idx2"),
        col("__dev").as("__da"))
    lhs.join(dev.select(col(groupCol), col("__idx").as("__idx2"),
          col("__dev").as("__db")), Seq(groupCol, "__idx2"))
      .groupBy(col(groupCol), col("lag"))
      .agg(sum(col("__da") * col("__db")).as("num"))
      .join(den, Seq(groupCol))
      .select(col(groupCol), col("lag"), col("num"), col("den"),
        when(col("den") === 0L, lit(null).cast("double"))
          .otherwise(round(col("num").cast("double") /
            col("den").cast("double"), 6)).as("r6"))
  }

  /** Day-of-week seasonal residuals: each daily observation compared to
    * its `(group, dow)` cell's mean — the detector that does NOT flag
    * every weekend dip the way the trailing-window one (q169) does,
    * because the baseline is the same weekday's own history.
    *
    * All integer: with `n` days and sum `s` in the cell, the deviation
    * in basis points is `sign(v·n − s) · (|v·n − s| · 10⁴ div s)` —
    * cross-multiplied so no mean is ever materialized, the abs/sign
    * split making floor-vs-truncate division agree in every engine (the
    * q169 discipline). `is_anomaly` flags |dev| ≥ `thresholdBp`.
    * Cells exist only where a day was observed, so `s ≥ 1` and the
    * division is total. Scale shape: one grouped aggregate over (group,
    * dow) broadcast-joined back — two narrow shuffles, no windows.
    */
  def dowResiduals(daily: DataFrame, groupCol: String, dayCol: String,
                   valCol: String, thresholdBp: Long): DataFrame = {
    require(thresholdBp >= 1, s"thresholdBp must be positive, got $thresholdBp")
    val d = daily.select(col(groupCol), col(dayCol),
      col(valCol).cast("long").as("v"),
      dayofweek(col(dayCol)).cast("long").as("dow"))
    val cell = d.groupBy(col(groupCol), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("v")).as("s"))
    d.join(cell, Seq(groupCol, "dow"))
      .select(col(groupCol), col(dayCol), col("dow"), col("v"),
        col("n_days"), col("s"),
        (signum(col("v") * col("n_days") - col("s")).cast("long") *
          expr("(abs(v * n_days - s) * 10000) div s")).as("dev_bp"))
      .withColumn("is_anomaly", abs(col("dev_bp")) >= thresholdBp)
  }
}
