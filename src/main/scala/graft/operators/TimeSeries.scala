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
}
