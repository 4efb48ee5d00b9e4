package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival curves with right-censoring, per group — the
  * time-to-event wing (time to conversion, to churn, to failure) the
  * funnel/latency queries (q202/q193) don't cover: subjects who never
  * experience the event still inform the curve through the shrinking
  * risk set instead of being dropped.
  *
  * Estimator contract, exact and engine-portable: at each distinct
  * duration t (in whole time units) with `d` events and `c` censorings,
  * the risk set is `n_risk = n − Σ_{s<t}(d_s + c_s)`, and the survival
  * probability updates ONLY on event rows by the floored ppm product
  * `S' = (S · (n_risk − d)) div n_risk` (S starts at 10⁶). The per-step
  * floor makes the product sequential — it runs as one `aggregate` fold
  * per group over the duration-sorted per-day table (the
  * [[Forecast.holtLinear]] discipline: codegen'd, no UDF, no driver
  * loop) and replays step-for-step in a recursive-CTE oracle. All
  * quantities non-negative, so floored and truncated division agree.
  *
  * Scale shape: subjects aggregate to one row per (group, duration) —
  * the fold's array is bounded by the observation window's length in
  * time units (the calendar-bound argument of [[TimeSeries]]), not by
  * subjects; everything before it is hash aggregates and one per-group
  * window, shuffle ∝ subjects then ∝ group·durations.
  */
object Survival {

  /** `spans`: one row per subject — `(group, duration ≥ 0 integral,
    * event flag: 1 = event observed at `duration`, 0 = censored at
    * `duration`)`. Returns one row per (group, distinct duration):
    * `(group, dur, n_risk, d, c, s_ppm)` ordered semantics (s_ppm is
    * the post-update survival at that duration).
    */
  def kaplanMeier(spans: DataFrame, groupCol: String, durCol: String,
                  eventCol: String): DataFrame = {
    val base = spans.select(col(groupCol), col(durCol).cast("long").as("dur"),
      col(eventCol).cast("long").as("ev"))
    val byDur = base.groupBy(col(groupCol), col("dur"))
      .agg(sum(col("ev")).as("d"),
        sum(lit(1L) - col("ev")).as("c"))
    val wg = Window.partitionBy(col(groupCol)).orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col(groupCol))
    val risk = byDur
      .withColumn("__cum", sum(col("d") + col("c")).over(wg))
      .withColumn("__n", sum(col("d") + col("c")).over(wn))
      .withColumn("n_risk", col("__n") - (col("__cum") - col("d") - col("c")))
      .select(col(groupCol), col("dur"), col("n_risk"), col("d"), col("c"))
    // sequential floored ppm product per group: fold over the
    // duration-sorted rows, emitting each row's post-update S
    val folded = risk.groupBy(col(groupCol))
      .agg(expr(
        """aggregate(
          |  array_sort(collect_list(struct(dur, n_risk, d, c))),
          |  named_struct('s', CAST(1000000 AS BIGINT),
          |    'out', CAST(array() AS array<struct<dur:bigint,s:bigint>>)),
          |  (acc, x) -> named_struct(
          |    's', CASE WHEN x.d > 0
          |           THEN (acc.s * (x.n_risk - x.d)) div x.n_risk
          |           ELSE acc.s END,
          |    'out', array_append(acc.out, named_struct(
          |      'dur', x.dur,
          |      's', CASE WHEN x.d > 0
          |             THEN (acc.s * (x.n_risk - x.d)) div x.n_risk
          |             ELSE acc.s END))),
          |  acc -> acc.out)""".stripMargin.replace("\n", " "))
        .as("__curve"))
      .select(col(groupCol), explode(col("__curve")).as("__p"))
      .select(col(groupCol), col("__p.dur").as("dur"),
        col("__p.s").as("s_ppm"))
    risk.join(folded, Seq(groupCol, "dur"))
      .select(col(groupCol), col("dur"), col("n_risk"), col("d"), col("c"),
        col("s_ppm"))
  }
}
