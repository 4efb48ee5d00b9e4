package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise linear trend — OLS slope per group as an integer RATIONAL,
  * in ONE partial-aggregated pass:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * emitted as (slope_num, slope_den) so the contract is float-free and a
  * SQL oracle replays it exactly; a 6-dp rounded double ride-along is for
  * human consumption. The five sufficient statistics (n, Σx, Σy, Σxy,
  * Σx²) are plain sums — fully map-side-combinable, one shuffle bounded
  * by group count, and mergeable across shards like every other summary
  * in this engine.
  *
  * Overflow budget (BIGINT): with x at day scale (~2·10⁴) and y at cent
  * scale (~10⁵), n·Σxy stays under 2⁶³ to ~10⁹ rows per group. Beyond
  * that, center x per group (subtract the group's min day) — it divides
  * the cross-term magnitudes by ~10⁴ and leaves the slope unchanged.
  * Callers pass x PRE-SCALED (days, not seconds) for exactly this reason.
  *
  * A group with zero x-variance has slope_den = 0: the rational is
  * emitted as-is (0/0 is an honest "no trend defined"), the rounded
  * slope is null.
  */
object Trend {

  def groupTrend(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den")): _*)
      .withColumn("slope6",
        when(col("slope_den") === 0L, lit(null).cast("double"))
          .otherwise(round(col("slope_num").cast("double") /
            col("slope_den").cast("double"), 6)))
  }

  /** Group-wise Pearson correlation from the same sufficient-statistics
    * discipline as [[groupTrend]] — one partial-aggregated pass over six
    * plain sums, emitting the EXACT integer components
    *
    *   cov_num  = n·Σxy − Σx·Σy
    *   varx_num = n·Σx² − (Σx)²,  vary_num = n·Σy² − (Σy)²
    *
    * (each the n²-scaled covariance/variance — BIGINT-exact, mergeable
    * across shards) plus `r2_6`, the squared correlation
    * `cov²/(varx·vary)` rounded at 6 dp. r² needs NO square root, so the
    * only float is one identically-written double expression on exact
    * integer inputs — the q236 ACF trade. Null r² when either variance
    * is zero (constant column: correlation undefined, stated honestly).
    *
    * Overflow budget (BIGINT): needs `n·Σy² < 2⁶³` per group — callers
    * pre-scale (dollars, not cents) exactly like [[groupTrend]]'s x.
    */
  def groupCorr(df: DataFrame, groupCols: Seq[String], xCol: String,
                yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(groupCols.map(col) ++ Seq(
        col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vary_num")): _*)
      .withColumn("r2_6",
        when(col("varx_num") === 0L || col("vary_num") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            col("cov_num").cast("double") * col("cov_num").cast("double") /
              (col("varx_num").cast("double") *
                col("vary_num").cast("double")), 6)))
  }
}
