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

  /** Theil–Sen robust slope per group — the median of all pairwise
    * slopes `(y_j−y_i)/(x_j−x_i)` over `x_i < x_j`: a single wild
    * outlier day moves [[groupTrend]]'s OLS slope arbitrarily but moves
    * at most half the pairwise slopes, so the median barely shifts (the
    * robust-statistics wing's regression member, next to the MAD and
    * the Tukey fences).
    *
    * Exact-median contract, engine-portable: pair slopes are rationals
    * with positive denominators; they are totally ordered by the
    * DOCUMENTED key `(sign(num)·(|num|·10⁶ div den), num, den)` — the
    * floored micro-slope first (identical in any engine via the
    * explicit sign split), exact numerator/denominator as tie-breaks —
    * and the median is the ceil-rank ⌈P/2⌉ element of that order. Two
    * rationals within 10⁻⁶ of each other may order by (num, den) rather
    * than true value; the selected element is still a true pairwise
    * slope and the rule replays bit-for-bit in SQL.
    *
    * Scale shape: the pair self-join is GROUP-BLOCKED (equi-join on the
    * group key); per-group pair count is span²/2 where span is the
    * series length — calendar-bounded for daily series (the
    * [[TimeSeries]] argument), NOT data-proportional. One join + one
    * per-group window.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], xCol: String,
               yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val d = df.select(g ++ Seq(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y")): _*)
    val a = d.select(g ++ Seq(col("__x").as("__xa"), col("__y").as("__ya")): _*)
    val b = d.select(g ++ Seq(col("__x").as("__xb"), col("__y").as("__yb")): _*)
    val pairs = a.join(b, groupCols).filter(col("__xa") < col("__xb"))
      .select(g ++ Seq((col("__yb") - col("__ya")).as("num"),
        (col("__xb") - col("__xa")).as("den")): _*)
      .withColumn("sk", signum(col("num")).cast("long") *
        expr("(abs(num) * 1000000) div den"))
    val w = Window.partitionBy(g: _*)
      .orderBy(col("sk"), col("num"), col("den"))
    val wn = Window.partitionBy(g: _*)
    pairs
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(wn))
      .filter(col("__rn") === expr("(n_pairs + 1) div 2"))
      .select(g ++ Seq(col("n_pairs"), col("num").as("med_num"),
        col("den").as("med_den")): _*)
      .withColumn("slope6", round(col("med_num").cast("double") /
        col("med_den").cast("double"), 6))
  }

  /** Full pairwise correlation MATRIX over `valCols` in ONE corpus pass:
    * one grouped aggregate computes every Σxᵢ, Σxᵢ², Σxᵢxⱼ — p·(p+3)/2
    * sums total — and the p·(p−1)/2 pair rows are projected off that
    * (group-count-sized) aggregate afterwards. The at-scale point: a
    * p-measure correlation report costs the SAME single scan as one
    * pair, where calling [[groupCorr]] per pair would rescan the corpus
    * p·(p−1)/2 times. Components are the exact integer rationals of
    * [[groupCorr]] (same overflow budget per measure: n·Σx² < 2⁶³,
    * callers pre-scale); `r2_6` the one identically-written double.
    * Output: one row per (group, ordered pair col_a < col_b by input
    * order) — `(…group, col_a, col_b, n, cov_num, varx_num, vary_num,
    * r2_6)`.
    */
  def corrMatrix(df: DataFrame, groupCols: Seq[String],
                 valCols: Seq[String]): DataFrame = {
    require(valCols.size >= 2, s"need >= 2 measures, got ${valCols.size}")
    require(valCols.distinct.size == valCols.size, "measures must be distinct")
    val n = valCols.size
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        valCols.zipWithIndex.map { case (c, i) =>
          sum(col(c).cast("long")).as(s"s$i") } ++
        (for (i <- 0 until n; j <- i until n) yield
          sum(col(valCols(i)).cast("long") * col(valCols(j)).cast("long"))
            .as(s"p${i}_$j"))
    // materialized ONCE (group-count-sized): without the checkpoint,
    // per-branch column pruning specializes each union branch's
    // aggregate, the exchange subplans stop matching, and the corpus
    // would be rescanned once per pair — exactly what this operator
    // exists to avoid
    val base = (if (groupCols.isEmpty) df.groupBy()
                else df.groupBy(groupCols.map(col): _*))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    val pairs = for (i <- 0 until n; j <- (i + 1) until n) yield
      base.select(groupCols.map(col) ++ Seq(
        lit(valCols(i)).as("col_a"), lit(valCols(j)).as("col_b"),
        col("n"),
        (col("n") * col(s"p${i}_$j") - col(s"s$i") * col(s"s$j"))
          .as("cov_num"),
        (col("n") * col(s"p${i}_$i") - col(s"s$i") * col(s"s$i"))
          .as("varx_num"),
        (col("n") * col(s"p${j}_$j") - col(s"s$j") * col(s"s$j"))
          .as("vary_num")): _*)
    pairs.reduce(_ unionByName _)
      .withColumn("r2_6",
        when(col("varx_num") === 0L || col("vary_num") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            col("cov_num").cast("double") * col("cov_num").cast("double") /
              (col("varx_num").cast("double") *
                col("vary_num").cast("double")), 6)))
  }
}
