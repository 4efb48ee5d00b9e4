package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed evaluation metrics for learned data filters.
  *
  * `auc` is the exact Mann-Whitney AUC (with midrank tie handling) as a
  * distributed computation: scores are grouped (shuffle ∝ distinct
  * scores), then ranked by the same two-phase range-partitioned scan
  * [[Packing]] uses — per-partition totals are collected (bounded by the
  * partition count) and prefix sums broadcast back as base offsets, so no
  * single-partition window ever sees the corpus. The rank statistic is
  * accumulated in INTEGER space (2·midrank = 2·cumBelow + n + 1, exact in
  * any engine; BigInt on the driver so it cannot overflow at any corpus
  * size) and only the final division touches floating point — which makes
  * the result bit-replayable in SQL.
  */
object Metrics {

  /** One row: (auc, n_pos, n_neg). `labelCol` must be 0/1. Ranking uses
    * the raw score values; pass a bit-deterministic score (e.g. a linear
    * logit, not a transcendental transform) when cross-engine exactness
    * matters — AUC is invariant under monotone transforms anyway.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val g = df
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("np"))
      .repartitionByRange(col("s"))
      .sortWithinPartitions(col("s"))
    // one RDD instance for both passes (see Scan's invariant)
    val gRdd = g.rdd
    val base = Scan.partitionBases(gRdd)(_.getLong(1))
    val partials = gRdd.mapPartitionsWithIndex { case (pi, rows) =>
      var c = base(pi)
      var s2 = BigInt(0); var p = 0L; var tot = 0L
      rows.foreach { r =>
        val n = r.getLong(1); val np = r.getLong(2)
        s2 += BigInt(np) * (2 * c + n + 1)
        p += np; tot += n; c += n
      }
      Iterator((s2, p, tot))
    }.collect()
    val s2 = partials.map(_._1).sum
    val p = partials.map(_._2).sum
    val nneg = partials.map(_._3).sum - p
    require(p > 0 && nneg > 0, "AUC needs both classes present")
    val a = (s2 - BigInt(p) * (p + 1)).toDouble / 2.0 / (p.toDouble * nneg)
    import spark.implicits._
    Seq((a, p, nneg)).toDF("auc", "n_pos", "n_neg")
  }

  /** EXACT two-sample Kolmogorov–Smirnov distance — the nonparametric
    * drift test (q188's fixed-bin histograms made exact): the max over
    * all values of |cdf_A − cdf_B|, computed ENTIRELY in integers as
    * ks_num = max |n_b·cum_a − n_a·cum_b| over the merged value axis, so
    * the statistic (and its argmax value, smallest on ties) replays
    * bit-for-bit in any engine; the 6-dp double ks6 = ks_num/(n_a·n_b)
    * rides along. Distributed as the [[auc]] shape: counts per value
    * (shuffle ∝ distinct values), range partition, one combined
    * per-partition totals collect (bounded by partition count), one
    * narrow pass tracking the per-partition max — never a
    * single-partition window. Overflow budget: n_a·n_b must fit BIGINT
    * (holds to ~3·10⁹ rows per side).
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val spark = a.sparkSession
    val g = a.select(col(valueCol).cast("long").as("v"),
        lit(1L).as("__a"), lit(0L).as("__b"))
      .unionByName(b.select(col(valueCol).cast("long").as("v"),
        lit(0L).as("__a"), lit(1L).as("__b")))
      .groupBy(col("v"))
      .agg(sum(col("__a")).as("na"), sum(col("__b")).as("nb"))
      .repartitionByRange(col("v"))
      .sortWithinPartitions(col("v"))
    val rdd = g.rdd // one instance for both passes (the Scan invariant)
    val per = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var sa = 0L; var sb = 0L
      rows.foreach { r => sa += r.getLong(1); sb += r.getLong(2) }
      Iterator((pi, sa, sb))
    }.collect().sortBy(_._1)
    val basesA = per.map(_._2).scanLeft(0L)(_ + _).dropRight(1)
    val basesB = per.map(_._3).scanLeft(0L)(_ + _).dropRight(1)
    val nA = per.map(_._2).sum
    val nB = per.map(_._3).sum
    require(nA > 0 && nB > 0, "ksStatistic needs both samples non-empty")
    val best = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var ca = basesA(pi); var cb = basesB(pi)
      var bestNum = -1L; var bestV = 0L
      rows.foreach { r =>
        ca += r.getLong(1); cb += r.getLong(2)
        val num = math.abs(nB * ca - nA * cb)
        if (num > bestNum) { bestNum = num; bestV = r.getLong(0) }
      }
      if (bestNum >= 0) Iterator((bestNum, bestV)) else Iterator.empty
    }.collect()
    val (ksNum, atV) = best.reduce { (x, y) =>
      if (x._1 > y._1 || (x._1 == y._1 && x._2 <= y._2)) x else y
    }
    import spark.implicits._
    Seq((nA, nB, ksNum, atV,
      BigDecimal(ksNum.toDouble / (nA.toDouble * nB.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_a", "n_b", "ks_num", "at_value", "ks6")
  }

  /** Per-GROUP KS — the drift dashboard (one statistic per segment):
    * same integer contract as [[ksStatistic]], with `isACol` (boolean)
    * marking side A, distributed across groups by group-partitioned
    * cumulative windows over the value-count table (never the corpus).
    * Groups missing either side are dropped — a one-sided KS is
    * undefined, not zero.
    */
  def ksByGroup(df: DataFrame, groupCol: String, isACol: String,
                valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(groupCol), col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(isACol), 1L).otherwise(0L)).as("na"),
        sum(when(!col(isACol), 1L).otherwise(0L)).as("nb"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    g.withColumn("ca", sum(col("na")).over(wOrd))
      .withColumn("cb", sum(col("nb")).over(wOrd))
      .withColumn("n_a", sum(col("na")).over(wAll))
      .withColumn("n_b", sum(col("nb")).over(wAll))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("num", abs(col("n_b") * col("ca") - col("n_a") * col("cb")))
      .groupBy(col(groupCol))
      .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
        max(struct(col("num"), (-col("v")).as("negv"))).as("m"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        col("m.num").as("ks_num"), (-col("m.negv")).as("at_value"),
        round(col("m.num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks6"))
  }
}
