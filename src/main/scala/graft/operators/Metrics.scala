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
}
