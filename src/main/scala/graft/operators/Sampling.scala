package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation. `sample(fraction)` is
  * useless for a training pipeline: it is partitioning- and run-dependent,
  * so the "same" sample can never be reproduced, diffed, or re-drawn after
  * a backfill. Here membership is a pure function of (seed, id):
  *
  *  - [[stratified]]: per stratum, the n rows with the smallest
  *    md5(seed:id) — a fixed-size per-group sample whose rank window is
  *    PARTITIONED by stratum (never a global sort), the same shape as
  *    top-k-per-group (q04). Adding rows can only rotate members out by
  *    hash rank; re-running is free.
  *  - [[hashFraction]]: keep id iff md5(seed:id) mod d < k — the
  *    shuffle-free Bernoulli-by-hash used for holdouts (q124's md5-bucket
  *    discipline generalized): no window, no shuffle, a pure filter that
  *    pushes down to the scan, and two samples with different seeds are
  *    independent while the SAME seed always reproduces.
  *
  * Both replay bit-identically in any engine with md5 — fully
  * oracle-checkable, unlike RNG-based sampling.
  */
object Sampling {

  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 n: Int, seed: String = "s0"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val r = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(r, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  def hashFraction(df: DataFrame, idCol: String, k: Int, d: Int,
                   seed: String = "s0"): DataFrame = {
    require(k > 0 && k <= d, s"need 0 < k <= d, got k=$k d=$d")
    val bucket =
      conv(substring(md5(concat(lit(s"$seed:"), col(idCol).cast("string"))),
        1, 8), 16, 10).cast("long") % d
    df.filter(bucket < k)
  }

  /** Weighted Bernoulli sampling, still a pure function of (seed, id):
    * keep a row iff its 32-bit hash falls below (w·2³²) div maxW, so
    * inclusion probability is proportional to the integer weight (the
    * max-weight row is always kept; floors shave < 2⁻³²). The
    * importance-sampling step of corpus curation — sample long/high-
    * quality documents preferentially — without surrendering
    * reproducibility: no RNG, no state, replayable in SQL. `maxW` is one
    * scalar aggregate (a bounded one-row driver artifact, the Selection
    * convention); the filter itself is shuffle-free.
    *
    * Preconditions are ENFORCED, not just documented (the sibling-operator
    * `require` discipline): every weight must be positive — w ≤ 0 would
    * silently exclude its rows — and max(w) must fit 2³⁰ so w·2³² stays in
    * BIGINT; a larger weight would silently overflow the threshold
    * negative and drop the rows that should be kept with the HIGHEST
    * probability. Both bounds come from the same one-row min/max
    * aggregate.
    */
  def weightedHash(df: DataFrame, idCol: String, weightCol: String,
                   seed: String = "w0"): DataFrame = {
    val r = df.agg(max(col(weightCol).cast("long")).as("__maxw"),
      min(col(weightCol).cast("long")).as("__minw")).head
    if (r.isNullAt(0)) return df.limit(0) // empty input: nothing to sample
    val (maxW, minW) = (r.getLong(0), r.getLong(1))
    require(minW > 0,
      s"weightedHash: weights must be positive, got min($weightCol)=$minW")
    require(maxW < (1L << 30),
      s"weightedHash: max($weightCol)=$maxW >= 2^30 would overflow w*2^32")
    val h = conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    df.filter(h < expr(s"CAST($weightCol AS LONG) * 4294967296L DIV ${maxW}L"))
  }
}
