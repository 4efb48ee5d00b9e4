package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain reweighting — the "data mixing" stage of a training-data
  * pipeline: given target proportions per domain (language, source,
  * toxicity band, ...), downsample each domain deterministically so the
  * output matches the target mix at the largest size achievable WITHOUT
  * upsampling any domain (the DoReMi/Pile-style static-mixture shape).
  *
  * Per-domain keep-rates are computed from the (tiny, one row per domain)
  * count aggregate on the driver; each row's keep decision is a pure
  * function of (id, domain) via the q68-proven portable md5 bucket, so the
  * sample is rerun-stable, cluster-size-independent, and replayable in any
  * engine with md5 — no RNG state, no sampleBy non-determinism.
  *
  * Scale shape: one partial-aggregated count shuffle, then a single
  * filter pass over the corpus with the thresholds inlined as a CASE
  * column. Nothing per-row touches the driver.
  */
object DomainMix {

  /** Integer bucket thresholds per domain (of `buckets`), normalized from
    * `targets`. floor semantics so any engine's integer conversion agrees.
    */
  private[graft] def thresholds(counts: Map[String, Long],
                                targets: Map[String, Double],
                                buckets: Int): Map[String, Long] = {
    val norm = targets.values.sum
    require(norm > 0, "target weights must sum to a positive value")
    val t = targets.map { case (d, w) => d -> w / norm }
    // feasible output size: bounded by the scarcest domain relative to its
    // target share (no upsampling)
    val scale = counts.flatMap { case (d, n) =>
      t.get(d).filter(_ > 0).map(n / _)
    }.foldLeft(Double.MaxValue)(math.min)
    counts.map { case (d, n) =>
      val rate = if (n == 0) 0.0 else math.min(1.0, t.getOrElse(d, 0.0) * scale / n)
      // +1e-9 before floor: the binding domain's rate computes to 1.0 only
      // up to ulp error (t * (n/t) / n rounds three times), and a bare
      // floor would then keep 9999/10000 buckets of the domain the scale
      // math says is "kept whole". The epsilon (absolute, vs ~5e-12 worst-
      // case error at bucket magnitude, far below the ~buckets/n rate
      // granularity of any real corpus) is mirrored verbatim in every
      // oracle replay so both engines floor the same value.
      d -> math.floor(rate * buckets + 1e-9).toLong
    }
  }

  /** Adds `keep` to `docs`: true iff the row survives mixing to `targets`.
    * Domains absent from `targets` are dropped entirely.
    */
  def reweight(docs: DataFrame, idCol: String, domainCol: String,
               targets: Map[String, Double], buckets: Int = 10000): DataFrame =
    reweightWithCounts(docs, idCol, domainCol, domainCounts(docs, domainCol),
      targets, buckets)

  /** Temperature-scaled mixing: targets ∝ (n_d/N)^alpha — the standard
    * multilingual-pretraining sampling formula (exponentiated-unigram
    * mixing: alpha = 1 reproduces the natural distribution and keeps
    * everything; alpha -> 0 approaches a uniform mix bounded by the
    * scarcest domain; 0.3-0.7 is the usual up-weight-the-tail range).
    * Same no-upsampling scale rule and deterministic md5 buckets as
    * [[reweight]] — the alpha weighting only changes the target vector.
    */
  def temperatureReweight(docs: DataFrame, idCol: String, domainCol: String,
                          alpha: Double, buckets: Int = 10000): DataFrame = {
    require(alpha >= 0, "alpha must be non-negative")
    val counts = domainCounts(docs, domainCol)
    val total = counts.values.sum.toDouble
    val targets = counts.map { case (d, n) => d -> math.pow(n / total, alpha) }
    reweightWithCounts(docs, idCol, domainCol, counts, targets, buckets)
  }

  /** Uniform mix over whatever domains exist: targets 1.0 for every
    * observed domain, derived from the SAME single counts collect — so a
    * caller never needs a separate distinct-domains action (which would
    * re-execute the upstream lineage when the input isn't cached).
    */
  def uniformReweight(docs: DataFrame, idCol: String, domainCol: String,
                      buckets: Int = 10000): DataFrame = {
    val counts = domainCounts(docs, domainCol)
    reweightWithCounts(docs, idCol, domainCol, counts,
      counts.map { case (d, _) => d -> 1.0 }, buckets)
  }

  private def domainCounts(docs: DataFrame, domainCol: String): Map[String, Long] =
    docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def reweightWithCounts(docs: DataFrame, idCol: String, domainCol: String,
                                 counts: Map[String, Long],
                                 targets: Map[String, Double],
                                 buckets: Int): DataFrame = {
    val th = thresholds(counts, targets, buckets)
    val thCol = th.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (d, v)) =>
      when(col(domainCol) === d, lit(v)).otherwise(acc)
    }
    val bucket = graft.functions.TextFns.md5Bucket(
      concat(col(idCol).cast("string"), lit(":"), col(domainCol)), buckets)
    docs.withColumn("keep", bucket < thCol)
  }
}
