package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-hygiene filters a large-scale training-data pipeline runs between
  * dedup and tokenization — signals the reference's per-document quality
  * rubric (zara_hybrid_etl.py:212-222) does not cover because they are
  * CORPUS-level pathologies:
  *
  *  - `repetitionStats`: Gopher-style repetition signals (Rae et al. 2021,
  *    table A1): the fraction of all bigrams taken by the single most
  *    frequent one, and the fraction of trigram occurrences that are
  *    duplicates. Boilerplate, keyword-stuffed spam, and degenerate-LM
  *    output all spike these while passing length/punctuation rubrics.
  *
  *  - `decontaminate`: benchmark decontamination (the GPT-3 appendix-C
  *    shape): flag corpus documents sharing any length-n token window with
  *    a held-out evaluation set, so test questions don't leak into
  *    training data.
  *
  * Distribution shape: everything is explode -> partial-aggregated groupBy
  * on (doc, gram) — shuffle proportional to distinct grams, no windows, no
  * driver collects. Decontamination broadcasts the (small) benchmark gram
  * set into the corpus scan, so the corpus never shuffles for the probe —
  * at 100 TB the benchmark side is a few MB of n-grams while the corpus
  * side stays a single pass.
  */
object QualityFilters {

  /** Per-document repetition signals + keep/drop verdict.
    *
    * Output: id, n_toks, top_bigram_frac (most frequent bigram's share of
    * all bigram occurrences), dup_trigram_frac (share of trigram
    * occurrences whose trigram appears more than once), keep. Documents too
    * short to form a gram score 0.0 (nothing repeats in them).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      maxTopBigram: Double = 0.20,
                      maxDupTrigram: Double = 0.30): DataFrame = {
    val base = docs.select(col(idCol).as("__id"),
      TextFns.tokens(lower(col(textCol))).as("__toks"))

    // one tagged explode carries BOTH gram sizes: the corpus (the expensive
    // side at scale) is scanned and tokenized once, and the k-tagged gram
    // key keeps the two statistics separable through shared shuffles
    val counts = base.select(col("__id"), explode(concat(
        transform(TextFns.wordShingles(col("__toks"), 2),
          g => struct(lit(2).as("k"), g.as("g"))),
        transform(TextFns.wordShingles(col("__toks"), 3),
          g => struct(lit(3).as("k"), g.as("g"))))).as("kg"))
      .select(col("__id"), col("kg.k").as("k"), col("kg.g").as("g"))
      .groupBy(col("__id"), col("k"), col("g")).agg(count(lit(1)).as("c"))

    val sig = counts.groupBy(col("__id"), col("k"))
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("topfrac"),
        (sum(when(col("c") > 1, col("c")).otherwise(lit(0))).cast("double") /
          sum(col("c"))).as("dupfrac"))
      .groupBy(col("__id"))
      .agg(max(when(col("k") === 2, col("topfrac"))).as("top2"),
        max(when(col("k") === 3, col("dupfrac"))).as("dup3"))

    base.select(col("__id"), size(col("__toks")).cast("long").as("n_toks"))
      .join(sig, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_toks"),
        round(coalesce(col("top2"), lit(0.0)), 6).as("top_bigram_frac"),
        round(coalesce(col("dup3"), lit(0.0)), 6).as("dup_trigram_frac"))
      .withColumn("keep",
        col("top_bigram_frac") <= maxTopBigram && col("dup_trigram_frac") <= maxDupTrigram)
  }

  /** Substring-level (duplicated-span) dedup signals — the third dedup
    * granularity after document-exact and document-near: the fraction of a
    * document's k-token windows that occur MORE THAN ONCE corpus-wide
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better": repeated spans, not just repeated documents, cause
    * memorization). Output: id, n_win, n_dup, dup_frac, keep.
    *
    * Shape: one explode builds the rolling windows, then a TWO-LEVEL
    * count. Level one pre-aggregates on (gram, doc) — the doc id acts as
    * the salt, so a corpus-dominating span (license header, template
    * boilerplate) spreads across the id dimension instead of landing in a
    * single task the way a raw `Window.partitionBy(g)` would (window
    * partitions cannot be split by AQE; shuffle-join partitions can).
    * Level two sums the pre-aggregate by gram for the global totals and
    * joins back — both branches consume the SAME (gram, doc) aggregate,
    * so ReuseExchange keeps the corpus scan/tokenize single-pass
    * (pinned in PlanSpec), and the join runs under AQE skew-join.
    * Documents shorter than k windows score 0.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 10, maxDupFrac: Double = 0.3): DataFrame = {
    // the explicit id filter keeps BOTH count branches' scan subtrees
    // canonically identical (the roster's outer join infers isnotnull on
    // one branch only otherwise), which is what lets ReuseExchange fold
    // them into a single corpus scan. CONTRACT: rows with a null id are
    // dropped from the output (not scored keep=true) — a corpus keyed by
    // nullable ids must synthesize ids upstream.
    val base = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        TextFns.tokens(lower(col(textCol))).as("__toks"))
    val wins = base.select(col("__id"),
      explode(TextFns.wordShingles(col("__toks"), k)).as("g"))
    // level 1: per-(gram, doc) occurrence counts — the salted partial
    val dg = wins.groupBy(col("g"), col("__id")).agg(count(lit(1)).as("c"))
    // level 2: global per-gram totals over one row per (gram, doc)
    val gtot = dg.groupBy(col("g")).agg(sum(col("c")).as("tot"))
    val perDoc = dg.join(gtot, Seq("g"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_win"),
        sum(when(col("tot") > 1, col("c")).otherwise(lit(0L))).as("n_dup"))
    base.select(col("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_win"), lit(0L)).as("n_win"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(when(col("n_win") === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_win")), 6))
      .withColumn("keep", col("dup_frac") <= maxDupFrac)
  }

  /** Flag corpus documents that share at least one n-token window with the
    * benchmark set. Output: id, n_hits (distinct leaked benchmark n-grams),
    * contaminated. Benchmark documents themselves are excluded from the
    * corpus side (they would trivially self-match).
    *
    * The corpus is read twice (the id roster keeps zero-gram docs that the
    * explode necessarily drops); in a real 100 TB run the filtered corpus
    * side is a staged table read from storage, so the second pass prunes
    * to one column — or persist the roster when it fits.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchIdCol: String, benchTextCol: String,
                    n: Int = 8): DataFrame = {
    val benchIds = bench.select(col(benchIdCol).as("__id")).distinct()
    val benchGrams = bench.select(
        explode(TextFns.wordShingles(
          TextFns.tokens(lower(col(benchTextCol))), n)).as("g"))
      .distinct()

    val corpusSide = corpus.join(benchIds,
        corpus(idCol) === benchIds("__id"), "left_anti")
      .select(col(idCol).as("__cid"),
        TextFns.tokens(lower(col(textCol))).as("__toks"))

    val hits = corpusSide
      .select(col("__cid"), explode(TextFns.wordShingles(col("__toks"), n)).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col("__cid"))
      .agg(countDistinct(col("g")).as("n_hits"))

    corpusSide.select(col("__cid"))
      .join(hits, Seq("__cid"), "left")
      .select(col("__cid").as(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
