package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityFilters

class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: degenerate repetition maxes both signals, clean text scores 0") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),            // one bigram, repeated
      (2L, "the quick brown fox jumps over dogs"), // all grams unique
      (3L, "a b c a b c a b c"),                   // cyclic: every trigram duplicated? no — 3 distinct, each repeated
      (4L, "solo"),                                 // too short for any gram
      (5L, "")).toDF("doc_id", "text")
    val out = QualityFilters.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_toks", "top_bigram_frac", "dup_trigram_frac", "keep")
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq

    assert(out(0) == ((1L, 5L, 1.0, 1.0, false)), s"got ${out(0)}")
    assert(out(1) == ((2L, 7L, 0.166667, 0.0, true)),
      s"unique-bigram doc: top share = round(1/6, 6), keep; got ${out(1)}")
    // "a b c" x3: trigrams = {abc x3, bca x2, cab x2} -> all 7 occurrences duplicated
    assert(out(2)._4 == 1.0 && !out(2)._5, s"got ${out(2)}")
    assert(out(3) == ((4L, 1L, 0.0, 0.0, true)))
    assert(out(4) == ((5L, 0L, 0.0, 0.0, true)))
  }

  test("duplicated spans: a 10-token window shared across docs flags both") {
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"unique alpha beta $span gamma delta"),
      (2L, s"other prefix tokens $span and a suffix here"),
      (3L, "totally fresh text with no repeats whatsoever in it at all"),
      (4L, "tiny")).toDF("doc_id", "text")
    val out = QualityFilters.duplicatedSpans(docs, "doc_id", "text", k = 10)
      .orderBy("doc_id")
      .select("doc_id", "n_win", "n_dup", "dup_frac", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(out(0)._3 == 1 && out(1)._3 == 1,
      s"exactly the shared span is duplicated: ${out.toSeq}")
    assert(out(2)._3 == 0 && out(2)._5, "fresh doc is clean")
    assert(out(3) == ((4L, 0L, 0L, 0.0, true)), "sub-window doc scores 0")
  }

  test("count-min sketch: overestimates only, shard-merge equals whole-corpus build") {
    import graft.operators.Sketches
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d d d d"), (3L, "e e c a"))
      .toDF("doc_id", "text")
    val sketch = Sketches.countMin(docs, "text", depth = 4, width = 16)
    val terms = Seq("a", "b", "c", "d", "e", "zzz").toDF("term")
    val est = Sketches.estimate(sketch, terms, "term", depth = 4, width = 16)
      .as[(String, Long)].collect().toMap
    val truth = Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 4L, "e" -> 2L, "zzz" -> 0L)
    truth.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS must never underestimate: $t est ${est(t)} < $n")
    }
    assert(est("a") <= 5L + 11, "width-16 overcount stays bounded on this corpus")

    // mergeability: per-shard sketches folded == whole-corpus sketch
    val merged = Sketches.merge(
      Sketches.countMin(docs.filter(col("doc_id") <= 1), "text", 4, 16),
      Sketches.countMin(docs.filter(col("doc_id") > 1), "text", 4, 16))
    val whole = sketch.orderBy("row", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(merged.orderBy("row", "bucket").as[(Int, Long, Long)].collect().toSeq == whole)
  }

  test("corpus pipeline composition: stages shrink monotonically, end nonempty") {
    val out = graft.queries.Registry.queries("q106_corpus_pipeline")(spark, sfDir)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq ==
      Seq("total", "repetition", "exact_dedup", "decontaminated", "domain_mix"))
    val ns = out.map(_._3)
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      s"each stage can only remove rows: ${ns.toSeq}")
    assert(ns.head > 0 && ns.last > 0, s"pipeline must not drain the corpus: ${ns.toSeq}")
  }

  test("domain mix: feasible uniform thresholds, scarcest domain kept whole") {
    import graft.operators.DomainMix
    val counts = Map("a" -> 100L, "b" -> 50L, "c" -> 10L)
    val th = DomainMix.thresholds(counts,
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), buckets = 10000)
    // uniform mix limited by c: rates 10/100, 10/50, 10/10
    assert(th == Map("a" -> 1000L, "b" -> 2000L, "c" -> 10000L), th.toString)

    val docs = (0L until 160L).map { i =>
      (i, if (i < 100) "a" else if (i < 150) "b" else "c")
    }.toDF("doc_id", "lang")
    val out = DomainMix.reweight(docs, "doc_id", "lang",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    val kept = out.filter(col("keep")).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(kept("c") == 10L, "rate-1.0 domain keeps every row")
    assert(kept("a") > 0 && kept("a") < 100, s"a downsampled: ${kept("a")}")
    // deterministic: identical rerun
    val again = DomainMix.reweight(docs, "doc_id", "lang",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
      .filter(col("keep")).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(kept == again)
    // a domain missing from targets is dropped entirely
    val dropped = DomainMix.reweight(docs, "doc_id", "lang",
      Map("a" -> 1.0, "b" -> 1.0))
    assert(dropped.filter(col("lang") === "c" && col("keep")).count() == 0)
  }

  test("decontaminate: leaked 8-token window flags the doc, benchmark excluded") {
    val w = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (0L, s"benchmark question text here $w and the answer"), // benchmark (0 % 41 == 0)
      (1L, s"innocent looking training doc that contains $w verbatim inside"),
      (2L, "completely unrelated training document with fresh tokens only"),
      (3L, "short doc")).toDF("doc_id", "text")
    val out = QualityFilters.decontaminate(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 41 === 0), "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_hits", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSeq

    assert(out.map(_._1) == Seq(1L, 2L, 3L), "benchmark doc 0 must not appear")
    assert(out(0)._2 >= 1 && out(0)._3, s"doc 1 leaks the window: ${out(0)}")
    assert(out(1) == ((2L, 0L, false)))
    assert(out(2) == ((3L, 0L, false)), "sub-8-token doc cannot match")
  }
}
