package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ohlc, Sampling}

/** Candle merge law and deterministic-sampling invariants. */
class OhlcSamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables(spark, sfDir, "events")

  test("candle merge law: shard candles fold to the whole-input candles") {
    // three disjoint row shards by an arbitrary predicate uncorrelated
    // with time order — batch boundaries never align with hours
    val shards = Seq(
      events.filter(col("event_id") % 3 === 0),
      events.filter(col("event_id") % 3 === 1),
      events.filter(col("event_id") % 3 === 2))
    val merged = Ohlc.finish(
      Ohlc.mergeCandles(shards.map(Ohlc.candles).reduce(_ unionByName _)))
    val whole = Ohlc.finish(Ohlc.candles(events))
    val cols = Seq("h", "event_type", "open", "high", "low", "close", "volume")
    assert(merged.orderBy(cols.map(col): _*).collect().toSeq ===
      whole.orderBy(cols.map(col): _*).collect().toSeq)
  }

  test("merge is closed: merging merged shards equals merging all shards at once") {
    val a = Ohlc.candles(events.filter(col("event_id") % 2 === 0))
    val b = Ohlc.candles(events.filter(col("event_id") % 2 === 1))
    val twoStep = Ohlc.finish(Ohlc.mergeCandles(
      Ohlc.mergeCandles(a).unionByName(b)))
    val oneStep = Ohlc.finish(Ohlc.mergeCandles(a.unionByName(b)))
    val cols = Seq("h", "event_type", "open", "high", "low", "close", "volume")
    assert(twoStep.orderBy(cols.map(col): _*).collect().toSeq ===
      oneStep.orderBy(cols.map(col): _*).collect().toSeq)
  }

  test("stratified sample: partitioning-invariant, size-bounded, pure in (seed, id)") {
    val docs = Tables(spark, sfDir, "documents")
    val s7 = Sampling.stratified(docs.repartition(7), "lang", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    val s1 = Sampling.stratified(docs.coalesce(1), "lang", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(s7 === s1)
    val sizes = Sampling.stratified(docs, "lang", "doc_id", 5)
      .groupBy("lang").count().as[(String, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(_._2 <= 5))
    // different seed draws a different sample (overwhelmingly likely)
    val other = Sampling.stratified(docs, "lang", "doc_id", 5, seed = "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(other !== s7)
  }

  test("hashFraction: reproducible, disjoint across complementary buckets") {
    val docs = Tables(spark, sfDir, "documents")
    val a = Sampling.hashFraction(docs, "doc_id", 3, 10)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashFraction(docs, "doc_id", 3, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("weightedHash: enforces positive weights and the 2^30 overflow bound") {
    val ok = Seq((1L, 10L), (2L, 1L), (3L, 10L)).toDF("id", "w")
    // max-weight rows are always kept (threshold = 2^32 exactly)
    val kept = Sampling.weightedHash(ok, "id", "w")
      .select("id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(3L))

    // w <= 0 would silently drop rows — must be rejected loudly
    val zero = Seq((1L, 0L), (2L, 5L)).toDF("id", "w")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.weightedHash(zero, "id", "w")
    }
    assert(e1.getMessage.contains("positive"))

    // w >= 2^30 would overflow w*2^32 negative — must be rejected loudly
    val big = Seq((1L, 1L << 30), (2L, 5L)).toDF("id", "w")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.weightedHash(big, "id", "w")
    }
    assert(e2.getMessage.contains("2^30"))

    // empty input: empty sample, no crash
    assert(Sampling.weightedHash(ok.limit(0), "id", "w").count() == 0L)
  }
}
