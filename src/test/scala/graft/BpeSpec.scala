package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Pins the BPE trainer/encoder to the published algorithm (Sennrich et al.
  * 2016): the textbook low/lower/newest/widest corpus, the greedy
  * lowest-rank encode, unk handling, the min-frequency stop, and that the
  * distributed DataFrame encode agrees with the driver-side per-word
  * encoder it broadcasts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic example corpus (Sennrich §3.2's figure, freqs adjusted to
  // make every tie-break branch visible)
  private val corpus = IndexedSeq[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainOnCounts: merge order is max-freq with lexicographic ties") {
    val m = Bpe.trainOnCounts(corpus, numMerges = 6)
    assert(m.merges == IndexedSeq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow),
      ("l", "o"), ("lo", "w"), ("e", "w")))
    // vocabulary: sorted base alphabet (Eow sorts first: '<' < letters)
    // gets ids 0..10, merge products follow in merge order
    assert(m.vocab(Bpe.Eow) == 0L && m.vocab("d") == 1L && m.vocab("w") == 10L)
    assert(m.vocab("es") == 11L && m.vocab("est") == 12L &&
      m.vocab("est" + Bpe.Eow) == 13L && m.vocab("lo") == 14L &&
      m.vocab("low") == 15L && m.vocab("ew") == 16L)
  }

  test("encodeWord: the canonical 'lowest' -> low + est</w> generalization") {
    val m = Bpe.trainOnCounts(corpus, numMerges = 6)
    // 'lowest' never occurs in training; BPE composes it from learned units
    assert(Bpe.encodeWord("lowest", m).toSeq ==
      Seq(m.vocab("low"), m.vocab("est" + Bpe.Eow)))
    // a training word encodes to its fully-merged form
    assert(Bpe.encodeWord("low", m).toSeq == Seq(m.vocab("low"), m.vocab(Bpe.Eow)))
    assert(Bpe.decode(Bpe.encodeWord("lowest", m), m) == "lowest")
  }

  test("encodeWord: characters outside the training alphabet become unkId") {
    val m = Bpe.trainOnCounts(corpus, numMerges = 6)
    val ids = Bpe.encodeWord("löw", m).toSeq // ö never seen
    assert(ids == Seq(m.vocab("l"), -1L, m.vocab("w"), m.vocab(Bpe.Eow)))
  }

  test("trainOnCounts: stops when no pair occurs at least twice") {
    val m = Bpe.trainOnCounts(IndexedSeq(("abc", 1L), ("xyz", 1L)), numMerges = 100)
    assert(m.merges.isEmpty, "freq-1 pairs must not become merge rules")
  }

  test("literal </w> corpus text never aliases the end-of-word marker") {
    // a scraped corpus containing the marker string as real content: no
    // merge product may equal the marker, ids stay unambiguous, and
    // decode round-trips the literal text instead of erasing it
    val m = Bpe.trainOnCounts(
      IndexedSeq((Bpe.Eow, 5L), ("low", 4L), ("lower", 2L)), numMerges = 50)
    assert(!m.merges.exists { case (a, b) => a + b == Bpe.Eow },
      s"banned product slipped through: ${m.merges}")
    val ids = Bpe.encodeWord(Bpe.Eow, m)
    assert(!ids.contains(m.vocab(Bpe.Eow)) ||
      ids.count(_ == m.vocab(Bpe.Eow)) == 1,
      "content ids must not collapse into the marker id")
    assert(Bpe.decode(ids, m) == Bpe.Eow,
      s"literal marker text must survive decode: '${Bpe.decode(ids, m)}'")
  }

  test("encode: distributed output agrees with driver-side encodeWord") {
    val docs = Seq(
      (1L, "low lower newest"), (2L, "widest lowest löw"), (3L, ""))
      .toDF("doc_id", "text")
    val m = Bpe.trainOnCounts(corpus, numMerges = 6)
    val got = Bpe.encode(docs, "doc_id", "text", m)
      .select("doc_id", "ids", "n_words", "n_toks", "n_unk")
      .as[(Long, Seq[Long], Long, Long, Long)].collect().sortBy(_._1)

    def exp(ws: String*): (Seq[Long], Long, Long, Long) = {
      val per = ws.map(w => Bpe.encodeWord(w, m).toSeq)
      val flat = per.flatten
      (flat, ws.length.toLong, flat.length.toLong, flat.count(_ == -1L).toLong)
    }
    val e1 = exp("low", "lower", "newest")
    val e2 = exp("widest", "lowest", "löw")
    assert(got.length == 2, "token-free docs drop (same contract as Vocab.encode)")
    assert(got(0) == ((1L, e1._1, e1._2, e1._3, e1._4)))
    assert(got(1) == ((2L, e2._1, e2._2, e2._3, e2._4)))
    assert(got(1)._5 == 1L, "exactly the ö is unk")
  }

  test("train: end-to-end on real parquet is deterministic across runs") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val a = Bpe.train(docs, "text", numMerges = 20)
    val b = Bpe.train(docs, "text", numMerges = 20)
    assert(a.merges == b.merges && a.vocab == b.vocab)
    assert(a.merges.nonEmpty)
  }

  test("save/load round-trips the exact model (train/serve token parity)") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val m = Bpe.train(docs, "text", numMerges = 20)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    Bpe.save(spark, m, tmp)
    val loaded = Bpe.load(spark, tmp)
    assert(loaded.merges == m.merges && loaded.vocab == m.vocab &&
      loaded.unkId == m.unkId)
    assert(Bpe.encodeWord("lowestish", loaded).toSeq ==
      Bpe.encodeWord("lowestish", m).toSeq)
  }

  test("streaming encode with a loaded model equals the batch encode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, "low lower newest"), (2L, "widest lowest"), (3L, "low"))
    val m = Bpe.trainOnCounts(corpus, numMerges = 6)
    val batch = Bpe.encode(rows.toDF("doc_id", "text"), "doc_id", "text", m)
      .select(col("doc_id"), array_join(col("ids"), " ").as("ids_str"),
        col("n_toks")).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    input.addData(rows)
    val q = Bpe.encode(input.toDF().toDF("doc_id", "text"), "doc_id", "text", m)
      .select(col("doc_id"), array_join(col("ids"), " ").as("ids_str"), col("n_toks"))
      .writeStream.format("memory").queryName("bpe_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bpe_stream").orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(streamed == batch, s"stream/batch token divergence: $streamed vs $batch")
  }

  test("decodeDf round-trips encode and matches the driver decode") {
    val rows = Seq((1L, "low lower newest"), (2L, "widest lowest low"),
      (3L, "low"))
    val m = Bpe.trainOnCounts(corpus, numMerges = 6)
    val df = rows.toDF("doc_id", "text")
    val enc = Bpe.encode(df, "doc_id", "text", m)
    val dec = Bpe.decodeDf(enc, "doc_id", "ids", m)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(dec == rows.map { case (id, t) => (id, t) },
      s"round trip broke: $dec")
    // distributed decode == driver decode on the same id sequences
    val encRows = enc.select(col("doc_id"), col("ids"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect()
    val driver = encRows.map { case (id, ids) => (id, Bpe.decode(ids, m)) }.toSeq
    assert(dec == driver, s"distributed vs driver decode: $dec vs $driver")
    // unknown ids drop, matching the driver's flatMap
    val withUnk = enc.withColumn("ids",
      concat(col("ids"), array(lit(999999L))))
    val dec2 = Bpe.decodeDf(withUnk, "doc_id", "ids", m)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(dec2 == dec, "unknown ids must drop silently like Bpe.decode")
  }
}
