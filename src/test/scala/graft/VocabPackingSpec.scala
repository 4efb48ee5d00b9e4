package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Vocab}

class VocabPackingSpec extends SparkSpec {
  import spark.implicits._

  test("buildVocab: frequency rank, lexicographic ties, capped size") {
    val docs = Seq((1L, "b a b c a b"), (2L, "a c d")).toDF("doc_id", "text")
    // freqs: a=3, b=3, c=2, d=1 -> ties (a,b) break lexicographically
    val v = Vocab.buildVocab(docs, "text", size = 3)
      .select("token", "token_id", "freq").as[(String, Long, Long)].collect().sortBy(_._2)
    assert(v.toSeq == Seq(("a", 0L, 3L), ("b", 1L, 3L), ("c", 2L, 2L)))
  }

  test("encode: position-ordered ids, OOV as -1, counts") {
    val docs = Seq((1L, "b a b c a b"), (2L, "a c d")).toDF("doc_id", "text")
    val v = Vocab.buildVocab(docs, "text", size = 3)
    val e = Vocab.encode(docs, "doc_id", "text", v)
      .select("doc_id", "ids", "n_toks", "n_oov")
      .as[(Long, Seq[Long], Long, Long)].collect().sortBy(_._1)
    assert(e(0) == ((1L, Seq(1L, 0L, 1L, 2L, 0L, 1L), 6L, 0L)))
    assert(e(1) == ((2L, Seq(0L, 2L, -1L), 3L, 1L)), "d is OOV -> -1")
  }

  test("packSequences: exact exclusive running sum across many partitions") {
    val docs = (0L until 200L).map(i => (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(16)
    val out = Packing.packSequences(docs, "doc_id", "text", seqLen = 10)
      .orderBy("doc_id")
      .select("doc_id", "n_toks", "tok_start", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // driver mirror of the concatenated stream
    var off = 0L
    val expected = (0L until 200L).map { i =>
      val n = (i % 7) + 1
      val row = (i, n, off, off / 10, off % 10)
      off += n
      row
    }
    assert(out == expected, "two-phase scan must equal the sequential scan exactly")
    assert(out.last._3 + out.last._2 == (0L until 200L).map(_ % 7 + 1).sum,
      "stream length adds up")
  }
}
