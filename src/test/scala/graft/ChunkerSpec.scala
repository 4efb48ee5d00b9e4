package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** G1 chunker properties (SURVEY §5.2 item 4): full coverage, exact overlap,
  * metadata preservation.
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Long, String)] =
    Chunker.split(Seq((1L, text)).toDF("id", "text"), "text", size, overlap)
      .select(col("chunk_id"), col("chunk_text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("short doc yields exactly one chunk equal to the input") {
    val c = chunksOf("a b c", 10, 2)
    assert(c == Seq((0L, "a b c")))
  }

  test("chunks cover every token and consecutive chunks share `overlap` tokens") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
        val n = 1 + rnd.nextInt(400)
        val size = 2 + rnd.nextInt(49)
        val overlap = math.min(rnd.nextInt(11), size - 1)
        val toks = (0 until n).map(i => s"t$i")
        val cs = chunksOf(toks.mkString(" "), size, overlap).map(_._2.split(" ").toSeq)
        val step = size - overlap
        // reconstruction: first chunk + the tail of every later chunk
        val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(overlap))
        assert(rebuilt == toks, s"n=$n size=$size overlap=$overlap")
        // every chunk except the last is exactly `size` tokens
        cs.dropRight(1).foreach(c => assert(c.size == size))
        // consecutive chunks agree on the overlap region
        cs.sliding(2).foreach {
          case Seq(a, b) => assert(a.takeRight(overlap) == b.take(overlap))
          case _ =>
        }
    }
  }

  test("neighbors: bounded prev/next context windows, default off") {
    val toks = (1 to 100).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" "))).toDF("id", "text")
    val out = Chunker.split(df, "text", 10, 0, neighbors = 2)
      .select(col("chunk_id"), col("prev_context"), col("chunk_text"), col("next_context"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(out.length == 10)
    // chunk 3 covers t31..t40; +-2 chunk-steps of context on each side
    val c3 = out(3)
    assert(c3._2 == (11 to 30).map(i => s"t$i").mkString(" "), s"prev: ${c3._2}")
    assert(c3._3 == (31 to 40).map(i => s"t$i").mkString(" "))
    assert(c3._4 == (41 to 60).map(i => s"t$i").mkString(" "), s"next: ${c3._4}")
    // edges: first chunk has no prev, chunk 1 a truncated prev, last no next
    assert(out(0)._2 == "" && out(0)._4 == (11 to 30).map(i => s"t$i").mkString(" "))
    assert(out(1)._2 == (1 to 10).map(i => s"t$i").mkString(" "))
    assert(out(9)._4 == "")
    // default: context columns absent (q55 output shape unchanged)
    assert(!Chunker.split(df, "text", 10, 0).columns.contains("prev_context"))
  }

  test("metadata columns are preserved on every chunk") {
    val df = Seq((7L, "x", ("w " * 50).trim)).toDF("id", "lang", "text")
    val out = Chunker.split(df, "text", 20, 5)
    assert(out.columns.toSet == Set("id", "lang", "text", "chunk_id", "chunk_text"))
    assert(out.select("id").distinct().as[Long].collect().toSeq == Seq(7L))
    assert(out.count() == 3) // 50 tokens, size 20, step 15 -> ceil((50-5)/15) = 3
  }
}
