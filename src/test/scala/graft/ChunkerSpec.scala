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

  test("metadata columns are preserved on every chunk") {
    val df = Seq((7L, "x", ("w " * 50).trim)).toDF("id", "lang", "text")
    val out = Chunker.split(df, "text", 20, 5)
    assert(out.columns.toSet == Set("id", "lang", "text", "chunk_id", "chunk_text"))
    assert(out.select("id").distinct().as[Long].collect().toSeq == Seq(7L))
    assert(out.count() == 3) // 50 tokens, size 20, step 15 -> ceil((50-5)/15) = 3
  }
}
