package graft

import org.apache.spark.sql.functions.col

import graft.operators.Graph

/** Pins the exact fixed-point PageRank: bit-equality with a driver mirror
  * using the identical integer ops, and the loud dangling-node contract.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankFixed equals the integer driver mirror on a symmetric graph") {
    val rnd = new scala.util.Random(7)
    val raw = (1 to 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
    val sym = (raw ++ raw.map(_.swap)).distinct
    val got = Graph.pageRankFixed(sym.toDF("src", "dst").repartition(8),
        "src", "dst", iters = 10)
      .as[(Long, Long)].collect().toMap

    val nodes = sym.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val scale = 1000000000L
    val init = scale / nodes.length
    val base = ((15L * scale) / 100L) / nodes.length
    val out = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
      sym.foreach { case (s0, d0) =>
        contrib(d0) += (85L * r(s0)) / (100L * out(s0))
      }
      r = nodes.map(v => v -> (base + contrib(v))).toMap
    }
    assert(got == r, s"distributed $got != mirror $r")
  }

  test("a node with no out-edge fails loudly instead of leaking rank mass") {
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankFixed(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
    }
    assert(e.getMessage.contains("no out-edge"))
  }

  test("a node with no in-edge fails loudly instead of silently vanishing") {
    // node 3 has an out-edge but nothing points at it: after iteration 1
    // it would drop from the groupBy(dst)-built rank vector
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankFixed(Seq((3L, 1L), (1L, 2L), (2L, 1L), (1L, 3L))
        .toDF("src", "dst").filter(col("dst") =!= 3L), "src", "dst")
    }
    assert(e.getMessage.contains("no in-edge"))
  }
}
