package graft

import graft.operators.Cf

/** Pins the CF recommender against a brute-force driver mirror: stop-item
  * cut, min-co pruning, squared-cosine ppm ranking with deterministic
  * ties, candidate generation minus the full own-basket.
  */
class CfSpec extends SparkSpec {
  import spark.implicits._

  private def mirror(ui: Seq[(Long, Long)], maxDf: Long, minCo: Long,
                     k: Int, topN: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val base = ui.distinct
    val df = base.groupBy(_._2).map { case (i, v) => i -> v.size.toLong }
    val kept = base.filter(p => df(p._2) <= maxDf)
    val items = kept.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).toSet }
    val own = base.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).toSet }
    val users = items.keys.toSeq.sorted
    val nbrs = users.flatMap { ua =>
      users.filter(_ != ua)
        .map { ub => (ub, (items(ua) & items(ub)).size.toLong) }
        .filter(_._2 >= minCo)
        .map { case (ub, co) =>
          (ub, co, co * co * 1000000L / (items(ua).size.toLong * items(ub).size)) }
        .sortBy { case (ub, _, s) => (-s, ub) }.take(k)
        .map { case (ub, co, s) => (ua, ub, co, s) }
    }
    nbrs.groupBy(_._1).toSeq.flatMap { case (u, ns) =>
      val cand = ns.flatMap { case (_, nb, _, s) =>
        items(nb).diff(own.getOrElse(u, Set())).map(i => (i, s))
      }.groupBy(_._1).map { case (i, v) =>
        (i, v.map(_._2).sum, v.size.toLong)
      }.toSeq
      cand.sortBy { case (i, s, _) => (-s, i) }.take(topN).zipWithIndex
        .map { case ((i, s, n), r) => (u, i, s, n, r + 1L) }
    }.sortBy(r => (r._1, r._5))
  }

  test("recommend matches the brute-force mirror on a random matrix") {
    val rnd = new scala.util.Random(31)
    val ui = (1 to 400).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(25).toLong))
    val got = Cf.recommend(ui.toDF("u", "i").repartition(6), "u", "i",
        maxDf = 10L, minCo = 2L, k = 3, topN = 4)
      .orderBy("u", "rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val exp = mirror(ui, 10L, 2L, 3, 4)
    assert(got == exp, s"mirror diverged:\ngot  ${got.take(8)}\nwant ${exp.take(8)}")
  }

  test("a stop item is never a candidate, but blocks re-recommendation") {
    // item 100 is in EVERY basket (df 4 > maxDf 2): it must not appear in
    // any recommendation, and users who own it anyway must not get it.
    // Users 1,2 share {10,11}; user 2 also has 12 -> rec 12 for user 1.
    val ui = Seq((1L, 10L), (1L, 11L), (1L, 100L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 100L),
      (3L, 20L), (3L, 21L), (3L, 100L), (4L, 20L), (4L, 21L), (4L, 100L))
    val got = Cf.recommend(ui.toDF("u", "i"), "u", "i",
        maxDf = 2L, minCo = 2L, k = 3, topN = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.forall(_._2 != 100L), s"stop item recommended: $got")
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 12L)),
      s"expected exactly user 1 <- item 12: $got")
  }

  test("invalid knobs fail loudly") {
    val df = Seq((1L, 2L)).toDF("u", "i")
    intercept[IllegalArgumentException] { Cf.recommend(df, "u", "i", 0L, 1L, 1, 1) }
    intercept[IllegalArgumentException] { Cf.recommend(df, "u", "i", 1L, 0L, 1, 1) }
    intercept[IllegalArgumentException] { Cf.recommend(df, "u", "i", 1L, 1L, 0, 1) }
    intercept[IllegalArgumentException] { Cf.recommend(df, "u", "i", 1L, 1L, 1, 0) }
  }
}
