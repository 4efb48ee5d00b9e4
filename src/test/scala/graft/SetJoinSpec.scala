package graft

import graft.operators.SetJoin

/** Pins the AllPairs prefix-filter contract: the join result equals an
  * exhaustive brute-force threshold join — no false negatives (the
  * prefix theorem held) and no false positives (the integer verify) —
  * across several rational thresholds and set-size mixes.
  */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  test("allPairs equals brute force across thresholds on a random corpus") {
    val rnd = new scala.util.Random(42)
    // 80 sets over a 30-token vocab: dense overlap, sizes 1..10 (empty
    // sets excluded by the operator, singletons index their only token)
    val docs = (0 until 80).map { i =>
      val n = 1 + rnd.nextInt(10)
      (i.toLong, Seq.fill(n)("t" + rnd.nextInt(30)))
    }
    val df = docs.toDF("id", "toks")
    val sets = docs.map { case (i, ts) => (i, ts.toSet) }
    for ((tn, td) <- Seq((1, 2), (3, 4), (1, 4), (9, 10), (1, 1))) {
      val got = SetJoin.allPairs(df, "id", "toks", tn, td)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = (for {
        (a, sa) <- sets
        (b, sb) <- sets if a < b
        isect = (sa & sb).size
        uni = (sa | sb).size
        if isect * td >= uni * tn
      } yield (a, b, isect.toLong, uni.toLong)).toSet
      assert(got == want,
        s"t=$tn/$td: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("bipartite equals brute force across thresholds, including colliding ids") {
    val rnd = new scala.util.Random(7)
    def corpus(n: Int, maxLen: Int) = (0 until n).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(maxLen))("t" + rnd.nextInt(30)))
    }
    // ids intentionally overlap across the two corpora — the pair key is
    // (id_l, id_r), sides are never mixed
    val ls = corpus(60, 10)
    val rs = corpus(40, 8)
    val (ldf, rdf) = (ls.toDF("id", "toks"), rs.toDF("id", "toks"))
    val (lSets, rSets) =
      (ls.map { case (i, t) => (i, t.toSet) }, rs.map { case (i, t) => (i, t.toSet) })
    for ((tn, td) <- Seq((1, 2), (1, 4), (3, 4), (1, 1))) {
      val got = SetJoin.bipartite(ldf, "id", rdf, "id", "toks", tn, td)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = (for {
        (a, sa) <- lSets
        (b, sb) <- rSets
        isect = (sa & sb).size
        uni = (sa | sb).size
        if isect * td >= uni * tn
      } yield (a, b, isect.toLong, uni.toLong)).toSet
      assert(got == want,
        s"t=$tn/$td: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}
