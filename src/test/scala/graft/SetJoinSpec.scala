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

  test("bipartiteContainment equals brute force across thresholds") {
    val rnd = new scala.util.Random(13)
    def corpus(n: Int, maxLen: Int) = (0 until n).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(maxLen))("t" + rnd.nextInt(30)))
    }
    val ls = corpus(60, 8)
    val rs = corpus(40, 12)
    val (ldf, rdf) = (ls.toDF("id", "toks"), rs.toDF("id", "toks"))
    val (lSets, rSets) =
      (ls.map { case (i, t) => (i, t.toSet) }, rs.map { case (i, t) => (i, t.toSet) })
    for ((tn, td) <- Seq((1, 2), (1, 4), (3, 4), (9, 10), (1, 1))) {
      val got = SetJoin.bipartiteContainment(ldf, "id", rdf, "id", "toks", tn, td)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = (for {
        (a, sa) <- lSets
        (b, sb) <- rSets
        isect = (sa & sb).size
        if isect * td >= sa.size * tn
      } yield (a, b, isect.toLong, sa.size.toLong)).toSet
      assert(got == want,
        s"t=$tn/$td: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("containment catches the subset-of-large-reference pair Jaccard misses") {
    // a 4-shingle doc fully inside a 40-shingle reference: containment 1.0
    // but Jaccard 0.1 — the decontamination case the asymmetric mode exists
    // for
    val small = Seq((1L, (0 until 4).map("t" + _))).toDF("id", "toks")
    val big = Seq((9L, (0 until 40).map("t" + _))).toDF("id", "toks")
    val jac = SetJoin.bipartite(small, "id", big, "id", "toks", 1, 2)
    assert(jac.isEmpty, "Jaccard 1/2 must NOT match a 0.1-J pair")
    val con = SetJoin.bipartiteContainment(small, "id", big, "id", "toks", 1, 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(con == Seq((1L, 9L, 4L, 4L)),
      s"containment 1/1 must match the fully-contained pair, got $con")
  }
}
