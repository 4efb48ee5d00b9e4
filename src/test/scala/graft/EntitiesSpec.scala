package graft

import graft.operators.Entities

/** Pins deletion-neighborhood fuzzy matching: all three edit kinds at
  * distance 1 are found (substitution, insertion, deletion — the latter
  * two exist only because the delete-0 variant is in the blocking set),
  * exact duplicates pair at distance 0, and distance-2 names never pair.
  */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  test("finds substitution, insertion, deletion, and exact pairs; rejects distance 2") {
    val df = Seq(
      (1L, "smith"), (2L, "smyth"), (3L, "smiths"), (4L, "smit"),
      (5L, "jones"), (6L, "smith")).toDF("id", "nm")
    val pairs = Entities.fuzzyPairs(df, "id", "nm")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 1L)), "substitution smith~smyth")
    assert(pairs.contains((1L, 3L, 1L)), "insertion smith~smiths")
    assert(pairs.contains((1L, 4L, 1L)), "deletion smith~smit")
    assert(pairs.contains((1L, 6L, 0L)), "exact duplicate pairs at distance 0")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "jones matches nothing")
    assert(!pairs.contains((3L, 4L, 2L)) && !pairs.exists(_._3 > 1),
      s"distance-2 pairs must be verified away: $pairs")
  }

  test("delete-2 neighborhoods find distance-2 pairs k=1 blocking provably misses") {
    // two substitutions at NON-ADJACENT positions (i->y at index 2 and 8):
    // no single deletion aligns the strings, so the k=1 neighborhoods
    // share no variant at all — this pair is invisible to k=1 blocking,
    // not merely rejected by its verify filter
    val df = Seq((1L, "alice smith"), (2L, "alyce smyth"), (3L, "bob"))
      .toDF("id", "nm")
    val k1 = Entities.fuzzyPairs(df, "id", "nm")
      .as[(Long, Long, Long)].collect().toSet
    assert(k1.isEmpty, s"k=1 must not even see the candidate: $k1")
    val k2 = Entities.fuzzyPairs(df, "id", "nm", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(k2 == Set((1L, 2L, 2L)), s"k=2 must verify the pair at distance 2: $k2")
  }

  test("transposition pairs verify at distance 2 under k=2") {
    // an adjacent transposition = two adjacent substitutions: k=1 blocking
    // sees the candidate (both sides' delete-1 hit the same string) but
    // its verify filter rejects dist 2; k=2 keeps it
    val df = Seq((1L, "Customer#12"), (2L, "Customer#21")).toDF("id", "nm")
    assert(Entities.fuzzyPairs(df, "id", "nm").count() == 0)
    val k2 = Entities.fuzzyPairs(df, "id", "nm", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(k2 == Set((1L, 2L, 2L)), s"transposition must pair at dist 2: $k2")
  }

  test("names longer than maxLen fail loudly instead of exploding the block index") {
    val df = Seq((1L, "x" * 70)).toDF("id", "nm")
    val e = intercept[Exception] {
      Entities.fuzzyPairs(df, "id", "nm", maxDist = 2).count()
    }
    assert(e.getMessage != null)
  }
}
