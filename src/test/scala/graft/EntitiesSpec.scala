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
}
