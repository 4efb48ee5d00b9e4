package graft

import graft.operators.SpatialJoin

/** Pins the grid radius join against the brute-force O(n·m) definition:
  * exactly-once pair emission, inclusive boundary, floor-division cells
  * on negative coordinates.
  */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)],
                    rad: Long): Set[(Long, Long, Long)] =
    (for {
      (li, lx, ly) <- l
      (ri, rx, ry) <- r
      if math.abs(lx - rx) <= rad && math.abs(ly - ry) <= rad
    } yield (li, ri, math.max(math.abs(lx - rx), math.abs(ly - ry)))).toSet

  test("matches brute force on random points, negative coordinates included") {
    val rnd = new scala.util.Random(23)
    def pts(n: Int, base: Long) = (1 to n).map(i =>
      (base + i, rnd.nextLong(4000) - 2000L, rnd.nextLong(4000) - 2000L))
    val l = pts(120, 1000)
    val r = pts(40, 9000)
    val got = SpatialJoin.radiusJoin(
        l.toDF("id", "x", "y").repartition(7), "id", "x", "y",
        r.toDF("rid", "x", "y").repartition(3), "rid", "x", "y", 300L)
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    assert(got.toSet == brute(l, r, 300L),
      s"grid join diverged from brute force (${got.length} vs ${brute(l, r, 300L).size})")
  }

  test("boundary is inclusive and cells floor across zero") {
    // dist exactly == radius must be kept; the pair straddles x=0 so a
    // truncating cell split (both landing in cell 0) would be wrong for
    // points further apart than one cell — exercise a straddle at range.
    val l = Seq((1L, -5L, 0L), (2L, -300L, 0L)).toDF("id", "x", "y")
    val r = Seq((7L, 295L, 0L)).toDF("rid", "x", "y")
    val got = SpatialJoin.radiusJoin(l, "id", "x", "y", r, "rid", "x", "y", 300L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 7L, 300L)), s"boundary/straddle wrong: $got")
    intercept[IllegalArgumentException] {
      SpatialJoin.radiusJoin(l, "id", "x", "y", r, "rid", "x", "y", 0L)
    }
  }
}
