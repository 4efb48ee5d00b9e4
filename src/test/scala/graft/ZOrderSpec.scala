package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Pins the z-order layout contract: the bit interleave itself, and the
  * skipping property — on uniform 2-D data every top-4-bit z bucket
  * (4x4 grid cell) spans roughly a quarter of EACH dimension's range,
  * which is what makes file min/max stats selective on both filter
  * columns at once.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave places bit i of a at 2i+1 and bit i of b at 2i") {
    val df = Seq((3L, 1L), (0L, 3L), (2L, 2L)).toDF("a", "b")
    val got = df.select(ZOrder.interleave(col("a"), col("b"), 2).as("z"))
      .as[Long].collect().toSeq
    // (a=11, b=01) -> 1011 = 11; (a=00, b=11) -> 0101 = 5; (a=10, b=10) -> 1100 = 12
    assert(got == Seq(11L, 5L, 12L), s"interleave mismatch: $got")
  }

  test("uniform grid: every 4x4 bucket spans ~1/4 of each dimension, all rows covered") {
    // full 64x64 integer grid — both dims range over [0, 63]
    val grid = spark.range(0, 64 * 64).select(
      (col("id") % 64).cast("long").as("a"),
      (col("id") / 64).cast("long").as("b"))
    val stats = ZOrder.layoutStats(grid, "a", "b", bits = 8, gridBits = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 16, s"expected 16 grid buckets, got ${stats.length}")
    assert(stats.map(_._2).sum == 64L * 64L, "every row must land in a bucket")
    stats.foreach { case (bucket, _, aMin, aMax, bMin, bMax) =>
      // quarter of a 0..63 range is 16 values; +1 slack for scaling rounding
      assert(aMax - aMin <= 17, s"bucket $bucket a-span ${aMax - aMin} too wide")
      assert(bMax - bMin <= 17, s"bucket $bucket b-span ${bMax - bMin} too wide")
    }
    // contrast: a 1-D layout on `a` alone leaves b spanning the full range
    // in every a-slice — z-order is what bounds BOTH spans
  }

  test("layout range-partitions by __z without changing rows") {
    val grid = spark.range(0, 256).select(
      (col("id") % 16).cast("long").as("a"),
      (col("id") / 16).cast("long").as("b"))
    val out = ZOrder.layout(grid, "a", "b", bits = 4, partitions = 4)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.drop("__z").as[(Long, Long)].collect().toSet ==
      grid.as[(Long, Long)].collect().toSet, "layout must be row-preserving")
  }
}
