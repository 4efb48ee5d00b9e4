package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: Morton-code correctness and the property the layout
  * exists for — per-file min-max envelopes stay tight in BOTH dimensions,
  * which is what lets a 2-D predicate prune files at scale.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonCode interleaves bits (known values + inverse round-trip)") {
    val cases = Seq((0, 0, 0L), (1, 0, 1L), (0, 1, 2L), (1, 1, 3L), (2, 3, 14L), (5, 6, 57L))
    val got = cases.map { case (x, y, _) => (x, y) }.toDF("x", "y")
      .select(Layout.mortonCode(col("x"), col("y"), 8)).as[Long].collect()
    assert(got.toSeq == cases.map(_._3), s"got ${got.toSeq}")
    // bijectivity on the 32x32 grid: 1024 distinct codes in [0, 1024)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    val codes = grid.select(Layout.mortonCode(col("x"), col("y"), 5)).as[Long].collect()
    assert(codes.distinct.length == 1024 && codes.min == 0 && codes.max == 1023)
  }

  test("writeZOrdered keeps per-file envelopes tight in both dimensions") {
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x, y)).toDF("x", "y")
      .repartition(8) // shuffle away any accidental input ordering
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    Layout.writeZOrdered(grid, s"$dir/z", "x", "y", bits = 6, numFiles = 16)

    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected >=8 part files, got ${files.length}")
    assert(spark.read.parquet(s"$dir/z").count() == n.toLong * n)

    val spans = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getInt(1) - r.getInt(0), r.getInt(3) - r.getInt(2))
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    // A single-column sort would leave the OTHER dimension's span ~= n-1 per
    // file; the Z-curve keeps both well under half the global span.
    assert(avgX < n / 2.0, s"avg x-span $avgX not tight (global ${n - 1})")
    assert(avgY < n / 2.0, s"avg y-span $avgY not tight (global ${n - 1})")
  }

  test("shuffledOrder: exact permutation matching the driver mirror, seed-sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0L until 300L)
    val df = ids.toDF("id").repartition(16)
    val got = graft.operators.Layout.shuffledOrder(df, "id", seed = 7L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    // driver mirror: same md5 key, same (key, id) order
    def key(i: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$i".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val want = ids.sortBy(i => (key(i), i)).zipWithIndex
      .map { case (i, p) => i -> p.toLong }.toMap
    assert(got == want, "distributed rank must equal the driver mirror")
    assert(got.values.toSeq.sorted == (0L until 300L), "pos must be a permutation")
    val other = graft.operators.Layout.shuffledOrder(df, "id", seed = 8L)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(other != got, "a different seed must produce a different permutation")
  }
}
