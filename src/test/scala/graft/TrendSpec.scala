package graft

import graft.operators.Trend

/** Pins groupCorr's exact components against a driver mirror and the
  * perfect/constant edge cases (oracle coverage: q240, q172/q213 for the
  * slope sibling).
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("groupCorr: perfect line r2=1, constant column null, mirror on random data") {
    val rnd = new scala.util.Random(41)
    val noisy = (1 to 200).map(i =>
      ("n", i.toLong, 3L * i + rnd.nextInt(50).toLong))
    val line = (1 to 50).map(i => ("l", i.toLong, 7L * i + 2L))
    val const = (1 to 20).map(i => ("c", i.toLong, 5L))
    val got = Trend.groupCorr(
        (noisy ++ line ++ const).toDF("g", "x", "y").repartition(6),
        Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5, r._6))).toMap

    // driver mirror for the noisy group
    val xs = noisy.map(_._2); val ys = noisy.map(_._3)
    val n = xs.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
    val (cov, vx, vy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    assert(got("n")._1 == cov && got("n")._2 == vx && got("n")._3 == vy,
      s"mirror diverged: ${got("n")} vs ($cov, $vx, $vy)")

    assert(got("l")._4.contains(1.0), s"perfect line must have r2=1: ${got("l")}")
    assert(got("c")._3 == 0L && got("c")._4.isEmpty,
      s"constant y must emit vary=0 and null r2: ${got("c")}")
  }

  test("corrMatrix: every pair row equals the per-pair groupCorr (one scan vs p scans)") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map { i =>
      val g = if (i % 2 == 0) "a" else "b"
      (g, i.toLong, 2L * i + rnd.nextInt(40), rnd.nextInt(100).toLong)
    }.toDF("g", "x", "y", "z").repartition(5)
    val cols = Seq("x", "y", "z")
    val matrix = Trend.corrMatrix(df, Seq("g"), cols)
      .as[(String, String, String, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => (r._1, r._2, r._3) -> ((r._4, r._5, r._6, r._7, r._8)))
      .toMap
    assert(matrix.size == 2 * 3, s"2 groups x 3 pairs expected: ${matrix.keys}")
    for (i <- cols.indices; j <- (i + 1) until cols.size) {
      val single = Trend.groupCorr(df, Seq("g"), cols(i), cols(j))
        .as[(String, Long, Long, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      for (g <- Seq("a", "b"))
        assert(matrix((g, cols(i), cols(j))) == single(g),
          s"pair (${cols(i)},${cols(j)}) group $g diverged")
    }
  }
}
