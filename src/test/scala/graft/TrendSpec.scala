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

  test("theilSen: immune to the outlier that wrecks OLS; exact driver mirror") {
    // clean slope-5 line with one wild outlier day
    val pts = (1 to 30).map(i =>
      ("g", i.toLong, if (i == 16) 1000000L else 5L * i + 3L))
    val df = pts.toDF("g", "x", "y").repartition(4)
    val ts = Trend.theilSen(df, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(ts.length == 1)
    val (_, nPairs, num, den, slope6) = ts.head
    assert(nPairs == 30L * 29L / 2L)
    assert(slope6 == 5.0, s"median slope must ignore the outlier: $slope6")

    // the OLS slope on the same data is far from 5
    val ols = Trend.groupTrend(df, Seq("g"), "x", "y")
      .select($"slope6").as[Option[Double]].head()
    assert(ols.exists(s => math.abs(s - 5.0) > 10.0),
      s"fixture must actually wreck OLS, got $ols")

    // exact mirror of the documented order + ceil-rank rule
    val pairs = for {
      i <- pts.indices; j <- pts.indices if pts(i)._2 < pts(j)._2
    } yield (pts(j)._3 - pts(i)._3, pts(j)._2 - pts(i)._2)
    def sk(p: (Long, Long)): Long =
      math.signum(p._1) * (math.abs(p._1) * 1000000L / p._2)
    val ordered = pairs.sortBy(p => (sk(p), p._1, p._2))
    val med = ordered((pairs.size + 1) / 2 - 1)
    assert((num, den) == med, s"median pair mirror: ($num,$den) vs $med")
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
