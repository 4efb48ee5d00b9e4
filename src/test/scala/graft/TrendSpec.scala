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
}
