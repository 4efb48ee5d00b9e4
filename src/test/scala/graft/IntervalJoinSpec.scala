package graft


import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.IntervalJoin

/** IntervalJoin: the grid-fragmented equi-join equals the O(n·m) naive
  * overlap definition on generated intervals, each pair exactly once,
  * across bin widths; degenerate intervals drop; the fragment cap is loud.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(23L)
    (1 to n).map { _ =>
      val t = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
  }

  private val ivGen = for {
    key <- Gen.chooseNum(0L, 4L)
    s <- Gen.chooseNum(0L, 500L)
    len <- Gen.chooseNum(0L, 90L) // len 0 = degenerate, must match nothing
  } yield (key, s, s + len)

  test("overlap equals the naive inequality join, exactly once per pair, " +
    "for several bin widths") {
    val as = sampleN(ivGen, 120).zipWithIndex
      .map { case ((k, s, e), i) => (i.toLong, k, s, e) }
    val bs = sampleN(ivGen, 80).zipWithIndex
      .map { case ((k, s, e), i) => (1000L + i, k, s, e) }
    // the raw inequality a.s < b.e AND b.s < a.e would also "match" empty
    // [x, x) intervals; real overlap requires both sides non-degenerate
    val expected = (for {
      (ai, ak, as_, ae) <- as
      (bi, bk, bs_, be) <- bs
      if ak == bk && as_ < ae && bs_ < be && as_ < be && bs_ < ae
    } yield (ai, bi)).toSet

    for (w <- Seq(7L, 32L, 1000L)) {
      val got = IntervalJoin.overlap(
          as.toDF("aid", "k", "s", "e"), bs.toDF("bid", "k", "s", "e"),
          Seq("k"), "s", "e", binWidth = w)
        .select(col("aid"), col("bid_r"))
        .as[(Long, Long)].collect()
      assert(got.length === got.toSet.size,
        s"width $w: pairs must be emitted exactly once")
      assert(got.toSet === expected, s"width $w: wrong pair set")
    }
    assert(expected.nonEmpty)
  }

  test("coverage equals the brute-force union length per key, touching " +
    "intervals merge, degenerate intervals drop") {
    val ivs = sampleN(ivGen, 200).zipWithIndex
      .map { case ((k, s, e), i) => (i.toLong, k, s, e) }
    val got = IntervalJoin.coverage(ivs.toDF("id", "k", "s", "e"),
        Seq("k"), "s", "e")
      .select(col("k"), col("covered"), col("n_intervals"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val expected = ivs.filter(iv => iv._3 < iv._4).groupBy(_._2).map {
      case (k, xs) =>
        val covered = xs.flatMap(iv => iv._3 until iv._4).distinct.size.toLong
        k -> (covered, xs.size.toLong)
    }
    assert(got === expected)
    // touching [0,3) + [3,5) merge to 5 with no gap double-count
    val touch = Seq((1L, 9L, 0L, 3L), (2L, 9L, 3L, 5L), (3L, 9L, 1L, 2L))
      .toDF("id", "k", "s", "e")
    val t9 = IntervalJoin.coverage(touch, Seq("k"), "s", "e")
      .select(col("covered"), col("n_intervals"))
      .as[(Long, Long)].collect().head
    assert(t9 === ((5L, 3L)))
  }

  test("fragment cap raises loudly instead of exploding") {
    val a = Seq((1L, 0L, 0L, 1000000L)).toDF("aid", "k", "s", "e")
    val b = Seq((2L, 0L, 0L, 10L)).toDF("bid", "k", "s", "e")
    val e = intercept[Exception] {
      IntervalJoin.overlap(a, b, Seq("k"), "s", "e", binWidth = 10L,
        maxBinsPerInterval = 64).count()
    }
    assert(e.getMessage.contains("IntervalJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("IntervalJoin")))
  }
}
