package graft

import graft.operators.{Forecast, Graph}

/** Pins HITS (q244), neighbor-Jaccard link prediction (q250) and the
  * Holt forecast (q248) against exact driver mirrors — same integer
  * recurrences replayed in plain Scala — plus partitioning invariance
  * and the documented edge drops.
  */
class HitsForecastSpec extends SparkSpec {
  import spark.implicits._

  test("hits: exact integer mirror on a small bipartite graph") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (3L, 12L))
    val got = Graph.hits(edges.toDF("s", "d").repartition(4), "s", "d",
        iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // driver mirror: identical floored-integer recurrence
    val scale = 1000000L
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> 1L).toMap
    var auth = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val aRaw = nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val sA = aRaw.values.sum
      auth = aRaw.map { case (n, a) => n -> (a * scale) / sA }
      val hRaw = nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val sH = hRaw.values.sum
      hub = hRaw.map { case (n, h) => n -> (h * scale) / sH }
    }
    nodes.foreach { n =>
      assert(got(n) == ((hub(n), auth(n))),
        s"node $n: got ${got(n)}, mirror (${hub(n)}, ${auth(n)})")
    }
    // hubs carry no authority and vice versa on a bipartite graph
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 == 0L))
    assert(Seq(10L, 11L, 12L).forall(got(_)._1 == 0L))
  }

  test("nodeJaccard: brute-force mirror and the maxDeg hub cut") {
    // u1 -> {a,b}, u2 -> {a,b}, u3 -> {b,c}, hub u4 -> {a,b,c,d}
    val edges = Seq((1L, 100L), (1L, 101L), (2L, 100L), (2L, 101L),
      (3L, 101L), (3L, 102L), (4L, 100L), (4L, 101L), (4L, 102L),
      (4L, 103L))
    val got = Graph.nodeJaccard(edges.toDF("u", "v").repartition(3),
        "u", "v", maxDeg = 3L, minCo = 1L, k = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // u4 dropped: neighbors N(100)={1,2}, N(101)={1,2,3}, N(102)={3}
    // co(100,101)=2 jac=2e6/(2+3-2)=666666; co(101,102)=1 jac=1e6/3
    assert(got == Set(
      (100L, 101L, 2L, 2L, 3L, 666666L),
      (101L, 100L, 2L, 3L, 2L, 666666L),
      (101L, 102L, 1L, 3L, 1L, 333333L),
      (102L, 101L, 1L, 1L, 3L, 333333L)), s"got $got")
  }

  test("holtLinear: driver mirror incl. negative trend; short keys drop") {
    // descending series => the trend is negative from the init on,
    // exercising the sign-split division on both level and trend
    val ys = Seq(100L, 90L, 80L, 70L, 55L, 45L, 30L)
    val daily = ys.zipWithIndex.map { case (y, i) =>
      ("k", java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, i + 1)), y)
    } :+ (("solo", java.sql.Date.valueOf("2026-01-01"), 5L))
    val got = Forecast.holtLinear(
        daily.toDF("k", "day", "v").repartition(4),
        "k", "day", "v", horizon = 2)
      .as[(String, Long, java.sql.Date, Long, Long, Long, java.sql.Date, Long)]
      .collect()

    assert(!got.exists(_._1 == "solo"), "single-observation key must drop")
    // mirror: micro-units, alpha=2/10, beta=1/10, idiv = sign*(abs div d)
    def idiv(x: Long, d: Long): Long =
      if (x < 0) -((-x) / d) else x / d
    val m = ys.map(_ * 1000000L)
    var l = m(1); var b = m(1) - m(0)
    m.drop(2).foreach { y =>
      val l2 = idiv(2 * y + 8 * (l + b), 10)
      b = idiv(1 * (l2 - l) + 9 * b, 10)
      l = l2
    }
    assert(b < 0, s"fixture must reach a negative trend, got $b")
    val k = got.filter(_._1 == "k").sortBy(_._6)
    assert(k.length == 2 && k.forall(r => r._4 == l && r._5 == b),
      s"level/trend mirror diverged: ${k.toSeq} vs ($l, $b)")
    assert(k(0)._8 == l + b && k(1)._8 == l + 2 * b,
      s"forecasts must be l + h*b: ${k.toSeq}")
    assert(k(1)._7.toLocalDate == java.time.LocalDate.of(2026, 1, 9),
      s"forecast_day must extend the last day: ${k(1)._7}")
  }
}
