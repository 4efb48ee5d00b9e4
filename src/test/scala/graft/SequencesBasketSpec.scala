package graft

import graft.operators.{Basket, Sequences}

/** Pins the sequence-mining pair (transitions q246, trigrams q249) and
  * the market-basket rules (q245): hand mirrors, tie-break determinism,
  * overlap counting, the maxBasketSize stop-cut, and partitioning
  * invariance.
  */
class SequencesBasketSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.toDF("u", "ts", "eid", "st").repartition(5)

  test("transitions: counts, ppm, rank and the (ts, tie) order contract") {
    // user 1: a->b->a->c  user 2: b->a->b ; user 3 single event (no pair)
    val df = ev(Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, "c"),
      (2L, 10L, 5L, "b"), (2L, 20L, 6L, "a"), (2L, 30L, 7L, "b"),
      (3L, 99L, 8L, "c")))
    val got = Sequences.transitions(df, "u", "ts", "eid", "st")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // from a: a->b (1), a->c (1), a->b from u2 (1) => a->b 2, a->c 1, row 3
    assert(got == Set(
      ("a", "b", 2L, 3L, 666666L, 1L),
      ("a", "c", 1L, 3L, 333333L, 2L),
      ("b", "a", 2L, 2L, 1000000L, 1L)), s"got $got")

    // a timestamp TIE resolved by the tie column: same counts must come
    // out whichever physical order the rows arrive in
    val tied = ev(Seq((1L, 10L, 2L, "x"), (1L, 10L, 1L, "y")))
    val t = Sequences.transitions(tied, "u", "ts", "eid", "st")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(t == Set(("y", "x", 1L, 1L, 1000000L, 1L)),
      s"tie must order by eid: $t")
  }

  test("frequentNgrams: overlapping occurrences each count; short keys drop") {
    // user 1: a a a a  -> trigram a>a>a occurs twice (overlap)
    val df = ev(Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "a"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "a"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "a"))) // only 2 events: no trigram
    val got = Sequences.frequentNgrams(df, "u", "ts", "eid", "st",
        n = 3, minSupport = 1L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>a>a" -> 2L), s"got $got")
    intercept[IllegalArgumentException] {
      Sequences.frequentNgrams(df, "u", "ts", "eid", "st", 1, 1L)
    }
  }

  test("basket rules: hand mirror and the maxBasketSize stop-cut") {
    // baskets: {1,2} {1,2} {1,3} {2,3} and one oversized {1..5}
    val items = Seq(
      (10L, 1L), (10L, 2L),
      (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L),
      (13L, 2L), (13L, 3L),
      (14L, 1L), (14L, 2L), (14L, 3L), (14L, 4L), (14L, 5L))
      .toDF("b", "i").repartition(4)
    val got = Basket.rules(items, "b", "i", minSupport = 2L,
        maxBasketSize = 4L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // after dropping basket 14: N=4, sup(1)=3 sup(2)=3 sup(3)=2; only
    // pair (1,2) has sup 2
    assert(got == Set(
      (1L, 2L, 2L, 3L, 3L, 666666L, 888888L),
      (2L, 1L, 2L, 3L, 3L, 666666L, 888888L)), s"got $got")

    // raising the cap admits basket 14: N=5 and pair (1,2) gains a basket
    val loose = Basket.rules(items, "b", "i", 2L, 16L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(loose((1L, 2L)) == 3L, s"got $loose")
  }
}
