package graft

import graft.operators.{Attribution, Survival}

/** Pins Markov removal-effect attribution (q251) and the Kaplan-Meier
  * estimator (q252) against exact hand calculations on planted
  * journeys/cohorts, the first-conversion journey cut, and group
  * isolation.
  */
class AttributionSurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("markovRemoval: hand fixture — probabilities, removals, shares") {
    // A: x -> purchase ; B: x -> y -> (no conversion) ; C: y -> purchase
    // matrix: START {x:2, y:1}/3, x {CONV:1, y:1}/2, y {NULL:1, CONV:1}/2
    // fixpoint: p_y=500000, p_x=750000, p_START=666666
    // remove x: START=(0+500000)/3=166666 -> removal 500000
    // remove y: p_x=500000, START=(2*500000)/3=333333 -> removal 333333
    val ev = Seq(
      (1L, 10L, 1L, "x"), (1L, 20L, 2L, "purchase"),
      (2L, 10L, 3L, "x"), (2L, 20L, 4L, "y"),
      (3L, 10L, 5L, "y"), (3L, 20L, 6L, "purchase"))
      .toDF("u", "ts", "eid", "st").repartition(3)
    val got = Attribution.markovRemoval(ev, "u", "ts", "eid", "st",
        "purchase", iters = 30)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("x", 666666L, 166666L, 500000L, 600000L),
      ("y", 666666L, 333333L, 333333L, 399999L)), s"got $got")
  }

  test("markovRemoval: journey ends at FIRST conversion; no channels -> empty") {
    // the only user converts on their first event; the post-conversion
    // touch must be ignored, leaving no removable channel
    val ev = Seq((1L, 10L, 1L, "purchase"), (1L, 20L, 2L, "x"))
      .toDF("u", "ts", "eid", "st")
    val got = Attribution.markovRemoval(ev, "u", "ts", "eid", "st",
      "purchase", iters = 5)
    assert(got.count() == 0L, "post-conversion touches must not create channels")
  }

  test("kaplanMeier: hand fixture — risk sets, floored ppm product, groups") {
    // g: events at 1,1, censor at 1, event at 2, censor at 3
    //   t=1: d=2 c=1 n=5 -> S=600000; t=2: d=1 n=2 -> S=300000
    //   t=3: censor only -> S stays 300000
    // h: single subject, event at 0 -> S=0
    val spans = Seq(
      ("g", 1L, 1L), ("g", 1L, 1L), ("g", 1L, 0L), ("g", 2L, 1L),
      ("g", 3L, 0L),
      ("h", 0L, 1L))
      .toDF("grp", "dur", "ev").repartition(4)
    val got = Survival.kaplanMeier(spans, "grp", "dur", "ev")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("g", 1L, 5L, 2L, 1L, 600000L),
      ("g", 2L, 2L, 1L, 0L, 300000L),
      ("g", 3L, 1L, 0L, 1L, 300000L),
      ("h", 0L, 1L, 1L, 0L, 0L)), s"got $got")
  }
}
