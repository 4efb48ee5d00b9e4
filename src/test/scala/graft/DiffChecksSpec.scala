package graft

import graft.operators.{Checks, Diff}

/** Null-transition edges of tableDiff (the q175 fixture has no NULLs) and
  * the counting contracts of the check suite.
  */
class DiffChecksSpec extends SparkSpec {
  import spark.implicits._

  test("tableDiff: null transitions count as changes, unchanged rows are dropped") {
    val a = Seq((1L, Option(10L), "x"), (2L, Option(20L), "y"),
      (3L, None: Option[Long], "z"), (4L, Option(40L), "w"))
      .toDF("k", "v", "s")
    val b = Seq((1L, Option(10L), "x"), // unchanged
      (2L, None: Option[Long], "y"), // value -> NULL
      (3L, Option(30L), "z"), // NULL -> value
      (5L, Option(50L), "n")) // added; 4 removed
      .toDF("k", "v", "s")
    val got = Diff.tableDiff(a, b, Seq("k"), Seq("v", "s"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got === Array(
      (2L, "changed", "v"), (3L, "changed", "v"),
      (4L, "removed", ""), (5L, "added", "")))
  }

  test("checks: dup counting, k-anonymity row counting, orphan counting") {
    val dups = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val u = Checks.unique(dups, Seq("k"), "u").as[(String, Long, Boolean)]
      .collect().head
    assert(u === ("u", 3L, false)) // (3-1) + (2-1) = 3 extra rows

    val quasi = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2))
      .toDF("g", "i")
    val ka = Checks.kAnonymity(quasi, Seq("g"), 3, "ka")
      .as[(String, Long, Boolean)].collect().head
    assert(ka === ("ka", 2L, false)) // group b has 2 rows < k=3

    val child = Seq(10L, 11L, 99L).toDF("fk")
    val parent = Seq(10L, 11L, 12L).toDF("pk")
    val ri = Checks.refIntegrity(child, "fk", parent, "pk", "ri")
      .as[(String, Long, Boolean)].collect().head
    assert(ri === ("ri", 1L, false))

    // null FKs are NOT orphans (SQL NOT IN semantics — null detection is
    // notNull's job): only the one non-null dangling key counts
    val childN = Seq(Option(10L), None, None, Option(99L)).toDF("fk")
    val riN = Checks.refIntegrity(childN, "fk", parent, "pk", "ri_null")
      .as[(String, Long, Boolean)].collect().head
    assert(riN === ("ri_null", 1L, false))
  }

  test("lDiversity: distinct-sensitive counting, inclusive threshold, loud l") {
    // group a: 3 rows, sensitive {x, y} -> 2 distinct; group b: 2 rows,
    // both 'z' -> 1 distinct (k-anonymity-safe sizes can still leak).
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"), ("b", "z"))
      .toDF("g", "s")
    val got = Checks.lDiversity(rows, Seq("g"), "s", l = 2L)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map("a" -> ((3L, 2L, true)), "b" -> ((2L, 1L, false))),
      s"l-diversity report wrong: $got")
    intercept[IllegalArgumentException] {
      Checks.lDiversity(rows, Seq("g"), "s", l = 0L)
    }
  }
}
