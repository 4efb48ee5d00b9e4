package graft

import graft.operators.LogTemplates

/** Pins the Drain-lite template miner: (len, first-token) grouping, the
  * integer permille stability rule at its exact boundary, and per-line
  * rendering.
  */
class LogTemplatesSpec extends SparkSpec {
  import spark.implicits._

  private def mine(lines: Seq[(Long, String)], permille: Long): Map[String, (Long, Long)] =
    LogTemplates.mine(lines.toDF("id", "line").repartition(4), "id", "line", permille)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("stable slots keep literals, volatile slots wildcard, grouped by first token") {
    val lines = Seq(
      1L -> "login user 1 ok", 2L -> "login user 2 ok", 3L -> "login user 3 ok",
      4L -> "logout user 9 ok")
    val got = mine(lines, 600L)
    // 'login' group (3 lines): user-id slot is 1/3 < 600 permille -> <*>;
    // 'logout' group (1 line): every slot trivially stable.
    assert(got == Map(
      "login user <*> ok" -> (3L, 1L),
      "logout user 9 ok" -> (1L, 4L)), s"wrong templates: $got")
  }

  test("the permille threshold is inclusive (>=) and applies per line's own token") {
    val lines = Seq(
      1L -> "x aa y", 2L -> "x aa y", 3L -> "x aa y",
      4L -> "x bb y", 5L -> "x cc y")
    val got = mine(lines, 600L)
    // aa: 3*1000 >= 600*5 exactly -> stable; bb/cc volatile on THEIR lines.
    assert(got == Map("x aa y" -> (3L, 1L), "x <*> y" -> (2L, 4L)),
      s"threshold boundary broken: $got")
    // one notch tighter and aa flips volatile too
    val tight = mine(lines, 601L)
    assert(tight == Map("x <*> y" -> (5L, 1L)), s"tighter threshold: $tight")
  }

  test("different token counts never merge, even with the same first token") {
    val lines = Seq(1L -> "a b", 2L -> "a b", 3L -> "a b c", 4L -> "a b c")
    val got = mine(lines, 600L)
    assert(got == Map("a b" -> (2L, 1L), "a b c" -> (2L, 3L)),
      s"length groups merged: $got")
  }

  test("an out-of-range permille fails loudly") {
    val df = Seq(1L -> "a").toDF("id", "line")
    intercept[IllegalArgumentException] {
      LogTemplates.mine(df, "id", "line", 0L)
    }
    intercept[IllegalArgumentException] {
      LogTemplates.mine(df, "id", "line", 1001L)
    }
  }
}
