package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row attach the most recent right row (per key)
  * whose time <= the left row's time.
  *
  * Implemented as ONE union + window pass instead of the naive
  * join-filter-rank formulation: the naive version materializes every
  * (left, right-history) pair before ranking — quadratic blowup per key at
  * scale — while this shape shuffles each input exactly once on the key and
  * streams a sorted merge per partition. Skewed keys can additionally be
  * salted upstream; AQE handles moderate skew.
  *
  * Semantics mirror DuckDB's `ASOF JOIN` with `left.t >= right.t`
  * (inclusive): on a time tie the right row is visible to the left row.
  * The reference has no as-of operator; this is part of the carrier surface
  * (SURVEY.md §2.4 J4) for the `events` table.
  *
  * Contract: `left` and `right` share the key column name `keyCol` and time
  * column name `timeCol`; all other right columns are carried as the as-of
  * payload (null when no right row precedes the left row — filter
  * `isNotNull` for inner semantics) and their names must be disjoint from
  * the left's payload columns. Right (key, time, payload) should be unique
  * per (key, time) — pre-aggregate otherwise.
  *
  * The right payload travels as ONE struct through the window (a single
  * `last(struct, ignoreNulls)`), so a right row whose payload field is
  * genuinely NULL keeps that NULL — per-column `last` would silently backfill
  * it from an older right row.
  */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String): DataFrame = {
    val lv = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val rv = right.columns.filterNot(c => c == keyCol || c == timeCol)
    val overlap = lv.toSet.intersect(rv.toSet)
    require(overlap.isEmpty,
      s"as-of payload column names must be disjoint, both sides have: ${overlap.mkString(", ")}")
    if (rv.isEmpty) return left

    val rPacked = right.select(col(keyCol), col(timeCol).as("__ts"),
      struct(rv.map(col): _*).as("__r"))
    val rType = rPacked.schema("__r").dataType

    val lSel = left.select(
      col(keyCol) +: col(timeCol).as("__ts") +: lit(1).as("__side") +:
        (lv.map(col) :+ lit(null).cast(rType).as("__r")): _*)
    val rSel = rPacked.select(
      col(keyCol) +: col("__ts") +: lit(0).as("__side") +:
        (lv.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__r")): _*)

    // __side orders right(0) before left(1) at equal time => inclusive (>=).
    val w = Window.partitionBy(keyCol).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSel.unionByName(rSel)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        col(keyCol) +: col("__ts").as(timeCol) +:
          (lv.map(col) ++ rv.map(c => col("__r").getField(c).as(c))): _*)
  }
}
