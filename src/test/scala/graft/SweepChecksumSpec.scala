package graft

import org.apache.spark.sql.functions._

/** Invariants for the checksum and interval-sweep shapes that the q198/
  * q201 oracles exercise only on conflict-free data: checksum
  * partitioning/order independence, and the sweep's half-open tie rule on
  * a fixture with exact boundary collisions.
  */
class SweepChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def checksum(df: org.apache.spark.sql.DataFrame): Long =
    df.select(conv(substring(md5(concat_ws("|", lit("ck"), col("k"),
        col("v")).cast("binary")), 1, 12), 16, 10).cast("long").as("rh"))
      .agg(sum(col("rh"))).as[Long].collect().head

  test("row checksum is independent of partitioning and row order") {
    val rows = (1L to 300L).map(i => (i, s"v$i"))
    val a = checksum(rows.toDF("k", "v").repartition(13))
    val b = checksum(rows.reverse.toDF("k", "v").coalesce(1))
    assert(a === b)
    // any single-row change must move the fingerprint
    val c = checksum((rows.dropRight(1) :+ (300L, "vX")).toDF("k", "v"))
    assert(c !== a)
  }

  test("interval sweep: ends release before starts acquire at the same instant") {
    // [0, 10) and [10, 20) must NEVER overlap (half-open): peak stays 1;
    // [0, 10) and [5, 15) genuinely overlap: peak 2
    val iv = Seq((0L, 10L), (10L, 20L), (30L, 40L), (35L, 45L))
    val bounds = iv.flatMap { case (a, b) => Seq((a, 1L), (b, -1L)) }
      .toDF("t", "delta")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t"), col("delta"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val levels = bounds.withColumn("level", sum(col("delta")).over(w))
      .select("t", "level").as[(Long, Long)].collect().toMap
    assert(levels.values.max === 2) // only the genuine overlap reaches 2
    assert(levels(10L) <= 1) // the touching boundary never double-counts
  }
}
