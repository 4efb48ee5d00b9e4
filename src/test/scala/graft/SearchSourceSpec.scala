package graft

import org.apache.spark.sql.functions._

import graft.streaming.StatefulSessions

class SearchSourceSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 search source: per-category partitions, quota, deterministic rows") {
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB").option("maxResults", "20").load()
    assert(df.count() == 20) // 2 categories x quota 10
    assert(df.select("category").distinct().as[String].collect().toSet == Set("cs.AI", "cs.DB"))
    assert(df.rdd.getNumPartitions == 2, "one input partition per category")
    val again = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB").option("maxResults", "20").load()
    assert(df.collect().toSeq == again.collect().toSeq, "source must be deterministic")
  }

  test("DSv2 limit pushdown reaches the scan; column pruning reaches readSchema") {
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB,cs.LG,cs.CV").option("maxResults", "1000")
      .load()
      .select("arxiv_id", "category")
      .limit(8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=8"), s"limit must push into the source:\n$plan")
    assert(plan.contains("prunedColumns=arxiv_id,category"),
      s"column pruning must reach the source:\n$plan")
    assert(df.count() == 8)
  }

  test("pushed limit is honored exactly for non-divisible and tiny limits") {
    def rows(limit: Int): Long =
      spark.read.format("graft.sources.SearchSource")
        .option("categories", "cs.AI,cs.DB,cs.LG,cs.CV").option("maxResults", "1000")
        .load().limit(limit).count()
    assert(rows(10) == 10, "remainder must be distributed, not floored")
    assert(rows(2) == 2, "limit below #categories must not over-produce")
    assert(rows(8) == 8)
  }

  test("flatMapGroupsWithState sessionization equals gaps-and-islands batch") {
    val ev = Tables(spark, sfDir, "events")
    val stateful = StatefulSessions.sessionize(ev, 30)
      .select("user_id", "n", "first_ev", "last_ev")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch gaps-and-islands reference (same as q23)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    val batch = ev
      .withColumn("new_s", when(gapUs.isNull || gapUs > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_ev"),
        max(col("event_id")).as("last_ev"))
      .select("user_id", "n", "first_ev", "last_ev")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(stateful == batch)
  }
}
