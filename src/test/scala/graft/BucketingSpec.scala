package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Scale-path evidence: bucketed tables co-locate equi-joins (no exchange
  * in the plan), and salted joins/aggs reproduce unsalted results exactly.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh_").toString
    val o = Tables(spark, sfDir, "orders")
    val l = Tables(spark, sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n${plan.take(2000)}")
      assert(joined.count() == l.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("date-partitioned writes prune partitions at scan time") {
    val out = Files.createTempDirectory("graft_part_").toString
    val ev = Tables(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    val read = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"),
      s"day filter must prune partitions:\n${plan.take(1500)}")
    val expected = ev.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(read.count() == expected)
    assert(expected > 0)
  }

  test("salted join equals plain join; salted agg equals plain agg") {
    val l = Tables(spark, sfDir, "lineitem")
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = l.join(o, Seq("l_orderkey")).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Skew.saltedJoin(l, o, "l_orderkey", factor = 4)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("q"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted == plain)

    val plainAgg = l.groupBy("l_returnflag").agg(sum(col("l_quantity")).as("s"))
      .select(col("l_returnflag"), round(col("s"), 2).as("s"))
      .as[(String, Double)].collect().toSet
    val saltedAgg = Skew.saltedAgg(l, "l_returnflag", 8,
        partials = Seq("ps" -> sum(col("l_quantity"))),
        finals = Seq(round(sum(col("ps")), 2).as("s")))
      .select(col("l_returnflag"), col("s"))
      .as[(String, Double)].collect().toSet
    assert(saltedAgg == plainAgg)
  }

  test("unioned HLL sketch partials estimate within 2% of the exact distinct") {
    val l = Tables(spark, sfDir, "lineitem")
    val fine = l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val est = fine.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
      .as[(String, Long)].collect().toMap
    val exact = l.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (flag, n) =>
      val e = est(flag)
      assert(math.abs(e - n).toDouble / n < 0.02,
        s"$flag: estimate $e vs exact $n exceeds 2% relative error")
    }
  }

  test("approx_percentile honors its rank-error accuracy bound (mergeable sketch)") {
    // approx_percentile(c, q, accuracy) guarantees rank error <= 1/accuracy
    // (Greenwald-Khanna style summary — the mergeable-sketch pattern that
    // replaces a full sort at 100 TB). Verify the bound against the exact
    // percentile by RANK, not value: the estimate's rank position among the
    // sorted values must be within n/accuracy of the target rank.
    val l = Tables(spark, sfDir, "lineitem").select(col("l_extendedprice").cast("double").as("v"))
    val n = l.count()
    val acc = 100
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val est = l.agg(expr(s"approx_percentile(v, $q, $acc)")).head().getDouble(0)
      val rankOfEst = l.filter(col("v") <= est).count()
      val targetRank = q * n
      val tol = n.toDouble / acc + 1
      assert(math.abs(rankOfEst - targetRank) <= tol,
        s"q=$q: est $est has rank $rankOfEst, target $targetRank, tol $tol")
    }
  }

  test("salted join rejects join types where unmatched right replicas leak") {
    val l = Seq((1L, "a")).toDF("k", "lv")
    val r = Seq((1L, "b"), (2L, "unmatched")).toDF("k", "rv")
    for (bad <- Seq("right", "right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException](Skew.saltedJoin(l, r, "k", 4, bad))
      assert(e.getMessage.contains("only sound"))
    }
    // left_outer remains allowed and exact
    assert(Skew.saltedJoin(l, r, "k", 4, "left").count() == 1)
  }
}
