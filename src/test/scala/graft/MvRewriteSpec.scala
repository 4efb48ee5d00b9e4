package graft

import org.apache.spark.sql.functions._

import graft.operators.{AggStore, ViewStore}
import graft.plans.{AggStoreRewrite, JoinViewCatalog, JoinViewRewrite, MvCatalog}

/** Pins the materialized-view rewrite: a matching single-table
  * count/sum aggregate is served from the registered AggStore (the
  * scan's input files move from the base table to the store), results
  * are bit-identical, and anything the conservative matcher does not
  * recognize — extra aggregates, filters below the aggregate, an
  * unregistered table — is left alone.
  */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev ++ Seq(AggStoreRewrite(spark), JoinViewRewrite(spark))
    try body
    finally {
      spark.experimental.extraOptimizations = prev
      MvCatalog.clear()
      JoinViewCatalog.clear()
    }
  }

  test("a matching aggregate is served from the store, bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_").toString
    Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (3L, 7L))
      .toDF("k", "v").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/store", "k", "v")
    withRule {
      MvCatalog.registerAggView(base, "k", "v", s"$dir/store")
      val q = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/store/")),
        "the rewritten plan must scan the store")
      assert(!q.inputFiles.exists(_.contains("/base/")),
        "the rewritten plan must not touch the base table")
      assert(q.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 30L), (2L, 1L, 5L), (3L, 2L, 14L)),
        "served results must equal the direct aggregation")
      // ...and the rewrite composes with operators ABOVE the aggregate
      val top = q.filter(col("total") > 10L).orderBy(col("k"))
      assert(top.inputFiles.exists(_.contains("/store/")))
      assert(top.as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 30L), (3L, 2L, 14L)))
    }
  }

  test("top-k serving: ORDER BY <agg> DESC LIMIT k over a registered " +
    "aggregate serves from the store; an unstored sort key refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvtopk_").toString
    Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (3L, 7L), (4L, 50L))
      .toDF("k", "v").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/store", "k", "v")
    withRule {
      MvCatalog.registerAggView(base, "k", "v", s"$dir/store")
      // the dashboard shape: top customers by stored sum
      val top = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
        .orderBy(col("total").desc).limit(2)
      assert(top.inputFiles.exists(_.contains("/store/")) &&
        !top.inputFiles.exists(_.contains("/base/")),
        "Sort+Limit above the aggregate must still serve from the store")
      assert(top.as[(Long, Long, Long)].collect().toSeq ==
        Seq((4L, 1L, 50L), (1L, 2L, 30L)))
      // the SQL spelling, sort key named in the select
      base.createOrReplaceTempView("mv_topk_base")
      val sql1 = spark.sql("SELECT k, sum(cast(v AS bigint)) AS total " +
        "FROM mv_topk_base GROUP BY k ORDER BY total DESC LIMIT 2")
      assert(sql1.inputFiles.exists(_.contains("/store/")),
        "the SQL top-k must serve from the store")
      assert(sql1.as[(Long, Long)].collect().toSeq ==
        Seq((4L, 50L), (1L, 30L)))
      // the SQL spelling, sort key NOT in the select (the analyzer
      // widens the aggregate and projects it away)
      val sql2 = spark.sql("SELECT k FROM mv_topk_base GROUP BY k " +
        "ORDER BY sum(cast(v AS bigint)) DESC LIMIT 2")
      assert(sql2.inputFiles.exists(_.contains("/store/")),
        "an ORDER-BY-only aggregate must still serve from the store")
      assert(sql2.as[Long].collect().toSeq == Seq(4L, 1L))
      // refusal: a sort key the store does not carry (max) recomputes
      // from the base — correct, never wrong
      val unstored = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), max(col("v")).as("m"))
        .orderBy(col("m").desc).limit(2)
      assert(!unstored.inputFiles.exists(_.contains("/store/")),
        "an unstored sort key must refuse the rewrite")
      assert(unstored.as[(Long, Long, Long)].collect().toSeq ==
        Seq((4L, 1L, 50L), (1L, 2L, 20L)))
    }
  }

  test("non-matching shapes are left alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv2_").toString
    Seq((1L, 10L), (2L, 5L)).toDF("k", "v").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/store", "k", "v")
    withRule {
      MvCatalog.registerAggView(base, "k", "v", s"$dir/store")
      // avg(v) serves as total/cnt from the store's own columns —
      // exact for integral inputs (integer partial sums are exact in
      // double)
      val avgQ = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), avg(col("v")).as("a"))
      assert(avgQ.inputFiles.exists(_.contains("/store/")),
        "avg must serve from the store")
      assert(avgQ.orderBy("k").as[(Long, Long, Double)].collect().toSeq ==
        Seq((1L, 1L, 10.0), (2L, 1L, 5.0)))
      // an aggregate the store genuinely cannot serve — max — refuses
      val maxQ = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), max(col("v")).as("m"))
      assert(!maxQ.inputFiles.exists(_.contains("/store/")),
        "a max aggregate must not be rewritten")
      // filter BELOW the aggregate changes the grouped rows
      val filtered = base.filter(col("v") > 6L).groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(!filtered.inputFiles.exists(_.contains("/store/")),
        "a filtered base must not be rewritten")
      assert(filtered.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 1L, 10L)))
      // a different table never matches
      val other = Seq((9L, 9L)).toDF("k", "v")
      assert(other.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .collect().toSeq.nonEmpty)
    }
  }

  test("a matching join-aggregate is served from the join-view store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvj_").toString
    Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("okey", "cust")
      .write.parquet(s"$dir/a")
    Seq((1L, 5L), (1L, 7L), (3L, 2L)).toDF("okey", "qty")
      .write.parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    ViewStore.buildJoinView(a, b, s"$dir/jv", "okey", "cust", "okey", "qty",
      nBuckets = 4)
    withRule {
      JoinViewCatalog.registerJoinView(a, b, "okey", "cust", "okey", "qty",
        s"$dir/jv")
      val q = a.join(b, a("okey") === b("okey"))
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("cnt"), sum(col("qty").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/jv/")),
        "the rewritten plan must scan the view store")
      assert(!q.inputFiles.exists(f =>
        f.contains("/a/") || f.contains("/b/")),
        "the rewritten plan must not touch either base")
      assert(q.orderBy("cust").as[(Long, Long, Long)].collect().toSeq ==
        Seq((10L, 2L, 12L), (20L, 1L, 2L)))
      // a LEFT join has different semantics — left alone
      val lj = a.join(b, a("okey") === b("okey"), "left")
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("cnt"))
      assert(!lj.inputFiles.exists(_.contains("/jv/")),
        "an outer join must not be rewritten")
      // a filter below the join changes the pairs — left alone
      val fj = a.filter(col("cust") > 10L).join(b, a("okey") === b("okey"))
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("cnt"), sum(col("qty").cast("long")).as("total"))
      assert(!fj.inputFiles.exists(_.contains("/jv/")),
        "a filtered base must not be rewritten")
    }
  }

  test("join-view min/max serve from an EXTREMA view and refuse on a " +
    "plain one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvjx_").toString
    Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("okey", "cust")
      .write.parquet(s"$dir/a")
    Seq((1L, 5L), (1L, 7L), (2L, 1L), (3L, 2L)).toDF("okey", "qty")
      .write.parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    ViewStore.buildJoinView(a, b, s"$dir/jvx", "okey", "cust", "okey", "qty",
      nBuckets = 4, extrema = true)
    ViewStore.buildJoinView(a, b, s"$dir/jvp", "okey", "cust", "okey", "qty",
      nBuckets = 4) // plain twin
    withRule {
      JoinViewCatalog.registerJoinView(a, b, "okey", "cust", "okey", "qty",
        s"$dir/jvx")
      def q = a.join(b, a("okey") === b("okey"))
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("cnt"),
          min(col("qty").cast("long")).as("vmin"),
          max(col("qty").cast("long")).as("vmax"))
      assert(q.inputFiles.exists(_.contains("/jvx/")),
        "min/max must serve from the extrema view store")
      assert(!q.inputFiles.exists(f => f.contains("/a/") || f.contains("/b/")),
        "the rewritten plan must not touch either base")
      // cust 10: keys {1, 2} -> qtys {5, 7, 1}; cust 20: key 3 -> {2}
      assert(q.orderBy("cust").as[(Long, Long, Long, Long)].collect().toSeq ==
        Seq((10L, 3L, 1L, 7L), (20L, 1L, 2L, 2L)),
        "served extrema must equal the direct recompute")
      // a group point filter composes: extrema through the bucket lookup
      val pq = a.join(b, a("okey") === b("okey"))
        .filter(col("cust") === 10L)
        .groupBy(col("cust"))
        .agg(max(col("qty").cast("long")).as("vmax"))
      assert(pq.inputFiles.exists(_.contains("/jvx/")))
      assert(pq.as[(Long, Long)].collect().toSeq == Seq((10L, 7L)))
      // a bare int-typed min would flip the output type — never rewritten
      // (qty here is long so the cast is identity; pin with the PLAIN
      // store below instead)
      JoinViewCatalog.clear()
      JoinViewCatalog.registerJoinView(a, b, "okey", "cust", "okey", "qty",
        s"$dir/jvp")
      val refused = a.join(b, a("okey") === b("okey"))
        .groupBy(col("cust"))
        .agg(min(col("qty").cast("long")).as("vmin"))
      assert(!refused.inputFiles.exists(_.contains("/jvp/")),
        "a plain view store must never serve min/max")
      assert(refused.orderBy("cust").as[(Long, Long)].collect().toSeq ==
        Seq((10L, 1L), (20L, 2L)), "the refused query answers from the base")
    }
  }

  test("type discipline: a bare fractional sum never serves the truncated " +
    "store total; the query's own cast(long) does; count(NULL) is never " +
    "the store count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvt_").toString
    Seq((1L, 10L, 1.5, "x"), (1L, 20L, 2.5, "y"), (2L, 5L, 0.5, "z"))
      .toDF("k", "v", "d", "s").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/store", "k", "v")
    // store over the DOUBLE column: total = sum(cast(d as long)), truncated
    AggStore.buildAggStore(base, s"$dir/store_d", "k", "d")
    withRule {
      // non-numeric value columns refuse loudly at registration
      val err = intercept[IllegalArgumentException] {
        MvCatalog.registerAggView(base, "k", "s", s"$dir/store")
      }
      assert(err.getMessage.contains("must be numeric"))
      MvCatalog.registerAggView(base, "k", "v", s"$dir/store")
      MvCatalog.registerAggView(base, "k", "d", s"$dir/store_d")
      // a BARE sum(double) is a true double sum — the store holds the
      // cast-truncated long, so the matcher must refuse
      val sumD = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("d")).as("total"))
      assert(!sumD.inputFiles.exists(_.contains("/store_d/")),
        "a fractional sum must not serve the truncated store total")
      assert(sumD.orderBy("k").as[(Long, Long, Double)].collect().toSeq ==
        Seq((1L, 2L, 4.0), (2L, 1L, 0.5)))
      // ...but the query's OWN cast(long) truncates exactly as the
      // store's write did — value-identical, rewrite fires
      val sumCast = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("d").cast("long")).as("total"))
      assert(sumCast.inputFiles.exists(_.contains("/store_d/")),
        "sum(cast(d as long)) matches the store's own fold")
      assert(sumCast.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 3L), (2L, 1L, 0L)))
      // count(NULL) is 0 for every group — not the store's row count
      val cn = base.groupBy(col("k"))
        .agg(count(lit(null)).as("cnt"),
          sum(col("v").cast("long")).as("total"))
      assert(!cn.inputFiles.exists(_.contains("/store/")),
        "count(NULL) must not rewrite to the store count")
      assert(cn.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 0L, 30L), (2L, 0L, 5L)))
    }
  }

  test("a pushed-down key-literal filter becomes a bucket-pruned point " +
    "lookup; value filters still refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvl_").toString
    spark.range(0, 40).select((col("id") % 20).as("k"), col("id").as("v"))
      .write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/store", "k", "v", nBuckets = 8)
    withRule {
      MvCatalog.registerAggView(base, "k", "v", s"$dir/store")
      val q = base.filter(col("k").isin(1L, 3L)).groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/store/")),
        "the key-IN aggregate must serve from the store")
      // ...and through the manifest-pruned lookup: a strict subset of
      // the store's buckets
      val all = AggStore.readAggStore(spark, s"$dir/store").inputFiles.toSet
      assert(q.inputFiles.toSet.subsetOf(all) &&
        q.inputFiles.length < all.size,
        s"lookup must open a strict subset (${q.inputFiles.length} of " +
          s"${all.size})")
      assert(q.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 22L), (3L, 2L, 26L)),
        "k=1: v∈{1,21}; k=3: v∈{3,23}")
      // single-equality form too
      val eq = base.filter(col("k") === 5L).groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(eq.inputFiles.exists(_.contains("/store/")))
      assert(eq.as[(Long, Long, Long)].collect().toSeq == Seq((5L, 2L, 30L)))
      // a VALUE filter changes the grouped rows — always refused
      val vq = base.filter(col("v") > 30L).groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(!vq.inputFiles.exists(_.contains("/store/")),
        "a value filter must never serve from the store")
    }
  }

  test("min/max serve from an EXTREMA store and never from a plain one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvx_").toString
    Seq((1L, 10L), (1L, 3L), (2L, 7L)).toDF("k", "v")
      .write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/plain", "k", "v")
    AggStore.buildAggStore(base.filter(col("v") =!= 3L), s"$dir/ext",
      "k", "v", extrema = true)
    // insert-only increment folds the extrema by least/greatest
    AggStore.mergeIntoAggStore(base.filter(col("v") === 3L), s"$dir/ext",
      "k", "v", appliedId = Some("inc-1"))
    withRule {
      MvCatalog.registerAggView(base, "k", "v", s"$dir/ext")
      val q = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      assert(q.inputFiles.exists(_.contains("/ext/")),
        "min/max must serve from the extrema store")
      assert(q.orderBy("k").as[(Long, Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 3L, 10L), (2L, 1L, 7L, 7L)))
      MvCatalog.clear()
      // a store without the columns must refuse
      MvCatalog.registerAggView(base, "k", "v", s"$dir/plain")
      val p = base.groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), min(col("v")).as("lo"))
      assert(!p.inputFiles.exists(_.contains("/plain/")),
        "a plain store cannot serve min/max")
    }
  }

  test("string and date keys serve through the point lookup — the " +
    "internal-value bridge is a lossless round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvk_").toString
    Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L)).toDF("k", "v")
      .write.parquet(s"$dir/sbase")
    val sbase = spark.read.parquet(s"$dir/sbase")
    AggStore.buildAggStore(sbase, s"$dir/sstore", "k", "v", nBuckets = 8)
    def d(s: String) = java.sql.Date.valueOf(s)
    Seq((d("1994-01-01"), 1L), (d("1994-01-02"), 2L), (d("1994-01-02"), 3L),
      (d("1994-01-03"), 4L)).toDF("k", "v").write.parquet(s"$dir/dbase")
    val dbase = spark.read.parquet(s"$dir/dbase")
    AggStore.buildAggStore(dbase, s"$dir/dstore", "k", "v", nBuckets = 8)
    withRule {
      MvCatalog.registerAggView(sbase, "k", "v", s"$dir/sstore")
      MvCatalog.registerAggView(dbase, "k", "v", s"$dir/dstore")
      // string IN: UTF8String literals bridge back to java Strings
      val sq = sbase.filter(col("k").isin("a", "c")).groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(sq.inputFiles.exists(_.contains("/sstore/")),
        "a string-keyed IN aggregate must serve from the store")
      val sAll = AggStore.readAggStore(spark, s"$dir/sstore").inputFiles.toSet
      assert(sq.inputFiles.toSet.subsetOf(sAll) &&
        sq.inputFiles.length < sAll.size,
        "the string lookup must open a strict subset of the buckets")
      assert(sq.orderBy("k").as[(String, Long, Long)].collect().toSeq ==
        Seq(("a", 2L, 30L), ("c", 1L, 7L)))
      // date equality: epoch-day literals bridge back to java Dates
      val dq = dbase.filter(col("k") === lit(d("1994-01-02")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(dq.inputFiles.exists(_.contains("/dstore/")),
        "a date-keyed equality aggregate must serve from the store")
      assert(dq.as[(java.sql.Date, Long, Long)].collect().toSeq ==
        Seq((d("1994-01-02"), 2L, 5L)))
    }
  }

  test("min/max serve THROUGH the bucket-pruned point lookup on an " +
    "extrema store; a plain store still refuses them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvxl_").toString
    spark.range(0, 40).select((col("id") % 20).as("k"), col("id").as("v"))
      .write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(base, s"$dir/ext", "k", "v", nBuckets = 8,
      extrema = true)
    AggStore.buildAggStore(base, s"$dir/plain", "k", "v", nBuckets = 8)
    withRule {
      MvCatalog.registerAggView(base, "k", "v", s"$dir/ext")
      val q = base.filter(col("k").isin(1L, 3L)).groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      assert(q.inputFiles.exists(_.contains("/ext/")),
        "the key-IN extrema aggregate must serve from the extrema store")
      // ...and through the manifest-pruned five-column lookup: a strict
      // subset of the store's buckets
      val all = AggStore.readAggStoreExtrema(spark, s"$dir/ext")
        .inputFiles.toSet
      assert(q.inputFiles.toSet.subsetOf(all) &&
        q.inputFiles.length < all.size,
        s"extrema lookup must open a strict subset " +
          s"(${q.inputFiles.length} of ${all.size})")
      assert(q.orderBy("k").as[(Long, Long, Long, Long, Long)]
        .collect().toSeq ==
        Seq((1L, 2L, 22L, 1L, 21L), (3L, 2L, 26L, 3L, 23L)),
        "k=1: v∈{1,21}; k=3: v∈{3,23}")
      MvCatalog.clear()
      // the lookup path refuses min/max on a store without the columns
      MvCatalog.registerAggView(base, "k", "v", s"$dir/plain")
      val p = base.filter(col("k") === 5L).groupBy(col("k"))
        .agg(min(col("v")).as("lo"))
      assert(!p.inputFiles.exists(_.contains("/plain/")),
        "a plain store must not serve min/max through the lookup either")
      assert(p.as[(Long, Long)].collect().toSeq == Seq((5L, 5L)))
    }
  }

  test("multi-column groupBy serves from a struct-keyed store, in " +
    "registration order only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvm_").toString
    Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "a", 5L), (2L, "b", 7L))
      .toDF("k1", "k2", "v").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(
      base.select(struct(col("k1"), col("k2")).as("kk"), col("v")),
      s"$dir/store", "kk", "v", nBuckets = 4)
    withRule {
      MvCatalog.registerAggView(base, Seq("k1", "k2"), "v", s"$dir/store")
      val q = base.groupBy(col("k1"), col("k2"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/store/")),
        "the two-key aggregate must serve from the struct-keyed store")
      assert(q.orderBy("k1", "k2").as[(Long, String, Long, Long)]
        .collect().toSeq ==
        Seq((1L, "a", 2L, 15L), (1L, "b", 1L, 20L), (2L, "b", 1L, 7L)))
      // wrong grouping order ≠ the registered key order — refused
      val swapped = base.groupBy(col("k2"), col("k1"))
        .agg(count(lit(1)).as("cnt"))
      assert(!swapped.inputFiles.exists(_.contains("/store/")),
        "a different key order must not be rewritten")
    }
  }

  test("a conjunction of per-column equalities over a struct-keyed " +
    "store becomes a single-bucket lookup; partial keys refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvmk_").toString
    Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "a", 5L), (2L, "b", 7L))
      .toDF("k1", "k2", "v").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    AggStore.buildAggStore(
      base.select(struct(col("k1"), col("k2")).as("kk"), col("v")),
      s"$dir/store", "kk", "v", nBuckets = 8)
    withRule {
      MvCatalog.registerAggView(base, Seq("k1", "k2"), "v", s"$dir/store")
      val q = base.filter(col("k1") === 1L && col("k2") === "a")
        .groupBy(col("k1"), col("k2"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/store/")),
        "the full-key equality conjunction must serve from the store")
      val all = AggStore.readAggStore(spark, s"$dir/store").inputFiles.toSet
      assert(q.inputFiles.toSet.subsetOf(all) &&
        q.inputFiles.length < all.size,
        s"multi-key lookup must open a strict subset " +
          s"(${q.inputFiles.length} of ${all.size})")
      assert(q.as[(Long, String, Long, Long)].collect().toSeq ==
        Seq((1L, "a", 2L, 15L)))
      // ONE IN among the equalities: the degenerate cross product —
      // "these k1s' k2=a aggregates" — still a bucket-pruned lookup
      val inq = base.filter(col("k1").isin(1L, 2L) && col("k2") === "a")
        .groupBy(col("k1"), col("k2"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(inq.inputFiles.exists(_.contains("/store/")),
        "IN x equality over the struct key must serve from the store")
      assert(inq.orderBy("k1").as[(Long, String, Long, Long)]
        .collect().toSeq == Seq((1L, "a", 2L, 15L)),
        "(2, a) has no rows; (1, a) folds its two")
      // TWO INs would be a multiplicative cross product — refused
      val twoIns = base.filter(col("k1").isin(1L, 2L) &&
          col("k2").isin("a", "b"))
        .groupBy(col("k1"), col("k2"))
        .agg(count(lit(1)).as("cnt"))
      assert(!twoIns.inputFiles.exists(_.contains("/store/")),
        "a conjunction of two INs must not be rewritten")
      assert(twoIns.orderBy("k1", "k2").as[(Long, String, Long)]
        .collect().toSeq ==
        Seq((1L, "a", 2L), (1L, "b", 1L), (2L, "b", 1L)))
      // a PARTIAL key filter changes which groups exist vs the lookup's
      // semantics — refused, answered from the base
      val partial = base.filter(col("k1") === 1L)
        .groupBy(col("k1"), col("k2"))
        .agg(count(lit(1)).as("cnt"))
      assert(!partial.inputFiles.exists(_.contains("/store/")),
        "a partial key equality must not be rewritten")
      assert(partial.orderBy("k2").as[(Long, String, Long)]
        .collect().toSeq == Seq((1L, "a", 2L), (1L, "b", 1L)))
    }
  }

  test("a group point filter over the join-aggregate becomes a " +
    "bucket-pruned view lookup; value filters still refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvjl_").toString
    spark.range(0, 60).select(col("id").as("okey"), (col("id") % 20).as("cust"))
      .write.parquet(s"$dir/a")
    spark.range(0, 60).select(col("id").as("okey"), (col("id") % 7).as("qty"))
      .write.parquet(s"$dir/b")
    val a = spark.read.parquet(s"$dir/a")
    val b = spark.read.parquet(s"$dir/b")
    ViewStore.buildJoinView(a, b, s"$dir/jv", "okey", "cust", "okey", "qty",
      nBuckets = 8)
    withRule {
      JoinViewCatalog.registerJoinView(a, b, "okey", "cust", "okey", "qty",
        s"$dir/jv")
      val q = a.join(b, a("okey") === b("okey"))
        .filter(col("cust").isin(3L, 5L))
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("cnt"), sum(col("qty").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/jv/")),
        "the group point filter must serve from the view store")
      // ...through the manifest-pruned lookup: a strict subset of the
      // view's bucket files
      val all = ViewStore.readJoinView(spark, s"$dir/jv").inputFiles.toSet
      assert(q.inputFiles.toSet.subsetOf(all) && q.inputFiles.length < all.size,
        s"lookup must open a strict subset (${q.inputFiles.length} of " +
          s"${all.size})")
      // cust c owns okeys {c, c+20, c+40}; qty = okey % 7
      def expect(c: Long) = (c, 3L, (c % 7) + ((c + 20) % 7) + ((c + 40) % 7))
      assert(q.orderBy("cust").as[(Long, Long, Long)].collect().toSeq ==
        Seq(expect(3L), expect(5L)))
      // a VALUE filter on either side still refuses
      val vq = a.join(b, a("okey") === b("okey"))
        .filter(col("qty") > 3L)
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("cnt"), sum(col("qty").cast("long")).as("total"))
      assert(!vq.inputFiles.exists(_.contains("/jv/")),
        "a value filter must never serve from the view")
    }
  }

  test("freshness guard: files landed after the last store merge refuse " +
    "the rewrite until they are merged in") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvf_").toString
    Seq((1L, 10L), (2L, 5L)).toDF("k", "v").write.parquet(s"$dir/base")
    AggStore.buildAggStore(spark.read.parquet(s"$dir/base"),
      s"$dir/store", "k", "v")
    withRule {
      MvCatalog.registerAggView(spark.read.parquet(s"$dir/base"),
        "k", "v", s"$dir/store")
      def q = spark.read.parquet(s"$dir/base").groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/store/")),
        "fresh store: the rewrite must fire")
      // a new file lands in the base WITHOUT a store merge — the one
      // reachable-stale-answer window; the rule must refuse and the
      // query must answer from the base, new rows included
      Seq((1L, 100L), (3L, 7L)).toDF("k", "v")
        .write.mode("append").parquet(s"$dir/base")
      val stale = q
      assert(!stale.inputFiles.exists(_.contains("/store/")),
        "unmerged landed files must refuse the rewrite")
      assert(stale.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 110L), (2L, 1L, 5L), (3L, 1L, 7L)),
        "the refused query must answer fresh from the base")
      // merging the landed increment restores serving — and serves the
      // post-merge truth
      def norm(p: String) = p.replaceFirst("^file:/+", "/")
      val fp = graft.operators.BaseFiles.read(spark, s"$dir/store").get
      val landed = spark.read.parquet(s"$dir/base").inputFiles.toSeq
        .filterNot(f => fp.contains(norm(f)))
      AggStore.mergeIntoAggStore(spark.read.parquet(landed: _*),
        s"$dir/store", "k", "v", appliedId = Some("day-1"))
      val served = q
      assert(served.inputFiles.exists(_.contains("/store/")),
        "merging the landed files must restore the rewrite")
      assert(served.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        Seq((1L, 2L, 110L), (2L, 1L, 5L), (3L, 1L, 7L)))
    }
  }

  test("shrinkage guard: base files deleted after the store folded them " +
    "refuse the rewrite; a rebuild resets the fingerprint and restores") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mvs_").toString
    Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("k", "v")
      .repartition(3).write.parquet(s"$dir/base")
    AggStore.buildAggStore(spark.read.parquet(s"$dir/base"),
      s"$dir/store", "k", "v")
    withRule {
      MvCatalog.registerAggView(spark.read.parquet(s"$dir/base"),
        "k", "v", s"$dir/store")
      def q = spark.read.parquet(s"$dir/base").groupBy(col("k"))
        .agg(count(lit(1)).as("cnt"), sum(col("v").cast("long")).as("total"))
      assert(q.inputFiles.exists(_.contains("/store/")),
        "fresh store: the rewrite must fire")
      // file-level retention drops ONE base data file — no rewrite, no
      // new names: the forward (addition) check alone cannot see it,
      // but the store still serves the deleted file's rows
      val victim = spark.read.parquet(s"$dir/base").inputFiles.head
      assert(new java.io.File(new java.net.URI(victim)).delete())
      val shrunk = q
      assert(!shrunk.inputFiles.exists(_.contains("/store/")),
        "deleted base files must refuse the rewrite")
      val baseTruth = shrunk.orderBy("k").as[(Long, Long, Long)]
        .collect().toSeq
      assert(baseTruth.length == 2,
        s"the base recompute must reflect the deletion, got $baseTruth")
      // the rebuild deletion semantics demand anyway RESETS the
      // fingerprint — serving resumes, now over the shrunken truth
      AggStore.buildAggStore(spark.read.parquet(s"$dir/base"),
        s"$dir/store", "k", "v")
      val served = q
      assert(served.inputFiles.exists(_.contains("/store/")),
        "a rebuild must restore the rewrite")
      assert(served.orderBy("k").as[(Long, Long, Long)].collect().toSeq ==
        baseTruth, "the restored serving must equal the base recompute")
    }
  }

  test("without a registration the rule is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv3_").toString
    Seq((1L, 10L)).toDF("k", "v").write.parquet(s"$dir/base")
    val base = spark.read.parquet(s"$dir/base")
    withRule {
      val q = base.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      assert(q.inputFiles.exists(_.contains("/base/")))
      assert(q.as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
    }
  }
}
