package graft

import org.apache.spark.sql.functions._

import graft.operators.{AggStore, GenStore, Maintenance, Similarity,
  TextIndex, ViewStore, ZoneMap}
import graft.operators.Maintenance.{AggStoreT, IvfPqT, JoinViewT, Policy,
  TextIndexT, ZoneMapT}

/** Pins the unified table-services verb: ONE [[Maintenance.sweep]] over
  * a degraded multi-store fixture — an over-segmented join view and
  * text index, an agg store with deep history, a drifted z-ordered
  * layout — runs exactly the needed verbs (compact / vacuum /
  * recluster; healthy targets report `none`), drives every inspected
  * number back under policy, and leaves every serving read
  * bit-identical.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_maint_$tag").toString

  test("one sweep drives a degraded multi-store fixture to healthy " +
    "with serving reads unchanged") {
    val dir = tmp("fix")
    val policy = Policy(maxSegments = 2, keepGens = 2,
      maxDriftPpm = 250000L, partitions = 8)

    // -- join view: build + 4 two-sided merges -> up to 5 LSM segments
    // on hot buckets (under mergeAdditive's own auto-compact threshold
    // of 8, over the sweep policy's 2)
    val jv = s"$dir/jv"
    def aRows(i: Long) = Seq((i, 10L), (i + 100, 20L)).toDF("okey", "cust")
    def bRows(i: Long) = Seq((i, 5L), (i + 100, 2L)).toDF("okey", "qty")
    ViewStore.buildJoinView(aRows(0), bRows(0), jv,
      "okey", "cust", "okey", "qty", nBuckets = 2)
    (1L to 4L).foreach(i => ViewStore.mergeIntoJoinView(aRows(i), bRows(i),
      jv, "okey", "cust", "okey", "qty", appliedId = Some(s"b$i")))

    // -- text index: build + 4 appends, same over-segmentation shape
    val ti = s"$dir/ti"
    def docs(i: Long) = Seq((i, "spark shuffles data"),
      (i + 100, "zone maps skip files")).toDF("id", "text")
    TextIndex.buildTextIndex(docs(0), ti, "id", "text", nBuckets = 2)
    (1L to 4L).foreach(i => TextIndex.mergeIntoTextIndex(docs(i), ti,
      "id", "text", appliedId = Some(s"t$i")))

    // -- agg store: build + 4 merges -> 5 resolvable generations
    val ag = s"$dir/ag"
    AggStore.buildAggStore(Seq((1L, 3L)).toDF("k", "v"), ag, "k", "v",
      nBuckets = 2)
    (1L to 4L).foreach(i => AggStore.mergeIntoAggStore(
      Seq((i % 3, i)).toDF("k", "v"), ag, "k", "v", Some(s"a$i")))

    // -- z-ordered layout: clustered build + full-span unclustered
    // append -> drift past threshold
    val (zd, zz) = (s"$dir/zd", s"$dir/zz")
    val grid = spark.range(0, 1024).select(
      (col("id") % 32).cast("long").as("a"),
      (col("id") / 32).cast("long").as("b"))
    ZoneMap.writeZOrdered(grid, zd, zz, "a", "b", bits = 8, partitions = 8)
    ZoneMap.appendWithStats(grid.repartition(4), zd, Seq("a", "b"), zz)

    // the degradation is real
    def segs(p: String) = GenStore.read(spark, p).get.entries
      .groupBy(_._1).map(_._2.size).max
    assert(segs(s"$jv/view") > policy.maxSegments, "fixture: jv segmented")
    assert(segs(s"$ti/postings") > policy.maxSegments, "fixture: ti segmented")
    assert(GenStore.listHistoryGens(spark, ag).size + 1 > policy.keepGens,
      "fixture: agg history deep")
    assert(ZoneMap.layoutDrift(spark, zz, "a", "b")._1 > policy.maxDriftPpm,
      "fixture: layout drifted")

    // serving reads BEFORE
    val jvBefore = ViewStore.readJoinView(spark, jv)
      .as[(Long, Long, Long)].collect().toSet
    val tiQ = Seq((1L, "spark zone")).toDF("qid", "qtext")
    def tiServe = TextIndex.serveTextIndex(spark, ti, tiQ,
      "qid", "qtext", "id", k = 10).collect().map(_.toString).toSet
    val tiBefore = tiServe
    val agBefore = AggStore.readAggStore(spark, ag)
      .as[(Long, Long, Long)].collect().toSet
    val zmPreds = Seq(("a", 3L, 6L), ("b", 10L, 20L))
    val zmBefore = ZoneMap.prunedRead(spark, zd, zz, zmPreds)
      .groupBy(col("a")).count().as[(Long, Long)].collect().toSet

    // ONE sweep
    val actions = Maintenance.sweep(spark, Seq(
      JoinViewT(jv), TextIndexT(ti), AggStoreT(ag),
      ZoneMapT(zd, zz, "a", "b")), policy)
    def verbsOf(label: String) =
      actions.filter(_.target == label).map(_.verb).toSet
    assert(verbsOf(s"joinview:$jv").contains("compact"))
    assert(verbsOf(s"textindex:$ti").contains("compact"))
    assert(verbsOf(s"aggstore:$ag") == Set("vacuum"))
    assert(verbsOf(s"zonemap:$zd") == Set("recluster"))

    // healthy afterwards...
    assert(segs(s"$jv/view") <= policy.maxSegments)
    assert(segs(s"$ti/postings") <= policy.maxSegments)
    assert(GenStore.listHistoryGens(spark, ag).size + 1 <= policy.keepGens)
    assert(ZoneMap.layoutDrift(spark, zz, "a", "b")._1 <= policy.maxDriftPpm,
      "recluster must restore the layout under threshold")
    // ...serving bit-identical
    assert(ViewStore.readJoinView(spark, jv)
      .as[(Long, Long, Long)].collect().toSet == jvBefore)
    assert(tiServe == tiBefore)
    assert(AggStore.readAggStore(spark, ag)
      .as[(Long, Long, Long)].collect().toSet == agBefore)
    assert(ZoneMap.prunedRead(spark, zd, zz, zmPreds)
      .groupBy(col("a")).count().as[(Long, Long)].collect().toSet
      == zmBefore)

    // a second sweep is a no-op: every target reports `none`
    val again = Maintenance.sweep(spark, Seq(
      JoinViewT(jv), TextIndexT(ti), AggStoreT(ag),
      ZoneMapT(zd, zz, "a", "b")), policy)
    assert(again.forall(_.verb == "none"),
      s"a healthy fleet must sweep to all-none, got $again")
  }

  test("the ANN family sweeps to healthy: tombstones compact, catalog " +
    "and version retention fire, serving bit-identical") {
    val dir = tmp("ann")
    val idx = s"$dir/idx"
    def vecs(from: Long, n: Long) = spark.range(from, from + n)
      .select(col("id").as("nid"),
        array((0 until 4).map(i =>
          ((col("id") * (i + 1)) % 17).cast("double")): _*).as("ne"))
    val corpus = vecs(0, 200)
    // three rebuilds -> three resolvable versions (v1..v3)
    (1 to 3).foreach(_ => Similarity.rebuildIvfPqIndex(corpus, idx,
      nCells = 4, m = 2, kSub = 4))
    // two appends on the live version -> catalog history deepens
    Similarity.appendToIvfPqIndex(vecs(200, 20), idx, appendId = "day1")
    Similarity.appendToIvfPqIndex(vecs(220, 20), idx, appendId = "day2")
    // logical deletes -> a live tombstone log
    Similarity.tombstoneIvfPq(Seq(3L, 9L, 201L).toDF("nid"), idx)
    val policy = Policy(keepGens = 2, keepVersions = 2)
    val (tombs0, cats0, vers0) = Similarity.ivfPqMaintenanceStats(spark, idx)
    assert(tombs0 == 3L && cats0 > policy.keepGens &&
      vers0 > policy.keepVersions,
      s"fixture must be degraded, got $tombs0/$cats0/$vers0")
    val queries = vecs(0, 3).select(col("nid").as("qid"), col("ne").as("qe"))
    def serve = Similarity.serveIvfPq(spark, idx, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val before = serve
    assert(!before.exists(r => Seq(3L, 9L, 201L).contains(r.getLong(1))),
      "tombstoned ids must already be logically gone")
    val actions = Maintenance.sweep(spark, Seq(IvfPqT(idx)), policy)
    assert(actions.count(_.verb == "compact") == 1 &&
      actions.count(_.verb == "vacuum") == 2,
      s"tombstones compact and both retentions fire, got $actions")
    assert(serve == before, "maintenance must not change served answers")
    val (t1, c1, v1) = Similarity.ivfPqMaintenanceStats(spark, idx)
    assert(t1 == 0L && c1 <= policy.keepGens && v1 <= policy.keepVersions,
      s"sweep must drive the numbers under policy, got $t1/$c1/$v1")
    val again = Maintenance.sweep(spark, Seq(IvfPqT(idx)), policy)
    assert(again.forall(_.verb == "none"),
      s"a healthy index must sweep to all-none, got $again")
    // detection: the `v<N>` version manifest names the family
    assert(Maintenance.detect(spark, idx).contains(IvfPqT(idx)))
  }

  test("a planner zone-map registration doubles as the sweep registry; " +
    "string-stat registrations never enroll; errors isolate per target") {
    val dir = tmp("zreg")
    val grid = spark.range(0, 256).select(
      (col("id") % 16).cast("long").as("a"),
      (col("id") / 16).cast("long").as("b"))
    ZoneMap.writeZOrdered(grid, s"$dir/data", s"$dir/zone", "a", "b",
      bits = 8, partitions = 4)
    // a pruning-only STRING registration (q349's shape) must NOT become
    // a recluster target — its drift inspection would refuse
    spark.range(0, 64).select(
        concat(lit("s"), (col("id") % 4)).as("seg"), col("id").as("v"))
      .write.parquet(s"$dir/sdata")
    ZoneMap.buildZoneMap(spark, s"$dir/sdata", Seq("seg", "v"),
      s"$dir/szone")
    graft.plans.ZoneMapCatalog.register(spark, s"$dir/data", s"$dir/zone",
      Seq("a", "b"))
    graft.plans.ZoneMapCatalog.register(spark, s"$dir/sdata", s"$dir/szone",
      Seq("seg", "v"))
    try {
      val targets = graft.plans.ZoneMapCatalog.zoneTargetsFromCatalog(spark)
      assert(targets.map(t => (t.zonePath, t.colA, t.colB)) ==
        Seq((s"$dir/zone", "a", "b")),
        s"only the integer-image registration enrolls, got $targets")
      val acts = Maintenance.sweep(spark, targets)
      assert(acts.nonEmpty && acts.forall(_.verb == "none"),
        s"a fresh clustered layout is healthy, got $acts")
      // per-target error isolation: a corrupt target reports `error`
      // and the healthy one still sweeps
      new java.io.File(s"$dir/bad").mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/bad/CURRENT"), "garbage")
      val mixed = Maintenance.sweep(spark,
        Seq(IvfPqT(s"$dir/bad")) ++ targets)
      assert(mixed.exists(a => a.verb == "error" &&
        a.target.startsWith("ivfpq:")),
        s"the corrupt target must report error, got $mixed")
      assert(mixed.exists(a => a.verb == "none" &&
        a.target.startsWith("zonemap:")),
        s"the healthy target must still sweep, got $mixed")
    } finally graft.plans.ZoneMapCatalog.clear()
  }

  test("sweepRoots detects each family from its own manifests and " +
    "skips unknown roots") {
    val dir = tmp("det")
    ViewStore.buildJoinView(
      Seq((1L, 10L)).toDF("okey", "cust"), Seq((1L, 5L)).toDF("okey", "qty"),
      s"$dir/jv", "okey", "cust", "okey", "qty", nBuckets = 2)
    TextIndex.buildTextIndex(Seq((1L, "hello world")).toDF("id", "text"),
      s"$dir/ti", "id", "text", nBuckets = 2)
    AggStore.buildAggStore(Seq((1L, 3L)).toDF("k", "v"), s"$dir/ag",
      "k", "v", nBuckets = 2)
    assert(Maintenance.detect(spark, s"$dir/jv")
      .contains(JoinViewT(s"$dir/jv")))
    assert(Maintenance.detect(spark, s"$dir/ti")
      .contains(TextIndexT(s"$dir/ti")))
    assert(Maintenance.detect(spark, s"$dir/ag")
      .contains(AggStoreT(s"$dir/ag")))
    val acts = Maintenance.sweepRoots(spark,
      Seq(s"$dir/jv", s"$dir/ti", s"$dir/ag", s"$dir/nothing"))
    assert(acts.exists(a => a.target == s"$dir/nothing" && a.verb == "skip"))
    assert(acts.count(_.verb == "none") >= 3,
      "freshly-built stores are healthy")
  }
}
