package graft

import org.apache.spark.sql.functions._

import graft.operators.{GenStore, ViewStore}

/** Pins the join-view store's laws: increment-merge equals the full
  * recompute (the factored delta rule, both sides in one batch), replay
  * is a no-op in all three substores, purge erases the subject from
  * every file (orphaned b-keys included, shared keys excluded) and the
  * suppression lists block a replayed committed batch from re-ingesting
  * the subject, and re-admission re-opens the door without restoring
  * history.
  */
class ViewStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_vs_").toString + "/jv"

  private def a1 = Seq((1L, 10L), (2L, 10L)).toDF("okey", "cust")
  private def a2 = Seq((3L, 20L), (4L, 30L)).toDF("okey", "cust")
  private def b1 = Seq((1L, 5L), (3L, 2L)).toDF("okey", "qty")
  private def b2 = Seq((1L, 7L), (2L, 1L), (4L, 4L), (4L, 6L))
    .toDF("okey", "qty")

  // full recompute of the fixture: cust 10 -> (3, 13), 20 -> (1, 2),
  // 30 -> (2, 10)
  private val full = Set((10L, 3L, 13L), (20L, 1L, 2L), (30L, 2L, 10L))

  private def build(path: String): Unit =
    ViewStore.buildJoinView(a1, b1, path, "okey", "cust", "okey", "qty",
      nBuckets = 4, appliedId = Some("batch-0"))

  private def view(path: String): Set[(Long, Long, Long)] =
    ViewStore.readJoinView(spark, path)
      .as[(Long, Long, Long)].collect().toSet

  test("increment-merge on both sides equals the full recompute") {
    val path = tmp()
    build(path)
    assert(view(path) == Set((10L, 1L, 5L)),
      "build view must be the partial join (b's key 3 has no a-row yet)")
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1"))
    assert(view(path) == full,
      "after the increment the view must equal the full A JOIN B GROUP BY")
  }

  test("extrema store: min/max fold by least/greatest across build, " +
    "merge segments, compaction, lookup, and purge") {
    val path = tmp()
    ViewStore.buildJoinView(a1, b1, path, "okey", "cust", "okey", "qty",
      nBuckets = 4, appliedId = Some("batch-0"), extrema = true)
    def ext = ViewStore.readJoinViewExtrema(spark, path)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(ext == Set((10L, 1L, 5L, 5L, 5L)),
      "build view: cust 10 has one joined row of qty 5")
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1"))
    // cust 10: keys {1,2} -> qtys {5,7,1}; 20: {2}; 30: {4,6}
    val fullExt = Set((10L, 3L, 13L, 1L, 7L), (20L, 1L, 2L, 2L, 2L),
      (30L, 2L, 10L, 4L, 6L))
    assert(ext == fullExt,
      "post-merge extrema must fold across the delta segments")
    assert(ViewStore.lookupJoinViewGroupsExtrema(Seq(10L).toDF("key"), path)
      .as[(Long, Long, Long, Long, Long)].collect().toSet ==
      Set((10L, 3L, 13L, 1L, 7L)), "point lookup folds extrema too")
    ViewStore.compactJoinView(spark, path)
    assert(ext == fullExt, "compaction folds by each column's own monoid")
    // the read path refuses extrema on a plain store, and a rebuild
    // must not silently change the store's shape
    intercept[IllegalArgumentException] {
      ViewStore.buildJoinView(a1, b1, path, "okey", "cust", "okey", "qty",
        nBuckets = 4)
    }
    // purge a group: survivors keep their extrema intact (fold-spec'd
    // sweep — a sum-fold would have corrupted or dropped vmin/vmax)
    ViewStore.purgeJoinViewGroups(Seq(10L).toDF("grp"), path, "grp")
    assert(ext == fullExt - ((10L, 3L, 13L, 1L, 7L)),
      "purge sweeps must preserve surviving extrema bit-exact")
  }

  test("a replayed batch id is a detected no-op in all three substores") {
    val path = tmp()
    build(path)
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1"))
    val gens = Seq("view", "a", "b")
      .map(s => GenStore.read(spark, s"$path/$s").get.gen)
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1")) // replay
    assert(Seq("view", "a", "b")
      .map(s => GenStore.read(spark, s"$path/$s").get.gen) == gens,
      "a replay must not advance any substore generation")
    assert(view(path) == full, "a replay must not double-count")
    // and the id is in every ledger (the all-three crash-replay check)
    Seq("view", "a", "b").foreach(s =>
      assert(GenStore.read(spark, s"$path/$s").get.applied
        .contains("batch-1"), s"$s ledger must hold batch-1"))
  }

  test("an empty increment leg still stamps the ledger, pointer-only") {
    val path = tmp()
    build(path)
    // b-only batch: the a-substore gets a pointer-only ledger commit
    ViewStore.mergeIntoJoinView(a1.limit(0), b2, path,
      "okey", "cust", "okey", "qty", appliedId = Some("batch-1"))
    val mA = GenStore.read(spark, s"$path/a").get
    assert(mA.applied.contains("batch-1"),
      "the empty a-leg must stamp its ledger")
    // b2's key-4 rows have no stored a-row yet: they land in the b-state
    // but contribute nothing to the view until their a-row arrives
    assert(view(path) == Set((10L, 3L, 13L)),
      s"b-only increment joins only stored a-rows, got ${view(path)}")
  }

  test("time travel reads the view as each batch committed it") {
    val path = tmp()
    build(path)
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1"))
    val asOf1 = ViewStore.readJoinViewAsOf(spark, path, 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(asOf1 == Set((10L, 1L, 5L)),
      "generation 1 must replay the build-time view")
    assert(ViewStore.joinViewHistory(spark, path).map(_._1) == Seq(2L, 1L))
  }

  test("vacuum trims all three substores' history; the view unaffected") {
    val path = tmp()
    build(path)
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1"))
    val before = view(path)
    val deleted = ViewStore.vacuumJoinView(spark, path, keepGens = 1)
    assert(deleted.exists(_.startsWith("view/")) &&
      deleted.exists(_.startsWith("a/")) && deleted.exists(_.startsWith("b/")),
      s"all three substores must retire generation-1 state, got $deleted")
    assert(view(path) == before, "vacuum must not move the served view")
    val err = intercept[IllegalArgumentException] {
      ViewStore.readJoinViewAsOf(spark, path, 1L).collect()
    }
    assert(err.getMessage.contains("not retained"))
  }

  test("point lookup reads only the groups' view buckets") {
    val path = tmp()
    build(path)
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("batch-1"))
    val one = ViewStore.lookupJoinViewGroups(Seq(20L).toDF("key"), path)
    assert(one.as[(Long, Long, Long)].collect().toSet == Set((20L, 1L, 2L)))
    val allFiles = ViewStore.readJoinView(spark, path).inputFiles.toSet
    val lookFiles = one.inputFiles.toSet
    assert(lookFiles.subsetOf(allFiles) && lookFiles.size < allFiles.size,
      s"lookup must open a strict subset of the view's files " +
        s"(${lookFiles.size} of ${allFiles.size})")
  }

  test("rollback reverts state AND ledgers batch-aligned; the re-fed " +
    "batch applies; diff audits the change") {
    val path = tmp()
    build(path)
    // BAD day-1 load: every qty inflated by 100
    ViewStore.mergeIntoJoinView(a2,
      b2.withColumn("qty", col("qty") + lit(100L)), path,
      "okey", "cust", "okey", "qty", appliedId = Some("day-1"))
    assert(view(path) != full, "the bad load must be visible")
    ViewStore.rollbackJoinView(spark, path, batchesBack = 1)
    assert(view(path) == Set((10L, 1L, 5L)),
      "rollback must restore the build-time view")
    // the ledger reverted WITH the state: the SAME id re-applies
    ViewStore.mergeIntoJoinView(a2, b2, path, "okey", "cust", "okey", "qty",
      appliedId = Some("day-1"))
    assert(view(path) == full, "the corrected re-feed must fold")
    // audit: generation 1 -> current shows what day-1 changed
    val d = ViewStore.diffJoinView(spark, path, 1L,
      GenStore.read(spark, s"$path/view").get.gen)
      .select(col("key"), col("change"))
      .as[(Long, String)].collect().toSet
    assert(d == Set((10L, "changed"), (20L, "added"), (30L, "added")),
      s"diff must audit the day-1 groups, got $d")
  }

  test("GenStore.diff folds only sides whose OWN manifest is segmented: " +
    "a content-changed bucket keeps the raw path for non-summable valCols") {
    val path = tmp()
    // two single-segment snapshots with a STRING value column — the
    // normal diff case (content changed, bucket dirs differ ACROSS the
    // manifests); a combined segmentation check would wrongly take the
    // folded path and try sum(string)
    GenStore.commitGen(spark, path,
      Seq((1L, "x"), (2L, "y")).toDF("key", "v"),
      4, Seq.empty, 0L, Seq.empty, None)
    val m1 = GenStore.read(spark, path).get
    GenStore.commitGen(spark, path,
      Seq((1L, "x2"), (2L, "y")).toDF("key", "v"),
      4, m1.applied, m1.gen, Seq.empty, None)
    val m2 = GenStore.read(spark, path).get
    val d = GenStore.diff(spark, path, m1.gen, m2.gen, "key",
        Seq("v"), "changed")
      .select(col("key"), col("change")).as[(Long, String)].collect().toSet
    assert(d == Set((1L, "changed")), s"raw-path diff must work, got $d")
  }

  test("purge erases the subject everywhere; shared keys survive; " +
    "replayed batches and re-sends are suppressed until re-admission") {
    val path = tmp()
    // cust 77 and 88 SHARE join key 9; cust 77 exclusively owns key 8
    val a = Seq((8L, 77L), (9L, 77L), (9L, 88L)).toDF("okey", "cust")
    val b = Seq((8L, 100L), (9L, 3L)).toDF("okey", "qty")
    ViewStore.buildJoinView(a, b, path, "okey", "cust", "okey", "qty",
      nBuckets = 4, appliedId = Some("batch-0"))
    assert(view(path) == Set((77L, 2L, 103L), (88L, 1L, 3L)))

    val (aDel, bDel, vDel) = ViewStore.purgeJoinViewGroups(
      Seq(77L).toDF("key"), path)
    assert((aDel, bDel, vDel) == (2L, 1L, 1L),
      s"expected (2 a-rows, 1 orphaned b-row, 1 view row), " +
        s"got ($aDel, $bDel, $vDel)")
    assert(view(path) == Set((88L, 1L, 3L)),
      "the surviving group's view row must be untouched")

    // residue sweep: no file under the store may still hold the subject
    val files = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk)
        else if (d.getName.endsWith(".parquet")) Seq(d) else Seq.empty
      walk(new java.io.File(path.stripSuffix("/jv")))
    }
    files.foreach { f =>
      val df = spark.read.parquet(f.getAbsolutePath)
      val cols = df.columns.toSet
      // the suppression list holds the bare group id BY DESIGN (policy,
      // not subject data) — everything else must be clean
      if (cols.contains("grp") && !f.getAbsolutePath.contains("_purged"))
        assert(df.filter(col("grp") === 77L).isEmpty, s"residue in $f")
      if (f.getAbsolutePath.contains("/view/") && cols.contains("key"))
        assert(df.filter(col("key") === 77L).isEmpty, s"residue in $f")
      if (f.getAbsolutePath.contains("/b/") && cols.contains("key") &&
        !f.getAbsolutePath.contains("_purged"))
        assert(df.filter(col("key") === 8L).isEmpty,
          s"orphaned key residue in $f")
    }

    // a replayed committed batch (same payload, fresh id — the upstream
    // re-send) must NOT re-ingest the purged subject...
    ViewStore.mergeIntoJoinView(
      Seq((8L, 77L)).toDF("okey", "cust"), Seq((8L, 100L)).toDF("okey", "qty"),
      path, "okey", "cust", "okey", "qty", appliedId = Some("resend-1"))
    assert(view(path) == Set((88L, 1L, 3L)),
      "suppression must block the purged subject's replayed rows")

    // ...until re-admission, after which NEW data (fresh keys) ingests
    assert(ViewStore.readmitJoinViewGroups(Seq(77L).toDF("key"), path) == 1L)
    ViewStore.mergeIntoJoinView(
      Seq((15L, 77L)).toDF("okey", "cust"), Seq((15L, 9L)).toDF("okey", "qty"),
      path, "okey", "cust", "okey", "qty", appliedId = Some("post-readmit"))
    assert(view(path) == Set((88L, 1L, 3L), (77L, 1L, 9L)),
      "a re-admitted subject's new data must ingest; erased keys stay gone")
  }

  test("a merge WRITES the increment, not the touched bucket " +
    "(LSM delta segments)") {
    val path = tmp()
    // nBuckets = 1: every group lands in ONE bucket — the hot-bucket
    // worst case the LSM tier exists for
    val aBig = spark.range(0, 200)
      .select(col("id").as("okey"), (col("id") % 100).as("cust"))
    val bBig = spark.range(0, 200)
      .select(col("id").as("okey"), lit(2L).as("qty"))
    ViewStore.buildJoinView(aBig, bBig, path, "okey", "cust", "okey", "qty",
      nBuckets = 1, appliedId = Some("b0"))
    ViewStore.mergeIntoJoinView(
      Seq((1000L, 7L)).toDF("okey", "cust"),
      Seq((1000L, 5L)).toDF("okey", "qty"),
      path, "okey", "cust", "okey", "qty", appliedId = Some("b1"))
    // the new generation dir holds ONLY the delta's rows — the 100-key
    // bucket was NOT rewritten (written bytes ∝ the increment)
    assert(spark.read.parquet(s"$path/view/d2").count() == 1L,
      "the view's d2 segment must hold the one changed group")
    assert(spark.read.parquet(s"$path/a/d2").count() == 1L,
      "the a-substore's d2 segment must hold the one new a-row state")
    // the bucket now maps to BOTH segment dirs in the manifest
    val mv = GenStore.read(spark, s"$path/view").get
    assert(mv.entries.map(_._1).distinct.size == 1 && mv.entries.size == 2,
      s"bucket 0 must map to two segments, got ${mv.entries}")
    // folded serving equals the recompute: cust c has okeys {c, c+100},
    // 1 b-row of qty 2 each → (2, 4); cust 7 gains (1000, qty 5)
    val expect = (0L until 100L)
      .map(c => if (c == 7L) (c, 3L, 9L) else (c, 2L, 4L)).toSet
    assert(view(path) == expect, "fold-at-read must equal the eager merge")
  }

  test("segments auto-compact past the threshold; explicit compaction " +
    "folds to one; substores stay gen-aligned throughout") {
    val path = tmp()
    build(path)
    for (i <- 1 to 10)
      ViewStore.mergeIntoJoinView(
        Seq((100L + i, 10L)).toDF("okey", "cust"),
        Seq((100L + i, 1L)).toDF("okey", "qty"),
        path, "okey", "cust", "okey", "qty", appliedId = Some(s"m$i"))
    // ten hot-group merges: state exact, segment fan-out bounded by the
    // auto-compaction threshold
    assert(view(path) == Set((10L, 11L, 15L)),
      s"ten (cnt+1, total+1) increments on (10, 1, 5), got ${view(path)}")
    val mv = GenStore.read(spark, s"$path/view").get
    assert(mv.entries.groupBy(_._1).forall(_._2.size <= 8),
      s"auto-compaction must bound segments at 8, got ${mv.entries}")
    val before = view(path)
    val compacted = ViewStore.compactJoinView(spark, path, maxSegments = 1)
    assert(compacted.exists(_._2 > 0), s"something must fold, got $compacted")
    val mv2 = GenStore.read(spark, s"$path/view").get
    assert(mv2.entries.groupBy(_._1).forall(_._2.size == 1),
      "full compaction must leave single-segment buckets")
    assert(view(path) == before, "compaction must not move the view")
    // every mutation advanced every substore by exactly one generation
    val gens = Seq("view", "a", "b")
      .map(s => GenStore.read(spark, s"$path/$s").get.gen)
    assert(gens.distinct.size == 1,
      s"substores must stay gen-aligned, got $gens")
  }

  test("one-sided and all-zero-delta batches advance every substore in " +
    "lockstep, applied id or not") {
    val path = tmp()
    build(path)
    def gens = Seq("view", "a", "b")
      .map(s => GenStore.read(spark, s"$path/$s").get.gen)
    assert(gens == Seq(1L, 1L, 1L))
    // a-only batch, NO applied id, new key with no b-state: the view's
    // delta is all-zero and b's is empty — BOTH must still commit
    // pointer-only, or the substores drift and batch-relative rollback
    // addresses different batches per substore
    ViewStore.mergeIntoJoinView(
      Seq((50L, 40L)).toDF("okey", "cust"), b1.limit(0),
      path, "okey", "cust", "okey", "qty")
    assert(gens == Seq(2L, 2L, 2L),
      s"a one-sided no-id batch must advance all three, got $gens")
    assert(view(path) == Set((10L, 1L, 5L)),
      "key 50 has no b-state: the view is unchanged")
    // batch-relative rollback stays aligned across the one-sided batch
    ViewStore.rollbackJoinView(spark, path, batchesBack = 1)
    assert(gens == Seq(3L, 3L, 3L) && view(path) == Set((10L, 1L, 5L)))
  }

  test("the LSM merge evaluates a non-trivial delta pipeline exactly once") {
    // r20 optimization pin: mergeAdditive consumes its delta twice (the
    // touched-bucket collect and the segment write) — an expensive delta
    // pipeline must be materialized once, never re-run per consumer. The
    // accumulator counts per-row evaluations of the pipeline BELOW the
    // delta's aggregate; a regression to lazy re-evaluation doubles it.
    import org.apache.spark.sql.functions.{col, sum, udf}
    val sub = java.nio.file.Files
      .createTempDirectory("graft_vs_once_").toString + "/sub"
    GenStore.commitGen(spark, sub,
      Seq((1L, 10L)).toDF("key", "v"), 4, Seq.empty, 0L, Seq.empty, None)
    val acc = spark.sparkContext.longAccumulator("delta-evals")
    val counted = udf((v: Long) => { acc.add(1L); v })
    val delta = Seq((1L, 5L), (2L, 7L), (2L, 3L)).toDF("key", "raw")
      .select(col("key"), counted(col("raw")).as("raw"))
      .groupBy(col("key")).agg(sum(col("raw")).as("v"))
    GenStore.mergeAdditive(spark, sub, delta, Seq("key"), Seq("v"), None)
    assert(acc.value == 3L,
      s"the delta pipeline must run exactly once (3 input rows), " +
        s"got ${acc.value} per-row evaluations")
    val state = GenStore.foldRead(spark, sub,
      GenStore.read(spark, sub).get.entries, Seq("key"), Seq("v"))
      .as[(Long, Long)].collect().toSet
    assert(state == Set((1L, 15L), (2L, 10L)),
      "single-evaluation must not change the folded state")
  }

  test("buildJoinView evaluates each raw side exactly once") {
    // r20 optimization pin: the three substore commits (view, a, b) read
    // the side aggregates — a lazy aggA/aggB re-ran each raw side twice
    // per build (once under the view's contributions join, once under
    // its own commit). The accumulator counts raw a-side row reads. The
    // side is PARQUET-BACKED on purpose: over a LocalRelation the
    // optimizer's ConvertToLocalRelation evaluates the probe at
    // plan time once per derived Dataset and the count would measure
    // optimizer runs, not data passes.
    import org.apache.spark.sql.functions.{col, udf}
    val path = tmp()
    val aPath = java.nio.file.Files
      .createTempDirectory("graft_vs_side_").toString + "/a"
    a1.write.parquet(aPath)
    val acc = spark.sparkContext.longAccumulator("a-side-evals")
    val counted = udf((v: Long) => { acc.add(1L); v })
    val aInstr = spark.read.parquet(aPath)
      .select(counted(col("okey")).as("okey"), col("cust"))
    ViewStore.buildJoinView(aInstr, b1, path, "okey", "cust", "okey", "qty",
      nBuckets = 4)
    assert(acc.value == 2L,
      s"the raw a-side (2 rows) must be read exactly once per build, " +
        s"got ${acc.value} per-row evaluations")
    assert(view(path) == Set((10L, 1L, 5L)),
      "single-evaluation must not change the built view")
  }
}
