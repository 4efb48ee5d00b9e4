package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Chunker, LmScore}
import graft.queries.Registry

/** Physical-plan regression pins for the hot queries.
  *
  * The round-over-round perf story otherwise rests entirely on wall-clock,
  * which contention noise can hide regressions inside: a broadcast hint
  * silently lost to a sort-merge join, the chunker regaining a shuffle, or
  * exchange reuse breaking would each cost multiples at 100 TB while moving
  * a local benchmark by fractions of a second. These asserts fail the build
  * instead. AQE is disabled per-assert so the compile-time plan shape (what
  * ships to a cluster) is what's pinned, not a runtime re-plan of sf0.001
  * row counts.
  */
class PlanSpec extends SparkSpec {

  private val registry = Registry.queries

  private def withoutAqe[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def plan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan
  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case e: ShuffleExchangeExec => e }

  test("q02/q25: dimension joins stay broadcast, never sort-merge") {
    withoutAqe {
      for (name <- Seq("q02_market_share", "q25_nation_volume")) {
        val p = plan(registry(name)(spark, sfDir))
        val bhj = p.collect { case j: BroadcastHashJoinExec => j }
        val smj = p.collect { case j: SortMergeJoinExec => j }
        assert(bhj.size >= 3, s"$name: expected >=3 broadcast joins, got ${bhj.size}")
        assert(smj.isEmpty, s"$name: broadcast hint degraded to sort-merge join:\n$p")
      }
    }
  }

  test("q03: top-10 aggregate runs BELOW the orders join (join touches 10 rows)") {
    withoutAqe {
      val p = plan(registry("q03_revenue_topn")(spark, sfDir))
      val joins = p.collect { case j: BroadcastHashJoinExec => j }
      assert(joins.nonEmpty, s"q03: orders join must be broadcast, got:\n$p")
      assert(joins.exists(_.children.exists(
          _.collectFirst { case t: TakeOrderedAndProjectExec => t }.isDefined)),
        s"q03: the TakeOrdered top-10 must sit under the join, not above it:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty)
    }
  }

  test("q55 chunker: zero shuffles end-to-end") {
    withoutAqe {
      val docs = Tables(spark, sfDir, "documents")
      val p = plan(Chunker.split(docs, "text", chunkSize = 30, overlap = 5)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text")))
      assert(shuffles(p).isEmpty, s"chunker must stay shuffle-free:\n$p")
    }
  }

  test("BM25/LmScore: postings exchange is built once and reused") {
    withoutAqe {
      val docs = Tables(spark, sfDir, "documents")
      import spark.implicits._
      val queries = Seq((1L, "spark data"), (2L, "model training"))
        .toDF("qid", "qtext")
      val bm25 = plan(Bm25.search(docs, "doc_id", "text", queries, "qid", "qtext"))
      assert(bm25.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        s"BM25: dl must reuse tf's exchange (single tokenize pass):\n$bm25")
      val lm = plan(LmScore.bigramNll(docs, "doc_id", "text"))
      assert(lm.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        s"LmScore: vocab must reuse c2's exchange:\n$lm")
    }
  }

  test("q99 IVF-PQ: probed side broadcasts, encoded corpus never sort-merges") {
    withoutAqe {
      val p = plan(registry("q99_ivfpq_ann")(spark, sfDir))
      assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"q99: probed (query, cell, dt) side must broadcast into the codes join:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"q99: encoded corpus must not shuffle for the query:\n$p")
    }
  }

  test("q109 dup-spans: salted two-level counts, no gram-partitioned window, one tokenize") {
    withoutAqe {
      val p = plan(registry("q109_dup_spans")(spark, sfDir))
      val scans = p.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      // one wide scan feeds the exploded windows; the second reads only
      // doc_id for the zero-window-doc roster
      assert(scans.size <= 2, s"q109: gram stats must not rescan the corpus:\n$p")
      // the 100 TB skew hazard: a raw Window.partitionBy(g) puts every
      // occurrence of one boilerplate span in a single unsplittable task;
      // the (g, doc) pre-aggregate + sum-by-g + join-back shape must hold
      assert(p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        s"q109: gram counts regained an unsalted window partition:\n$p")
      assert(p.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        s"q109: gtot and the join-back must consume the SAME (g, doc) aggregate:\n$p")
    }
  }

  test("dup-spans: a corpus-dominating span never rides a window partition") {
    withoutAqe {
      import spark.implicits._
      // 40 documents all sharing one 10-token boilerplate span (the license-
      // header shape), plus distinct tails — the hot-gram case that must
      // spread across the (g, doc) salt instead of one window partition
      val boiler = (1 to 10).map(i => s"tok$i").mkString(" ")
      val docs = (1 to 40).map(i => (i.toLong, s"$boiler unique$i trail$i")).toDF("id", "text")
      val out = graft.operators.QualityFilters.duplicatedSpans(docs, "id", "text", k = 10)
      val p = plan(out)
      assert(p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
        s"dominating gram landed in a window partition:\n$p")
      // every doc has 3 windows; the boilerplate window [tok1..tok10] is
      // corpus-duplicated, the two windows overlapping uniqueN/trailN are not
      val rows = out.orderBy($"id").collect()
      assert(rows.length == 40)
      assert(rows.forall(r => r.getAs[Long]("n_win") == 3L && r.getAs[Long]("n_dup") == 1L),
        s"expected n_win=3, n_dup=1 per doc, got:\n${rows.take(5).mkString("\n")}")
    }
  }

  test("IVF-PQ serving layout: scan lists only probed cells, corpus side never shuffles") {
    withoutAqe {
      import graft.operators.Similarity
      val emb = Tables(spark, sfDir, "embeddings")
      val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      // 2 queries x 4 probes <= 8 of 16 cells: pruning is visible
      val queries = emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val nCells = 16; val nProbe = 4
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx_").toString

      Similarity.buildIvfPqIndex(corpus, tmp, nCells = nCells)
      val served = Similarity.serveIvfPq(spark, tmp, queries, k = 5, nProbe = nProbe)

      // 1. the plan pins it: the codes scan carries a partition filter and
      // feeds a broadcast join — no sort-merge, no exchange of the corpus
      val p = plan(served)
      val scans = p.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      val codesScan = scans.find(
        _.relation.location.rootPaths.exists(_.toString.contains("codes")))
      assert(codesScan.exists(_.partitionFilters.nonEmpty),
        s"serving scan must push the probed-cell partition filter:\n$p")
      // 2. partition pruning is REAL: execute once and read the scan's
      // driver metric — at most |queries| x nProbe of the nCells cell=
      // directories are listed. The 100 TB claim is exactly that the
      // corpus outside the probed cells is never read
      served.collect()
      val nRead = codesScan.get.metrics("numPartitions").value
      assert(nRead > 0 && nRead <= 2 * nProbe && nRead < nCells,
        s"scan must list only probed cells, read $nRead of $nCells")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"encoded corpus must never sort-merge on the serving path:\n$p")
      assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty)
      // 3. served answers == the inline operator (same seeds, same ranking)
      val inline = Similarity.ivfPqTopK(queries, corpus, k = 5,
        nCells = nCells, nProbe = nProbe)
      val a = served.orderBy(col("qid"), col("rn")).collect().toSeq
      val b = inline.orderBy(col("qid"), col("rn")).collect().toSeq
      assert(a == b, s"served results must match the inline operator:\n$a\nvs\n$b")
    }
  }

  test("IVF-PQ incremental append: chunked == one-shot, appends land in their " +
      "own directories for exactly the increment's cells, base files untouched") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val t1 = java.nio.file.Files.createTempDirectory("graft_inc1_").toString
    val t2 = java.nio.file.Files.createTempDirectory("graft_inc2_").toString
    Similarity.buildIvfPqIndex(base, t1)
    Similarity.buildIvfPqIndex(base, t2)
    // files present before the append — the append must not rewrite them
    def files(p: String) = new java.io.File(s"$p/codes").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getPath, f.lastModified(), f.length())).toSet
    val before = files(t1)
    // one-shot vs two-chunk append: final code rows must be identical
    Similarity.appendToIvfPqIndex(inc, t1)
    Similarity.appendToIvfPqIndex(inc.filter(col("nid") % 2 === 0), t2)
    Similarity.appendToIvfPqIndex(inc.filter(col("nid") % 2 =!= 0), t2)
    def codeRows(p: String) = Similarity.readIvfPqCodes(spark, p)
      .select(col("nid"), col("codes"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
    val (r1, r2) = (codeRows(t1), codeRows(t2))
    assert(r1 == r2, "chunked append must equal one-shot append")
    assert(r1.size == base.count() + inc.count(), "every vector indexed once")
    assert(files(t1) == before,
      "append must land in its own directory, never touch the base build's files")
    // appended rows are encoded with the FROZEN constants: cells touched
    // by the increment are exactly the increment's assignment cells
    val incCells = r1.filter(t => t._1 % 3 == 0).map(_._3)
    val newDirs = new java.io.File(s"$t1/appends").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).filter(_.isDirectory)
      .map(_.getName.stripPrefix("cell=").toInt).toSet
    assert(newDirs == incCells, s"new files in $newDirs but increment cells $incCells")
  }

  test("IVF-PQ append replay: a crashed-and-retried append with a stable " +
      "appendId is exactly-once; served answers carry no duplicate slots") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val once = java.nio.file.Files.createTempDirectory("graft_replay1_").toString
    val twice = java.nio.file.Files.createTempDirectory("graft_replay2_").toString
    Similarity.buildIvfPqIndex(base, once)
    Similarity.buildIvfPqIndex(base, twice)
    Similarity.appendToIvfPqIndex(inc, once, appendId = "day1")
    Similarity.appendToIvfPqIndex(inc, twice, appendId = "day1")
    Similarity.appendToIvfPqIndex(inc, twice, appendId = "day1") // the replay
    def state(p: String) = Similarity.readIvfPqCodes(spark, p)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getInt(2))).toSet
    assert(state(once) == state(twice),
      "replayed append must leave the index bit-identical to a single append")
    assert(state(twice).size == base.count() + inc.count(),
      "replay must not double-index any vector")
    val a = Similarity.serveIvfPq(spark, once, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val b = Similarity.serveIvfPq(spark, twice, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(a == b, "served answers must be unchanged by the replay")
    b.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (k2, v) =>
      assert(v.size == 1, s"candidate $k2 occupies ${v.size} result slots")
    }
  }

  test("IVF-PQ delete lifecycle: tombstoned serve == compacted serve; " +
      "emptied cells leave the catalog; reader isolation — every pre-compaction " +
      "file survives byte-identical for in-flight readers") {
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_del_").toString
    Similarity.buildIvfPqIndex(corpus, tmp)
    def files() = new java.io.File(s"$tmp/codes").listFiles()
      .filter(_.isDirectory).flatMap(d => d.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (d.getName, (f.getPath, f.lastModified(), f.length()))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def liveRows() = Similarity.readIvfPqCodes(spark, tmp)
      .select(col("nid"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val before = files()
    val codes0 = liveRows()
    // a reader that resolved the catalog BEFORE the compaction: it scans
    // these exact rows and must keep seeing them afterwards
    val preReaderRows = spark.read.parquet(s"$tmp/codes")
      .select(col("nid")).collect().map(_.getLong(0)).toSet
    // kill one whole cell plus every 7th id: exercises both the rewrite
    // path and the emptied-cell catalog drop
    val victimCell = codes0.groupBy(_._2).minBy(_._2.length)._1
    val dead = (codes0.filter(_._2 == victimCell).map(_._1) ++
      codes0.map(_._1).filter(_ % 7 == 0)).distinct
    Similarity.tombstoneIvfPq(dead.toSeq.toDF("nid"), tmp)
    val logical = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(logical.nonEmpty &&
      !logical.exists(r => dead.contains(r.getLong(1))),
      "tombstoned ids must stop being served immediately")
    Similarity.compactIvfPqIndex(spark, tmp)
    val physical = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(logical == physical, "compaction must not change served answers")
    assert(!new java.io.File(s"$tmp/tombstones").exists(),
      "compaction must clear the tombstone log")
    // reader isolation: compaction writes a FRESH directory and remaps —
    // it never mutates a file the previous catalog referenced, so the
    // in-flight reader's scan is still byte-identical
    assert(files() == before,
      "compaction must never rewrite or delete previously-referenced files")
    assert(spark.read.parquet(s"$tmp/codes").select(col("nid"))
      .collect().map(_.getLong(0)).toSet == preReaderRows,
      "a reader holding the pre-compaction catalog must see the old rows intact")
    // the LIVE view: dead rows gone, emptied cell out of the catalog
    val left = liveRows()
    assert(!left.map(_._2).contains(victimCell),
      "a cell whose every row died must leave the live catalog")
    assert(left.map(_._1).toSet.intersect(dead.toSet).isEmpty &&
      left.length == codes0.length - dead.length,
      "compaction must drop exactly the tombstoned rows")
  }

  test("IVF-PQ rebuild: manifest swap is the cutover; old layout untouched; " +
      "rebuilt serve == monolithic build; versions accumulate") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val full = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rebuild_").toString
    Similarity.buildIvfPqIndex(base, tmp)
    Similarity.appendToIvfPqIndex(inc, tmp)
    def legacyFiles() = new java.io.File(s"$tmp/codes").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getPath, f.lastModified(), f.length())).toSet
    val before = legacyFiles()
    val v1 = Similarity.rebuildIvfPqIndex(full, tmp)
    assert(v1 == "v1", s"first rebuild must version to v1, got $v1")
    val manifest = scala.io.Source.fromFile(s"$tmp/CURRENT").mkString.trim
    assert(manifest == "v1", s"CURRENT must name the new version, got '$manifest'")
    // the old flat layout is byte-for-byte untouched: a reader that
    // resolved the root before the swap keeps scanning consistent files
    assert(legacyFiles() == before,
      "rebuild must never mutate the previous version's files")
    // rebuilt serve == monolithic build on the same corpus (same seeds,
    // same sample discipline) — the drift is gone
    val mono = java.nio.file.Files.createTempDirectory("graft_rebuild_mono_").toString
    Similarity.buildIvfPqIndex(full, mono)
    val a = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val b = Similarity.serveIvfPq(spark, mono, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(a == b, "rebuilt index must serve exactly the monolithic build's answers")
    // versions accumulate: a second rebuild lands in v2, v1 stays intact,
    // and post-swap appends resolve into the CURRENT version only
    val v2 = Similarity.rebuildIvfPqIndex(full, tmp)
    assert(v2 == "v2" && new java.io.File(s"$tmp/v1/codes").exists(),
      "second rebuild must version to v2 and leave v1 on disk")
    // the flat-era append dir predates the rebuild; the post-swap append
    // must land under v2, adding nothing to the old layouts
    val flatAppendDirs = new java.io.File(s"$tmp/appends").listFiles().length
    Similarity.appendToIvfPqIndex(
      emb.filter(col("vec_id") < 2).select(
        (col("vec_id") + 1000000L).as("nid"), col("embedding").as("ne")), tmp)
    assert(new java.io.File(s"$tmp/v2/appends").exists() &&
      new java.io.File(s"$tmp/appends").listFiles().length == flatAppendDirs &&
      !new java.io.File(s"$tmp/v1/appends").exists() &&
      legacyFiles() == before,
      "append must land in the CURRENT version, not an old layout")
    assert(Similarity.readIvfPqCodes(spark, tmp)
      .filter(col("nid") >= 1000000L).count() == 2,
      "the post-swap append must be visible through the CURRENT version")
    // retention GC: vacuum(keep = 1) reclaims v1, keeps v2, serve unaffected
    val servedPre = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val deleted = Similarity.vacuumIvfPqVersions(spark, tmp, keep = 1)
    assert(deleted == Seq("v1") && !new java.io.File(s"$tmp/v1").exists() &&
      new java.io.File(s"$tmp/v2/codes").exists(),
      s"vacuum must delete exactly the versions past retention, got $deleted")
    val servedPost = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    assert(servedPre == servedPost, "vacuum must not change served answers")
    assert(Similarity.vacuumIvfPqVersions(spark, tmp, keep = 1).isEmpty,
      "a second vacuum at the same retention must be a no-op")
  }

  test("IVF-PQ delete-then-reinsert: the generation fence serves the " +
      "reinserted vector immediately, keeps every pre-delete copy dead, and " +
      "compaction keeps exactly the reinserted row") {
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_reinsert_").toString
    // build WITH the victim's original vector, delete it plus a plain id,
    // then re-append the victim with a DIFFERENT vector — the hard case:
    // the stale pre-delete row stays physically on disk until compaction
    val victim = 42L
    Similarity.buildIvfPqIndex(corpus, tmp)
    Similarity.tombstoneIvfPq(Seq(victim, 7L).toDF("nid"), tmp)
    val reinserted = corpus.filter(col("nid") === victim)
      .select(col("nid"),
        transform(col("ne").cast("array<double>"),
          x => x * lit(0.5) + lit(0.25)).as("ne"))
    Similarity.appendToIvfPqIndex(reinserted, tmp, appendId = "reinsert")
    // the log is NOT rewritten — both tombstones remain, fence-generation'd
    assert(spark.read.parquet(s"$tmp/tombstones")
      .select(col("nid")).collect().map(_.getLong(0)).toSet == Set(victim, 7L),
      "the fence design never rewrites the tombstone log on append")
    // the appended row's codes are the truth the lifecycle must preserve
    val newRow = spark.read.parquet(s"$tmp/appends/reinsert")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    assert(newRow.size == 1 && newRow.head._1 == victim)
    // served: 7 is gone, the victim is alive (out-generations its tombstone)
    // probe every cell so candidate coverage is total, not probe-dependent
    val servedPre = Similarity.serveIvfPq(spark, tmp, queries, k = 1000, nProbe = 16)
      .select(col("nid")).collect().map(_.getLong(0)).toSet
    assert(servedPre.contains(victim) && !servedPre.contains(7L),
      "reinsert must serve immediately; the plain delete must not")
    Similarity.compactIvfPqIndex(spark, tmp)
    assert(!new java.io.File(s"$tmp/tombstones").exists())
    // exactly ONE live row for the victim, and it is the REINSERTED one —
    // the pre-delete copy is physically gone
    val live = Similarity.readIvfPqCodes(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toList
    val victimRows = live.filter(_._1 == victim)
    assert(victimRows.size == 1 && victimRows.head._2 == newRow.head._2,
      s"compaction must keep exactly the reinserted row, got $victimRows")
    assert(!live.exists(_._1 == 7L), "the plain delete must be physical now")
    val servedPost = Similarity.serveIvfPq(spark, tmp, queries, k = 1000, nProbe = 16)
      .select(col("nid")).collect().map(_.getLong(0)).toSet
    assert(servedPost == servedPre, "compaction must not change served ids")
  }

  test("IVF-PQ drift-triggered rebuild: a planted shifted increment fires the " +
      "retrain; a no-drift corpus provably skips it") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    // the VectorFnsSpec 3x+2 fixture pattern: walk the increment's
    // distribution far from the training sample
    val shifted = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"),
        transform(col("embedding").cast("array<double>"),
          x => x * lit(3.0) + lit(2.0)).as("ne"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift_fire_").toString
    Similarity.buildIvfPqIndex(base, tmp)
    Similarity.appendToIvfPqIndex(shifted, tmp)
    val live = base.withColumn("cohort", lit("base"))
      .unionByName(shifted.withColumn("cohort", lit("increment")))
    val fired = Similarity.rebuildIfDrifted(live, tmp, "cohort").collect()(0)
    assert(fired.getBoolean(0) && fired.getString(4) == "v1",
      s"a 3x+2 shifted increment must fire the rebuild, got $fired")
    assert(fired.getLong(3) > 2000000L,
      s"the fired ratio must exceed the 2x default threshold, got ${fired.getLong(3)}")
    // the rebuilt index serves the monolithic full-live-corpus build's answers
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val mono = java.nio.file.Files.createTempDirectory("graft_drift_mono_").toString
    Similarity.buildIvfPqIndex(
      base.unionByName(shifted.select(col("nid"), col("ne"))), mono)
    assert(Similarity.serveIvfPq(spark, tmp, queries, k = 5)
        .orderBy(col("qid"), col("rn")).collect().toSeq ==
      Similarity.serveIvfPq(spark, mono, queries, k = 5)
        .orderBy(col("qid"), col("rn")).collect().toSeq,
      "the fired rebuild must serve the monolithic build's answers")
    // no drift: an i.i.d. increment of the same distribution skips
    val skipTmp = java.nio.file.Files.createTempDirectory("graft_drift_skip_").toString
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    Similarity.buildIvfPqIndex(base, skipTmp)
    Similarity.appendToIvfPqIndex(inc, skipTmp)
    val calm = base.withColumn("cohort", lit("base"))
      .unionByName(inc.withColumn("cohort", lit("increment")))
    val skipped = Similarity.rebuildIfDrifted(calm, skipTmp, "cohort").collect()(0)
    assert(!skipped.getBoolean(0) && skipped.getString(4) == "flat",
      s"an i.i.d. increment must not fire the rebuild, got $skipped")
    assert(!new java.io.File(s"$skipTmp/CURRENT").exists(),
      "a skipped rebuild must leave the index unversioned and untouched")
  }

  test("cluster store merge: only buckets holding merged labels gain a new " +
      "generation; emptied buckets leave the manifest; old files stay " +
      "byte-identical for in-flight readers; labels always equal a full recompute") {
    import graft.operators.Dedup
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cstore_")
      .toString + "/labels"
    // three 2-node components: labels 1 (bucket 1), 10 (bucket 2), 20 (bucket 4)
    Dedup.buildClusterStore(
      Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    // every parquet file across all generation dirs, keyed by (gen, bucket)
    def files() = new java.io.File(tmp).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("d"))
      .flatMap(g => g.listFiles().filter(_.isDirectory).map(b =>
        (g.getName, b.getName) -> b.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.lastModified(), f.length())).toSet)).toMap
    def manifest() = Dedup.readStoreManifest(spark, tmp).get
    def liveBuckets() = manifest().entries.map(_._1).toSet
    def stored() = Dedup.readClusterStore(spark, tmp)
      .as[(Long, Long)].collect().toSet
    def full(pairs: Seq[(Long, Long)]) = Dedup
      .connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toSet
    val before = files()
    val storedBefore = stored()
    val manifestBefore = manifest()
    // day 1: fresh node 30 joins component 1; fresh pair (40,41) founds a
    // new component — components 10 and 20 are not involved
    val day1 = Seq((2L, 30L), (40L, 41L))
    Dedup.mergeIntoClusterStore(day1.toDF("id_a", "id_b"), tmp, nBuckets = 8)
    val after1 = files()
    assert(before.forall { case (k, v) => after1(k) == v },
      "a merge must never rewrite or delete an existing generation's files")
    assert(manifest().entries.filter(e => Set(2L, 4L)(e._1)) ==
      manifestBefore.entries.filter(e => Set(2L, 4L)(e._1)),
      "buckets of untouched components must keep their manifest entries")
    // reader isolation: a reader that resolved the pre-merge manifest
    // scans exactly the pre-merge rows — its generation dirs are intact
    val oldView = manifestBefore.entries.groupBy(_._2).toSeq.map { case (d, es) =>
      spark.read.option("basePath", s"$tmp/$d").parquet(s"$tmp/$d")
        .where(col("bucket").isin(es.map(_._1).map(Long.box): _*))
    }.reduce(_.unionByName(_)).select(col("id"), col("label"))
      .as[(Long, Long)].collect().toSet
    assert(oldView == storedBefore,
      "a reader holding the pre-merge manifest must see the old labels intact")
    val all1 = Seq((1L, 2L), (10L, 11L), (20L, 21L)) ++ day1
    assert(stored() == full(all1), "incremental labels must equal a full recompute")
    // day 2: the bridge (11,21) merges components 10 and 20 into label 10 —
    // bucket 4 empties (its rows migrate to bucket 2) and must leave the manifest
    val manifest1 = manifest()
    Dedup.mergeIntoClusterStore(Seq((11L, 21L)).toDF("id_a", "id_b"), tmp,
      nBuckets = 8)
    assert(!liveBuckets().contains(4L),
      "a bucket whose every row migrated out must leave the manifest")
    val after2 = files()
    assert(after1.forall { case (k, v) => after2(k) == v },
      "the merge of 10/20 must not rewrite existing files of 1 or 40")
    assert(manifest().entries.filter(e => Set(0L, 1L)(e._1)) ==
      manifest1.entries.filter(e => Set(0L, 1L)(e._1)),
      "the merge of 10/20 must not remap components 1 or 40")
    assert(stored() == full(all1 :+ (11L, 21L)))
    // a pair INSIDE one component is a no-op: zero files, zero manifest churn
    val snap = files()
    val snapManifest = manifest()
    Dedup.mergeIntoClusterStore(Seq((1L, 30L)).toDF("id_a", "id_b"), tmp,
      nBuckets = 8)
    assert(files() == snap && manifest() == snapManifest,
      "an intra-component pair must write nothing")
    // retention GC: after day 2 every d1 bucket has been remapped (b1 day 1,
    // b2 day 2) or dropped (b4) — d1 is unreferenced and reclaimable
    val labelsPre = stored()
    val vacuumed = Dedup.vacuumClusterStore(spark, tmp)
    assert(vacuumed == Seq("d1", "manifests/1", "manifests/2") &&
      !new java.io.File(s"$tmp/d1").exists(),
      s"keepGens=1 vacuum must reclaim the unreferenced generation AND " +
        s"retire the archived history, got $vacuumed")
    assert(stored() == labelsPre, "vacuum must not change the live labels")
    assert(Dedup.vacuumClusterStore(spark, tmp).isEmpty,
      "a second vacuum must be a no-op")
  }

  test("cluster-store time travel: every committed generation reads back " +
      "byte-exact through its archived manifest, retention bounds the " +
      "window, and a vacuumed generation fails loudly") {
    import graft.operators.Dedup
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ctt_").toString + "/labels"
    def stored() = Dedup.readClusterStore(spark, tmp)
      .as[(Long, Long)].collect().toSet
    def asOf(g: Long) = Dedup.readClusterStoreAsOf(spark, tmp, g)
      .as[(Long, Long)].collect().toSet
    // gen 1: three 2-node components; gen 2: growth + a new component;
    // gen 3: the bridge merge (the reader-isolation fixture's history)
    Dedup.buildClusterStore(
      Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    val atG1 = stored()
    Dedup.mergeIntoClusterStore(
      Seq((2L, 30L), (40L, 41L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    val atG2 = stored()
    Dedup.mergeIntoClusterStore(
      Seq((11L, 21L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    val atG3 = stored()
    assert(Dedup.readStoreManifest(spark, tmp).get.gen == 3L)
    // every generation resolves to exactly the state it committed
    assert(asOf(3L) == atG3, "as-of CURRENT must equal the live read")
    assert(asOf(2L) == atG2, "as-of 2 must reproduce the pre-bridge labels")
    assert(asOf(1L) == atG1, "as-of 1 must reproduce the built labels")
    intercept[IllegalArgumentException](asOf(4L)) // the future
    // keepGens=2 keeps the time-travel window at {2, 3}: manifests/1 is
    // retired, but every dir manifest 2 references stays alive
    val v2 = Dedup.vacuumClusterStore(spark, tmp, keepGens = 2)
    assert(v2 == Seq("manifests/1"),
      s"keepGens=2 must retire only the oldest manifest here, got $v2")
    assert(asOf(2L) == atG2, "the retained window must survive the vacuum")
    intercept[IllegalArgumentException](asOf(1L))
    assert(stored() == atG3, "vacuum must never move the live read")
    // keepGens=1 collapses to CURRENT-only: manifests/2 and the now-
    // unreferenced d1 go; as-of 2 fails loudly; the live read is intact
    val v1 = Dedup.vacuumClusterStore(spark, tmp)
    assert(v1.contains("manifests/2") && v1.contains("d1"),
      s"keepGens=1 must retire the remaining history and its dirs, got $v1")
    intercept[IllegalArgumentException](asOf(2L))
    assert(asOf(3L) == atG3 && stored() == atG3)
  }

  test("cluster-store generation diff: added/moved/removed exact in both " +
      "directions, self-diff empty, and the scan touches ONLY buckets " +
      "whose manifest entries differ") {
    import graft.operators.Dedup
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdiff_").toString + "/labels"
    def diff(a: Long, b: Long) = Dedup.diffClusterStore(spark, tmp, a, b)
    def rows(a: Long, b: Long) = diff(a, b)
      .as[(Long, Option[Long], Option[Long], String)].collect().toSet
    // the time-travel fixture's history: gen 1 three 2-node components,
    // gen 2 growth + a new component, gen 3 the bridge merge
    Dedup.buildClusterStore(
      Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    Dedup.mergeIntoClusterStore(
      Seq((2L, 30L), (40L, 41L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    Dedup.mergeIntoClusterStore(
      Seq((11L, 21L)).toDF("id_a", "id_b"), tmp, nBuckets = 8)
    assert(rows(2L, 3L) == Set(
      (20L, Some(20L), Some(10L), "moved"),
      (21L, Some(20L), Some(10L), "moved")),
      "the bridge merge must read back as exactly its two relabels")
    assert(rows(1L, 2L) == Set(
      (30L, None, Some(1L), "added"),
      (40L, None, Some(40L), "added"),
      (41L, None, Some(40L), "added")),
      "the growth merge must read back as exactly its three inserts")
    assert(rows(1L, 3L) == Set(
      (30L, None, Some(1L), "added"),
      (40L, None, Some(40L), "added"),
      (41L, None, Some(40L), "added"),
      (20L, Some(20L), Some(10L), "moved"),
      (21L, Some(20L), Some(10L), "moved")),
      "a multi-generation diff must compose both mutations")
    // the diff is directional: swapping the roles flips added <-> removed
    assert(rows(3L, 1L) == Set(
      (30L, Some(1L), None, "removed"),
      (40L, Some(40L), None, "removed"),
      (41L, Some(40L), None, "removed"),
      (20L, Some(10L), Some(20L), "moved"),
      (21L, Some(10L), Some(20L), "moved")),
      "the reverse diff must flip added to removed and swap labels")
    assert(diff(3L, 3L).isEmpty && diff(1L, 1L).isEmpty,
      "a self-diff must be empty")
    // the manifest-pruning pin: gens 2 and 3 differ only in the buckets
    // of labels 20 (moved-from, emptied) and 10 (moved-to) — every file
    // the diff plan reads must live under those two bucket partitions
    val scanned = diff(2L, 3L).inputFiles.toSeq
    assert(scanned.nonEmpty &&
      scanned.forall(f => f.contains("/bucket=2/") || f.contains("/bucket=4/")),
      s"diff must scan only entry-differing buckets, scanned: $scanned")
    // reverse-diff of the two merges plants a removed row in a bucket one
    // side lacks entirely — the one-sided-empty read path
    assert(rows(2L, 1L) == Set(
      (30L, Some(1L), None, "removed"),
      (40L, Some(40L), None, "removed"),
      (41L, Some(40L), None, "removed")))
  }

  test("aggregate store: merges rewrite only touched buckets, replayed " +
      "appliedIds are detected no-ops, half-landed staging retries commit " +
      "once, and time travel / diff / vacuum compose") {
    import graft.operators.AggStore
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_aggs_").toString + "/aggs"
    def files() = new java.io.File(tmp).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("d"))
      .flatMap(g => g.listFiles().filter(_.isDirectory).map(b =>
        (g.getName, b.getName) -> b.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.lastModified(), f.length())).toSet)).toMap
    def state() = AggStore.readAggStore(spark, tmp)
      .as[(Long, Long, Long)].collect().toSet
    AggStore.buildAggStore(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (1L, 5L)).toDF("k", "v"),
      tmp, "k", "v", nBuckets = 8)
    val atG1 = state()
    assert(atG1 == Set((1L, 2L, 15L), (2L, 1L, 20L), (3L, 1L, 30L), (4L, 1L, 40L)))
    val before = files()
    AggStore.mergeIntoAggStore(Seq((2L, 7L), (9L, 1L)).toDF("k", "v"),
      tmp, "k", "v", appliedId = Some("day-1"))
    val atG2 = state()
    assert(atG2 == Set((1L, 2L, 15L), (2L, 2L, 27L), (3L, 1L, 30L),
      (4L, 1L, 40L), (9L, 1L, 1L)),
      "counts add, sums add, untouched keys carry, new keys insert")
    assert(before.forall { case (k, v) => files()(k) == v },
      "a merge must never rewrite or delete an existing generation's files")
    // committed replay: the appliedId is in the ledger — byte-identical
    // manifest, no new generation, state untouched
    val manifestBytes = scala.io.Source.fromFile(s"$tmp/CURRENT").mkString
    AggStore.mergeIntoAggStore(Seq((2L, 100L)).toDF("k", "v"),
      tmp, "k", "v", appliedId = Some("day-1"))
    assert(scala.io.Source.fromFile(s"$tmp/CURRENT").mkString == manifestBytes &&
      state() == atG2, "a replayed appliedId must be a detected no-op")
    // half-landed staging: junk d3 exists (crash mid-write), the manifest
    // never saw it — the retry overwrites in place and commits exactly once
    Seq((999L, 999L, 999L)).toDF("key", "cnt", "total")
      .withColumn("bucket", lit(0L))
      .write.partitionBy("bucket").parquet(s"$tmp/d3")
    AggStore.mergeIntoAggStore(Seq((3L, 3L)).toDF("k", "v"),
      tmp, "k", "v", appliedId = Some("day-2"))
    val atG3 = state()
    assert(!atG3.exists(_._1 == 999L) &&
      atG3 == atG2.filterNot(_._1 == 3L) + ((3L, 2L, 33L)),
      "the junk staging must be overwritten, never served")
    // time travel: every committed generation reads back exactly
    assert(AggStore.readAggStoreAsOf(spark, tmp, 1L)
      .as[(Long, Long, Long)].collect().toSet == atG1)
    assert(AggStore.readAggStoreAsOf(spark, tmp, 2L)
      .as[(Long, Long, Long)].collect().toSet == atG2)
    // manifest-pruned diff: exactly the day-1 insert + change
    val d12 = AggStore.diffAggStore(spark, tmp, 1L, 2L)
      .select(col("key"), col("cnt_b"), col("total_b"), col("change"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(d12 == Set((2L, 2L, 27L, "changed"), (9L, 1L, 1L, "added")),
      s"diff must read back exactly the merge's effect, got $d12")
    // retention: keepGens=1 trims the history; live state untouched
    val v = AggStore.vacuumAggStore(spark, tmp)
    assert(v.contains("manifests/1") && v.contains("manifests/2"),
      s"vacuum must retire the archived history, got $v")
    intercept[IllegalArgumentException](
      AggStore.readAggStoreAsOf(spark, tmp, 1L))
    assert(state() == atG3, "vacuum must never move the live read")
    // null keys fail LOUDLY inside the write job (they could never fold:
    // null does not join to itself) — and the store is left untouched
    val boom = intercept[Exception](
      AggStore.mergeIntoAggStore(
        Seq((Some(7L), 1L), (None, 1L)).toDF("k", "v"), tmp, "k", "v"))
    assert(boom.getMessage != null || boom.getCause != null)
    assert(state() == atG3, "a rejected null-key merge must not commit")
  }

  test("store rollback: pointer-only (no data file is written or touched), " +
      "the ledger reverts with the state so the reverted batch re-applies, " +
      "the bad state stays archived and diffable, and vacuum reclaims it") {
    import graft.operators.AggStore
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rb_").toString + "/aggs"
    def allFiles() = new java.io.File(tmp).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("d"))
      .flatMap(g => g.listFiles().filter(_.isDirectory).flatMap(_.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length())))).toSet
    def state() = AggStore.readAggStore(spark, tmp)
      .as[(Long, Long, Long)].collect().toSet
    AggStore.buildAggStore(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      tmp, "k", "v", nBuckets = 8)                                 // gen 1
    val atG1 = state()
    AggStore.mergeIntoAggStore(Seq((1L, 777L)).toDF("k", "v"),     // gen 2: BAD
      tmp, "k", "v", appliedId = Some("day-1"))
    val atG2 = state()
    val filesBefore = allFiles()
    AggStore.rollbackAggStore(spark, tmp, 1L)                      // gen 3
    assert(state() == atG1, "rollback must revert the live state")
    assert(allFiles() == filesBefore,
      "rollback must be pointer-only — no data file written, touched, or removed")
    // the reverted batch id re-applies: the ledger rolled back WITH the
    // state (a stale ledger would refuse this and silently drop the day)
    AggStore.mergeIntoAggStore(Seq((1L, 1L)).toDF("k", "v"),       // gen 4
      tmp, "k", "v", appliedId = Some("day-1"))
    assert(state() == Set((1L, 2L, 11L), (2L, 1L, 20L)),
      "a re-fed batch after rollback must fold, not be refused")
    // and it is exactly-once again from here
    AggStore.mergeIntoAggStore(Seq((1L, 999L)).toDF("k", "v"),
      tmp, "k", "v", appliedId = Some("day-1"))
    assert(state() == Set((1L, 2L, 11L), (2L, 1L, 20L)))
    // the bad state stayed archived: diffable, time-travel-readable
    assert(AggStore.readAggStoreAsOf(spark, tmp, 2L)
      .as[(Long, Long, Long)].collect().toSet == atG2,
      "the rolled-back-from generation must stay resolvable")
    // history surfaces every resolvable snapshot, newest first — with the
    // rollback and the re-fed batch as first-class generations
    val hist = AggStore.aggStoreHistory(spark, tmp)
    assert(hist.map(_._1) == Seq(4L, 3L, 2L, 1L),
      s"history must list all four generations newest-first, got $hist")
    assert(hist.find(_._1 == 4L).get._4 == 1 &&
      hist.find(_._1 == 3L).get._4 == 0,
      "the ledger must read 1 applied id after the re-feed, 0 at the rollback")
    val d24 = AggStore.diffAggStore(spark, tmp, 2L, 4L)
      .select(col("key"), col("total_a"), col("total_b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(d24 == Set((1L, 787L, 11L)),
      s"diff across the rollback must show the undo, got $d24")
    // retention then retires the bad lineage like any other history
    AggStore.vacuumAggStore(spark, tmp)
    intercept[IllegalArgumentException](
      AggStore.readAggStoreAsOf(spark, tmp, 2L))
    assert(state() == Set((1L, 2L, 11L), (2L, 1L, 20L)))
    // rolling back to the current or a future generation is loud
    intercept[IllegalArgumentException](
      AggStore.rollbackAggStore(spark, tmp, 99L))
  }

  test("snapshot-store compliance purge: purged bytes are gone from EVERY " +
      "file under the store (live and history), components relabel to the " +
      "surviving minimum, the ledger survives, and untouched buckets stay " +
      "byte-identical") {
    import graft.operators.{AggStore, Dedup}
    import spark.implicits._
    def allParquet(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allParquet)
      else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Seq.empty

    // ---- aggregate store ----
    val atmp = java.nio.file.Files.createTempDirectory("graft_apurge_").toString + "/aggs"
    AggStore.buildAggStore(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "v"),
      atmp, "k", "v", nBuckets = 8)
    AggStore.mergeIntoAggStore(Seq((1L, 1L)).toDF("k", "v"),
      atmp, "k", "v", appliedId = Some("day-1"))
    val untouchedBefore = new java.io.File(atmp).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("d"))
      .flatMap(g => g.listFiles().filter(_.isDirectory).map(b =>
        (g.getName, b.getName) -> b.listFiles().map(_.getName).toSet)).toMap
    val deleted = AggStore.purgeAggStoreKeys(
      Seq(2L, 9L).toDF("k"), atmp, "k")
    assert(deleted == 1L, s"only key 2 is stored, got $deleted")
    assert(AggStore.readAggStore(spark, atmp)
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 11L), (3L, 1L, 30L), (4L, 1L, 40L)))
    // the compliance sweep: NO file under the store holds the purged key
    val residue = spark.read
      .parquet(allParquet(new java.io.File(atmp)): _*)
      .select(col("key")).as[Long].collect().toSet
    assert(!residue.contains(2L),
      "purged keys must be physically gone from every file under the store")
    // history truncated: the archive would resolve the pre-purge state
    assert(AggStore.aggStoreHistory(spark, atmp).map(_._1) == Seq(3L),
      "purge must truncate the snapshot history")
    intercept[IllegalArgumentException](
      AggStore.readAggStoreAsOf(spark, atmp, 2L))
    // the ledger survives: the applied batch is still refused
    AggStore.mergeIntoAggStore(Seq((1L, 999L)).toDF("k", "v"),
      atmp, "k", "v", appliedId = Some("day-1"))
    assert(AggStore.readAggStore(spark, atmp)
      .as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 11L), (3L, 1L, 30L), (4L, 1L, 40L)),
      "the ledger must survive the purge")
    // purging absent keys is a no-op (no generation burned)
    assert(AggStore.purgeAggStoreKeys(Seq(777L).toDF("k"), atmp, "k") == 0L)
    assert(AggStore.aggStoreHistory(spark, atmp).map(_._1) == Seq(3L))

    // ---- cluster store: the label-relabel subtlety ----
    val ctmp = java.nio.file.Files.createTempDirectory("graft_cpurge_").toString + "/labels"
    Dedup.buildClusterStore(
      Seq((1L, 2L), (2L, 30L), (10L, 11L)).toDF("id_a", "id_b"),
      ctmp, nBuckets = 8)
    // purge id 1 — the MINIMUM of component {1,2,30}: survivors must
    // relabel to 2, never keep carrying the erased subject's id
    assert(Dedup.purgeClusterStoreIds(Seq(1L).toDF("id"), ctmp) == 1L)
    assert(Dedup.readClusterStore(spark, ctmp)
      .as[(Long, Long)].collect().toSet ==
      Set((2L, 2L), (30L, 2L), (10L, 10L), (11L, 10L)),
      "survivors must relabel to the surviving minimum; untouched " +
        "components must keep their labels")
    val clusterResidue = spark.read
      .parquet(allParquet(new java.io.File(ctmp)): _*)
      .select(col("id"), col("label"))
      .as[(Long, Long)].collect().flatMap(r => Seq(r._1, r._2)).toSet
    assert(!clusterResidue.contains(1L),
      "the erased id must appear in NO file — not as a row, not as a label")
    // purge down to a singleton: {10,11} minus 10 keeps (11,11)
    assert(Dedup.purgeClusterStoreIds(Seq(10L).toDF("id"), ctmp) == 1L)
    val finalRows = Dedup.readClusterStore(spark, ctmp)
      .as[(Long, Long)].collect().toSet
    assert(finalRows == Set((2L, 2L), (30L, 2L), (11L, 11L)),
      s"a component purged to one member stays a singleton, got $finalRows")
  }

  test("nProbe tuner: recall is monotone non-decreasing in nProbe, exactly " +
      "one candidate is chosen — the smallest meeting the target — and an " +
      "unreachable target falls back to the best candidate") {
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_tune_").toString
    Similarity.buildIvfPqIndex(corpus, tmp)
    def tuned(target: Long) = Similarity
      .tuneIvfPqNProbe(spark, tmp, queries, corpus, k = 5, target,
        candidates = Seq(1, 2, 4, 8))
      .as[(Int, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val rows = tuned(800000L)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    assert(rows.sliding(2).forall(p => p(0)._4 <= p(1)._4),
      s"recall must be monotone non-decreasing in nProbe: $rows")
    assert(rows.count(_._5) == 1, "exactly one candidate must be chosen")
    val expect = rows.find(_._4 >= 800000L).map(_._1)
      .getOrElse(rows.maxBy(r => (r._4, -r._1))._1)
    assert(rows.find(_._5).get._1 == expect,
      s"chosen must be the smallest candidate meeting the target: $rows")
    // an unreachable target (recall_ppm can never exceed 1e6) falls back
    // to the highest-recall candidate, ties to the smaller probe count
    val hard = tuned(1000001L)
    assert(hard.count(_._5) == 1 &&
      hard.find(_._5).get._1 == hard.maxBy(r => (r._4, -r._1))._1,
      s"an unreachable target must pick the best candidate: $hard")
    // loud on nonsense
    intercept[IllegalArgumentException](
      Similarity.tuneIvfPqNProbe(spark, tmp, queries, corpus, k = 5,
        800000L, candidates = Seq.empty))
  }

  test("IVF-PQ compliance purge: purged ids appear in NO file under the " +
      "index — code rows, tombstone logs, archived catalogs, superseded " +
      "versions — and the survivors keep serving") {
    import graft.operators.Similarity
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ipurge_").toString
    // a full lifecycle so every byte-hiding place exists: flat build +
    // append (the ABANDONED flat layout a rebuild leaves at path),
    // rebuild #1 (v1), post-rebuild delete + compact (archived catalogs
    // + a tombstone-log archive inside v1), re-append, rebuild #2 (v2 —
    // v1 becomes the superseded version retaining the whole corpus)
    Similarity.buildIvfPqIndex(base, tmp)
    Similarity.appendToIvfPqIndex(inc, tmp, appendId = "day1")
    Similarity.rebuildIvfPqIndex(base.unionByName(inc), tmp)
    Similarity.tombstoneIvfPq(
      emb.filter(col("vec_id") % 11 === 0).select(col("vec_id").as("nid")), tmp)
    Similarity.compactIvfPqIndex(spark, tmp)
    Similarity.appendToIvfPqIndex(
      emb.filter(col("vec_id") % 11 === 0)
        .select(col("vec_id").as("nid"), col("embedding").as("ne")),
      tmp, appendId = "re-add")
    Similarity.rebuildIvfPqIndex(base.unionByName(inc), tmp)
    val purged = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("vec_id")).as[Long].collect().toSet
    val deleted = Similarity.purgeIvfPqIds(
      emb.filter(col("vec_id") % 5 === 0).select(col("vec_id").as("nid")), tmp)
    assert(deleted == purged.size,
      s"every live purged row must be counted, got $deleted of ${purged.size}")
    // the compliance sweep: NO parquet file under the whole index tree
    // holds a purged id — not a code row, not a tombstone row
    def idFiles(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(idFiles)
      else if (f.getName.endsWith(".parquet") &&
        (f.getPath.contains("cell=") || f.getPath.contains("tomb")))
        Seq(f.getPath)
      else Seq.empty
    val files = idFiles(new java.io.File(tmp))
    assert(files.nonEmpty, "the sweep must actually find data files")
    val residue = spark.read.option("mergeSchema", "true")
      .parquet(files: _*).select(col("nid")).as[Long].collect().toSet
    assert(residue.intersect(purged).isEmpty,
      "purged ids must be physically gone from every file under the index")
    // the superseded version, the abandoned flat layout, catalog
    // history, and tombstone archives are all gone
    assert(!new java.io.File(s"$tmp/v1").exists(),
      "the superseded version directory must be erased")
    assert(!new java.io.File(s"$tmp/codes").exists() &&
      !new java.io.File(s"$tmp/appends").exists() &&
      !new java.io.File(s"$tmp/CODESMAP").exists(),
      "the abandoned pre-versioning flat layout must be erased")
    val root = new java.io.File(s"$tmp/v2")
    assert(!new java.io.File(root, "tombstones").exists() &&
      !new java.io.File(root, "tombhist").exists(),
      "no tombstone log or archive may survive a purge")
    val cats = new java.io.File(root, "catalogs")
    assert(!cats.exists() || cats.listFiles().isEmpty,
      "the catalog history must be truncated")
    // survivors keep serving, purged ids never rank
    val served = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .select(col("nid")).as[Long].collect().toSet
    assert(served.nonEmpty && served.intersect(purged).isEmpty,
      "the purged ids must never serve; the survivors must")
  }

  test("IVF-PQ within-version data GC: a fully-compacted-away append " +
      "directory is reclaimed; partially-live directories survive") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_datagc_").toString
    Similarity.buildIvfPqIndex(base, tmp)
    Similarity.appendToIvfPqIndex(inc, tmp, appendId = "day1")
    // delete the whole increment and compact: every cell the append
    // landed is remapped to the compaction directory, so appends/day1
    // carries zero live catalog entries afterwards
    Similarity.tombstoneIvfPq(inc, tmp)
    Similarity.compactIvfPqIndex(spark, tmp)
    val servedPre = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    val rowsPre = Similarity.readIvfPqCodes(spark, tmp)
      .collect().map(_.getLong(0)).toSet
    val vacuumed = Similarity.vacuumIvfPqData(spark, tmp)
    assert(vacuumed.contains("appends/day1") &&
      !new java.io.File(s"$tmp/appends/day1").exists(),
      s"the dead append directory must be reclaimed, got $vacuumed")
    assert(Similarity.readIvfPqCodes(spark, tmp)
      .collect().map(_.getLong(0)).toSet == rowsPre &&
      rowsPre == base.collect().map(_.getLong(0)).toSet,
      "vacuum must not change the live rows")
    assert(Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq == servedPre,
      "vacuum must not change served answers")
    assert(Similarity.vacuumIvfPqData(spark, tmp).isEmpty,
      "a second vacuum must be a no-op")
  }

  test("IVF-PQ time travel: every lifecycle generation serves back exactly, " +
      "a compacted-away row still serves as-of its pre-delete snapshot, and " +
      "retention bounds the window") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_itt_").toString
    def serveNow() = Similarity.serveIvfPq(spark, tmp, queries, k = 5)
      .orderBy(col("qid"), col("rn")).collect().toSeq
    def serveAt(g: Long) = Similarity
      .serveIvfPq(spark, tmp, queries, k = 5, asOfGen = Some(g))
      .orderBy(col("qid"), col("rn")).collect().toSeq
    Similarity.buildIvfPqIndex(base, tmp)                  // gen 1
    val atG1 = serveNow()
    Similarity.appendToIvfPqIndex(inc, tmp, appendId = "day1") // gen 2
    val atG2 = serveNow()
    Similarity.tombstoneIvfPq(                             // gen 3 (bump)
      emb.filter(col("vec_id") % 7 === 0).select(col("vec_id").as("nid")), tmp)
    val atG3 = serveNow()
    Similarity.compactIvfPqIndex(spark, tmp)               // gen 4
    val atG4 = serveNow()
    assert(atG4 == atG3, "compaction must not change served answers")
    assert(atG2 != atG3, "the fixture's delete must actually move the top-k")
    // every generation replays bit-exactly — including g2, whose deleted
    // rows are PHYSICALLY gone from the live index but still on disk in
    // the directories catalog 2 references
    assert(serveAt(4L) == atG4 && serveAt(3L) == atG3 &&
      serveAt(2L) == atG2 && serveAt(1L) == atG1,
      "each archived generation must serve exactly its committed state")
    intercept[IllegalArgumentException](serveAt(9L)) // the future
    // keepGens=2 keeps the {3, 4} window: catalogs 1-2 retire, the g4
    // tombstone archive survives (as-of 3 still needs the fences)
    val v2 = Similarity.vacuumIvfPqData(spark, tmp, keepGens = 2)
    assert(v2.contains("catalogs/1") && v2.contains("catalogs/2") &&
      !v2.exists(_.startsWith("tombhist/")),
      s"keepGens=2 must retire catalogs 1-2 and keep the archive, got $v2")
    assert(serveAt(3L) == atG3, "the retained window must survive the vacuum")
    intercept[IllegalArgumentException](serveAt(2L))
    // keepGens=1 collapses to the live state only
    val v1 = Similarity.vacuumIvfPqData(spark, tmp)
    assert(v1.contains("catalogs/3") && v1.contains("tombhist/g4"),
      s"keepGens=1 must retire the rest of the history, got $v1")
    intercept[IllegalArgumentException](serveAt(3L))
    assert(serveNow() == atG4 && serveAt(4L) == atG4,
      "the live state must be untouched by retention")
  }

  test("q50 minhash: single pair-generating exchange above the cached base") {
    withoutAqe {
      val p = plan(registry("q50_minhash_pairs")(spark, sfDir))
      val n = shuffles(p).size
      assert(n <= 2, s"q50: pair-gen grew extra exchanges ($n):\n$p")
    }
  }

  test("q118 temperature mix: thresholds are literals — no join in the corpus pass") {
    withoutAqe {
      val p = plan(registry("q118_temperature_mix")(spark, sfDir))
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"q118: the keep decision must be a CASE literal column, never a join:\n$p")
      assert(shuffles(p).size <= 2,
        s"q118: one partial-agg exchange plus the output sort, nothing more:\n$p")
    }
  }

  test("q120 classifier scoring: inlined-weight narrow map, no join, no agg exchange") {
    withoutAqe {
      val p = plan(registry("q120_quality_classifier")(spark, sfDir))
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"q120: scoring must not join a weight table — weights are literals:\n$p")
      assert(shuffles(p).size <= 1,
        s"q120: only the output sort may exchange; scoring is a narrow map:\n$p")
    }
  }

  test("q138 point-in-time SCD2 join: union+window shape, no nested-loop/cartesian join") {
    withoutAqe {
      val p = plan(registry("q138_scd2_pit")(spark, sfDir))
      val bad = p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }
      assert(bad.isEmpty,
        s"point-in-time join degenerated to a nested-loop/cartesian plan:\n$p")
      // no join operator at all: the dimension attach is the as-of window
      val joins = p.collect {
        case j: BroadcastHashJoinExec => j
        case j: SortMergeJoinExec => j
      }
      assert(joins.isEmpty,
        s"expected the union+window as-of shape, found join operators:\n$p")
    }
  }

  test("fuzzyPairs: variant explode runs ONCE; both join sides scan the materialization") {
    withoutAqe {
      val c = Tables(spark, sfDir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("nm"))
      val p = plan(graft.operators.Entities.fuzzyPairs(c, "id", "nm", maxDist = 2))
      // the (dominant) delete-neighborhood explode must be materialized
      // before the self-join — a Generate in this plan means some join
      // strategy (e.g. a small-scale broadcast build) re-runs it
      val gens = p.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }
      assert(gens.isEmpty,
        s"fuzzyPairs: variant explode leaked past the materialization:\n$p")
      val rddIds = p.collect {
        case r: org.apache.spark.sql.execution.RDDScanExec => r.inputRDD.id
      }
      assert(rddIds.size == 2 && rddIds.distinct.size == 1,
        s"fuzzyPairs: both join sides must scan ONE materialized RDD, got $rddIds:\n$p")
    }
  }

  test("BPE encode: zero-shuffle narrow map (no word join, no doc regroup)") {
    withoutAqe {
      val docs = Tables(spark, sfDir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", numMerges = 20)
      val p = plan(graft.operators.Bpe.encode(docs, "doc_id", "text", model))
      assert(shuffles(p).isEmpty,
        s"BPE encode must be a narrow map — a shuffle here is corpus-scale at 100 TB:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"BPE encode must not join a dictionary back into the token stream:\n$p")
    }
  }

  test("skyline/centroids/winsorize: frontier and bounds joins stay broadcast") {
    withoutAqe {
      // skyline: when the candidate count is inside the broadcast guard
      // (always true at test scale) the frontier join-back must broadcast,
      // never sort-merge; above the guard the hint is dropped and AQE
      // decides at runtime (equality of that path: SkylineSpec)
      val parts = Tables(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_size").cast("long").as("ps"),
          round(col("p_retailprice") * 100).cast("long").as("pc"))
      val sky = plan(graft.operators.Skyline.skyline2d(parts, "ps", "pc"))
      assert(sky.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"skyline join-back degraded to sort-merge:\n$sky")
      assert(sky.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"skyline join-back must broadcast the frontier:\n$sky")

      // centroids: the labels x dim centroid table must broadcast
      val emb = Tables(spark, sfDir, "embeddings")
      val cen = plan(graft.operators.Centroids
        .classOutliers(emb, "vec_id", "embedding", "label"))
      assert(cen.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"centroid join degraded to sort-merge:\n$cen")

      // winsorize bounds (group-cardinality-sized) must broadcast back
      val ev = Tables(spark, sfDir, "events").select(col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      val bounds = graft.operators.Selection
        .groupQuantileBounds(ev, "event_type", "c", 5, 95)
      val win = plan(ev.join(broadcast(bounds), Seq("event_type")))
      assert(win.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"winsorize bounds join degraded to sort-merge:\n$win")
    }
  }

  test("gk registers: ONE data-sized exchange (the bucket window), no join") {
    withoutAqe {
      val ev = Tables(spark, sfDir, "events").select(col("event_type"),
        col("event_id"), round(col("value") * 100).cast("long").as("c"))
      val p = plan(graft.operators.Gk.registers(ev, "c", "event_id",
        Seq("event_type"), k = 64, buckets = 8))
      assert(shuffles(p).size == 1,
        s"gk build must cost exactly one exchange over the data:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"gk build must not join:\n$p")

      // cdf annotation: the (checkpointed) registers broadcast; the data
      // side must never sort-merge or re-shuffle for the join
      val regs = graft.operators.Gk.registers(ev, "c", "event_id",
        Seq("event_type"), k = 64, buckets = 8).localCheckpoint(true)
      val p2 = plan(graft.operators.Gk.cdfPpm(regs, ev, "c", Seq("event_type")))
      assert(p2.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p2.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"gk cdf annotation must broadcast the registers:\n$p2")
    }
  }

  test("interval overlap join: equi-join on (key, cell) — no BNLJ, no cartesian") {
    withoutAqe {
      val p = plan(registry("q217_interval_join")(spark, sfDir))
      assert(p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }.isEmpty,
        s"interval overlap join degenerated to a nested-loop/cartesian plan:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.nonEmpty ||
        p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"interval overlap join must plan as an equi-join on (key, cell):\n$p")
    }
  }

  test("spatial radius join: equi-join on grid cells — no BNLJ, no cartesian") {
    withoutAqe {
      val p = plan(registry("q237_spatial_join")(spark, sfDir))
      assert(p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }.isEmpty,
        s"spatial radius join degenerated to a nested-loop/cartesian plan:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.nonEmpty ||
        p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"spatial radius join must plan as an equi-join on grid cells:\n$p")
    }
  }

  test("rendezvous sharding: pure projection — no shuffle, no join below the agg") {
    withoutAqe {
      val keys = Tables(spark, sfDir, "orders").select(col("o_orderkey"))
      val p = plan(graft.operators.Sharding.assign(keys, "o_orderkey", 8))
      assert(shuffles(p).isEmpty,
        s"rendezvous assignment must be a narrow map:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"rendezvous assignment must not join a shard table:\n$p")
    }
  }

  test("phrase search: one shuffle (window regroup), no postings self-join") {
    withoutAqe {
      val docs = Tables(spark, sfDir, "documents")
      val p = plan(graft.operators.Phrase
        .phraseMatches(docs, "doc_id", "text", "customer join"))
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"phrase match must be a lead-chain, not a postings self-join:\n$p")
      // tokens regroup to (doc) for the window, then aggregate reuses the
      // partitioning: at most 2 exchanges, never one per phrase word
      assert(shuffles(p).size <= 2,
        s"phrase lead-chain must not add per-word exchanges:\n$p")
    }
  }

  test("sequence mining: lead-window shape — no self-join, bounded exchanges") {
    withoutAqe {
      // transitions: user window + pair count + from_state windows
      // (operator planned directly — the query adds a presentation sort)
      val ev = Tables(spark, sfDir, "events")
      val pt = plan(graft.operators.Sequences.transitions(
        ev, "user_id", "ts", "event_id", "event_type"))
      assert(pt.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        pt.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"transitions must be lead-windows, never an event self-join:\n$pt")
      assert(shuffles(pt).size <= 3,
        s"transitions: user regroup + count + state window, got more:\n$pt")
      // trigrams: both leads share ONE user window exchange
      val pg = plan(graft.operators.Sequences.frequentNgrams(
        ev, "user_id", "ts", "event_id", "event_type", 3, 10L))
      assert(pg.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        pg.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"trigrams must not self-join the event table per position:\n$pg")
      assert(shuffles(pg).size <= 2,
        s"trigrams: one user window + one gram count, got more:\n$pg")
    }
  }

  test("basket rules / link prediction: blocked equi-joins, no BNLJ/cartesian") {
    withoutAqe {
      for (name <- Seq("q245_basket_rules", "q250_link_predict")) {
        val p = plan(registry(name)(spark, sfDir))
        assert(p.collect {
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
          case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
        }.isEmpty,
          s"$name: pair generation degenerated to nested-loop/cartesian:\n$p")
      }
    }
  }

  test("holt forecast: per-key fold — two aggregates, no join, no flat window") {
    withoutAqe {
      val daily = Tables(spark, sfDir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("v"))
      val p = plan(graft.operators.Forecast.holtLinear(
        daily, "event_type", "day", "v", 7))
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty &&
        p.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"holt must fold per key, not join a state table:\n$p")
      assert(shuffles(p).size <= 2,
        s"holt: daily aggregate + key fold only, got more exchanges:\n$p")
    }
  }

  test("corrMatrix: pair rows never rescan the corpus (materialized aggregate)") {
    withoutAqe {
      val d = Tables(spark, sfDir, "lineitem")
        .select(col("l_quantity").cast("long").as("a"),
          floor(col("l_extendedprice")).cast("long").as("b"),
          floor(col("l_discount") * 100).cast("long").as("c"))
      val p = plan(graft.operators.Trend.corrMatrix(d, Nil, Seq("a", "b", "c")))
      // the one corpus scan happened inside the checkpoint at build time;
      // the pair projections must read ONLY the materialized aggregate —
      // a file scan here would mean column pruning split the scan per pair
      assert(p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.isEmpty,
        s"corrMatrix pair rows rescanned the corpus:\n$p")
    }
  }

  test("theilSen: group-blocked pair join — no BNLJ, no cartesian") {
    withoutAqe {
      val daily = Tables(spark, sfDir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("v"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
          col("v"))
      val p = plan(graft.operators.Trend.theilSen(
        daily, Seq("event_type"), "x", "v"))
      assert(p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }.isEmpty,
        s"theilSen pair generation degenerated to nested-loop/cartesian:\n$p")
    }
  }

  test("kaplan-meier: no BNLJ; the curve join stays an equi-join") {
    withoutAqe {
      val p = plan(registry("q252_survival_km")(spark, sfDir))
      assert(p.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
      }.isEmpty,
        s"kaplan-meier: curve join-back degenerated to nested-loop:\n$p")
    }
  }
}
