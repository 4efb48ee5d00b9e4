package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** §2.12: streaming results must agree with the batch formulation
  * (Trigger.AvailableNow equivalence), modulo trailing windows the
  * watermark legitimately holds back.
  */
class StreamingSpec extends SparkSpec {

  test("streamed tumbling agg rows equal the batch agg (watermark-held tail excluded)") {
    val streamed = Streams.tumblingViaStream(spark, sfDir)
      .select("h", "event_type", "n", "sv").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = Tables(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), "every emitted window must match batch exactly")
    val missing = batch -- streamed
    val maxEmitted = streamed.map(_._1.getTime).max
    assert(missing.forall(_._1.getTime > maxEmitted - 2 * 3600 * 1000),
      "only trailing windows within the watermark horizon may be unemitted")
  }

  test("sessionizer hot key: thousands of one user's shuffled rows in a single batch") {
    import graft.streaming.StatefulSessions
    import spark.implicits._
    // one user, 5000 events delivered in ONE batch in shuffled order:
    // 20 sessions of 250 events (10 s apart inside a session, 6 h between
    // session starts, gap = 30 min). Exercises the documented per-key
    // buffering bound and the in-batch event-time sort.
    val rnd = new scala.util.Random(7)
    val evs = rnd.shuffle((0 until 5000).toVector).map { i =>
      val sess = i / 250; val off = i % 250
      (1L, new java.sql.Timestamp(1700000000000L + sess * 21600000L + off * 10000L),
        i.toLong)
    }.toDF("user_id", "ts", "event_id")
    val got = StatefulSessions.sessionize(evs, 30)
      .collect().sortBy(_.sess)
    assert(got.length == 20)
    got.zipWithIndex.foreach { case (s, k) =>
      assert(s.user_id == 1L && s.n == 250)
      assert(s.sess == (1700000000000L + k * 21600000L) * 1000L)
      assert(s.first_ev == k * 250L && s.last_ev == k * 250L + 249L)
    }
  }

  test("dedup within watermark removes reinjected duplicates") {
    val ev = Tables(spark, sfDir, "events").limit(100)
    val dup = ev.union(ev)
    // batch fallback of the same op: dropDuplicates on the key
    assert(dup.dropDuplicates("event_id").count() == 100)
  }

  test("stream-stream attribution join equals the batch time-bounded join") {
    import graft.streaming.Streams
    import spark.implicits._
    val streamed = Streams.runAvailableNowMem(
        Streams.attributionJoin(
          Streams.eventsStream(spark, sfDir).filter(col("event_type") === "click"),
          Streams.eventsStream(spark, sfDir).filter(col("event_type") === "purchase"),
          withinMinutes = 30), "sj_test")
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet

    val ev = Tables(spark, sfDir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    val batch = c.join(p,
        col("user_id") === col("pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet

    assert(streamed == batch, "AvailableNow stream-stream join must equal the batch join")
    assert(batch.nonEmpty, "fixture must actually produce attributed pairs")
  }

  test("foreachBatch idempotent merge: replayed batches do not duplicate") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_merge_").toString
    // deliberately a file: URI — java.io.File.exists("file:/...") is always
    // false, so this asserts the probe goes through the Hadoop FileSystem
    // API (the HDFS/S3 code path), not the local-FS shortcut
    val target = s"file:$tmp/target"
    Streams.runMergeSink(
      Streams.eventsStream(spark, sfDir).select(col("event_id"), col("event_type")),
      "event_id", target, s"$tmp/ckpt")
    val n1 = spark.read.parquet(target).count()
    assert(n1 > 0)
    // simulate a replayed/overlapping microbatch: half old keys, plus the
    // same stream rerun from a FRESH checkpoint (full redelivery)
    val overlap = spark.read.parquet(target).limit((n1 / 2).toInt)
    Streams.idempotentMerge(overlap, "event_id", target)
    assert(spark.read.parquet(target).count() == n1, "manual replay must merge to no-op")
    Streams.runMergeSink(
      Streams.eventsStream(spark, sfDir).select(col("event_id"), col("event_type")),
      "event_id", target, s"$tmp/ckpt2")
    assert(spark.read.parquet(target).count() == n1, "full redelivery must merge to no-op")
  }

  test("streaming cluster merge: shard replay is a zero-write no-op; " +
      "an uncommitted shard is skipped") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val tmp = java.nio.file.Files.createTempDirectory("graft_sclu_").toString
    Seq((2L, 1L), (30L, 2L)).toDF("new_id", "dup_id")
      .write.parquet(s"$tmp/pairs/batch=0")
    StreamingDedup.mergeBatchClusters(spark, s"$tmp/pairs", s"$tmp/clusters", 0L)
    def stored() = graft.operators.Dedup.readClusterStore(spark, s"$tmp/clusters")
      .as[(Long, Long)].collect().toSet
    // every parquet file across all generation directories, plus the
    // manifest bytes — a no-op merge must move NEITHER
    def files(): (Set[(String, Long, Long)], String) = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) else Seq(d)
      (walk(new java.io.File(s"$tmp/clusters"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.lastModified(), f.length())).toSet,
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$tmp/clusters/CURRENT")), "UTF-8"))
    }
    assert(stored() == Set((1L, 1L), (2L, 1L), (30L, 1L)))
    val snap = files()
    // replay: same shard folds again — endpoints already share a component
    StreamingDedup.mergeBatchClusters(spark, s"$tmp/pairs", s"$tmp/clusters", 0L)
    assert(files() == snap, "a replayed shard must write nothing")
    // a shard without its _SUCCESS marker (torn write) must be skipped
    Seq((7L, 8L)).toDF("new_id", "dup_id")
      .write.parquet(s"$tmp/pairs/batch=1")
    new java.io.File(s"$tmp/pairs/batch=1/_SUCCESS").delete()
    StreamingDedup.mergeBatchClusters(spark, s"$tmp/pairs", s"$tmp/clusters", 1L)
    assert(stored() == Set((1L, 1L), (2L, 1L), (30L, 1L)),
      "an uncommitted shard must not reach the cluster store")
  }

  test("streaming count-min: batch shards are idempotent under full redelivery") {
    import graft.operators.Sketches
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cms_").toString
    // file: URI so the shard-exists probe must use the Hadoop FS API
    val target = s"file:$tmp/sketch"
    val src = Streams.eventsStream(spark, sfDir).select(col("event_type").as("text"))
    Sketches.streamingCountMin(src, "text", target, s"$tmp/ckpt", depth = 4, width = 64)

    val exact = Tables(spark, sfDir, "events")
      .groupBy(lower(col("event_type"))).count()
      .as[(String, Long)].collect().toMap
    def estimates(): Map[String, Long] =
      Sketches.estimate(Sketches.readMerged(spark, target),
          exact.keys.toSeq.toDF("term"), "term", depth = 4, width = 64)
        .as[(String, Long)].collect().toMap
    val est1 = estimates()
    exact.foreach { case (t, n) =>
      assert(est1(t) >= n, s"CMS underestimated $t: ${est1(t)} < $n")
    }
    // full redelivery from a FRESH checkpoint: same batches re-arrive with
    // the same ids, every shard already exists, the sketch must not move
    Sketches.streamingCountMin(src, "text", target, s"$tmp/ckpt2", depth = 4, width = 64)
    assert(estimates() == est1, "redelivered batches must not double-count")
  }

  test("streaming HLL: merged registers equal the batch registers; redelivery is a no-op") {
    import graft.operators.Sketches
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_shll_").toString
    val target = s"file:$tmp/hll" // file: URI → Hadoop-FS shard probe
    val src = Streams.eventsStream(spark, sfDir)
      .select(col("event_type"), col("user_id"))
    Sketches.streamingHll(src, "user_id", Seq("event_type"),
      target, s"$tmp/ckpt", m = 64)
    def regs(): Set[(String, Long, Long)] =
      Sketches.readMergedHll(spark, target, Seq("event_type"))
        .as[(String, Long, Long)].collect().toSet
    val batchRegs = Sketches.hllRegisters(
        Tables(spark, sfDir, "events").select(col("event_type"), col("user_id")),
        "user_id", Seq("event_type"), m = 64)
      .as[(String, Long, Long)].collect().toSet
    val r1 = regs()
    assert(r1 == batchRegs,
      "stream-folded registers must equal the batch registers (merge law)")
    // full redelivery from a fresh checkpoint: shards exist, fold unchanged
    Sketches.streamingHll(src, "user_id", Seq("event_type"),
      target, s"$tmp/ckpt2", m = 64)
    assert(regs() == r1, "redelivered batches must not change the registers")
  }

  test("dedup-store compliance purge: the subject's text, shingles, band " +
      "rows, and pairs are gone from every file; shard replay guards " +
      "survive; survivors keep pairing against the purged history") {
    import graft.streaming.StreamingDedup
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pdedup_").toString
    val store = s"file:$tmp/store"
    val pairs = s"file:$tmp/pairs"
    val text = "w1 w2 w3 w4 w5 w6"
    StreamingDedup.processBatch(
      Seq((1L, text), (2L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 0L, threshold = 0.5)
    StreamingDedup.processBatch(Seq((3L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 1L, threshold = 0.5)
    def pairSet() = StreamingDedup.pairs(spark, pairs)
      .as[(Long, Long, Boolean, Double)].collect().toSet
    assert(pairSet() == Set((1L, 2L, false, 1.0), (3L, 1L, true, 1.0),
      (3L, 2L, true, 1.0)))
    // purge subject 1 — present in docs, bands, and BOTH pairs shards
    val deleted = StreamingDedup.purgeDocs(Seq(1L).toDF("id"), store,
      idCol = "id", pairsPath = Some(pairs))
    assert(deleted == 1L, s"one docs row must be erased, got $deleted")
    // the sweep: no file under docs/, bands/, or pairs/ names the subject
    def allParquet(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allParquet)
      else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Seq.empty
    Seq(s"$tmp/store/docs" -> Seq("id"), s"$tmp/store/bands" -> Seq("id"),
      s"$tmp/pairs" -> Seq("new_id", "dup_id")).foreach { case (dir, cols) =>
      val fs = allParquet(new java.io.File(dir))
      if (fs.nonEmpty) {
        val found = spark.read.parquet(fs: _*)
          .select(cols.map(col): _*).collect()
          .flatMap(r => cols.indices.map(r.getLong)).toSet
        assert(!found.contains(1L),
          s"subject must be gone from every file under $dir, got $found")
      }
    }
    assert(pairSet() == Set((3L, 2L, true, 1.0)),
      s"only subject-free pairs may survive: ${pairSet()}")
    // the shard replay guard SURVIVES the purge, and the SUPPRESSION
    // LIST blocks the resurrection a bare row-erase would allow: the
    // replayed batch's shard is detected AND its store merge must not
    // re-ingest the purged subject from the batch's own payload
    assert(new java.io.File(s"$tmp/pairs/batch=0/_SUCCESS").exists())
    StreamingDedup.processBatch(
      Seq((1L, text), (2L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 0L, threshold = 0.5)
    assert(pairSet() == Set((3L, 2L, true, 1.0)),
      "a replayed committed batch must stay a no-op after the purge")
    val docsIds = spark.read.parquet(s"$tmp/store/docs")
      .select(col("id")).as[Long].collect().toSet
    assert(!docsIds.contains(1L),
      "a replayed batch must NOT re-ingest the purged subject")
    // survivors keep pairing against the purged history; the purged
    // subject never reappears as a dup side, and an upstream RE-SEND of
    // the subject under a fresh batch id is suppressed too
    StreamingDedup.processBatch(Seq((4L, text), (1L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 2L, threshold = 0.5)
    assert(pairSet() == Set((3L, 2L, true, 1.0),
      (4L, 2L, true, 1.0), (4L, 3L, true, 1.0)),
      s"post-purge pairing must cover exactly the survivors: ${pairSet()}")
    assert(!spark.read.parquet(s"$tmp/store/docs")
      .select(col("id")).as[Long].collect().toSet.contains(1L),
      "an upstream re-send of the purged subject must be suppressed")
    // idempotent re-run
    assert(StreamingDedup.purgeDocs(Seq(1L).toDF("id"), store,
      idCol = "id", pairsPath = Some(pairs)) == 0L)
    // RE-ADMISSION: suppression is reversible policy (re-consent) while
    // erasure is not — after unsuppress, the subject's NEW document
    // ingests and pairs normally; the erased history stays erased
    assert(StreamingDedup.unsuppressDocs(Seq(1L).toDF("id"), store,
      idCol = "id") == 1L)
    StreamingDedup.processBatch(Seq((1L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 3L, threshold = 0.5)
    val readmitted = pairSet()
    assert(readmitted.exists(p => p._1 == 1L && p._3),
      s"a re-admitted subject's new data must pair against history: $readmitted")
    // clearing an unlisted key is a counted no-op
    assert(StreamingDedup.unsuppressDocs(Seq(1L).toDF("id"), store,
      idCol = "id") == 0L)
  }

  test("streaming incremental dedup: replayed batches add zero pairs, history pairs once") {
    import graft.streaming.StreamingDedup
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup_").toString
    // file: URIs so both the shard _SUCCESS probe and the store probe must
    // go through the Hadoop FS API (the HDFS/S3 code path)
    val store = s"file:$tmp/store"
    val pairs = s"file:$tmp/pairs"
    // identical texts -> jaccard 1.0 -> identical signatures -> every band
    // collides: the expected pairs are deterministic, not probabilistic
    val text = "w1 w2 w3 w4 w5 w6"
    val b0 = Seq((1L, text), (2L, text)).toDF("id", "text")
    def pairSet() = StreamingDedup.pairs(spark, pairs)
      .as[(Long, Long, Boolean, Double)].collect().toSet
    def storeN() = StreamingDedup.corpus(spark, store).count()

    StreamingDedup.processBatch(b0, "id", "text", store, pairs, 0L, threshold = 0.5)
    assert(pairSet() == Set((1L, 2L, false, 1.0)), s"batch-0 new-new pair: ${pairSet()}")
    assert(storeN() == 2)
    // exact redelivery (same batch id): the committed shard is skipped and
    // the store merge anti-joins to nothing
    StreamingDedup.processBatch(b0, "id", "text", store, pairs, 0L, threshold = 0.5)
    assert(pairSet() == Set((1L, 2L, false, 1.0)) && storeN() == 2,
      "redelivered batch must be a complete no-op")
    // redelivery under a NEW batch id (lost checkpoint): the store anti-join
    // leaves no new docs -> an EMPTY shard, never re-paired content
    StreamingDedup.processBatch(b0, "id", "text", store, pairs, 99L, threshold = 0.5)
    assert(pairSet() == Set((1L, 2L, false, 1.0)) && storeN() == 2,
      "replay under a different batch id must add nothing")
    // a genuine increment pairs against ALL history, flagged as existing
    val b1 = Seq((3L, text)).toDF("id", "text")
    StreamingDedup.processBatch(b1, "id", "text", store, pairs, 1L, threshold = 0.5)
    assert(pairSet() == Set((1L, 2L, false, 1.0), (3L, 1L, true, 1.0), (3L, 2L, true, 1.0)),
      s"increment must pair against history exactly once: ${pairSet()}")
    assert(storeN() == 3)
    // parameter drift: the store pins its signature parameters — a
    // redeploy under different banding can never match history, so it
    // must fail loudly, not silently emit zero pairs forever
    val e1 = intercept[IllegalArgumentException] {
      StreamingDedup.processBatch(Seq((9L, text)).toDF("id", "text"),
        "id", "text", store, pairs, 2L, bands = 4, threshold = 0.5)
    }
    assert(e1.getMessage.contains("built with"), e1.getMessage)
    // a redelivered id with DIFFERENT text is an upstream bug the
    // replay anti-join would otherwise bury with the stale text kept
    val e2 = intercept[IllegalArgumentException] {
      StreamingDedup.processBatch(Seq((1L, "completely different w9 w8"))
        .toDF("id", "text"), "id", "text", store, pairs, 3L, threshold = 0.5)
    }
    assert(e2.getMessage.contains("DIFFERENT text"), e2.getMessage)
    assert(pairSet().size == 3 && storeN() == 3, "rejected batches change nothing")
  }

  test("streaming dedup store is signature-bearing and bucketed: history probes prune") {
    import graft.streaming.StreamingDedup
    import graft.operators.Dedup
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sigstore_").toString
    val store = s"file:$tmp/store"
    val pairs = s"file:$tmp/pairs"
    val text = "w1 w2 w3 w4 w5 w6"
    StreamingDedup.processBatch(Seq((1L, text), (2L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 0L, threshold = 0.5)
    StreamingDedup.processBatch(Seq((3L, text)).toDF("id", "text"),
      "id", "text", store, pairs, 1L, threshold = 0.5)

    // 1. the docs table carries the per-document signature columns
    // (computed once at merge time) and is partitioned by id bucket; the
    // band index holds one row per (doc, band) partitioned by key bucket
    val docs = spark.read.parquet(s"$store/docs")
    assert(Set("__th", "__sh", "__sig", "__bucket").subsetOf(docs.columns.toSet),
      s"docs must persist digest/shingles/signature + bucket, has ${docs.columns.toSeq}")
    assert(docs.filter(col("__sig").isNull).count() == 0,
      "every stored doc must carry a signature")
    val bandsIdx = spark.read.parquet(s"$store/bands")
    assert(Set("id", "band", "key", "__bbk").subsetOf(bandsIdx.columns.toSet),
      s"band index columns: ${bandsIdx.columns.toSeq}")
    assert(bandsIdx.groupBy(col("id")).count().filter(col("count") =!= 8).count() == 0,
      "every stored doc must carry one index row per band")

    // 2. the history sides of the pairing read ONLY persisted columns with
    // PARTITION FILTERS — no text read, bucket pruning reaches the scan
    val docsSchema = StructType(docs.schema.fields)
    val bandsSchema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("band", IntegerType),
      StructField("key", org.apache.spark.sql.types.LongType),
      StructField("__bbk", IntegerType)))
    val ex = StreamingDedup.bandsSide(spark, store, "id", Seq(0, 1), bandsSchema)
    val sh = StreamingDedup.docsShingles(spark, store, "id", Seq(0, 1), docsSchema)
    for ((df, what) <- Seq((ex, "bands"), (sh, "docs-shingles"))) {
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, s"$what side must be a file scan")
      assert(scans.forall(_.partitionFilters.nonEmpty),
        s"$what scan must carry a partition filter:\n${df.queryExecution.executedPlan}")
      assert(!scans.exists(_.requiredSchema.fieldNames.contains("text")),
        s"$what scan must prune the text column")
    }

    // 3. the whole store-fed pairing plan contains NO tokenize/shingle/
    // signature expression — the new side's single text pass happens
    // upstream in enrich; history cost is pruned column scans
    val newSigned = Dedup.signedSide(Seq((9L, text)).toDF("id", "text"), "id", "text")
    val tmpNew = s"file:$tmp/new_signed"
    newSigned.write.parquet(tmpNew)
    val storedNew = spark.read.parquet(tmpNew)
    val newBanded = storedNew
      .select(col("__id"), lit(true).as("__new"), explode(col("__bk")).as("__b"))
      .select(col("__id"), col("__new"), col("__b.band").as("band"), col("__b.key").as("key"))
    val cand = Dedup.orientedCandidates(newBanded.unionByName(ex), maxBucket = 1000)
    val lazyPlan = Dedup.verifyOriented(cand,
      storedNew.select(col("__id"), col("__sh")),
      storedNew.select(col("__id"), col("__sh")).unionByName(sh),
      threshold = 0.5)
    val planStr = lazyPlan.queryExecution.optimizedPlan.toString
    for (tok <- Seq("split(", "regexp_replace", "lower(", "minhash"))
      assert(!planStr.toLowerCase.contains(tok),
        s"pairing plan must be tokenizer-free, found '$tok':\n$planStr")
  }

  test("streaming dedup merge rewrites only touched buckets; probes prune to them") {
    import graft.streaming.StreamingDedup
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bdedup_").toString
    val store = s"file:$tmp/store"
    val pairs = s"file:$tmp/pairs"
    // two ids in DIFFERENT docs buckets (bucket = pmod(xxhash64(id), 16))
    val bOf = Seq((1L to 40L): _*).toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val idB = (2L to 40L).find(bOf(_) != bOf(1L)).get
    val tA = "w1 w2 w3 w4 w5 w6"
    val tB = "z1 z2 z3 z4 z5 z6 z7 z8"
    StreamingDedup.processBatch(Seq((1L, tA), (idB, tB)).toDF("id", "text"),
      "id", "text", store, pairs, 0L, threshold = 0.5)

    def bucketFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$tmp/store/docs/__bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouchedBefore = bucketFiles(bOf(idB))
    assert(untouchedBefore.nonEmpty)
    // an increment whose id lands in id 1's bucket: the other bucket's
    // partition must not gain or rewrite any file (append-only merge +
    // bucket pruning — the q137 discipline)
    val idC = (2L to 40L).find(k => bOf(k) == bOf(1L) && k != 1L).get
    StreamingDedup.processBatch(Seq((idC, tA)).toDF("id", "text"),
      "id", "text", store, pairs, 1L, threshold = 0.5)
    assert(bucketFiles(bOf(idB)) == untouchedBefore,
      "untouched docs buckets must not be rewritten by a merge")
    import spark.implicits._
    val got = StreamingDedup.pairs(spark, pairs)
      .as[(Long, Long, Boolean, Double)].collect().toSet
    assert(got == Set((idC, 1L, true, 1.0)),
      s"increment must pair against its bucket's history: $got")
  }

  test("streaming SCD2: late data rewrites touched keys only; replay is a no-op") {
    import graft.streaming.StreamingScd
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sscd_").toString
    val obs = s"file:$tmp/obs"
    val dimp = s"file:$tmp/dim"
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // a second key in a DIFFERENT hash bucket than key 1, so the
    // untouched-partition claim below is observable
    val bOf = Seq((1L to 20L): _*).toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val k2 = (2L to 20L).find(bOf(_) != bOf(1L)).get
    def dimSet() = StreamingScd.dim(spark, dimp)
      .select(col("k"), col("version"), col("state.attr").as("a"),
        col("valid_from"), col("is_current"))
      .as[(Long, Long, String, java.sql.Timestamp, Boolean)].collect().toSet

    val b0 = Seq((1L, "a", ts(0), 1L), (1L, "b", ts(10), 2L), (k2, "a", ts(0), 3L))
      .toDF("k", "attr", "ts", "tie")
    StreamingScd.processBatch(b0, "k", Seq("attr"), "ts", "tie", obs, dimp)
    val d1 = dimSet()
    assert(d1 == Set((1L, 1L, "a", ts(0), false), (1L, 2L, "b", ts(10), true),
      (k2, 1L, "a", ts(0), true)), s"initial versions: $d1")

    // exact redelivery: log merge anti-joins to nothing, dim content holds
    StreamingScd.processBatch(b0, "k", Seq("attr"), "ts", "tie", obs, dimp)
    assert(dimSet() == d1, "replayed batch must be a complete no-op")

    // a redelivered observation id with a DIFFERENT payload is an upstream
    // bug — surfaced loudly, never silently dropped by the merge
    val bad = Seq((1L, "z", ts(0), 1L)).toDF("k", "attr", "ts", "tie")
    val e = intercept[IllegalArgumentException] {
      StreamingScd.processBatch(bad, "k", Seq("attr"), "ts", "tie", obs, dimp)
    }
    assert(e.getMessage.contains("DIFFERENT payload"))
    assert(dimSet() == d1, "a rejected batch must leave the dimension untouched")

    // a LATE observation lands between key 1's versions: that key's
    // history is rewritten from the merged log; key 2 is untouched
    def bucketFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$tmp/dim/__bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val k2FilesBefore = bucketFiles(bOf(k2))
    assert(k2FilesBefore.nonEmpty)
    val b1 = Seq((1L, "c", ts(5), 4L)).toDF("k", "attr", "ts", "tie")
    StreamingScd.processBatch(b1, "k", Seq("attr"), "ts", "tie", obs, dimp)
    val d2 = dimSet()
    assert(d2 == Set(
      (1L, 1L, "a", ts(0), false), (1L, 2L, "c", ts(5), false),
      (1L, 3L, "b", ts(10), true), (k2, 1L, "a", ts(0), true)),
      s"late data must rewrite key 1's history: $d2")
    // the untouched bucket's partition was not even rewritten: dynamic
    // partition overwrite + the static bucket-list filter leave its
    // files byte-for-byte alone (same names, same mtimes)
    assert(bucketFiles(bOf(k2)) == k2FilesBefore,
      "untouched bucket partitions must not be rewritten")
  }

  test("SCD compliance purge: the subject's bytes are gone from BOTH " +
      "stores' every file, co-bucketed survivors re-version from the " +
      "purged log, untouched buckets stay byte-identical, and the purge " +
      "is idempotent") {
    import graft.streaming.StreamingScd
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pscd_").toString
    val obs = s"file:$tmp/obs"
    val dimp = s"file:$tmp/dim"
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val bOf = Seq((1L to 40L): _*).toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    // kSame shares key 1's bucket (the co-bucketed survivor), kOther is
    // in a different bucket (the untouched control)
    val kSame = (2L to 40L).find(bOf(_) == bOf(1L)).get
    val kOther = (2L to 40L).find(bOf(_) != bOf(1L)).get
    val b0 = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(10), 2L),
      (kSame, "a", ts(0), 3L), (kSame, "c", ts(20), 4L),
      (kOther, "a", ts(0), 5L)).toDF("k", "attr", "ts", "tie")
    StreamingScd.processBatch(b0, "k", Seq("attr"), "ts", "tie", obs, dimp)
    def bucketFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$tmp/dim/__bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val otherBefore = bucketFiles(bOf(kOther))
    // purge subject 1 (the absent-key no-op is the idempotence re-run
    // below — same code path, and it cannot perturb the control bucket)
    val deleted = StreamingScd.purgeKeys(Seq(1L).toDF("k"),
      "k", Seq("attr"), "ts", "tie", obs, dimp)
    assert(deleted == 2L, s"subject 1 had two observations, got $deleted")
    // the compliance sweep: NO data file under either store names the
    // subject. (The suppression list under _purged/ retains the BARE key
    // by design — the minimal identifier needed to honor the erasure
    // against replays and re-sends; every payload byte is gone.)
    def allParquet(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allParquet)
      else if (f.getName.endsWith(".parquet") &&
        f.getPath.contains("__bucket=")) Seq(f.getPath)
      else Seq.empty
    Seq(s"$tmp/obs", s"$tmp/dim").foreach { store =>
      val ks = spark.read.parquet(allParquet(new java.io.File(store)): _*)
        .select(col("k")).as[Long].collect().toSet
      assert(!ks.contains(1L),
        s"purged key must be gone from every file under $store, got $ks")
    }
    // the co-bucketed survivor re-versions to exactly the batch answer
    val dim = StreamingScd.dim(spark, dimp)
      .select(col("k"), col("version"), col("state.attr").as("a"),
        col("is_current"))
      .as[(Long, Long, String, Boolean)].collect().toSet
    assert(dim == Set(
      (kSame, 1L, "a", false), (kSame, 2L, "c", true),
      (kOther, 1L, "a", true)),
      s"survivors must re-version from the purged log: $dim")
    // the untouched bucket was never rewritten
    assert(bucketFiles(bOf(kOther)) == otherBefore,
      "untouched buckets must stay byte-identical across a purge")
    // idempotent: a re-run erases nothing further and changes nothing
    assert(StreamingScd.purgeKeys(Seq(1L).toDF("k"),
      "k", Seq("attr"), "ts", "tie", obs, dimp) == 0L)
    // the RESURRECTION pin: the log merge is idempotent on tie ids, and
    // the purge just erased the subject's — a committed batch replayed
    // after the purge must NOT re-ingest the subject from its own
    // payload (the suppression list blocks it), nor may an upstream
    // re-send under fresh observation ids
    StreamingScd.processBatch(b0, "k", Seq("attr"), "ts", "tie", obs, dimp)
    StreamingScd.processBatch(
      Seq((1L, "back", ts(30), 9L)).toDF("k", "attr", "ts", "tie"),
      "k", Seq("attr"), "ts", "tie", obs, dimp)
    assert(!StreamingScd.dim(spark, dimp).select(col("k"))
      .as[Long].collect().contains(1L),
      "a purged subject must never re-enter — not via replay, not via re-send")
    // purge the co-bucketed survivor too: its bucket empties in BOTH
    // stores and the stale dirs drop rather than survive un-replaced
    assert(StreamingScd.purgeKeys(Seq(kSame, 1L).toDF("k"),
      "k", Seq("attr"), "ts", "tie", obs, dimp) == 2L)
    assert(!new java.io.File(s"$tmp/dim/__bucket=${bOf(1L)}").exists() &&
      !new java.io.File(s"$tmp/obs/__bucket=${bOf(1L)}").exists(),
      "an emptied bucket's stale dir must drop in both stores")
  }

  test("stateful sessions: event-time timeout flushes an idle session in streaming mode") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulSessions
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[(Long, Timestamp, Long)]
    val events = input.toDF().toDF("user_id", "ts", "event_id")
      .withWatermark("ts", "0 seconds")
    val q = StatefulSessions.sessionize(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart — one open session, timeout armed at +30
      input.addData((1L, ts(0), 1L), (1L, ts(10), 2L))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 0, "open session must not emit yet")
      // unrelated event far in the future advances the watermark past the timeout
      input.addData((2L, ts(600), 3L))
      q.processAllAvailable()
      // timeouts fire against the previous batch's watermark -> one more batch
      input.addData((2L, ts(610), 4L))
      q.processAllAvailable()
      val sessions = spark.table("sess_timeout")
        .select("user_id", "n", "first_ev", "last_ev")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(sessions.contains((1L, 2L, 1L, 2L)),
        s"idle session must be flushed by the event-time timeout, got $sessions")
    } finally q.stop()
  }

  test("transformWithState sessions: timers flush idle sessions, gap splits emit inline") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.TwsSessions
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    // transformWithState requires the RocksDB state store
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)
      val input = MemoryStream[(Long, Timestamp, Long)]
      val events = input.toDF().toDF("user_id", "ts", "event_id")
        .withWatermark("ts", "0 seconds")
      val q = TwsSessions.sessionize(events, gapMinutes = 30)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        // user 1: two events 10 min apart -> one open session
        input.addData((1L, ts(0), 1L), (1L, ts(10), 2L))
        q.processAllAvailable()
        assert(spark.table("tws_sessions").count() == 0, "open session must not emit yet")
        // user 1 again 100 min later: gap exceeded -> closed session emits
        // INLINE from handleInputRows, new session opens
        input.addData((1L, ts(110), 5L))
        q.processAllAvailable()
        val inline = spark.table("tws_sessions")
          .select("user_id", "n", "first_ev", "last_ev")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(inline == Set((1L, 2L, 1L, 2L)), s"gap split must emit inline, got $inline")
        // advance the watermark far past the open session's deadline; the
        // timer fires against the previous batch's watermark -> one extra batch
        input.addData((2L, ts(600), 6L))
        q.processAllAvailable()
        input.addData((2L, ts(610), 7L))
        q.processAllAvailable()
        val all = spark.table("tws_sessions")
          .select("user_id", "n", "first_ev", "last_ev")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(all.contains((1L, 1L, 5L, 5L)),
          s"idle session must be flushed by the event-time TIMER, got $all")
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming gk: multi-batch register shards fold by the union law — " +
    "exact total weight, bounded rank error") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Gk
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("gk_stream_").toString
    val input = MemoryStream[(Long, Long)]
    val (k, buckets) = (32, 4)
    val all = scala.collection.mutable.ArrayBuffer.empty[Long]
    // three separate AvailableNow drains over one checkpoint = three real
    // microbatches, each landing its own register shard
    Seq(0 until 400, 400 until 900, 900 until 1500).foreach { r =>
      val rows = r.map(i => (i.toLong, (i * 2654435761L) % 100003L))
      all ++= rows.map(_._2)
      input.addData(rows: _*)
      Gk.streamingRegisters(input.toDF().toDF("id", "v"), "v", "id", Nil,
        s"$tmp/regs", s"$tmp/ckpt", k, buckets)
    }
    val regs = Gk.readMergedRegisters(spark, s"$tmp/regs", Nil)
    val rows = regs.as[(Double, Long)].collect()
    assert(rows.map(_._2).sum === all.length.toLong,
      "merged shards must conserve total weight exactly")
    // per-batch error adds: sum_b (n_b/k + buckets)
    val errBound = Seq(400, 500, 600).map(n => n.toLong / k + buckets).sum
    val sorted = all.map(_.toDouble).sorted
    Gk.estimate(regs, Nil, Seq(("p50", 1, 2), ("p90", 9, 10)))
      .select(col("q"), col("k_target"), col("est"))
      .as[(String, Long, Double)].collect().foreach { case (label, kt, est) =>
        assert(sorted.count(_ <= est) >= kt && sorted.count(_ < est) < kt + errBound,
          s"$label: streamed est $est outside rank window [$kt, ${kt + errBound})")
      }
  }

  test("streaming anomaly: zero trailing sum drops the row (batch DIV-null semantics), no crash") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingAnomaly
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)
      val input = MemoryStream[(Long, Timestamp, Long, Double)]
      val events = input.toDF().toDF("user_id", "ts", "event_id", "value")
      val q = StreamingAnomaly.detect(events).toDF()
        .writeStream.format("memory").queryName("anom_zero")
        .outputMode("append").start()
      try {
        // six all-zero events fill the ring; event 7 is judged against a
        // trailing sum of 0 — the batch twin's SQL DIV yields NULL and the
        // row drops out of the > 20000 filter, so the stream must DROP it
        // too (pre-fix: ArithmeticException killed the query here)
        input.addData((1 to 7).map(i =>
          (1L, ts(i), i.toLong, if (i <= 6) 0.0 else 5.0)): _*)
        q.processAllAvailable()
        // event 8 vs ring [0,0,0,0,0,0,500]: n=7, s=500,
        // dev = |500*7-500|*10^4 div 500 = 60000 > 20000 -> flagged
        input.addData((1L, ts(8), 8L, 5.0))
        q.processAllAvailable()
        val got = spark.table("anom_zero")
          .select("event_id", "c", "n_trail", "s_trail", "dev_bp")
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        assert(got === Set((8L, 500L, 7L, 500L, 60000L)),
          s"only event 8 may flag; zero-sum rows must drop silently, got $got")
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming ingest: shards are idempotent under replay, scrub+gate+encode applied") {
    import spark.implicits._
    import graft.streaming.StreamingIngest
    import graft.operators.Bpe
    val corpus = Seq(
      (1L, "alice at alice@example.com says the merge rules converge fast"),
      (2L, "short"), // gated out: fewer than 5 tokens after scrubbing
      (3L, "the merge rules converge fast says the other machine today"))
      .toDF("doc_id", "text")
    val model = Bpe.train(
      corpus.select(graft.functions.TextFns.redactPii(col("text")).as("text")),
      "text", numMerges = 10)
    val tmp = java.nio.file.Files.createTempDirectory("graft_si_").toString
    StreamingIngest.processBatch(corpus, "doc_id", "text", model,
      minTokens = 5, s"$tmp/shards", batchId = 0L)
    val once = StreamingIngest.shards(spark, s"$tmp/shards", "doc_id")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(once.map(_._1) == Seq(1L, 3L), s"gate must drop doc 2: $once")
    assert(!once.head._2.isEmpty && once.head._4 > 0)
    // the email must have been redacted BEFORE encoding: the raw address
    // word never reaches the dictionary
    val rawIds = Bpe.encodeWord("alice@example.com", model)
    val redIds = Bpe.encodeWord("<email>", model)
    assert(once.head._2.contains(redIds.mkString(" ")) &&
      !once.head._2.contains(rawIds.mkString(" ")),
      "scrub must run before encode")
    // full redelivery of the same batch is a no-op
    StreamingIngest.processBatch(corpus, "doc_id", "text", model,
      minTokens = 5, s"$tmp/shards", batchId = 0L)
    val twice = StreamingIngest.shards(spark, s"$tmp/shards", "doc_id")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(twice == once, "replayed batch must not duplicate or change rows")
  }

  test("streaming CDC: out-of-order batches converge, tombstones persist, replay is a no-op") {
    import graft.streaming.StreamingCdc
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_scdc_").toString
    val log = s"file:$tmp/log"
    val snp = s"file:$tmp/snap"
    // a second key in a DIFFERENT hash bucket than key 1, so the
    // untouched-partition claim below is observable
    val bOf = Seq((1L to 20L): _*).toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val k2 = (2L to 20L).find(bOf(_) != bOf(1L)).get
    def snapSet() = StreamingCdc.snapshot(spark, snp)
      .as[(Long, String)].collect().toSet

    val base = Seq((1L, "a"), (k2, "b"), (17L, "c")).toDF("id", "v")
    StreamingCdc.bootstrap(base, "id", Seq("seq"), Seq("bigint"),
      "op", "tie", log, snp)
    // bootstrap is itself replay-safe: guarded by the log dir
    StreamingCdc.bootstrap(base, "id", Seq("seq"), Seq("bigint"),
      "op", "tie", log, snp)
    assert(snapSet() == Set((1L, "a"), (k2, "b"), (17L, "c")))

    // batch 0 arrives with the LATEST changes first (seq 2 before seq 1),
    // plus a tombstone for k2
    val b0 = Seq((1L, "a2", "U", 2L, 100L), (k2, "dead", "D", 1L, 101L))
      .toDF("id", "v", "op", "seq", "tie")
    StreamingCdc.processBatch(b0, "id", Seq("seq"), "op", "tie", log, snp)
    val s1 = snapSet()
    assert(s1 == Set((1L, "a2"), (17L, "c")), s"batch 0: $s1")
    // k2 was alone in its bucket: the tombstone emptied the bucket, and
    // dynamic overwrite alone would have left the stale partition behind
    assert(!new java.io.File(s"$tmp/snap/__bucket=${bOf(k2)}").exists(),
      "an emptied bucket's partition must be dropped, not left stale")

    // exact redelivery: log merge anti-joins to nothing, snapshot holds
    StreamingCdc.processBatch(b0, "id", Seq("seq"), "op", "tie", log, snp)
    assert(snapSet() == s1, "replayed batch must be a complete no-op")

    // a redelivered change id with a DIFFERENT payload is an upstream
    // bug — surfaced loudly, never silently dropped by the merge
    val bad = Seq((1L, "zzz", "U", 2L, 100L)).toDF("id", "v", "op", "seq", "tie")
    val e = intercept[IllegalArgumentException] {
      StreamingCdc.processBatch(bad, "id", Seq("seq"), "op", "tie", log, snp)
    }
    assert(e.getMessage.contains("DIFFERENT payload"))
    assert(snapSet() == s1, "a rejected batch must leave the snapshot untouched")

    // batch 1 delivers the STRAGGLERS: an older update for key 1 (must
    // lose to the already-applied seq 2) and an older update for k2 (must
    // lose to the tombstone); key 17's bucket is never touched
    def bucketFiles(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$tmp/snap/__bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val k17Before = bucketFiles(bOf(17L))
    assert(k17Before.nonEmpty)
    val b1 = Seq((1L, "a1", "U", 1L, 102L), (k2, "b0", "U", 0L, 103L))
      .toDF("id", "v", "op", "seq", "tie")
    StreamingCdc.processBatch(b1, "id", Seq("seq"), "op", "tie", log, snp)
    val s2 = snapSet()
    assert(s2 == Set((1L, "a2"), (17L, "c")),
      s"stragglers must lose to later seq and to the tombstone: $s2")
    assert(bucketFiles(bOf(17L)) == k17Before,
      "untouched bucket partitions must not be rewritten")

    // a LATER update resurrects a tombstoned key; an insert of a key the
    // base never had appears
    val b2 = Seq((k2, "b2", "U", 9L, 104L), (55L, "new", "U", 1L, 105L))
      .toDF("id", "v", "op", "seq", "tie")
    StreamingCdc.processBatch(b2, "id", Seq("seq"), "op", "tie", log, snp)
    val s3 = snapSet()
    assert(s3 == Set((1L, "a2"), (k2, "b2"), (17L, "c"), (55L, "new")),
      s"resurrect + insert: $s3")
    // and the maintained snapshot equals the batch MERGE over the same log
    val batchMerge = graft.operators.Cdc.applyDeltas(
      base, b0.unionByName(b1).unionByName(b2).drop("tie"),
      "id", Seq("seq")).as[(Long, String)].collect().toSet
    assert(s3 == batchMerge, "streaming snapshot must equal the batch MERGE")
  }

  test("CDC compliance purge: the subject's bytes — base rows, updates, AND " +
      "the delete tombstone that still carries their last payload — are " +
      "gone from both stores; survivors re-resolve; idempotent") {
    import graft.streaming.StreamingCdc
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_pcdc_").toString
    val log = s"file:$tmp/log"
    val snp = s"file:$tmp/snap"
    val bOf = Seq((1L to 40L): _*).toDF("k")
      .select(col("k"), pmod(xxhash64(col("k")), lit(16L)).cast("int").as("b"))
      .as[(Long, Int)].collect().toMap
    val kSame = (2L to 40L).find(bOf(_) == bOf(1L)).get
    val base = Seq((1L, "a"), (kSame, "b")).toDF("id", "v")
    StreamingCdc.bootstrap(base, "id", Seq("seq"), Seq("bigint"),
      "op", "tie", log, snp)
    // subject 1 gets an update and then a CDC DELETE — the tombstone row
    // still carries their key and last payload in the log
    val b0 = Seq((1L, "a2", "U", 1L, 100L), (1L, "gone", "D", 2L, 101L),
      (kSame, "b2", "U", 1L, 102L)).toDF("id", "v", "op", "seq", "tie")
    StreamingCdc.processBatch(b0, "id", Seq("seq"), "op", "tie", log, snp)
    def snapSet() = StreamingCdc.snapshot(spark, snp)
      .as[(Long, String)].collect().toSet
    assert(snapSet() == Set((kSame, "b2")),
      "the tombstone must already hide subject 1 from the SNAPSHOT")
    // ...but the LOG still holds 3 rows naming the subject — the purge
    // is what erases those bytes
    val deleted = StreamingCdc.purgeKeys(Seq(1L).toDF("id"),
      "id", Seq("seq"), "op", "tie", log, snp)
    assert(deleted == 3L,
      s"base row + update + tombstone must all be erased, got $deleted")
    // (the _purged suppression list retains the BARE key by design — the
    // minimal identifier needed to honor the erasure; payload bytes gone)
    def allParquet(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allParquet)
      else if (f.getName.endsWith(".parquet") &&
        f.getPath.contains("__bucket=")) Seq(f.getPath)
      else Seq.empty
    Seq(s"$tmp/log", s"$tmp/snap").foreach { store =>
      val ids = spark.read.parquet(allParquet(new java.io.File(store)): _*)
        .select(col("id")).as[Long].collect().toSet
      assert(!ids.contains(1L),
        s"the subject must be gone from every file under $store, got $ids")
    }
    // the co-bucketed survivor re-resolved to the same state
    assert(snapSet() == Set((kSame, "b2")),
      "survivors must re-resolve unchanged from the purged log")
    // idempotent re-run
    assert(StreamingCdc.purgeKeys(Seq(1L).toDF("id"),
      "id", Seq("seq"), "op", "tie", log, snp) == 0L)
    // the RESURRECTION pin: the log merge is idempotent on change ids,
    // and the purge just erased the subject's — a committed batch
    // replayed after the purge must NOT re-ingest the subject (the
    // suppression list blocks it), nor may a re-send under fresh ids
    StreamingCdc.processBatch(b0, "id", Seq("seq"), "op", "tie", log, snp)
    StreamingCdc.processBatch(
      Seq((1L, "back", "U", 9L, 200L)).toDF("id", "v", "op", "seq", "tie"),
      "id", Seq("seq"), "op", "tie", log, snp)
    val logIds = spark.read.parquet(allParquet(new java.io.File(s"$tmp/log")): _*)
      .select(col("id")).as[Long].collect().toSet
    assert(!logIds.contains(1L) && snapSet() == Set((kSame, "b2")),
      "a purged subject must never re-enter — not via replay, not via re-send")
    // purging the survivor empties the bucket in BOTH stores
    assert(StreamingCdc.purgeKeys(Seq(kSame).toDF("id"),
      "id", Seq("seq"), "op", "tie", log, snp) == 2L)
    assert(!new java.io.File(s"$tmp/log/__bucket=${bOf(1L)}").exists() &&
      !new java.io.File(s"$tmp/snap/__bucket=${bOf(1L)}").exists(),
      "an emptied bucket's stale dir must drop in both stores")
  }

  test("streaming IVF-PQ append: committed-batch replay is a ledger no-op, " +
    "a half-landed staging replay commits exactly once, and a checkpoint " +
    "restart continues the batch sequence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    import graft.streaming.StreamingIndex
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val inc = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
      .as[(Long, Seq[Float])].collect()
    def grp(r: Int) = inc.filter(_._1 / 3 % 3 == r)
    assert(grp(0).nonEmpty && grp(1).nonEmpty && grp(2).nonEmpty,
      "fixture needs three non-empty arrival groups")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_").toString
    Similarity.buildIvfPqIndex(base, tmp)

    // two real microbatches through the sink
    val input = MemoryStream[(Long, Seq[Float])]
    val sink = StreamingIndex.indexAppendSink(
      input.toDF().toDF("nid", "ne"), tmp, s"$tmp/ckpt")
    try {
      Seq(0, 1).foreach { r =>
        input.addData(grp(r).toSeq); sink.processAllAvailable()
      }
    } finally sink.stop()

    def codesmap(): List[String] =
      scala.io.Source.fromFile(s"$tmp/CODESMAP").getLines().toList
    val after2 = codesmap()
    val ledger = after2.find(_.startsWith("applied="))
      .get.stripPrefix("applied=").split(",").filter(_.nonEmpty).toSet
    assert(ledger.size == 2 && ledger.forall(_.startsWith("batch-")),
      s"two streamed batches must land two ledger ids, got $ledger")

    // replay EVERY committed batch id (restart-after-crash): detected
    // no-ops — the catalog file is byte-identical, nothing re-lands
    ledger.foreach { id =>
      Similarity.appendToIvfPqIndex(grp(0).toSeq.toDF("nid", "ne"), tmp,
        appendId = id)
    }
    assert(codesmap() == after2,
      "replaying committed batch ids must not touch the catalog")

    // half-landed interleaving: staging for a NEW id exists (with junk
    // rows simulating a crash mid-write), the catalog never saw it — the
    // retry must overwrite the staging in place and commit exactly once
    Seq((-999L, grp(2).head._2)).toDF("nid", "ne")
      .write.parquet(s"$tmp/appends/batch-99/cell=0")
    Similarity.appendToIvfPqIndex(grp(2).toSeq.toDF("nid", "ne"), tmp,
      appendId = "batch-99")
    val served = Similarity.readIvfPqCodes(spark, tmp)
      .groupBy(col("nid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(!served.contains(-999L),
      "the junk half-landed row must be overwritten, never served")
    assert(served.values.forall(_ == 1L),
      "every id must be indexed exactly once after replays")
    assert(grp(2).forall(v => served.contains(v._1)),
      "the retried batch's rows must all be present")

    // a restart from the same checkpoint (same source, new query)
    // continues the batch sequence rather than reusing a committed id:
    // a NEW arrival lands under a fresh ledger entry
    val emb2 = emb.filter(col("vec_id") % 3 === 1).limit(5)
      .select((col("vec_id") + 1000000L).as("nid"), col("embedding").as("ne"))
      .as[(Long, Seq[Float])].collect()
    val sink2 = StreamingIndex.indexAppendSink(
      input.toDF().toDF("nid", "ne"), tmp, s"$tmp/ckpt")
    try { input.addData(emb2.toSeq); sink2.processAllAvailable() }
    finally sink2.stop()
    val finalLedger = codesmap().find(_.startsWith("applied="))
      .get.stripPrefix("applied=").split(",").filter(_.nonEmpty).toSet
    assert(finalLedger.size == 4,
      s"restart must mint a fresh batch id, got $finalLedger")
    val served2 = Similarity.readIvfPqCodes(spark, tmp)
      .groupBy(col("nid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(emb2.forall(v => served2(v._1) == 1L),
      "post-restart arrivals must serve exactly once")
  }

  test("streaming aggregate store: the first batch creates the store, " +
    "committed-batch replay is a ledger no-op (an aggregate increment is " +
    "NOT idempotent — the ledger is what makes it exactly-once), and a " +
    "checkpoint restart mints a fresh batch id") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.AggStore
    import graft.streaming.StreamingAggStore
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft_saggs_").toString
    val store = s"$tmp/aggs"
    def current(): List[String] =
      scala.io.Source.fromFile(s"$store/CURRENT").getLines().toList
    def state() = AggStore.readAggStore(spark, store)
      .as[(Long, Long, Long)].collect().toSet

    val input = MemoryStream[(Long, Long)]
    val sink = StreamingAggStore.aggStoreSink(input.toDF().toDF("k", "v"),
      store, s"$tmp/ckpt", keyCol = "k", valCol = "v", nBuckets = 8)
    try {
      input.addData(Seq((1L, 10L), (2L, 20L))) // batch 0: BUILDS the store
      sink.processAllAvailable()
      input.addData(Seq((1L, 1L), (3L, 30L)))  // batch 1: merges
      sink.processAllAvailable()
    } finally sink.stop()
    val after2 = current()
    val ledger = after2.find(_.startsWith("applied="))
      .get.stripPrefix("applied=").split(",").filter(_.nonEmpty).toSet
    assert(ledger == Set("batch-0", "batch-1"),
      s"both batches must land ledger entries, got $ledger")
    val st2 = state()
    assert(st2 == Set((1L, 2L, 11L), (2L, 1L, 20L), (3L, 1L, 30L)),
      "streamed folds must produce the exact per-key counts and sums")

    // replay EVERY committed batch id with a would-double-count increment:
    // detected no-ops — manifest byte-identical, state untouched (this is
    // the case the quotient-merge store wins by algebra and THIS store can
    // only win by the ledger)
    ledger.foreach { id =>
      AggStore.mergeIntoAggStore(Seq((1L, 999L)).toDF("k", "v"),
        store, "k", "v", appliedId = Some(id))
    }
    assert(current() == after2 && state() == st2,
      "replaying committed batch ids must not change manifest or state")

    // a restart from the same checkpoint continues the batch sequence:
    // a NEW arrival lands under a fresh ledger entry, folded exactly once
    val sink2 = StreamingAggStore.aggStoreSink(input.toDF().toDF("k", "v"),
      store, s"$tmp/ckpt", keyCol = "k", valCol = "v", nBuckets = 8)
    try { input.addData(Seq((2L, 2L))); sink2.processAllAvailable() }
    finally sink2.stop()
    val finalLedger = current().find(_.startsWith("applied="))
      .get.stripPrefix("applied=").split(",").filter(_.nonEmpty).toSet
    assert(finalLedger == Set("batch-0", "batch-1", "batch-2"),
      s"restart must mint a fresh batch id, got $finalLedger")
    assert(state() == Set((1L, 2L, 11L), (2L, 2L, 22L), (3L, 1L, 30L)),
      "post-restart arrivals must fold exactly once")
  }
}
