package graft

import graft.operators.Entities

/** Pins deletion-neighborhood fuzzy matching: all three edit kinds at
  * distance 1 are found (substitution, insertion, deletion — the latter
  * two exist only because the delete-0 variant is in the blocking set),
  * exact duplicates pair at distance 0, and distance-2 names never pair.
  */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  test("finds substitution, insertion, deletion, and exact pairs; rejects distance 2") {
    val df = Seq(
      (1L, "smith"), (2L, "smyth"), (3L, "smiths"), (4L, "smit"),
      (5L, "jones"), (6L, "smith")).toDF("id", "nm")
    val pairs = Entities.fuzzyPairs(df, "id", "nm")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 1L)), "substitution smith~smyth")
    assert(pairs.contains((1L, 3L, 1L)), "insertion smith~smiths")
    assert(pairs.contains((1L, 4L, 1L)), "deletion smith~smit")
    assert(pairs.contains((1L, 6L, 0L)), "exact duplicate pairs at distance 0")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "jones matches nothing")
    assert(!pairs.contains((3L, 4L, 2L)) && !pairs.exists(_._3 > 1),
      s"distance-2 pairs must be verified away: $pairs")
  }

  test("delete-2 neighborhoods find distance-2 pairs k=1 blocking provably misses") {
    // two substitutions at NON-ADJACENT positions (i->y at index 2 and 8):
    // no single deletion aligns the strings, so the k=1 neighborhoods
    // share no variant at all — this pair is invisible to k=1 blocking,
    // not merely rejected by its verify filter
    val df = Seq((1L, "alice smith"), (2L, "alyce smyth"), (3L, "bob"))
      .toDF("id", "nm")
    val k1 = Entities.fuzzyPairs(df, "id", "nm")
      .as[(Long, Long, Long)].collect().toSet
    assert(k1.isEmpty, s"k=1 must not even see the candidate: $k1")
    val k2 = Entities.fuzzyPairs(df, "id", "nm", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(k2 == Set((1L, 2L, 2L)), s"k=2 must verify the pair at distance 2: $k2")
  }

  test("transposition pairs verify at distance 2 under k=2") {
    // an adjacent transposition = two adjacent substitutions: k=1 blocking
    // sees the candidate (both sides' delete-1 hit the same string) but
    // its verify filter rejects dist 2; k=2 keeps it
    val df = Seq((1L, "Customer#12"), (2L, "Customer#21")).toDF("id", "nm")
    assert(Entities.fuzzyPairs(df, "id", "nm").count() == 0)
    val k2 = Entities.fuzzyPairs(df, "id", "nm", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(k2 == Set((1L, 2L, 2L)), s"transposition must pair at dist 2: $k2")
  }

  test("names longer than maxLen fail loudly instead of exploding the block index") {
    val df = Seq((1L, "x" * 70)).toDF("id", "nm")
    val e = intercept[Exception] {
      Entities.fuzzyPairs(df, "id", "nm", maxDist = 2).count()
    }
    assert(e.getMessage != null)
  }

  test("the default length cap tightens with k: 40 chars pass k=2, fail k=3") {
    // the variant blow-up is ~len^k/k!: a 64-char cap calibrated for k=2
    // (~2k variants) would admit 40k+ variants per name at k=3, so the
    // default scales down (an explicit maxLen always wins)
    val df = Seq((1L, "x" * 40), (2L, "y" * 40)).toDF("id", "nm")
    Entities.fuzzyPairs(df, "id", "nm", maxDist = 2).count() // passes: cap 64
    val e = intercept[Exception] {
      Entities.fuzzyPairs(df, "id", "nm", maxDist = 3).count() // cap 32
    }
    assert(e.getMessage != null)
    // explicit override restores the k=2 cap at the caller's risk
    Entities.fuzzyPairs(df, "id", "nm", maxDist = 3, maxLen = 64).count()
  }

  test("incremental pairs equal the full run's pairs that touch the increment") {
    val df = Seq(
      (1L, "smith"), (2L, "smyth"), (10L, "smiths"), (20L, "smit"),
      (5L, "jones"), (30L, "smith")).toDF("id", "nm")
    val newDf = df.filter($"id" % 10 === 0)
    val oldDf = df.filter($"id" % 10 =!= 0)
    val inc = Entities.incrementalFuzzyPairs(newDf, oldDf, "id", "nm")
      .as[(Long, Long, Boolean, Long)].collect().toSet
    // full-run pairs touching a new id, re-oriented new-first
    val full = Entities.fuzzyPairs(df, "id", "nm")
      .as[(Long, Long, Long)].collect().toSet
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
      .map { case (a, b, d) =>
        if (a % 10 == 0) (a, b, b % 10 != 0, d) else (b, a, a % 10 != 0, d)
      }
    assert(inc == full && inc.nonEmpty,
      s"incremental must equal the full run on increment-touching pairs: $inc vs $full")
    // old-old pairs are provably absent: every row carries a new-side id
    assert(inc.forall(_._1 % 10 == 0))
    // disjointness contract fails loudly
    val e = intercept[IllegalArgumentException] {
      Entities.incrementalFuzzyPairs(newDf, df, "id", "nm")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("ER compliance purge: the subject's name, variant rows, and pairs " +
      "are gone from every file; the suppression list blocks replay " +
      "resurrection and re-sends; survivors keep matching") {
    import graft.streaming.StreamingEntities
    val tmp = java.nio.file.Files.createTempDirectory("graft_pent_").toString
    val store = s"file:$tmp/store"
    val pairs = s"file:$tmp/pairs"
    def pairSet() = StreamingEntities.pairs(spark, pairs)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    val b0 = Seq((1L, "smith"), (2L, "smyth")).toDF("id", "nm")
    StreamingEntities.processBatch(b0, "id", "nm", store, pairs, 0L)
    StreamingEntities.processBatch(Seq((3L, "smiths")).toDF("id", "nm"),
      "id", "nm", store, pairs, 1L)
    assert(pairSet() == Set((1L, 2L, false, 1L), (3L, 1L, true, 1L)))
    // purge subject 1 — in names, vars, and both pairs shards
    val deleted = StreamingEntities.purgeIds(Seq(1L).toDF("id"), store,
      idCol = "id", pairsPath = Some(pairs))
    assert(deleted == 1L)
    // the sweep: no file under names/, vars/, or pairs/ names the subject
    def allParquet(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allParquet)
      else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Seq.empty
    Seq(s"$tmp/store/names" -> Seq("id"), s"$tmp/store/vars" -> Seq("id"),
      s"$tmp/pairs" -> Seq("new_id", "peer_id")).foreach { case (dir, cols) =>
      val fl = allParquet(new java.io.File(dir))
      if (fl.nonEmpty) {
        val found = spark.read.parquet(fl: _*)
          .select(cols.map(org.apache.spark.sql.functions.col): _*).collect()
          .flatMap(r => cols.indices.map(r.getLong)).toSet
        assert(!found.contains(1L),
          s"subject must be gone from every file under $dir, got $found")
      }
    }
    assert(pairSet() == Set.empty,
      s"both pairs named the subject — none may survive: ${pairSet()}")
    // replay of the committed batch 0 must NOT resurrect the subject
    // (shard guard holds, suppression list blocks the store merge)
    StreamingEntities.processBatch(b0, "id", "nm", store, pairs, 0L)
    assert(!StreamingEntities.names(spark, store)
      .as[(Long, String)].collect().map(_._1).contains(1L),
      "a replayed batch must not re-ingest the purged subject")
    // an upstream re-send under a fresh batch id is suppressed, while a
    // genuine new arrival still matches the surviving history
    StreamingEntities.processBatch(
      Seq((1L, "smith"), (4L, "smythe")).toDF("id", "nm"),
      "id", "nm", store, pairs, 2L)
    val after = pairSet()
    assert(!after.exists(p => p._1 == 1L || p._2 == 1L),
      s"the purged subject must never pair again: $after")
    assert(after.contains((4L, 2L, true, 1L)),
      s"survivors and new arrivals must keep matching: $after")
    // idempotent re-run
    assert(StreamingEntities.purgeIds(Seq(1L).toDF("id"), store,
      idCol = "id", pairsPath = Some(pairs)) == 0L)
  }

  test("streaming entity resolution: replay is a no-op, drift fails loudly, store prunes") {
    import graft.streaming.StreamingEntities
    val tmp = java.nio.file.Files.createTempDirectory("graft_sent_").toString
    val store = s"file:$tmp/store"
    val pairs = s"file:$tmp/pairs"
    def pairSet() = StreamingEntities.pairs(spark, pairs)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    val b0 = Seq((1L, "smith"), (2L, "smyth")).toDF("id", "nm")
    StreamingEntities.processBatch(b0, "id", "nm", store, pairs, 0L)
    assert(pairSet() == Set((1L, 2L, false, 1L)), s"batch-0 new-new: ${pairSet()}")
    // exact redelivery: committed shard skipped, merges anti-join to nothing
    StreamingEntities.processBatch(b0, "id", "nm", store, pairs, 0L)
    assert(pairSet() == Set((1L, 2L, false, 1L)))
    assert(StreamingEntities.names(spark, store).count() == 2)
    // redelivery under a NEW batch id (lost checkpoint): empty shard
    StreamingEntities.processBatch(b0, "id", "nm", store, pairs, 99L)
    assert(pairSet() == Set((1L, 2L, false, 1L)))
    assert(StreamingEntities.names(spark, store).count() == 2)
    // a genuine increment pairs against history, flagged existing
    StreamingEntities.processBatch(Seq((3L, "smiths")).toDF("id", "nm"),
      "id", "nm", store, pairs, 1L)
    assert(pairSet() == Set((1L, 2L, false, 1L), (3L, 1L, true, 1L)),
      s"increment must pair against history exactly once: ${pairSet()}")
    // parameter drift fails loudly (index depth cannot serve deeper queries)
    val e1 = intercept[IllegalArgumentException] {
      StreamingEntities.processBatch(Seq((9L, "smythe")).toDF("id", "nm"),
        "id", "nm", store, pairs, 2L, maxDist = 2)
    }
    assert(e1.getMessage.contains("built with"), e1.getMessage)
    // name drift under a known id fails loudly
    val e2 = intercept[IllegalArgumentException] {
      StreamingEntities.processBatch(Seq((1L, "totally else")).toDF("id", "nm"),
        "id", "nm", store, pairs, 3L)
    }
    assert(e2.getMessage.contains("DIFFERENT"), e2.getMessage)
    assert(pairSet().size == 2)
    // the store scans carry partition filters (bucket pruning reaches them)
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val varsSchema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("nm", StringType), StructField("__v", StringType),
      StructField("__vbk", IntegerType)))
    val vs = StreamingEntities.varsSide(spark, store, "id", "nm", Seq(0, 1), varsSchema)
    val scans = vs.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      s"variant-index scan must carry a partition filter:\n${vs.queryExecution.executedPlan}")
  }
}
