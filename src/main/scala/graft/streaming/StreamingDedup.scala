package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Dedup

/** Continuous corpus ingestion with near-dup detection — the production
  * shape for a training-data pipeline that receives documents as a stream:
  * each microbatch is checked against the ever-growing persisted corpus
  * (and itself) with `Dedup.incrementalPairsSigned`, verified pairs land
  * in a per-batch shard, and the batch then merges into the corpus store.
  * Old–old pairs are never recomputed — each arriving document is paired
  * against history exactly once, which is what keeps a continuously-running
  * dedup affordable at 100 TB (cost per day ∝ increment × bands, not
  * corpus²).
  *
  * The store is SIGNATURE-BEARING: every merged document carries its
  * text digest, shingle set, MinHash signature, and LSH band keys
  * (`id, text, __th, __sh, __sig, __bk`), each computed exactly once at
  * merge time; the signature parameters are pinned in a meta file so a
  * redeploy under different banding fails loudly instead of silently
  * never matching history. A microbatch therefore pays text processing only for its OWN
  * documents; history contributes column-pruned parquet scans — `(id,
  * __bk)` into the banding stage and `(id, __sh)` into the Jaccard
  * verification join-backs — and is never re-tokenized (StreamingSpec pins
  * that the store-fed pairing plan contains no tokenizer and never reads
  * the text column). Storing `__sh` trades ~text-sized storage for a
  * tokenize-free verify; a deployment tighter on storage than CPU can drop
  * it and re-shingle only the (bounded) candidate-matched history rows.
  * `__sig` itself is not read on the hot path (banding consumes `__bk`)
  * but is what allows re-banding the corpus under a different bands/rows
  * split without re-signing it. At cluster scale, bucket the store by id
  * so the anti-join probe and the verify join-backs prune to buckets.
  *
  * Exactly-once under microbatch replay, by construction, in two layers:
  *
  *  1. The pairs shard for batch b is written only if its committed
  *     `_SUCCESS` marker is absent (torn shards from a mid-write crash are
  *     overwritten on retry — same rule as `Sketches.streamingCountMin`).
  *  2. Batch documents whose ids are already in the store are dropped
  *     before pairing (`left_anti` on the store's id column), so a batch
  *     redelivered after its store merge committed generates ZERO pairs,
  *     and the store merge itself is `Streams.idempotentMerge`.
  *
  * The pairs write runs BEFORE the store merge: a crash between the two
  * replays the batch with its ids not yet merged, so the shard is
  * recomputed against the same store state; the reverse order would lose
  * the batch's pairs forever (ids in store ⇒ newOnly empty on replay).
  */
object StreamingDedup {

  /** The batch enriched with the store columns: shingles, signature, band
    * keys — the single per-document text-processing pass of the whole
    * pipeline. Documents whose text yields no shingles keep null
    * `__sig`/`__bk` (they are corpus rows but can never pair).
    */
  private def enrich(batch: DataFrame, idCol: String, textCol: String,
                     numHashes: Int, bands: Int, shingleK: Int,
                     portableHash: Boolean): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    batch.select(col(idCol), col(textCol))
      // thin text digest for the cross-batch conflict probe: comparing
      // redelivered texts against history must not re-read the (wide)
      // text column per batch
      .withColumn("__th", md5(col(textCol).cast("binary")))
      .withColumn("__sh",
        array_distinct(TextFns.wordShingles(TextFns.tokens(col(textCol)), shingleK)))
      .withColumn("__sig", when(size(col("__sh")) > 0,
        graft.expressions.MinHashSig(col("__sh"), numHashes, 7, portableHash)))
      .withColumn("__bk", when(size(col("__sh")) > 0,
        Dedup.bandKeys(col("__sig"), numHashes, bands, portableHash)))
  }

  /** The stored columns are a function of the signature parameters: a
    * store written under one (numHashes, bands, shingleK, portableHash)
    * silently never matches batches signed under another (band keys from
    * different slicings are never equal). The parameters are pinned in a
    * `_graft_dedup_meta.json` beside the parquet (underscore-prefixed, so
    * scans ignore it); every batch requires a match. Absence self-heals
    * (written after the first merge; a crash between merge and meta write
    * must not brick the store).
    */
  private def checkOrWriteMeta(fs: org.apache.hadoop.fs.FileSystem,
                               storePath: String, numHashes: Int, bands: Int,
                               shingleK: Int, portableHash: Boolean,
                               write: Boolean): Unit = {
    val meta = new org.apache.hadoop.fs.Path(storePath, "_graft_dedup_meta.json")
    val expected = s"""{"numHashes":$numHashes,"bands":$bands,""" +
      s""""shingleK":$shingleK,"portableHash":$portableHash}"""
    if (fs.exists(meta)) {
      val in = fs.open(meta)
      val found =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(found == expected,
        s"StreamingDedup: store at $storePath was built with $found — " +
          s"refusing to pair against it with $expected (rebuild the store " +
          "or match the parameters)")
    } else if (write) {
      val out = fs.create(meta, true)
      try out.write(expected.getBytes("UTF-8")) finally out.close()
    }
  }

  /** One microbatch step. Exposed (rather than inlined in the foreachBatch
    * closure) so replay semantics are unit-testable without checkpoint
    * machinery: calling it twice with the same batch must be a no-op.
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   storePath: String, pairsPath: String, batchId: Long,
                   numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3,
                   threshold: Double = 0.5, maxBucket: Int = 1000,
                   portableHash: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val pairsDir = s"$pairsPath/batch=$batchId"
    val storeP = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeP.getFileSystem(conf)
    val storeExists = fs.exists(storeP)
    checkOrWriteMeta(fs, storePath, numHashes, bands, shingleK, portableHash,
      write = false)
    // an at-least-once source can redeliver a record INSIDE one batch:
    // collapse exact (id, text) duplicates (a duplicated row would
    // otherwise pair with itself through the bucket expansion and land in
    // the store twice)
    val deduped = batch.select(col(idCol), col(textCol)).distinct()
    // increment-sized; cached because it feeds BOTH the pairing (inside the
    // shard guard) and the store merge — one tokenize pass per batch, ever
    val enriched = enrich(deduped, idCol, textCol,
      numHashes, bands, shingleK, portableHash).persist()
    try {
      // a redelivered id whose TEXT differs from the store is an upstream
      // bug the anti-join below would silently bury (the stale text would
      // keep representing the document forever) — fail loudly instead.
      // The probe reads only the store's (id, digest) columns, the same
      // thin-scan class as the replay guard's id read.
      if (storeExists) {
        val stale = spark.read.parquet(storePath)
          .select(col(idCol), col("__th"))
          .join(broadcast(enriched.select(col(idCol), col("__th").as("__bth"))),
            Seq(idCol))
          .filter(!(col("__th") <=> col("__bth"))).count()
        require(stale == 0,
          s"StreamingDedup: $stale id(s) redelivered with DIFFERENT text " +
            "than the store holds — upstream must version corrections as " +
            "new document ids")
      }
      Streams.idempotentShardWrite(spark, pairsDir) {
        // fail loudly on conflicting texts under one id — the batch is
        // increment-sized, so the check is bounded
        val conflicts = deduped.groupBy(col(idCol))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
        require(conflicts == 0,
          s"StreamingDedup: $conflicts id(s) arrive with conflicting texts " +
            "in one batch — upstream must version or de-conflict ids")
        val existingIds =
          if (storeExists) spark.read.parquet(storePath).select(col(idCol))
          else deduped.select(col(idCol)).limit(0)
        // replay guard: ids already merged into the store are not "new" —
        // this also guarantees incrementalPairsSigned's disjointness contract
        val newSigned = enriched
          .join(existingIds, Seq(idCol), "left_anti")
          .filter(col("__sig").isNotNull)
          .select(col(idCol).as("__id"), col("__sh"), col("__bk"))
        val pairs =
          if (newSigned.isEmpty) {
            // fully-redelivered batch: emit the empty shard without scanning
            // the whole store's band keys just to pair nothing against them
            val schema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("new_id",
                batch.schema(idCol).dataType),
              org.apache.spark.sql.types.StructField("dup_id",
                batch.schema(idCol).dataType),
              org.apache.spark.sql.types.StructField("dup_is_existing",
                org.apache.spark.sql.types.BooleanType),
              org.apache.spark.sql.types.StructField("jaccard",
                org.apache.spark.sql.types.DoubleType)))
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          } else Dedup.incrementalPairsSigned(newSigned,
            existingSigned(spark, storePath, idCol, storeExists, enriched),
            threshold, maxBucket,
            // the left_anti above structurally guarantees disjointness —
            // skip the core's corpus-proportional re-probe per batch
            checkDisjoint = false)
        pairs.write.mode("overwrite").parquet(pairsDir)
      }
      Streams.idempotentMerge(enriched, idCol, storePath)
      checkOrWriteMeta(fs, storePath, numHashes, bands, shingleK, portableHash,
        write = true)
    } finally enriched.unpersist(false)
  }

  /** History as a pairing side, read STRAIGHT from the store's persisted
    * columns — no text read, no tokenizer in the plan.
    */
  private[graft] def existingSigned(spark: org.apache.spark.sql.SparkSession,
                                    storePath: String, idCol: String,
                                    storeExists: Boolean,
                                    emptyTemplate: DataFrame): DataFrame = {
    val src =
      if (storeExists) spark.read.parquet(storePath)
      else emptyTemplate.limit(0)
    src.filter(col("__sig").isNotNull)
      .select(col(idCol).as("__id"), col("__sh"), col("__bk"))
  }

  /** Attach the per-batch step to a streaming DataFrame of documents. */
  def sink(stream: DataFrame, idCol: String, textCol: String,
           storePath: String, pairsPath: String, checkpoint: String,
           numHashes: Int = 32, bands: Int = 8, shingleK: Int = 3,
           threshold: Double = 0.5, maxBucket: Int = 1000,
           portableHash: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, storePath, pairsPath, batchId,
          numHashes, bands, shingleK, threshold, maxBucket, portableHash)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** All pairs emitted so far, across every batch shard. */
  def pairs(spark: org.apache.spark.sql.SparkSession, pairsPath: String): DataFrame =
    spark.read.parquet(pairsPath)
      .select(col("new_id"), col("dup_id"), col("dup_is_existing"), col("jaccard"))
}
