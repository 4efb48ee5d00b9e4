package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Continuous corpus ingestion with near-dup detection — the production
  * shape for a training-data pipeline that receives documents as a stream:
  * each microbatch is checked against the ever-growing persisted corpus
  * (and itself) with `Dedup.incrementalMinhashPairs`, verified pairs land
  * in a per-batch shard, and the batch then merges into the corpus store.
  * Old–old pairs are never recomputed — each arriving document is paired
  * against history exactly once, which is what keeps a continuously-running
  * dedup affordable at 100 TB (cost per day ∝ increment × bands, not
  * corpus²).
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
  *
  * The store here carries (id, text) and re-derives signatures per batch —
  * correct but re-tokenizes history each increment. At scale, persist the
  * signature/shingle columns alongside (compute once on ingest) and feed a
  * signature-bearing store straight into the banding stage; the plan is
  * otherwise identical (Dedup.scala's incremental docstring).
  */
object StreamingDedup {

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
    Streams.idempotentShardWrite(spark, pairsDir) {
      val storeP = new org.apache.hadoop.fs.Path(storePath)
      val existing =
        if (storeP.getFileSystem(conf).exists(storeP))
          spark.read.parquet(storePath).select(col(idCol), col(textCol))
        else batch.select(col(idCol), col(textCol)).limit(0)
      // an at-least-once source can redeliver a record INSIDE one batch:
      // collapse exact (id, text) duplicates (a duplicated row would
      // otherwise pair with itself through the bucket expansion), and
      // fail loudly on conflicting texts under one id — the batch is
      // increment-sized, so the check is bounded
      val deduped = batch.select(col(idCol), col(textCol)).distinct()
      val conflicts = deduped.groupBy(col(idCol))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      require(conflicts == 0,
        s"StreamingDedup: $conflicts id(s) arrive with conflicting texts " +
          "in one batch — upstream must version or de-conflict ids")
      // replay guard: ids already merged into the store are not "new" —
      // this also guarantees incrementalMinhashPairs' disjointness contract
      val newOnly = deduped
        .join(existing.select(col(idCol)), Seq(idCol), "left_anti")
      val pairs =
        if (newOnly.isEmpty) {
          // fully-redelivered batch: emit the empty shard without paying a
          // whole-store signature pass just to pair nothing against it
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
        } else Dedup.incrementalMinhashPairs(newOnly, existing, idCol, textCol,
          numHashes, bands, shingleK, threshold, maxBucket, portableHash)
      pairs.write.mode("overwrite").parquet(pairsDir)
    }
    Streams.idempotentMerge(batch.select(col(idCol), col(textCol)), idCol, storePath)
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
