package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Count-Min sketch materialized AS A TABLE — the heavy-hitter /
  * frequency-estimation sketch for corpora too large to count exactly.
  *
  * Rather than a driver-side object, the sketch is a (row, bucket,
  * weight) DataFrame: one explode + one partial-aggregated groupBy builds
  * it, its size is exactly depth x width rows regardless of corpus size,
  * and two sketches built on different corpus shards MERGE by
  * union + re-aggregate — the property that makes CMS work on 100 TB
  * (build per-partition/per-day sketches, fold them, never re-scan).
  *
  * Hashing is the q68-proven portable md5 construction (row i hashes
  * token "i:token"), so estimates replay bit-identically in any engine
  * with md5 — the q107 oracle recomputes the full sketch AND the
  * row-wise-min estimates in DuckDB.
  *
  * Standard CMS guarantee: est(t) >= true(t), and
  * est(t) <= true(t) + eN with probability 1-d for w = ceil(e/eps),
  * d rows = ceil(ln(1/delta)).
  */
object Sketches {

  private def bucketCol(row: Int, token: org.apache.spark.sql.Column,
                        width: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(s"$row:"), token).cast("binary")), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the (row, bucket, w) sketch table over whitespace tokens. */
  def countMin(docs: DataFrame, textCol: String,
               depth: Int = 4, width: Int = 256): DataFrame = {
    val toks = docs.select(explode(TextFns.tokens(lower(col(textCol)))).as("t"))
    toks.select(col("t"), explode(array((0 until depth).map { r =>
        struct(lit(r).as("row"), bucketCol(r, col("t"), width).as("bucket"))
      }: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("w"))
  }

  /** Merge sketches built with identical (depth, width, hash family). */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("w")).as("w"))

  /** Streaming build: each microbatch's sketch lands as its own
    * `batch=<id>` directory, written ONLY if absent — the probe goes
    * through the Hadoop FileSystem API (HDFS/S3-correct, same rule as
    * Streams.idempotentMerge), so a replayed microbatch is a no-op instead
    * of double-counting into the running sketch. Readers call
    * `readMerged`, which unions every batch shard through `merge` —
    * cheap, because each shard is at most depth x width rows no matter
    * how much data the batch carried.
    */
  def streamingCountMin(stream: DataFrame, textCol: String, targetPath: String,
                        checkpoint: String, depth: Int = 4, width: Int = 256): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        // the shared _SUCCESS-guarded idempotency rule (see
        // Streams.idempotentShardWrite): a redelivered batch is a no-op,
        // a torn shard is safely overwritten — CMS est >= true holds
        graft.streaming.Streams.idempotentShardWrite(batch.sparkSession, dir) {
          countMin(batch, textCol, depth, width).write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard under `targetPath` into one sketch. */
  def readMerged(spark: org.apache.spark.sql.SparkSession, targetPath: String): DataFrame =
    merge(spark.read.parquet(targetPath).select(col("row"), col("bucket"), col("w")))

  /** Point estimates for a column of terms: min over the sketch's rows of
    * the bucket weights each term hashes into. The (tiny) sketch
    * broadcasts; the term side never shuffles.
    */
  def estimate(sketch: DataFrame, terms: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 256): DataFrame = {
    val hashed = terms.select(col(termCol).as("term"),
      explode(array((0 until depth).map { r =>
        struct(lit(r).as("row"), bucketCol(r, col(termCol), width).as("bucket"))
      }: _*)).as("rb"))
      .select(col("term"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    hashed.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("w"), lit(0L))).as("est"))
  }
}
