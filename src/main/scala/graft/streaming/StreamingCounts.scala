package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming grouped daily counts as idempotent per-batch shards — the
  * ADDITIVE summary family member (counts merge by plain sum), next to
  * the max-merge HLL (q153), bottom-k KMV (q159), weight-union GK (q215)
  * and counter-merge MG (q223) shards.
  *
  * Each microbatch writes its own `(group, day, cnt)` aggregate under
  * `batch=<id>` with the `_SUCCESS` discipline
  * ([[Streams.idempotentShardWrite]]); the fold on read sums counts per
  * `(group, day)`. Because addition is associative/commutative and each
  * event lands in exactly one batch, the folded table EQUALS the batch
  * aggregate over the same rows for ANY batch split — which is what lets
  * a downstream detector (q239 feeds [[graft.operators.TimeSeries
  * .changePoint]]) answer with the batch oracle verbatim.
  *
  * Scale shape: per-batch output is bounded by groups × days touched in
  * the batch (not batch rows); the store grows one small shard per
  * batch and the fold is one sum-aggregate over shards.
  */
object StreamingCounts {

  def streamingDailyCounts(stream: DataFrame, groupCol: String, tsCol: String,
                           targetPath: String, checkpoint: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        Streams.idempotentShardWrite(batch.sparkSession, dir) {
          batch.groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
            .agg(count(lit(1)).as("cnt"))
            .write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard into whole-stream daily counts (sum law). */
  def readMergedDailyCounts(spark: SparkSession, targetPath: String,
                            groupCol: String): DataFrame =
    spark.read.parquet(targetPath)
      .groupBy(col(groupCol), col("day"))
      .agg(sum(col("cnt")).as("cnt"))
}
