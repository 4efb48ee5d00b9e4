package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** OHLC candle downsampling as a MERGEABLE summary (q164's streaming
  * sibling): each shard candle carries the (ts, event_id) keys of its open
  * and close, so candles built over disjoint row subsets fold
  * associatively — open of the earlier open-key wins, close of the later
  * close-key wins, high/low/volume are max/min/sum. That is the law that
  * lets a 100-TB feed keep per-hour candles current by aggregating ONLY
  * each increment and merging group-count-bounded shard tables, never
  * rescanning history.
  *
  * The streaming builder is the q108/q153 shard discipline: each
  * microbatch's candles land as their own `batch=<id>` directory, written
  * only if absent (`Streams.idempotentShardWrite`, Hadoop-FS-correct), so
  * a replayed microbatch is a no-op; `readMerged` folds every shard by the
  * merge law, and the drained stream's candles EQUAL the batch candles
  * over the same rows — exactly what the q166 oracle checks.
  */
object Ohlc {

  /** Per (hour, event_type) candle over integer cents, WITH the open/close
    * merge keys. `finish` drops the keys for presentation.
    */
  def candles(events: DataFrame): DataFrame =
    events
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
        col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("h"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"))).as("__ok"),
        min_by(col("c"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("c")).as("high"),
        min(col("c")).as("low"),
        max(struct(col("ts"), col("event_id"))).as("__ck"),
        max_by(col("c"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))

  /** Fold shard candles by the merge law. Closed under merging: the output
    * carries the surviving open/close keys, so shards-of-shards fold too.
    */
  def mergeCandles(shards: DataFrame): DataFrame =
    shards.groupBy(col("h"), col("event_type"))
      .agg(
        min(col("__ok")).as("__ok"),
        min_by(col("open"), col("__ok")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max(col("__ck")).as("__ck"),
        max_by(col("close"), col("__ck")).as("close"),
        sum(col("volume")).as("volume"))

  def finish(candles: DataFrame): DataFrame =
    candles.select(col("h"), col("event_type"), col("open"), col("high"),
      col("low"), col("close"), col("volume"))

  def streamingCandles(stream: DataFrame, targetPath: String,
                       checkpoint: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        Streams.idempotentShardWrite(batch.sparkSession, dir) {
          candles(batch).write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def readMerged(spark: SparkSession, targetPath: String): DataFrame =
    mergeCandles(spark.read.parquet(targetPath))
}
