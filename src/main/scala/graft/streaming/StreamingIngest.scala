package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Bpe

/** Continuous pretraining-data ingest — the streaming capstone that runs
  * q122's batch story against an unbounded source: each microbatch is
  * PII-scrubbed, gated on a portable minimum-length predicate, encoded
  * with a PRE-TRAINED broadcast BPE model, and appended as an idempotent
  * per-batch training shard.
  *
  * Train/serve parity by construction: the tokenizer is trained offline
  * ([[Bpe.train]]/[[Bpe.save]]) and only LOADED here — the stream never
  * retrains, so its token ids are byte-identical to the batch pipeline's
  * (the drifting-vocabulary failure mode of "retrain per batch" designs
  * cannot happen).
  *
  * Exactly-once under replay: the shard for batch b is written only if
  * its committed `_SUCCESS` marker is absent; a torn shard from a
  * mid-write crash is overwritten on retry (the
  * `Sketches.streamingCountMin` / `StreamingDedup` rule). Every stage in
  * the batch body is a narrow map — scrub and gate are Column regex
  * chains, encode is the zero-shuffle broadcast-model pass — so a
  * microbatch costs one scan and one shard write, no shuffles at all.
  */
object StreamingIngest {

  /** One microbatch step, exposed for replay testing without checkpoint
    * machinery: calling it twice with the same batchId must be a no-op.
    */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
                   model: Bpe.Model, minTokens: Int,
                   shardsPath: String, batchId: Long): Unit = {
    val dir = s"$shardsPath/batch=$batchId"
    Streams.idempotentShardWrite(batch.sparkSession, dir) {
      val scrubbed = batch
        .select(col(idCol), TextFns.redactPii(col(textCol)).as("__clean"))
        .filter(TextFns.wordCount(col("__clean")) >= minTokens)
      Bpe.encode(scrubbed, idCol, "__clean", model)
        .select(col(idCol), array_join(col("ids"), " ").as("ids_str"),
          col("n_words"), col("n_toks"), col("n_unk"))
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** Attach the per-batch step to a streaming DataFrame of documents. */
  def sink(stream: DataFrame, idCol: String, textCol: String,
           model: Bpe.Model, minTokens: Int,
           shardsPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, idCol, textCol, model, minTokens, shardsPath, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Everything ingested so far, across every batch shard. */
  def shards(spark: org.apache.spark.sql.SparkSession, shardsPath: String,
             idCol: String): DataFrame =
    spark.read.parquet(shardsPath)
      .select(col(idCol), col("ids_str"), col("n_words"), col("n_toks"),
        col("n_unk"))
}
