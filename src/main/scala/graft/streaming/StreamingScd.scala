package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Scd

/** Streaming SCD Type-2 maintenance — the warehouse production shape:
  * observations arrive as a stream, and a persisted dimension table of
  * `[valid_from, valid_to)` version rows is kept current by re-versioning
  * ONLY the keys each microbatch touches. Late/out-of-order arrivals are
  * first-class: a key's versions are recomputed from its FULL merged
  * observation log, so an observation that lands between two existing
  * versions rewrites that key's history to what a batch run over all
  * observations would produce (q137 pins exactly that batch-equivalence).
  *
  * Two stores:
  *
  *   obsPath — append-only observation log, idempotent on `tieCol` (the
  *     unique observation id): a redelivered batch anti-joins to nothing.
  *   dimPath — the dimension, hash-partitioned by `bucket=` of the key.
  *     Per batch, only the buckets containing touched keys are rewritten
  *     (dynamic partition overwrite): untouched keys in those buckets are
  *     carried over, every other bucket's files are not even listed.
  *
  * Cost per batch ∝ touched buckets + the log scan for touched keys —
  * increment-proportional at a fixed key distribution, never a full-dim
  * rewrite. At cluster scale, partition the OBSERVATION log by the same
  * key hash so the re-versioning scan prunes to touched buckets too, and
  * size `nBuckets` so one bucket's dimension rows fit a write task.
  *
  * Exactly-once under replay, by construction: the log merge is
  * `Streams.idempotentMerge` (keyed on the observation id), and the
  * dimension rewrite is a DETERMINISTIC function of the merged log — a
  * redelivered batch merges nothing and overwrites the same bucket
  * partitions with byte-identical content. A crash between the two
  * stores replays into the correct state (log first, then dim).
  */
object StreamingScd {

  private def bucketOf(c: Column, nBuckets: Int): Column =
    pmod(xxhash64(c), lit(nBuckets.toLong)).cast("int")

  /** One microbatch step (exposed for replay-semantics tests, the
    * [[StreamingDedup.processBatch]] convention).
    */
  def processBatch(batch: DataFrame, keyCol: String, attrCols: Seq[String],
                   tsCol: String, tieCol: String,
                   obsPath: String, dimPath: String,
                   nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val obsCols = (Seq(keyCol) ++ attrCols ++ Seq(tsCol, tieCol)).map(col)
    // an at-least-once source can duplicate a row INSIDE one batch;
    // conflicting payloads under one observation id are upstream bugs and
    // fail loudly (the check is increment-sized)
    val obs = batch.select(obsCols: _*).distinct().persist()
    try {
      val conflicts = obs.groupBy(col(tieCol))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      require(conflicts == 0,
        s"StreamingScd: $conflicts observation id(s) arrive with conflicting " +
          "payloads in one batch — upstream must de-conflict")
      // ...and across batches: a redelivered observation id whose PAYLOAD
      // differs from what the log already holds would be silently dropped
      // by the idempotent merge (anti-join on the id), burying the same
      // upstream bug the in-batch check surfaces. The probe is bounded:
      // the increment's ids broadcast into a semi-join of the log.
      val obsP = new org.apache.hadoop.fs.Path(obsPath)
      if (obsP.getFileSystem(spark.sessionState.newHadoopConf()).exists(obsP)) {
        val payload = struct((Seq(keyCol) ++ attrCols ++ Seq(tsCol)).map(col): _*)
        val logged = spark.read.parquet(obsPath)
          .join(broadcast(obs.select(col(tieCol))), Seq(tieCol), "left_semi")
          .select(col(tieCol), payload.as("__logged"))
        val crossBatch = obs.select(col(tieCol), payload.as("__incoming"))
          .join(logged, Seq(tieCol))
          .filter(!(col("__incoming") <=> col("__logged"))).count()
        require(crossBatch == 0,
          s"StreamingScd: $crossBatch observation id(s) redelivered with a " +
            "DIFFERENT payload than the log holds — upstream must version " +
            "corrections as new observation ids")
      }
      Streams.idempotentMerge(obs, tieCol, obsPath)

      val touched = obs.select(col(keyCol)).distinct()
      // re-version ONLY the touched keys, from their full merged history
      // (scd2 is per-key independent, so this equals the global batch
      // result restricted to these keys)
      val log = spark.read.parquet(obsPath)
        .join(broadcast(touched), Seq(keyCol), "left_semi")
      val reversioned = Scd.scd2(log, keyCol, attrCols, tsCol, tieCol)
        .withColumn("__bucket", bucketOf(col(keyCol), nBuckets))

      // carry over untouched keys in the touched buckets; the bucket list
      // is bounded (<= nBuckets), so it pushes down as a STATIC partition
      // filter — buckets with no touched key are never listed. Materialize
      // before the overwrite below deletes the files being read.
      val dimP = new org.apache.hadoop.fs.Path(dimPath)
      val dimExists =
        dimP.getFileSystem(spark.sessionState.newHadoopConf()).exists(dimP)
      val kept =
        if (!dimExists) reversioned.limit(0)
        else {
          val buckets = touched.select(bucketOf(col(keyCol), nBuckets).as("b"))
            .distinct().collect().map(_.getInt(0))
          spark.read.parquet(dimPath)
            .where(col("__bucket").isin(buckets.map(Int.box): _*))
            .join(broadcast(touched), Seq(keyCol), "left_anti")
            .localCheckpoint(true)
        }

      reversioned.unionByName(kept)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(dimPath)
    } finally obs.unpersist(false)
  }

  /** Attach the per-batch step to a streaming DataFrame of observations. */
  def sink(stream: DataFrame, keyCol: String, attrCols: Seq[String],
           tsCol: String, tieCol: String,
           obsPath: String, dimPath: String, checkpoint: String,
           nBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, keyCol, attrCols, tsCol, tieCol,
          obsPath, dimPath, nBuckets)
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The dimension as a DataFrame (bucket column dropped). */
  def dim(spark: org.apache.spark.sql.SparkSession, dimPath: String): DataFrame =
    spark.read.parquet(dimPath).drop("__bucket")
}
