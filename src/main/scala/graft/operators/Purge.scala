package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted row deletion from a bucketed parquet store — the
  * right-to-be-forgotten / compliance-purge operation, done the way a
  * 100 TB table must do it: the store is partitioned by a portable md5
  * bucket of the key, a delete rewrites ONLY the partitions that can
  * hold the keys (everything else stays byte-identical on disk, which
  * `PurgeSpec` asserts file-for-file), and a bucket whose every row is
  * deleted has its stale partition directory dropped explicitly —
  * dynamic partition overwrite only replaces partitions the write
  * produces (the `StreamingCdc` lesson, applied in batch).
  *
  * Cost: touched-bucket discovery is one distinct over the keys
  * (bounded by `nBuckets`); the rewrite reads and writes touched
  * buckets only — deleting k keys from a b-bucket store costs
  * O(touched/b) of the table, not O(table). The keep-set is
  * materialized (`localCheckpoint`) before the overwrite so the job
  * never reads the path it is replacing. The anti-join's key side is
  * unhinted: AQE broadcasts a normal deletion list, and a pathological
  * key set degrades to a shuffle join instead of an OOM.
  *
  * IN-PLACE BY DESIGN — the one store that must NOT take the r14
  * snapshot-manifest discipline (Similarity's codes catalog, Dedup's
  * cluster-store generations): those keep superseded files on disk for
  * in-flight readers, but a compliance purge's whole point is that the
  * purged bytes are physically GONE when the call returns — reader
  * isolation here would mean retaining the data the subject asked to
  * erase until some later vacuum. The trade is a crash window instead:
  * a call torn between the dynamic overwrite and the emptied-dir drop
  * leaves a stale full-bucket directory, so a purge must be RE-RUN to
  * completion after a crash (it is idempotent — already-deleted keys
  * anti-join to the same keep-set and the same dirs drop).
  */
object Purge {

  private def bucketOf(c: Column, n: Int): Column =
    (conv(substring(md5(concat(lit("p:"), c.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long") % n).cast("int")

  /** Write `df` as a `__bucket=`-partitioned store keyed on `keyCol`. */
  def writeBucketed(df: DataFrame, keyCol: String, path: String,
                    nBuckets: Int = 16): Unit = {
    require(nBuckets >= 1, s"need nBuckets >= 1, got $nBuckets")
    df.withColumn("__bucket", bucketOf(col(keyCol), nBuckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(path)
  }

  /** Read the store back without the layout column. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("__bucket")

  /** Delete every row whose `keyCol` appears in `keys`, rewriting only
    * the touched bucket partitions. Returns the number of rows deleted.
    */
  def deleteKeys(spark: SparkSession, path: String, keyCol: String,
                 keys: DataFrame, nBuckets: Int = 16): Long = {
    val touched = keys.select(bucketOf(col(keyCol), nBuckets).as("__bucket"))
      .distinct().collect().map(_.getInt(0)).toSet // bounded by nBuckets
    if (touched.isEmpty) return 0L
    val bucketFilter = col("__bucket").isin(touched.toSeq: _*)
    val before = spark.read.parquet(path).where(bucketFilter)
    val keep = before
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .localCheckpoint(true) // never read `path` while overwriting it
    val deleted = before.count() - keep.count()
    keep.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(path)
    // a fully-deleted bucket produces no partition: drop its stale dir
    val nonEmpty = keep.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    touched.filterNot(nonEmpty).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/__bucket=$b"), true)
    }
    deleted
  }
}
