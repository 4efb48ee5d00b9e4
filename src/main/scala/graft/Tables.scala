package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet test layout (see TESTDATA.md).
  *
  * All tables are plain parquet files `<dir>/<name>.parquet`; reading them
  * through `spark.read.parquet` gives vectorized scans with predicate pushdown
  * and column pruning for free. At cluster scale the same call works against
  * any Hadoop-compatible FS path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` is TIMESTAMP(NANOS) parquet, which Spark cannot represent:
    // sessions set spark.sql.legacy.parquet.nanosAsLong=true and we convert
    // here (floor to micros, matching DuckDB's TIMESTAMP_NS -> epoch_us).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Re-balance an under-parallelized scan before CPU-heavy per-row work
    * (tokenization, shingling, hashing). A small parquet file arrives as a
    * single input split, which would serialize the expensive computation on
    * one core AND let concurrent AQE stages duplicate it before a cache
    * materializes. The probe uses optimizer STATISTICS (no job): `df.rdd
    * .getNumPartitions` would materialize the physical plan and, under AQE,
    * actually execute any upstream shuffle stages just to count partitions.
    * No-op when the input is large — at warehouse scale it arrives as
    * thousands of splits and repartitioning would be a pointless shuffle.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // under ~16MB per core the scan cannot have enough splits to keep the
    // cores busy; the re-balancing shuffle itself is then trivially cheap
    if (bytes < BigInt(p.toLong) * 16L * 1024 * 1024) df.repartition(p) else df
  }
}
