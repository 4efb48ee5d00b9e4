package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitter summary — the deterministic-GUARANTEE counter
  * sketch (k counters per group) that finds every value with frequency
  * above N/(k+1) in ONE pass, no token list up front, no full count
  * table. Complements the CMS (q107/q189): CMS answers point queries for
  * known terms, MG SURFACES the candidates — at 100 TB the difference
  * between "screen the terms you thought of" and "nothing frequent can
  * hide".
  *
  * Shape: one `mapPartitions` pass runs the classic MG update (increment
  * if tracked, open a counter if a slot is free, else decrement ALL
  * counters by one — Misra & Gries 1982) per (group) inside each
  * partition, emitting at most k·groups partial counters per partition;
  * one shuffle moves ONLY those partials; the merge is the published
  * mergeable-summaries law (Agarwal et al., PODS'12): sum counters
  * pointwise, subtract the (k+1)-st largest of the sums, drop the
  * non-positives — all window arithmetic over the (tiny) partial table.
  *
  * Contract (MgSpec pins it under several partitionings):
  *  - at most k counters per group survive;
  *  - c_v <= f_v (counters never overcount);
  *  - f_v − c_v <= (N_group − Σc)/(k+1)  — so every value with
  *    f_v > N_group/(k+1) is PRESENT in the summary (no false negatives
  *    above the support bound), deterministically, for ANY partitioning
  *    and merge order.
  *
  * The COUNTERS themselves are order-dependent (inherent to MG — only
  * the guarantees are deterministic), so oracle-checked queries emit the
  * guarantee-backed support set (candidates → exact counts → threshold),
  * not raw counters: one bounded candidate-pruned recount instead of
  * q189's full CMS screen + a term list. Null values are excluded (a
  * null is not a value; count them with `Checks.notNull`). Per-partition
  * state is k counters × live groups — groups per partition must be
  * bounded (they are, for the report-shaped group sets this serves).
  */
object Mg {

  def summary(df: DataFrame, valueCol: String, groupCols: Seq[String],
              k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = df.sparkSession
    val gN = groupCols.length
    val input = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("string").as("__v"): _*)
    val schema = StructType(input.schema.fields.dropRight(1) ++ Seq(
      StructField("__v", StringType, nullable = false),
      StructField("__c", LongType, nullable = false)))
    val partials = spark.createDataFrame(
      input.rdd.mapPartitions { rows =>
        val maps = mutable.LinkedHashMap
          .empty[Seq[Any], mutable.Map[String, Long]]
        rows.foreach { r =>
          val key = (0 until gN).map(r.get)
          val m = maps.getOrElseUpdate(key, mutable.Map.empty)
          val v = r.getString(gN)
          if (m.contains(v)) m(v) += 1L
          else if (m.size < k) m(v) = 1L
          else {
            val dead = mutable.ArrayBuffer.empty[String]
            m.keysIterator.foreach { t =>
              val c = m(t) - 1L
              if (c == 0L) dead += t else m(t) = c
            }
            dead.foreach(m.remove)
          }
        }
        maps.iterator.flatMap { case (key, m) =>
          m.iterator.map { case (v, c) => Row.fromSeq(key ++ Seq(v, c)) }
        }
      }, schema)
    mergeCounters(partials.withColumnRenamed("__v", "value")
      .withColumnRenamed("__c", "c"), groupCols, k)
  }

  /** The multiway mergeable-summaries law over any union of (group…,
    * value, c) counter shards: sum counters pointwise, subtract the
    * (k+1)-st largest of the sums, drop the non-positives. The potential
    * argument survives arbitrary merge trees, so the MG invariants hold
    * for the result whether the shards came from partitions (batch
    * build) or microbatches (streaming shards).
    */
  def mergeCounters(partials: DataFrame, groupCols: Seq[String],
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val summed = partials.groupBy(g :+ col("value"): _*)
      .agg(sum(col("c")).as("c"))
    val w = Window.partitionBy(g: _*).orderBy(col("c").desc, col("value"))
    val wAll = Window.partitionBy(g: _*)
    summed
      .withColumn("__rk", row_number().over(w))
      .withColumn("__s", coalesce(
        max(when(col("__rk") === k + 1, col("c"))).over(wAll), lit(0L)))
      .filter(col("c") > col("__s"))
      .select(g ++ Seq(col("value"), (col("c") - col("__s")).as("c")): _*)
  }

  /** Streaming build: each microbatch's MG summary lands as its own
    * `batch=<id>` shard under the `_SUCCESS`-guarded idempotency rule
    * shared with the other sketch families, so a replayed microbatch is
    * a no-op. Shards fold on read via [[mergeCounters]]; the guarantees
    * (and therefore the support set f > N/(k+1)) are preserved for ANY
    * batch split, so a query over the drained stream's summary equals
    * its batch twin.
    */
  def streamingSummary(stream: DataFrame, valueCol: String,
                       groupCols: Seq[String], targetPath: String,
                       checkpoint: String, k: Int): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        graft.streaming.Streams.idempotentShardWrite(batch.sparkSession, dir) {
          summary(batch, valueCol, groupCols, k)
            .write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard under `targetPath` by the merge law. */
  def readMergedSummary(spark: org.apache.spark.sql.SparkSession,
                        targetPath: String, groupCols: Seq[String],
                        k: Int): DataFrame =
    mergeCounters(
      spark.read.parquet(targetPath)
        .select((groupCols :+ "value" :+ "c").map(col): _*),
      groupCols, k)
}
