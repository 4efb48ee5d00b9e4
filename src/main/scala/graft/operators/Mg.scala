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

  /** SLIDING-WINDOW heavy hitters — "trending this week": per-day MG
    * summaries are built ONCE, each target day's trailing `windowDays`
    * summaries merge by [[mergeCounters]] (the multiway law — the
    * summary-table-only fold of q161's sliding KMV and q229's sliding
    * GK, now for the counter family), and the survivors are EXACTLY
    * recounted against the candidate-pruned corpus. The emitted rows
    * are every `(day, value)` whose exact trailing-window count reaches
    * `W_day div (k+1) + 1` — above the merged summary's error bound, so
    * the MG screen has NO false negatives and the output EQUALS the
    * direct exact computation (the q189/q219 sketch-free-oracle
    * discipline).
    *
    * Scale shape: the corpus is scanned twice — once for the per-day
    * summaries + exact per-day value counts, once never (the recount
    * reads the VALUE-COUNT table, not the corpus). The window fold
    * explodes each summary row to ≤ `windowDays` target days
    * (summary-table-sized), and the recount join touches only
    * candidate (day, value) pairs (≤ k per day). All equi-joins.
    */
  def slidingSupport(df: DataFrame, valueCol: String, dayCol: String,
                     windowDays: Int, k: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive, got $windowDays")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(dayCol).cast("date").as("day"),
        col(valueCol).cast("string").as("value"))
    val daily = summary(base, "value", Seq("day"), k)
    val days = base.select(col("day")).distinct()
    // each daily summary row reaches the observed target days in
    // [day, day + windowDays); unobserved targets drop via the semi-join
    val expand = explode(sequence(lit(0), lit(windowDays - 1))).as("__off")
    val reach = daily.select(col("day"), col("value"), col("c"), expand)
      .select(date_add(col("day"), col("__off")).as("day"),
        col("value"), col("c"))
      .join(days, Seq("day"), "left_semi")
    val screened = mergeCounters(reach, Seq("day"), k)
    // exact per-day value counts + window totals, summaries never consulted
    val vc = base.groupBy(col("day"), col("value"))
      .agg(count(lit(1)).as("n"))
    val dailyTot = base.groupBy(col("day")).agg(count(lit(1)).as("nd"))
    val wTot = dailyTot.select(col("day"), col("nd"), expand)
      .select(date_add(col("day"), col("__off")).as("day"), col("nd"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day")).agg(sum(col("nd")).as("w_total"))
    val recount = vc.select(col("day"), col("value"), col("n"), expand)
      .select(date_add(col("day"), col("__off")).as("day"),
        col("value"), col("n"))
      .join(screened.select(col("day"), col("value")), Seq("day", "value"),
        "left_semi")
      .groupBy(col("day"), col("value")).agg(sum(col("n")).as("wcount"))
    recount.join(wTot, "day")
      .withColumn("threshold", expr("w_total div " + (k + 1) + " + 1"))
      .filter(col("wcount") >= col("threshold"))
      .select(col("day"), col("value"), col("wcount"), col("w_total"),
        col("threshold"))
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
