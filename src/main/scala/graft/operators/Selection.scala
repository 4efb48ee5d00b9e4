package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT distributed quantile selection — the complement of the sketch
  * quantiles (q157 histogram, q13 approx): when the report needs the true
  * p50/p90/p99, not an estimate, and the data is far too large to sort.
  *
  * `orderBy(value).collect()[k]` sorts 100 TB to read three rows; a window
  * `cume_dist` funnels everything through one partition. Selection instead
  * counts: group by value (shuffle bounded by DISTINCT values, fully
  * partial-aggregated map-side), range-partition the counts by value, and
  * run the [[Scan]] two-phase exclusive prefix sum so every partition
  * knows the global rank its rows start at; one narrow pass then emits,
  * for each requested percentile, the first value whose cumulative count
  * reaches ceil(pct·n/100) — the classic "counting selection" that makes
  * exact order statistics shuffle-proportional to value cardinality, not
  * row count.
  *
  * Values must be integral (the cents discipline): exactness over floats
  * is not a meaningful contract. Ranks are 1-based; the emitted
  * `target_rank` makes the selection rule itself part of the verified
  * output.
  */
object Selection {

  /** The (value, count) summary the selection runs on. MERGEABLE: counts
    * over row shards fold by plain sum — the law the streaming builder
    * uses (a value-count table is the exact-world analog of a sketch).
    */
  def valueCounts(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))

  def exactQuantiles(df: DataFrame, valueCol: String,
                     pcts: Seq[Int]): DataFrame =
    quantilesFromCounts(valueCounts(df, valueCol), pcts)

  /** Selection over a (possibly sharded) `__v`/`__n` count table: folds
    * duplicate values by sum first, so per-batch shard unions are legal
    * input.
    */
  def quantilesFromCounts(countTable: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val spark = countTable.sparkSession
    val counts = countTable
      .groupBy(col("__v"))
      .agg(sum(col("__n")).as("__n"))
      .repartitionByRange(col("__v"))
      .sortWithinPartitions(col("__v"))
    // one RDD instance for both passes (the Scan invariant)
    val rdd = counts.rdd
    val per = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var t = 0L
      rows.foreach(t += _.getLong(1))
      Iterator((pi, t))
    }.collect().sortBy(_._1).map(_._2)
    val bases = per.scanLeft(0L)(_ + _).dropRight(1)
    val tot = per.sum
    require(tot > 0, "exactQuantiles over an empty frame")
    val targets = pcts.map(p => (p, (tot * p + 99L) / 100L))

    val out = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var cum = bases(pi)
      rows.flatMap { r =>
        val prev = cum
        cum += r.getLong(1)
        targets.collect { case (p, t) if t > prev && t <= cum =>
          Row(p, r.getLong(0), t)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("pct", IntegerType, nullable = false),
      StructField("value", LongType, nullable = false),
      StructField("target_rank", LongType, nullable = false))))
  }

  /** Per-GROUP exact quantile bounds (the winsorization primitive): for
    * each group the smallest values whose cumulative counts reach
    * ceil(loPct·n/100) and ceil(hiPct·n/100). Runs on the group's value
    * counts with a group-partitioned cumulative window — distributed
    * across groups; for a single colossal group use the global two-phase
    * [[quantilesFromCounts]] instead.
    */
  def groupQuantileBounds(df: DataFrame, groupCol: String, valueCol: String,
                          loPct: Int, hiPct: Int): DataFrame = {
    require(loPct >= 1 && hiPct <= 100 && loPct < hiPct,
      s"need 1 <= loPct < hiPct <= 100, got $loPct/$hiPct")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    counts
      .withColumn("__cum", sum(col("__n")).over(wOrd))
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__cum") >= expr(s"(__tot * $loPct + 99) DIV 100"),
          col("__v"))).as("lo"),
        min(when(col("__cum") >= expr(s"(__tot * $hiPct + 99) DIV 100"),
          col("__v"))).as("hi"),
        sum(col("__n")).as("n"))
  }

  /** Equal-frequency discretization (the ML-feature binning step): assign
    * every row its quantile bucket 1..nBins within its group. Bucket
    * bounds are the exact ceil-rank order statistics (one windowed pass
    * over the group's value counts, the [[groupQuantileBounds]] shape,
    * all bounds in a single aggregate), broadcast back; the bucket id is
    * then a pure Column expression `1 + Σ [v > bound_i]` — no second
    * shuffle of the data. Ties share a bucket by construction, so bucket
    * populations are equal only up to tie mass — the honest definition.
    */
  def equiFreqBins(df: DataFrame, groupCol: String, valueCol: String,
                   nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val cum = counts
      .withColumn("__cum", sum(col("__n")).over(wOrd))
      .withColumn("__tot", sum(col("__n")).over(wAll))
    val boundAggs = (1 until nBins).map { i =>
      min(when(col("__cum") >= expr(s"(__tot * $i + ${nBins - 1}) DIV $nBins"),
        col("__v"))).as(s"__b$i")
    }
    val bounds = cum.groupBy(col(groupCol)).agg(boundAggs.head, boundAggs.tail: _*)
    val bucket = (1 until nBins).map(i =>
      when(col(valueCol).cast("long") > col(s"__b$i"), 1).otherwise(0))
      .reduce(_ + _) + 1
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("bucket", bucket)
      .drop((1 until nBins).map(i => s"__b$i"): _*)
  }

  /** EXACT median absolute deviation per group — the robust dispersion
    * statistic (outlier fences that a heavy tail cannot drag, unlike
    * stddev): mad = median(|v − median(v)|), both medians the exact
    * ceil-rank order statistic. Two counting-selection passes (each
    * shuffle ∝ distinct values, the [[groupQuantileBounds]] shape) with
    * the per-group medians broadcast back between them — never a sort of
    * the data, never a one-partition window. Integral values (cents
    * discipline); ceil-rank target (n·50+99) div 100, matching the
    * repo's other selections.
    */
  def groupMad(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def medianOf(in: DataFrame, c: String, out: String): DataFrame = {
      val counts = in.groupBy(col(groupCol), col(c).cast("long").as("__v"))
        .agg(count(lit(1)).as("__n"))
      val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col(groupCol))
      counts
        .withColumn("__cum", sum(col("__n")).over(wOrd))
        .withColumn("__tot", sum(col("__n")).over(wAll))
        .groupBy(col(groupCol))
        .agg(min(when(col("__cum") >= expr("(__tot * 50 + 99) DIV 100"),
          col("__v"))).as(out), sum(col("__n")).as("__tot"))
    }
    val med = medianOf(df, valueCol, "med")
    val dev = df.join(broadcast(med.select(col(groupCol), col("med"))), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol).cast("long") - col("med")))
    medianOf(dev, "__dev", "mad")
      .withColumnRenamed("__tot", "n")
      .join(broadcast(med.select(col(groupCol), col("med"))), Seq(groupCol))
      .select(col(groupCol), col("n"), col("med"), col("mad"))
  }

  /** Robust NULL imputation: fill each null `valueCol` with the exact
    * ceil-rank MEDIAN of its group's non-null values (median, not mean —
    * a heavy tail or a few corrupt extremes cannot drag the fill value).
    * One counting-selection pass over the non-null rows + a broadcast
    * join-back; rows in a group with NO non-null value stay null (the
    * honest answer — flag them with `Checks.notNull` instead of
    * inventing a number).
    */
  def imputeMedian(df: DataFrame, groupCol: String, valueCol: String,
                   outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    val med = counts
      .withColumn("__cum", sum(col("__n")).over(wOrd))
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .groupBy(col(groupCol))
      .agg(min(when(col("__cum") >= expr("(__tot * 50 + 99) DIV 100"),
        col("__v"))).as("__med"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .withColumn(outCol, coalesce(col(valueCol).cast("long"), col("__med")))
      .drop("__med")
  }

  /** Tukey-fence outlier flags per group: exact ceil-rank quartiles
    * (q1 = p25, q3 = p75), and a row is an outlier when it falls outside
    * [q1 − 1.5·iqr, q3 + 1.5·iqr]. The comparison is doubled into pure
    * integers (2·v < 2·q1 − 3·iqr, 2·v > 2·q3 + 3·iqr) so no fractional
    * fence ever exists to round. One counting-selection pass + a
    * broadcast join-back — the box-plot outlier screen at table scale.
    */
  def tukeyOutliers(df: DataFrame, groupCol: String, valueCol: String,
                    flagCol: String = "is_outlier"): DataFrame = {
    val bounds = groupQuantileBounds(df, groupCol, valueCol, 25, 75)
      .select(col(groupCol), col("lo").as("__q1"), col("hi").as("__q3"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("__iqr", col("__q3") - col("__q1"))
      .withColumn(flagCol,
        (col(valueCol).cast("long") * 2 < col("__q1") * 2 - col("__iqr") * 3) ||
          (col(valueCol).cast("long") * 2 > col("__q3") * 2 + col("__iqr") * 3))
      .drop("__q1", "__q3", "__iqr")
  }

  /** Streaming build of the value-count summary: each microbatch's counts
    * land as their own `batch=<id>` shard, written only if absent
    * (`Streams.idempotentShardWrite`), so replays are no-ops; shards fold
    * by sum on read and the drained stream's quantiles EQUAL the batch
    * quantiles over the same rows. Per batch the shard is bounded by the
    * batch's distinct values, never its row count.
    */
  def streamingValueCounts(stream: DataFrame, valueCol: String,
                           targetPath: String, checkpoint: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        graft.streaming.Streams.idempotentShardWrite(batch.sparkSession, dir) {
          valueCounts(batch, valueCol).write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def readMergedCounts(spark: org.apache.spark.sql.SparkSession,
                       targetPath: String): DataFrame =
    spark.read.parquet(targetPath).select(col("__v"), col("__n"))
}
