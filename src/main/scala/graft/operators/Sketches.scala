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

  // ---------------------------------------------------------------- HLL

  /** Portable HyperLogLog — the distinct-count sketch, kept ENTIRELY in
    * integer space so the estimate replays bit-identically in any engine
    * with md5 (q67's `approx_count_distinct` is the fast path; this is
    * its fully-oracle-provable twin, the q92/q94 convention).
    *
    * Register construction: bucket = md5("b:"||v) % m and rank =
    * trailing-zeros(md5("r:"||v) as a 60-bit int) + 1, capped at 32 —
    * independent hash rows for bucket and rank, and trailing zeros
    * instead of leading so rho is pure bit arithmetic
    * (`bit_count((h & -h) - 1)`), no log2/float anywhere. Registers are
    * the mergeable form: max per bucket across shards.
    *
    * Estimation (`hllEstimate`): the harmonic sum is computed at scale
    * 2^32 — each bucket contributes the exact integer 2^(32-r), empty
    * buckets 2^32, so Z_scaled ≤ 65·2^32 fits a BIGINT exactly — and the
    * raw estimate is one integer division
    * (709·m²·2^32) div (1000·Z_scaled), i.e. alpha_64 = 0.709 kept as a
    * 709/1000 rational. The small-range branch (raw ≤ 2.5m with empty
    * buckets) is Flajolet's linear counting m·ln(m/V), the one
    * transcendental — rounded to an integer, where engines agree unless
    * the true value sits within an ulp of .5 (the 6-dp-quantized-ln
    * discipline from BM25, coarsened).
    */
  def hllRegisters(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   m: Int = 64): DataFrame = {
    require(Integer.bitCount(m) == 1, s"m must be a power of two, got $m")
    val v = col(valueCol).cast("string")
    val bucket =
      conv(substring(md5(concat(lit("b:"), v).cast("binary")), 1, 8), 16, 10)
        .cast("long") % m
    val h =
      conv(substring(md5(concat(lit("r:"), v).cast("binary")), 1, 15), 16, 10)
        .cast("long")
    val rank = least(bit_count(h.bitwiseAND(-h) - 1).cast("long") + 1L, lit(32L))
    df.select((groupCols.map(col) :+ bucket.as("bucket")) :+ rank.as("r"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Fold (possibly sharded) registers into one integer estimate per
    * group: `est` (the branch-selected final), plus `raw_est` and
    * `v_empty` so the branch choice itself is part of the verified
    * contract.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  m: Int = 64): DataFrame = {
    val alphaNum = 709L * m * m // alpha_64 = 709/1000
    val pow32 = 4294967296L // 2^32
    // Max-merge per (group, bucket) first — the HLL merge law — so shard
    // input with duplicate buckets folds correctly instead of
    // double-counting the harmonic sum (and driving v_empty negative).
    // Identity on pre-merged registers, so readMergedHll callers are
    // unaffected; a partial-agg max precedes the one shuffle either way.
    registers
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - r AS INT))"))
          .cast("long") +
          (lit(m.toLong) - count(lit(1))) * lit(pow32))
          .as("z_scaled"),
        (lit(m.toLong) - count(lit(1))).as("v_empty"))
      .withColumn("raw_est",
        expr(s"(${alphaNum}L * ${pow32}L) div (1000L * z_scaled)"))
      .withColumn("est",
        when(col("raw_est") <= lit((2.5 * m).toLong) && col("v_empty") > 0,
          round(lit(m.toDouble) *
            log(lit(m.toDouble) / col("v_empty").cast("double")), 0)
            .cast("long"))
          .otherwise(col("raw_est")))
      .select(groupCols.map(col) ++
        Seq(col("raw_est"), col("v_empty"), col("est")): _*)
  }

  /** One-pass sketch CUBE: build the registers ONCE at the finest grain,
    * then derive every rollup level — (a, b), (a), () — by max-merging
    * those same registers, never rescanning the rows. This is the payoff
    * of HLL's merge law at 100 TB: a multi-level distinct-count report
    * (per language+source, per language, global) costs one corpus scan
    * plus folds over groups x m register rows, where the exact
    * `countDistinct` rollup would shuffle the full id set once per level.
    *
    * Group columns must be STRING-typed (enforced): rolled-out levels fill
    * them with the "*" marker, which only round-trips losslessly through
    * `unionByName` for strings — a non-string group column would be
    * silently coerced, and a real group value equal to "*" would be
    * indistinguishable from the marker either way (callers with such data
    * should prefix-escape before cubing).
    *
    * The register table is cached because every level folds the same
    * (tiny) frame — and UNCACHED before returning: the rollup result is
    * report-sized (sum of level cardinalities), so it is materialized
    * eagerly via `localCheckpoint` first, letting the cache be released
    * instead of leaking executor storage across calls.
    */
  def hllCube(df: DataFrame, valueCol: String, groupCols: Seq[String],
              m: Int = 64): DataFrame = {
    val schema = df.select(groupCols.map(col): _*).schema
    require(schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType),
      s"hllCube group columns must be string-typed, got ${schema.simpleString}")
    val regs = hllRegisters(df, valueCol, groupCols, m).cache()
    try {
      (0 to groupCols.length).reverse.map(groupCols.take).map { lvl =>
        val filled = groupCols.map(c =>
          (if (lvl.contains(c)) col(c) else lit("*")).as(c))
        hllEstimate(regs, lvl, m)
          .select(filled ++ Seq(col("raw_est"), col("v_empty"), col("est")): _*)
      }.reduce(_ unionByName _)
        .localCheckpoint(true) // eager: materialize before releasing cache
    } finally regs.unpersist()
  }

  /** Streaming build of the HLL registers: each microbatch's per-group
    * registers land as their own `batch=<id>` shard, written only if
    * absent (the `Streams.idempotentShardWrite` _SUCCESS rule shared with
    * `streamingCountMin`), so a replayed microbatch is a no-op. Readers
    * call `readMergedHll`, which folds every shard by max-per-bucket —
    * the HLL merge law (PropertySpec) — so the drained stream's estimate
    * EQUALS the batch estimate over the same rows; that equality is
    * exactly what the q153 oracle checks. Each shard is at most
    * groups x m rows no matter how much data the batch carried.
    */
  def streamingHll(stream: DataFrame, valueCol: String, groupCols: Seq[String],
                   targetPath: String, checkpoint: String, m: Int = 64): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        graft.streaming.Streams.idempotentShardWrite(batch.sparkSession, dir) {
          hllRegisters(batch, valueCol, groupCols, m)
            .write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard under `targetPath` into whole-stream
    * registers (max merge law); feed to `hllEstimate`.
    */
  def readMergedHll(spark: org.apache.spark.sql.SparkSession, targetPath: String,
                    groupCols: Seq[String]): DataFrame =
    spark.read.parquet(targetPath)
      .select((groupCols :+ "bucket" :+ "r").map(col): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))

  // ---------------------------------------------------- histogram quantiles

  /** Mergeable fixed-width histogram — the one-pass quantile sketch for
    * columns too large to sort: one narrow map to a bin id plus one
    * (group, bin)-keyed partial aggregate, output bounded by
    * groups x bins regardless of input size, and shard histograms merge
    * by summing counts (same law as the CMS). Requires non-negative
    * values (SQL `div` truncates toward zero; bin = v div width is a
    * floor only for v >= 0 — callers shift negatives into range first).
    */
  def histogram(df: DataFrame, valueCol: String, groupCols: Seq[String],
                binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.select(groupCols.map(col) :+
        call_function("div", col(valueCol).cast("long"), lit(binWidth)).as("bin"): _*)
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a histogram: for each rational target
    * qNum/qDen, the first bin whose cumulative count reaches
    * k = ceil(q·n) — every step integer arithmetic, so the chosen bin
    * replays bit-identically in any engine. The true quantile provably
    * lies in [lo, hi) = [bin·w, (bin+1)·w), which is the sketch's whole
    * accuracy contract (`PropertySpec` pins containment against exact
    * sorted quantiles and the shard-merge law). The histogram is
    * groups x bins rows, so the cumulative windows here cost nothing at
    * any corpus scale.
    */
  def histQuantiles(hist: DataFrame, groupCols: Seq[String], binWidth: Long,
                    qs: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(g: _*).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(g: _*)))
    qs.map { case (label, qNum, qDen) =>
      require(qNum > 0 && qNum <= qDen, s"bad quantile $qNum/$qDen")
      cum
        .withColumn("k",
          call_function("div", col("n") * qNum + (qDen - 1), lit(qDen.toLong)))
        .filter(col("cum") >= col("k"))
        .groupBy(g: _*)
        .agg(min(col("n")).as("n"), min(col("k")).as("k"),
          min(col("bin")).as("bin"))
        .withColumn("q", lit(label))
    }.reduce(_ unionByName _)
      .select(g ++ Seq(col("q"), col("n"), col("k"), col("bin"),
        (col("bin") * binWidth).as("lo"),
        ((col("bin") + 1L) * binWidth).as("hi")): _*)
  }

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
