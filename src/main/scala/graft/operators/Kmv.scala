package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "bottom-k") distinct-count sketch — the third
  * member of the sketch family next to Count-Min and HLL
  * ([[Sketches]]): keep the k smallest DISTINCT hash values per group;
  * the k-th smallest estimates the cardinality because k uniform draws
  * on [0, H) spread ~H/nd apart (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002).
  *
  * Where HLL wins on register size (m bytes vs k·8), KMV wins on
  * set algebra: bottom-k registers support UNION (merge + re-take
  * bottom-k — exact, used by the shard fold and the streaming reader)
  * and, unlike HLL, INTERSECTION estimates via inclusion–exclusion on
  * the merged synopsis. The whole pipeline is integer-exact, the
  * q92/q94 portability convention:
  *
  *   - hash = first 12 hex chars of md5("k:" || value) → a 48-bit
  *     non-negative BIGINT; 48 bits (not 60 like HLL's rank hash)
  *     so the estimator's product (k-1)·2^48 stays inside a BIGINT
  *     for any k ≤ 32767.
  *   - registers = the ≤ k smallest distinct hashes, a sorted array —
  *     a set, so the result is independent of row order, partitioning,
  *     and merge shape (PropertySpec pins the shard-merge law).
  *   - estimate: exact n_seen when the group has fewer than k distinct
  *     hashes, else the ONE integer division
  *     (k-1)·2^48 div (h_k + 1) — the +1 makes the denominator
  *     strictly positive (h = 0 is a legal hash) and is part of the
  *     portable contract, replayed verbatim by the DuckDB oracle.
  *
  * Scale shape: one narrow hash projection, then ONE partial-aggregated
  * groupBy whose per-group state is ≤ k longs (the Aggregator's reduce
  * keeps the buffer sorted + bounded), so the shuffle carries groups ×
  * k·8 bytes no matter how many rows the corpus has — the same
  * bounded-synopsis argument as the CMS/HLL builders. Merging shard
  * registers (or streaming batch shards) is explode + the same
  * aggregate over ≤ shards·k rows per group.
  */
/** Bottom-k aggregation buffer — top-level (not nested in the object) and
  * public-constructor so the product-encoder's generated code can
  * instantiate it inside whole-stage codegen instead of falling back to
  * the interpreter.
  */
case class KmvBuf(hs: Seq[Long])

object Kmv {

  /** 2^48 — the hash space size the estimator divides by. */
  val HashSpace: Long = 1L << 48

  /** Portable 48-bit hash: first 12 hex chars of md5("k:" || value). */
  def hash48(v: Column): Column =
    conv(substring(md5(concat(lit("k:"), v.cast("string")).cast("binary")), 1, 12),
      16, 10).cast("long")

  /** Bounded bottom-k set aggregator: buffer = sorted distinct hashes,
    * ≤ k of them, at every point of the fold — so partial-aggregation
    * state is k·8 bytes per group regardless of input size.
    */
  private class BottomK(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    override def zero: KmvBuf = KmvBuf(Vector.empty)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = KmvBuf(insert(b.hs, h))
    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = KmvBuf(y.hs.foldLeft(x.hs)(insert))
    override def finish(r: KmvBuf): Seq[Long] = r.hs
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

    private def insert(sorted: Seq[Long], h: Long): Seq[Long] = {
      if (sorted.length >= k && h >= sorted.last) sorted
      else {
        // binary search for the insertion point in the ≤ k-long buffer
        var lo = 0; var hi = sorted.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (sorted(mid) < h) lo = mid + 1 else hi = mid
        }
        if (lo < sorted.length && sorted(lo) == h) sorted // already present
        else ((sorted.take(lo) :+ h) ++ sorted.drop(lo)).take(k)
      }
    }
  }

  /** Build per-group registers: `(groupCols..., hs array<bigint>)` with
    * `hs` the sorted ≤ k smallest distinct hashes of `valueCol`.
    */
  def kmvRegisters(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   k: Int = 64): DataFrame = {
    require(k >= 2 && k <= 32767, s"need 2 <= k <= 32767, got $k")
    val bottomK = udaf(new BottomK(k), Encoders.scalaLong)
    df.select(groupCols.map(col) :+ hash48(col(valueCol)).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("__h")).as("hs"))
  }

  /** Fold sharded registers (several `kmvRegisters` outputs unioned, or
    * the streaming batch shards) back into one register set per group —
    * the KMV merge law: bottom-k of a union = bottom-k of the union of
    * bottom-ks, because every one of the k global minima is among its
    * own shard's k minima.
    */
  def mergeRegisters(regs: DataFrame, groupCols: Seq[String],
                     k: Int = 64): DataFrame = {
    val bottomK = udaf(new BottomK(k), Encoders.scalaLong)
    regs.select(groupCols.map(col) :+ explode(col("hs")).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(bottomK(col("__h")).as("hs"))
  }

  /** Estimate per group from registers: `n_seen` (how many hashes the
    * register holds), `kth` (the k-th smallest hash — null below k) and
    * `est` — exact below k, else `(k-1)·2^48 div (kth + 1)`.
    */
  def kmvEstimate(regs: DataFrame, groupCols: Seq[String],
                  k: Int = 64): DataFrame =
    regs
      .withColumn("n_seen", size(col("hs")).cast("long"))
      .withColumn("kth",
        when(col("n_seen") >= k, element_at(col("hs"), k))
          .otherwise(lit(null).cast("long")))
      .withColumn("est",
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"(${(k - 1).toLong}L * ${HashSpace}L) div (kth + 1L)")))
      .select(groupCols.map(col) ++
        Seq(col("n_seen"), col("kth"), col("est")): _*)

  /** Merge two register arrays in pure Column space (no aggregation):
    * bottom-k of the distinct union — the same merge law as
    * [[mergeRegisters]], usable inside joins and windows.
    */
  def mergeArrays(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Pairwise distinct-INTERSECTION estimates — the set-algebra payoff
    * KMV has over HLL (registers are real hash samples, so union
    * registers are exact and inclusion–exclusion applies):
    *
    *   |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)
    *
    * with est(A ∪ B) computed from the MERGED registers (bottom-k of
    * the union — exact by the merge law, never a union of estimates).
    * All three terms are this module's integer estimator, so the
    * result is engine-exact; the estimator's noise can push the
    * difference below zero, so it is clamped at 0 (a true intersection
    * of 0 is indistinguishable from noise at sketch resolution).
    *
    * Scale shape: the self-join runs on the REGISTER table — groups ×
    * k·8 bytes, corpus-size-independent — so all-pairs over g groups is
    * g²/2 array merges of ≤ 2k longs each, a broadcast-sized problem
    * for any realistic group count (and never touches raw rows).
    */
  def kmvIntersect(regs: DataFrame, groupCol: String, k: Int = 64): DataFrame = {
    val est = kmvEstimate(regs, Seq(groupCol), k).select(col(groupCol), col("est"))
    val pairs = regs.select(col(groupCol).as("ga"), col("hs").as("__ha"))
      .join(regs.select(col(groupCol).as("gb"), col("hs").as("__hb")),
        col("ga") < col("gb"))
      .select(col("ga"), col("gb"), mergeArrays(col("__ha"), col("__hb"), k).as("hs"))
    kmvEstimate(pairs, Seq("ga", "gb"), k)
      .select(col("ga"), col("gb"), col("est").as("est_union"))
      .join(est.select(col(groupCol).as("ga"), col("est").as("est_a")), "ga")
      .join(est.select(col(groupCol).as("gb"), col("est").as("est_b")), "gb")
      .withColumn("est_intersect",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersect"))
  }

  /** Trailing-window register merge: for each (partition, day) row of a
    * per-day register table, replace `hs` with the bottom-k of the
    * distinct union of the trailing `days` days' registers (RANGE
    * window on the day index, `collect_list` → flatten → distinct →
    * sort → slice — [[mergeArrays]] generalized to the window) —
    * sliding-window cardinality that never rescans raw rows. Days with
    * no input rows contribute nothing and produce no output row (the
    * register table has no row to anchor them), matching a grid built
    * from observed days only.
    *
    * Scale shape: the window runs over the REGISTER table (partitions ×
    * days rows of ≤ k longs each), corpus-size-independent; the raw
    * corpus is touched exactly once, by the daily [[kmvRegisters]]
    * build, which at 100 TB is the one full scan a trailing-distinct
    * dashboard needs per refresh (and incremental days append via
    * [[streamingKmv]] shards).
    */
  def kmvTrailing(regs: DataFrame, partitionCols: Seq[String], dayCol: String,
                  days: Int, k: Int = 64): DataFrame = {
    require(days >= 1, s"need days >= 1, got $days")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("__d")).rangeBetween(-(days - 1), 0)
    regs
      .withColumn("__d", datediff(col(dayCol), to_date(lit("1970-01-01"))))
      .withColumn("hs",
        slice(array_sort(array_distinct(flatten(collect_list(col("hs")).over(w)))),
          1, k))
      .drop("__d")
  }

  /** Streaming build: each microbatch's per-group registers land as their
    * own `batch=<id>` shard, written only if absent (the
    * `Streams.idempotentShardWrite` _SUCCESS rule shared with the CMS and
    * HLL builders), so a replayed microbatch is a no-op. Readers call
    * [[readMergedKmv]]; the drained stream's estimate EQUALS the batch
    * estimate over the same rows — exactly what the q159 oracle checks.
    * Each shard is at most groups × k hashes no matter how much data the
    * batch carried.
    */
  def streamingKmv(stream: DataFrame, valueCol: String, groupCols: Seq[String],
                   targetPath: String, checkpoint: String, k: Int = 64): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        graft.streaming.Streams.idempotentShardWrite(batch.sparkSession, dir) {
          kmvRegisters(batch, valueCol, groupCols, k)
            .write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard under `targetPath` into whole-stream
    * registers (KMV merge law); feed to [[kmvEstimate]].
    */
  def readMergedKmv(spark: SparkSession, targetPath: String,
                    groupCols: Seq[String], k: Int = 64): DataFrame =
    mergeRegisters(
      spark.read.parquet(targetPath).select((groupCols :+ "hs").map(col): _*),
      groupCols, k)
}
