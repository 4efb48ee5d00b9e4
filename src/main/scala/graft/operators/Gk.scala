package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-error-bounded MERGEABLE quantile summary over unknown-range
  * values — the everyday "p50/p90/p99 of a heavy-tailed double" sketch
  * that neither [[Selection]] (exact, but shuffle ∝ distinct values) nor
  * the fixed-width histogram ([[Sketches.histogram]], needs a known value
  * range up front) serves.
  *
  * Lineage: the GK summary (Greenwald–Khanna, SIGMOD'01) keeps
  * (value, gap, spread) tuples with rank error ≤ εn; MRL
  * (Manku–Rajagopalan–Lindsay, SIGMOD'98) and KLL (Karnin–Lang–Liberty,
  * FOCS'16) build compactor hierarchies. KLL's compaction flips a random
  * coin per compaction — useless here, where the whole point is that the
  * summary REPLAYS bit-identically in any engine (the repo's oracle
  * discipline). This operator therefore uses the DETERMINISTIC batch
  * compaction rule: within each portable-md5 bucket, rows are put in the
  * canonical (value, id) order and collapsed into blocks of exactly
  * m = ceil(n_bucket / k) consecutive ranks; each block is summarized by
  * its MAXIMUM value carrying the block's total weight. The kept item's
  * cumulative weight inside its bucket is then the EXACT rank of that
  * value — the summary is exact at block boundaries and wrong by at most
  * m−1 ranks in between (the one straddling block per bucket).
  *
  * Contract (what the specs pin):
  *  - weight conservation, exactly: Σ w = n per group — always, not in
  *    expectation;
  *  - rank bound: for any value c,
  *    true_count(≤c) − Σ_buckets (m_b − 1)  ≤  Σ_{registers ≤ c} w
  *    ≤ true_count(≤c); so the q-quantile estimate sits within
  *    Σ_b (m_b − 1) ≈ n/k ranks of the true order statistic, for EVERY q
  *    at once, with no assumption on the value range or distribution;
  *  - merge = UNION of register rows (plus an exact re-aggregation of
  *    equal values) — associative, commutative, order-free, the same
  *    shard law as CMS/HLL/KMV; errors add across merged summaries;
  *  - [[compress]] re-bounds a grown union to ≤ k items per group,
  *    adding ≤ ceil(W/k) − 1 rank error, again deterministically.
  *
  * 100 TB shape: one hash exchange on (group, bucket) + a per-partition
  * sort (spill-aware, the price of a canonical engine-portable order),
  * all in whole-stage-codegen'd window functions — no RDD, no driver
  * state, no `collect`. `buckets` scales the parallelism (each bucket
  * sorts independently); registers are ≤ (k+1)·buckets rows per group no
  * matter the input size, so estimation and re-merging are free. The
  * streaming twin lands per-microbatch registers via the
  * `idempotentShardWrite` _SUCCESS rule shared with the other sketch
  * families; shards fold by the union law.
  *
  * Values ride as doubles (selection, not arithmetic — the emitted
  * quantile is an actual data value, so longs/cents pass through exactly;
  * doubles are fine because nothing is ever added to them).
  *
  * Cost model vs [[Selection]]: the build shuffles ∝ ROWS (the price of
  * the canonical order), where exact counting selection shuffles ∝
  * DISTINCT values — so for heavily-duplicated columns, compose instead
  * of choosing: pre-aggregate to (value, n) counts (shuffle ∝ distinct)
  * and feed them to [[weightedRegisters]] with the count as the weight
  * and the value as its own id — same bounds, the cheaper exchange, one
  * code path. For unknown-range doubles where every value is distinct
  * (latencies, losses) the direct build is the right tool and exact
  * selection is not.
  */
object Gk {

  private def bucketOf(idCol: String, buckets: Int): Column =
    conv(substring(md5(concat(lit("b:"), col(idCol).cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long") % buckets

  /** Build the (group…, value, w) register table. `idCol` supplies the
    * canonical tie-break/bucketing identity (any unique row id).
    */
  def registers(df: DataFrame, valueCol: String, idCol: String,
                groupCols: Seq[String], k: Int, buckets: Int = 32): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g :+ col("__bk"): _*)
      .orderBy(col("value"), col("__id"))
    val wAll = Window.partitionBy(g :+ col("__bk"): _*)
    df.filter(col(valueCol).isNotNull)
      .select(g ++ Seq(col(valueCol).cast("double").as("value"),
        col(idCol).as("__id"), bucketOf(idCol, buckets).as("__bk")): _*)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nb", count(lit(1)).over(wAll))
      // block size m = ceil(n_bucket / k): exact-rank block boundaries
      .withColumn("__m", expr(s"(__nb + ${k - 1}) DIV $k"))
      .filter(col("__rn") % col("__m") === 0 || col("__rn") === col("__nb"))
      .withColumn("w",
        when(col("__rn") % col("__m") === 0, col("__m"))
          .otherwise(col("__nb") % col("__m")))
      .select(g ++ Seq(col("value"), col("w")): _*)
  }

  /** WEIGHTED build — the weighted-percentile primitive (median price
    * weighted by quantity, latency weighted by request count): identical
    * block-collapse rule with blocks cut by CUMULATIVE WEIGHT instead of
    * rank — per bucket, M = ceil(W_b/k), an item belongs to the block its
    * cumulative weight ends in, each block keeps its max value with the
    * block's total weight. Exact at block boundaries in WEIGHT units,
    * ≤ M−1 between; Σw preserved exactly; same union/compress/estimate
    * algebra as the unweighted build (which is this with all weights 1).
    * Weights must be positive integers; null values/weights are excluded.
    */
  def weightedRegisters(df: DataFrame, valueCol: String, weightCol: String,
                        idCol: String, groupCols: Seq[String], k: Int,
                        buckets: Int = 32): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g :+ col("__bk"): _*)
      .orderBy(col("value"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g :+ col("__bk"): _*)
    df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(g ++ Seq(col(valueCol).cast("double").as("value"),
        col(weightCol).cast("long").as("__w"), col(idCol).as("__id"),
        bucketOf(idCol, buckets).as("__bk")): _*)
      .withColumn("__cumw", sum(col("__w")).over(w))
      .withColumn("__wb", sum(col("__w")).over(wAll))
      .withColumn("__m", expr(s"(__wb + ${k - 1}) DIV $k"))
      .withColumn("__blk", expr("(__cumw + __m - 1) DIV __m"))
      .groupBy(g ++ Seq(col("__bk"), col("__blk")): _*)
      .agg(max(col("value")).as("value"), sum(col("__w")).as("w"))
      .select(g ++ Seq(col("value"), col("w")): _*)
  }

  /** ROLLUP quantile report from one register build — the quantile
    * analog of the q163 HLL cube: registers are built ONCE at the
    * finest `dims` granularity, and every coarser rollup level
    * `(d₁..dₖ, *, …)` is the UNION of those same registers with the
    * rolled dimensions replaced by the `"*"` marker — one corpus scan
    * for a multi-level percentile dashboard, where per-level rebuilds
    * would rescan the corpus `levels` times. Union-merging registers is
    * the GK mergeable-summary law: the merged table represents the
    * exact multiset union, with rank error the SUM of the component
    * builds' bounds (still ∝ n_level/k + buckets — each level's
    * registers came from ONE build).
    *
    * `dims` must be STRING-typed: the `"*"` filler is only unambiguous
    * for string dimensions, and a real `"*"` dimension value would be
    * indistinguishable from the rollup marker (the hllCube lesson —
    * enforced here with a loud require, not a silent coercion).
    */
  def rollupEstimate(regs: DataFrame, dims: Seq[String],
                     qs: Seq[(String, Int, Int)]): DataFrame = {
    require(dims.nonEmpty, "rollupEstimate needs at least one dimension")
    dims.foreach { d =>
      require(regs.schema(d).dataType ==
          org.apache.spark.sql.types.StringType,
        s"rollup dimension '$d' must be STRING (the '*' filler is " +
          "ambiguous for other types); cast it before building registers")
    }
    // ...and a genuine "*" VALUE would still collide with the filler —
    // reject it loudly too. One scan over the register frame, which is
    // sketch-sized by construction, not corpus-sized.
    require(regs.filter(dims.map(d => col(d) === "*").reduce(_ || _)).isEmpty,
      "rollupEstimate: a dimension value equals the rollup marker '*' — " +
        "namespace or escape it before building registers")
    val levels = (0 to dims.size).reverse.map { keep =>
      regs.select(dims.zipWithIndex.map { case (d, i) =>
        (if (i < keep) col(d) else lit("*")).as(d)
      } ++ Seq(col("value"), col("w")): _*)
    }
    estimate(levels.reduce(_ unionByName _), dims, qs)
  }

  /** Quantile estimates from a register table (built, unioned from
    * shards, or compressed): for each rational target qNum/qDen the
    * smallest register value whose cumulative weight reaches
    * ceil(q·W) — every step integer arithmetic over the (tiny) register
    * frame, tie-safe because equal values are summed before the
    * cumulative pass.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val dedup = regs.groupBy(g :+ col("value"): _*).agg(sum(col("w")).as("w"))
    val cum = dedup
      .withColumn("__cum", sum(col("w")).over(
        Window.partitionBy(g: _*).orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("w")).over(Window.partitionBy(g: _*)))
    qs.map { case (label, qNum, qDen) =>
      require(qNum > 0 && qNum <= qDen, s"bad quantile $qNum/$qDen")
      cum
        .withColumn("__k",
          expr(s"(__tot * $qNum + ${qDen - 1}) DIV $qDen"))
        .filter(col("__cum") >= col("__k"))
        .groupBy(g: _*)
        .agg(min(col("__tot")).as("w_total"), min(col("__k")).as("k_target"),
          min(col("value")).as("est"))
        .withColumn("q", lit(label))
    }.reduce(_ unionByName _)
      .select(g ++ Seq(col("q"), col("w_total"), col("k_target"),
        col("est")): _*)
  }

  /** Annotate every row with its estimated within-group percentile in
    * ppm — `percent_rank` for groups too large to window-sort: the
    * (tiny) register table collapses to one sorted (value, w) array per
    * group, broadcasts, and each row's estimated count-below-or-equal is
    * a pure Column fold over that array — ZERO shuffles on the data side
    * (PlanSpec-pinnable), per-row cost O(registers). The estimate
    * undercounts true_count(≤v) by less than the build's rank error, so
    * the ppm is within (err/W)·10⁶ below the true percentile; exact at
    * register values. The percentile-feature step of feature
    * engineering, at any scale the registers fit a broadcast (they are
    * ≤ (k+1)·buckets rows per group by construction).
    */
  def cdfPpm(regs: DataFrame, df: DataFrame, valueCol: String,
             groupCols: Seq[String], outCol: String = "pctl_ppm"): DataFrame = {
    require(groupCols.nonEmpty, "cdfPpm needs at least one group column")
    val arr = regs.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("value"), col("w"))))
        .as("__regs"), sum(col("w")).as("__wtot"))
    df.join(broadcast(arr), groupCols)
      .withColumn(outCol, expr(
        s"aggregate(filter(__regs, r -> r.value <= CAST($valueCol AS DOUBLE)), " +
          "0L, (acc, r) -> acc + r.w) * 1000000L DIV __wtot"))
      .drop("__regs", "__wtot")
  }

  /** Deterministically re-bound a (possibly union-grown) register table
    * to ≤ k items per group: equal values are summed exactly, the value
    * order is cut into blocks of cumulative weight M = ceil(W/k), and
    * each block keeps its max value with the block's total weight — the
    * same exact-at-boundaries rule as the build, adding ≤ M−1 rank error.
    * A pure function of the register MULTISET (no order, no RNG), so
    * compress(union(shards)) replays in SQL too.
    */
  def compress(regs: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    regs.groupBy(g :+ col("value"): _*).agg(sum(col("w")).as("w"))
      .withColumn("__cum", sum(col("w")).over(
        Window.partitionBy(g: _*).orderBy(col("value"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("w")).over(Window.partitionBy(g: _*)))
      .withColumn("__blk",
        expr(s"(__cum + (__tot + ${k - 1}) DIV $k - 1) DIV ((__tot + ${k - 1}) DIV $k)"))
      .groupBy(g :+ col("__blk"): _*)
      .agg(max(col("value")).as("value"), sum(col("w")).as("w"))
      .select(g ++ Seq(col("value"), col("w")): _*)
  }

  /** Trailing-window quantiles from per-day register shards — the
    * quantile analog of the KMV sliding cardinality: build registers
    * once per day (grouped by the day column), then each day's
    * p50/p90/… over the trailing `windowDays` is a fold over the
    * REGISTER TABLE only (day-range join of days × registers, both
    * register-sized) — the corpus is scanned once ever, and a 100-day
    * dashboard costs days × registers rows of work, not days × corpus.
    * The day-range join runs on the tiny register frame by construction;
    * error bounds add across the window's shards (union law).
    */
  def slidingEstimate(regs: DataFrame, dayCol: String, windowDays: Int,
                      qs: Seq[(String, Int, Int)]): DataFrame = {
    require(windowDays >= 1, s"need windowDays >= 1, got $windowDays")
    val days = regs.select(col(dayCol).as("__day")).distinct()
    val joined = regs.join(days,
        col(dayCol) >= col("__day") - (windowDays - 1) &&
          col(dayCol) <= col("__day"))
      .groupBy(col("__day").as(dayCol), col("value"))
      .agg(sum(col("w")).as("w"))
    estimate(joined, Seq(dayCol), qs)
  }

  /** Streaming build: each microbatch's registers land as their own
    * `batch=<id>` shard under the `_SUCCESS`-guarded idempotency rule, so
    * a replayed microbatch is a no-op. Shards fold by the union law on
    * read. A single-microbatch drain (the AvailableNow one-file case)
    * yields registers IDENTICAL to the batch build — construction is a
    * pure function of the batch's row multiset; across many microbatches
    * the union keeps exact total weight and the per-shard rank bounds
    * add.
    */
  def streamingRegisters(stream: DataFrame, valueCol: String, idCol: String,
                         groupCols: Seq[String], targetPath: String,
                         checkpoint: String, k: Int,
                         buckets: Int = 32): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        graft.streaming.Streams.idempotentShardWrite(batch.sparkSession, dir) {
          registers(batch, valueCol, idCol, groupCols, k, buckets)
            .write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard under `targetPath` by the union law (exact
    * re-aggregation of equal values); feed to [[estimate]] or
    * [[compress]].
    */
  def readMergedRegisters(spark: org.apache.spark.sql.SparkSession,
                          targetPath: String,
                          groupCols: Seq[String]): DataFrame =
    spark.read.parquet(targetPath)
      .groupBy((groupCols.map(col) :+ col("value")): _*)
      .agg(sum(col("w")).as("w"))
}
