package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other row,
  * maximizing `xCol` and minimizing `yCol` — "largest part at the lowest
  * price". A row is dominated when some other row is >= in x and <= in y
  * with at least one strict inequality.
  *
  * The textbook nested-loop (`NOT EXISTS` over a self-join) is O(n²) and
  * un-runnable at scale; the sort-based skyline needs a global running
  * minimum, and a window `MIN OVER (ORDER BY x DESC)` funnels the whole
  * frame through ONE partition. Instead:
  *
  *   1. collapse to candidates: per distinct x keep min(y) — one shuffle,
  *      output bounded by distinct-x cardinality, partial-agg map-side;
  *   2. the running strict-min over x DESC is the two-phase distributed
  *      scan from [[Scan]]: range-partition candidates by x descending,
  *      collect ONE per-partition min (bounded by the partition count),
  *      prefix-fold those into each partition's exclusive base, then a
  *      single per-partition pass keeps candidates whose y is strictly
  *      below the best y seen at any larger x;
  *   3. semi-join the frontier back to the input to emit full rows. A 2-D
  *      frontier has at most one row per distinct x, so it is *usually*
  *      broadcast-sized — but on anti-correlated data it is EVERY distinct
  *      x, and a forced `broadcast()` hint would override Spark's size
  *      check and ship a multi-million-row staircase to every executor.
  *      The hint is therefore guarded: the per-partition scan in step 2
  *      already counts the candidates for free, and the hint is applied
  *      only when that count (an exact upper bound on the frontier) is
  *      ≤ `broadcastThreshold`; above it the join is left unhinted and
  *      AQE picks broadcast at runtime iff the actual frontier is small.
  *
  * `yCol` must be integral (cast currency to cents first): dominance on
  * floats would inherit representation noise, and the integer contract is
  * what lets a SQL oracle replay the result exactly. The aggregated
  * candidate min is cast to long explicitly (int/short y columns would
  * otherwise break the `getLong` scan), and null y rows are excluded
  * before candidate collapse — a null never dominates and is never on the
  * frontier.
  *
  * Shuffle cost: one hash exchange (step 1) + one range exchange (step 2)
  * over the collapsed candidates + the broadcast join-back. The `Scan`
  * invariant applies: both passes run over the SAME bound RDD instance so
  * the RangePartitioner samples its bounds exactly once.
  */
object Skyline {

  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                broadcastThreshold: Long = 4000000L): DataFrame = {
    val spark = df.sparkSession
    val cand = df
      .filter(col(yCol).isNotNull)
      .groupBy(col(xCol).as("__x"))
      .agg(min(col(yCol)).cast("long").as("__ymin"))
      .repartitionByRange(col("__x").desc)
      .sortWithinPartitions(col("__x").desc)
    val rdd = cand.rdd

    val per = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var m = Long.MaxValue
      var n = 0L
      rows.foreach { r => n += 1L; val y = r.getLong(1); if (y < m) m = y }
      Iterator((pi, m, n))
    }.collect().sortBy(_._1)
    val bases = per.map(_._2).scanLeft(Long.MaxValue)(math.min).dropRight(1)
    val candCount = per.map(_._3).sum

    val xField = cand.schema.fields(0)
    val frontier = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (pi, rows) =>
        var best = bases(pi)
        rows.flatMap { r =>
          val y = r.getLong(1)
          val keep = y < best
          if (keep) best = y
          if (keep) Iterator(Row(r.get(0), y)) else Iterator.empty
        }
      },
      StructType(Seq(xField, StructField("__ymin", LongType, nullable = false))))

    // candCount bounds the frontier exactly: force the broadcast only when
    // that bound is sane; otherwise leave the join unhinted (AQE converts
    // to broadcast at runtime iff the realized frontier is small).
    val hinted =
      if (candCount <= broadcastThreshold) broadcast(frontier) else frontier
    df.join(hinted,
      df(xCol) === frontier("__x") && df(yCol) === frontier("__ymin"),
      "left_semi")
  }
}
