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
  *   3. semi-join the (small) frontier back to the input to emit full
  *      rows — broadcast, since a 2-D frontier has at most one row per
  *      distinct x.
  *
  * `yCol` must be integral (cast currency to cents first): dominance on
  * floats would inherit representation noise, and the integer contract is
  * what lets a SQL oracle replay the result exactly.
  *
  * Shuffle cost: one hash exchange (step 1) + one range exchange (step 2)
  * over the collapsed candidates + the broadcast join-back. The `Scan`
  * invariant applies: both passes run over the SAME bound RDD instance so
  * the RangePartitioner samples its bounds exactly once.
  */
object Skyline {

  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val cand = df
      .groupBy(col(xCol).as("__x"))
      .agg(min(col(yCol)).as("__ymin"))
      .repartitionByRange(col("__x").desc)
      .sortWithinPartitions(col("__x").desc)
    val rdd = cand.rdd

    val per = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var m = Long.MaxValue
      rows.foreach { r => val y = r.getLong(1); if (y < m) m = y }
      Iterator((pi, m))
    }.collect().sortBy(_._1).map(_._2)
    val bases = per.scanLeft(Long.MaxValue)(math.min).dropRight(1)

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

    df.join(broadcast(frontier),
      df(xCol) === frontier("__x") && df(yCol) === frontier("__ymin"),
      "left_semi")
  }
}
