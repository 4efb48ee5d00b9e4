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

  def exactQuantiles(df: DataFrame, valueCol: String,
                     pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    val spark = df.sparkSession
    val counts = df
      .groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__n"))
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
}
