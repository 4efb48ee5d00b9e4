package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pareto / ABC classification — "which 20% of keys carry 80% of the
  * value": each key classed A/B/C by its position in the cumulative value
  * share, descending. The textbook formulation is a global window
  * (`SUM OVER (ORDER BY rev DESC)`) — one partition swallowing the whole
  * key dimension; here it is the [[Scan]] two-phase distributed scan
  * (range-partition by (value DESC, key), per-partition totals, prefix
  * bases, one narrow classify pass), the same discipline as [[Skyline]]
  * and [[Selection]]. Comparisons are cross-multiplied (cum·100 ≤
  * tot·pct), so the share thresholds stay in exact integers; with
  * cent-scale values that bounds tot at ~9·10¹⁶ before needing a wider
  * type.
  */
object Abc {

  def classify(df: DataFrame, keyCol: String, valueCol: String,
               aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct < 100,
      s"need 0 < aPct < bPct < 100, got $aPct/$bPct")
    val spark = df.sparkSession
    val ranked = df
      .select(col(keyCol).as("__k"), col(valueCol).cast("long").as("__v"))
      .repartitionByRange(col("__v").desc, col("__k"))
      .sortWithinPartitions(col("__v").desc, col("__k"))
    // one RDD instance for both passes (the Scan invariant)
    val rdd = ranked.rdd
    val per = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var t = 0L
      rows.foreach(t += _.getLong(1))
      Iterator((pi, t))
    }.collect().sortBy(_._1).map(_._2)
    val bases = per.scanLeft(0L)(_ + _).dropRight(1)
    val tot = per.sum

    val kField = ranked.schema.fields(0).copy(name = keyCol)
    spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (pi, rows) =>
        var cum = bases(pi)
        rows.map { r =>
          cum += r.getLong(1)
          val cls =
            if (cum * 100 <= tot * aPct) "A"
            else if (cum * 100 <= tot * bPct) "B"
            else "C"
          Row(r.get(0), r.getLong(1), cls)
        }
      },
      StructType(Seq(kField,
        StructField("value", LongType, nullable = false),
        StructField("cls", StringType, nullable = false))))
  }
}
