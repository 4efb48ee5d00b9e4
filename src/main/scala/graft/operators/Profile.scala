package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass dataset profiling — the "what is in this table" operator every
  * ingestion pipeline runs before anything else: per column, the non-null
  * count, null count, distinct count, and min/max rendered as strings, in
  * ONE aggregate over the table (never a scan per column).
  *
  * Exact distinct counts per column make Catalyst plan an Expand (one
  * input row fans out per distinct aggregate) — the right call when the
  * profile must be exact and oracle-checkable. At 100 TB pass
  * `approx = true`: `approx_count_distinct` (HLL++) collapses the Expand
  * back into a single partial-aggregated pass, the same trade the sketch
  * family (q150/q163) makes explicit.
  *
  * min/max stay honest as strings only for integral and string columns;
  * profile doubles/timestamps through a cast-to-cents / epoch projection
  * first (engine float formatting differs — the q164 cents discipline).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val nd: String => Column =
      c => if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__${c}_n"), nd(c).as(s"__${c}_nd"),
        min(col(c)).cast("string").as(s"__${c}_min"),
        max(col(c)).cast("string").as(s"__${c}_max"))
    } :+ count(lit(1)).as("__total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__${c}_n").as("n"),
        (col("__total") - col(s"__${c}_n")).as("n_null"),
        col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_min").as("vmin"), col(s"__${c}_max").as("vmax"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
