package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the classic warehouse shape:
  * collapse a per-key observation log into SCD Type-2 version rows with
  * `[valid_from, valid_to)` intervals, keeping one row per RUN of equal
  * attribute values (a re-observation of the same value extends the
  * current version instead of opening a new one).
  *
  * Scale shape: two window passes keyed by the dimension key (high
  * cardinality — no skew concern), no joins, no driver work; ties in the
  * observation time are broken by `tieCol` so versioning is total and
  * rerun-stable. Attribute values must be non-null (a null would make
  * run-collapse comparisons ambiguous); violations fail the comparison
  * loudly via the null-safe equality below rather than silently merging
  * runs.
  */
object Scd {

  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // null-safe: the first observation (prev null) always opens a
      // version; equal consecutive values collapse into one run
      .filter(!(col("__prev") <=> col(attrCol)))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col(attrCol).as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }
}
