package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance — the classic warehouse shape:
  * collapse a per-key observation log into SCD Type-2 version rows with
  * `[valid_from, valid_to)` intervals, keeping one row per RUN of equal
  * attribute values (a re-observation of the same value extends the
  * current version instead of opening a new one). Real dimensions
  * version a TUPLE of attributes; the multi-column form compares the
  * whole attribute struct with one null-safe equality and emits it as a
  * single `state` struct column.
  *
  * Scale shape: two window passes keyed by the dimension key (high
  * cardinality — no skew concern), no joins, no driver work; ties in the
  * observation time are broken by `tieCol` so versioning is total and
  * rerun-stable.
  *
  * Null attribute values are OUTSIDE the contract and unchecked: Spark's
  * null-safe struct comparison gives them consistent engine semantics
  * (a re-observed null field collapses into the run; a value→null
  * transition opens a version), but replaying that choice in another
  * engine's SQL needs explicit IS DISTINCT FROM plumbing — callers who
  * want cross-engine-verifiable histories should pre-filter or sentinel
  * nulls upstream.
  */
object Scd {

  def scd2(df: DataFrame, keyCol: String, attrCols: Seq[String],
           tsCol: String, tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = df
      .withColumn("__state", struct(attrCols.map(col): _*))
      .withColumn("__prev", lag(col("__state"), 1).over(w))
      // null-safe: the first observation (prev null) always opens a
      // version; equal consecutive states collapse into one run
      .filter(!(col("__prev") <=> col("__state")))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changed
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col("__state").as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Single-attribute convenience form: same pipeline, `state` carries the
    * bare attribute value instead of a one-field struct.
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame =
    scd2(df, keyCol, Seq(attrCol), tsCol, tieCol)
      .withColumn("state", col("state").getField(attrCol))

  /** Point-in-time consumption of an SCD2 dimension — the join that makes
    * versioned dimensions useful: attach to each fact row the version
    * valid at the fact's timestamp (key match + `ts ∈ [valid_from,
    * valid_to)`). The scaled-up analog of the reference's metadata lookup
    * join (`arxiv_hook.py:184-215` resolves each download against the
    * manifest state current at run time; a versioned dimension answers
    * the same question AT ANY PAST INSTANT).
    *
    * Because [[scd2]] version intervals tile each key's timeline
    * contiguously from its first observation on, "the valid version" IS
    * "the latest version opening at-or-before ts" — so this is the as-of
    * union+window shape ([[AsOfJoin.asof]]): each side shuffles ONCE on
    * the key and a sorted per-partition pass attaches versions. The naive
    * `BETWEEN` inequality join expresses the same thing but Spark can only
    * plan it as a broadcast-nested-loop / cartesian filter — per-key
    * quadratic, the classic scale trap (PlanSpec pins its absence here).
    * Facts before a key's first version carry null version columns (left
    * semantics).
    *
    * Zero-width versions (two attribute changes at the same timestamp —
    * the earlier one's `[t, t)` interval is empty) are dropped before the
    * join: they are valid at NO point in time, and the as-of window's
    * "latest at tie" would otherwise depend on intra-timestamp order the
    * dimension no longer carries.
    *
    * `dim` is the [[scd2]] output schema; `facts` carries keyCol + tsCol +
    * payload columns whose names are disjoint from the dim's.
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCol: String,
                  tsCol: String): DataFrame =
    AsOfJoin.asof(facts,
      dim.filter(col("valid_to").isNull || col("valid_from") =!= col("valid_to"))
        .withColumnRenamed("valid_from", tsCol),
      keyCol, tsCol)
}
