package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every key across two table versions as added,
  * removed, or changed (with the changed column names), emitting ONLY
  * differences — the audit primitive behind schema migrations, backfill
  * validation, and CDC reconciliation.
  *
  * One full-outer shuffle join on the key (both sides hash-partition; at
  * 100 TB pre-bucketed snapshots co-locate and skip the exchange), with
  * null-safe (`<=>`) column comparison so NULL→value and value→NULL both
  * count as changes. Unchanged keys are dropped BEFORE the result
  * materializes: the output is diff-proportional, not table-proportional
  * — the property that makes diffing two 100-TB snapshots usable.
  */
object Diff {

  def tableDiff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "tableDiff needs key and compare columns")
    val aa = a.select((keyCols ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"__a_$c").toMap)
      .withColumn("__in_a", lit(true))
    val bb = b.select((keyCols ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"__b_$c").toMap)
      .withColumn("__in_b", lit(true))
    val joined = aa.join(bb, keyCols, "full_outer")
    val changedCols = concat_ws(",", array(compareCols.sorted.map { c =>
      when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))
    }: _*))
    joined
      .withColumn("change",
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(length(changedCols) > 0, lit("changed")))
      .filter(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed", changedCols).otherwise(lit("")))
      .select(keyCols.map(col) ++ Seq(col("change"), col("changed_cols")): _*)
  }
}
