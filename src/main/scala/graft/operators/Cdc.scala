package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: MERGE a delta log (upserts + deletes) into a
  * snapshot — the batch form of the "apply CDC feed to the warehouse copy"
  * step every replicated operational table needs (reference analog: the
  * idempotent re-ingest that overwrites previously-seen rows,
  * `airflow/dags/zara_hybrid_etl.py` upsert step).
  *
  * Semantics are last-writer-wins per key: among all delta rows for a key
  * the one with the highest `seqCols` tuple decides — `deleteOp` removes
  * the key, anything else replaces the payload; keys with no delta keep
  * their snapshot row. `seqCols` must totally order each key's deltas
  * (e.g. a change-log LSN, or (ts, change_id)); ties would make the
  * result nondeterministic, so give the last column a unique tiebreaker.
  *
  * Scale shape: ONE hash-partition-by-key shuffle and one window pass over
  * snapshot ∪ deltas — no join, so a hot key costs only its own change
  * count. The snapshot side enters the union with null seq columns and
  * loses to any delta on the `__src` flag, never on null comparison
  * ordering (explicit `desc_nulls_last` guards the mixed frame anyway).
  * At 100 TB the snapshot is the big side and the delta log is
  * day-proportional; the single exchange is the floor for a
  * latest-per-key computation, and AQE splits any skewed key.
  */
object Cdc {

  /** `snapshot`: `(key, payload...)`. `deltas`: `(key, payload..., op,
    * seqCols...)` — payload column NAMES must match the snapshot's.
    * Returns the post-merge snapshot `(key, payload...)`.
    */
  def applyDeltas(snapshot: DataFrame, deltas: DataFrame, keyCol: String,
                  seqCols: Seq[String], opCol: String = "op",
                  deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "seqCols must order each key's deltas")
    val payload = snapshot.columns.filterNot(_ == keyCol).toSeq
    val seqTypes = seqCols.map(c => deltas.schema(c).dataType)
    val base0 = snapshot
      .select(col(keyCol) +: payload.map(col): _*)
      .withColumn("__src", lit(0))
      .withColumn(opCol, lit(null).cast("string"))
    val base = seqCols.zip(seqTypes).foldLeft(base0) {
      case (df, (c, tpe)) => df.withColumn(c, lit(null).cast(tpe))
    }
    val d = deltas
      .select((col(keyCol) +: payload.map(col)) ++
        (col(opCol) +: seqCols.map(col)): _*)
      .withColumn("__src", lit(1))
    resolveLog(base.unionByName(d), keyCol, seqCols, opCol, deleteOp)
  }

  /** Winner-per-key resolution over a TAGGED change log: rows carry
    * `__src` (0 = snapshot base — null seq columns, loses to any delta;
    * 1 = delta), `opCol`, and `seqCols`; every other non-key column is
    * payload. The highest `(__src, seqCols...)` row per key survives
    * unless it is a `deleteOp` tombstone. Shared by the batch MERGE
    * above and the streaming snapshot maintenance
    * ([[graft.streaming.StreamingCdc]]) — their equivalence contract is
    * literally "both resolve the same log".
    */
  def resolveLog(log: DataFrame, keyCol: String, seqCols: Seq[String],
                 opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val payload = log.columns
      .filterNot(c => c == keyCol || c == opCol || c == "__src" ||
        seqCols.contains(c)).toSeq
    val order: Seq[Column] =
      col("__src").desc +: seqCols.map(c => col(c).desc_nulls_last)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 &&
        (col(opCol).isNull || col(opCol) =!= deleteOp))
      .select(col(keyCol) +: payload.map(col): _*)
  }
}
