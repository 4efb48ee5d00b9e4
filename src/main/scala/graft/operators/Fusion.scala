package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion — the standard way to combine heterogeneous
  * retrieval lists (lexical BM25 + embedding ANN) without comparable
  * scores: each list contributes 1/(c + rank) for the documents it
  * returns, and documents strong in EITHER list surface in the fused
  * order (Cormack et al., the c = 60 convention).
  *
  * Kept in integer micro-units — 1000000 div (c + rank) — so fused
  * scores and the fused ORDER replay bit-identically in any engine (the
  * repo's no-independent-transcendentals rule; a float 1/(c+r) sum would
  * depend on addition order).
  *
  * Scale shape: one union + one partial-aggregated groupBy on
  * (query, doc) — the lists are top-k-bounded (|queries|·k rows each),
  * so fusion cost is query-proportional, never corpus-proportional; the
  * corpus is only touched by the upstream retrievers.
  */
object Fusion {

  /** Fuse named rank lists. Each list: (qCol, idCol, rnCol) rows with
    * rank 1 = best. Returns per (query, doc): a `<name>_rn` column per
    * list (null = doc absent from that list), the integer `rrf` score,
    * and the fused rank `rn` (ties broken by doc id), top `topK` kept.
    */
  def rrf(lists: Seq[(String, DataFrame)], qCol: String, idCol: String,
          rnCol: String, c: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty)
    val tagged = lists.map { case (name, df) =>
      df.select(col(qCol), col(idCol), col(rnCol).cast("long").as("__r"),
        lit(name).as("__src"))
    }.reduce(_ unionByName _)
    val perList = lists.map { case (name, _) =>
      min(when(col("__src") === name, col("__r"))).as(s"${name}_rn")
    }
    val fused = tagged
      .groupBy(col(qCol), col(idCol))
      .agg(sum(expr(s"1000000 div ($c + __r)")).as("rrf"), perList: _*)
    val w = Window.partitionBy(col(qCol)).orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("rn", row_number().over(w)).filter(col("rn") <= topK)
  }
}
