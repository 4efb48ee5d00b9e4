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

  /** Integer micro-unit position discounts 1000000/log2(i+1), i = 1..k —
    * computed ONCE on the driver with StrictMath (the deterministic-
    * transcendental rule) and inlined as literals, so DCG is pure integer
    * multiply-add on both engines and the oracle can carry the same
    * constants verbatim.
    */
  def discountsMicro(k: Int): Array[Long] =
    (1 to k).map { i =>
      StrictMath.round(1e6 * StrictMath.log(2.0) / StrictMath.log(i + 1.0))
    }.toArray

  /** Rank-quality metrics of `ranked` (qCol, idCol, rnCol; rank 1 = best)
    * against a binary-relevance `truth` list (qCol, idCol): per query,
    * `hits` = |top-k ∩ truth|, `mrr_micro` = 1000000 div (first relevant
    * rank), `dcg_micro` = Σ rel·discount(rank), `idcg_micro` = the ideal
    * prefix for min(|truth|, k) relevants, and `ndcg_micro` =
    * (1000000·dcg) div idcg — every column an exact integer, so the whole
    * evaluation is hash-verifiable cross-engine.
    *
    * Scale shape: both inputs are top-k-bounded per query, so the joins
    * and the groupBy are query-proportional; a truth list from an exact
    * scorer is the only corpus-proportional upstream.
    */
  def rankMetrics(ranked: DataFrame, truth: DataFrame, qCol: String,
                  idCol: String, rnCol: String, k: Int = 10): DataFrame = {
    val d = discountsMicro(k)
    val prefix = d.scanLeft(0L)(_ + _).tail // prefix(i) = ideal DCG of i hits
    val rel = ranked.filter(col(rnCol) <= k)
      .select(col(qCol), col(idCol), col(rnCol).cast("long").as("__rn"))
      .join(truth.select(col(qCol), col(idCol), lit(1L).as("__rel")),
        Seq(qCol, idCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    rel.groupBy(col(qCol))
      .agg(
        sum(col("__rel")).as("hits"),
        coalesce(max(when(col("__rel") === 1L, expr("1000000 div __rn"))),
          lit(0L)).as("mrr_micro"),
        sum(col("__rel") *
          element_at(array(d.map(lit): _*), col("__rn").cast("int")))
          .as("dcg_micro"))
      .join(truth.groupBy(col(qCol)).agg(count(lit(1)).as("__nt")), Seq(qCol))
      .withColumn("idcg_micro",
        element_at(array(prefix.map(lit): _*),
          least(col("__nt"), lit(k.toLong)).cast("int")))
      .withColumn("ndcg_micro", expr("(1000000 * dcg_micro) div idcg_micro"))
      .select(col(qCol), col("hits"), col("mrr_micro"), col("dcg_micro"),
        col("idcg_micro"), col("ndcg_micro"))
  }
}
