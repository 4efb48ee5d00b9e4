package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Frequency-ranked vocabulary construction and token-id encoding — the
  * "build the tokenizer dictionary, then integerize the corpus" step that
  * sits between text cleanup and sequence packing in a training-data
  * pipeline.
  *
  * Scale shape: the frequency count is a partial-aggregated shuffle over
  * exploded tokens (shuffle ∝ distinct tokens); the global rank then runs
  * on the TOP-`size` rows only (TakeOrdered collapses the candidate set
  * before the single-partition row_number window, so the non-distributed
  * step is bounded by the vocabulary size — 50k rows, not the corpus).
  * Encoding broadcasts the finished vocabulary into the corpus scan: one
  * pass, no corpus shuffle except the per-document fold.
  */
object Vocab {

  /** Top-`size` tokens by frequency; ties break lexicographically so the
    * assignment is deterministic. token_id is the dense 0-based rank.
    */
  def buildVocab(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    val freq = docs
      .select(explode(TextFns.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(size)
    // the window input is already capped at `size` rows — the one
    // single-partition step is O(vocab), never O(corpus)
    freq.withColumn("token_id",
        row_number().over(Window.orderBy(col("freq").desc, col("token"))).cast("long") - 1)
      .select(col("token"), col("token_id"), col("freq"))
  }

  /** Integerize each document against a vocabulary: out-of-vocabulary
    * tokens become `unkId`. Output: id, ids (position-ordered token ids),
    * n_toks, n_oov.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, unkId: Long = -1L): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
        posexplode(TextFns.tokens(lower(col(textCol)))).as(Seq("pos", "token")))
    toks.join(broadcast(vocab.select(col("token"), col("token_id"))), Seq("token"), "left")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("pos"),
          coalesce(col("token_id"), lit(unkId)).as("tid")))).as("ps"),
        count(lit(1)).as("n_toks"),
        sum(when(col("token_id").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("__id").as(idCol),
        expr("transform(ps, x -> x.tid)").as("ids"),
        col("n_toks"), col("n_oov"))
  }
}
