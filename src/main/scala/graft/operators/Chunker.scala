package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Token-window chunker — the reference's `split` operator
  * (docetl/config/paper_extraction.yaml:17-24: method token_count,
  * chunk_size 3000, chunk_overlap 300, metadata preserved).
  *
  * Pure Column expressions (sequence/transform/explode), so the fan-out runs
  * inside whole-stage codegen and distributes row-parallel — no UDTF, no
  * driver involvement. Tokenization is pluggable at the column level; the
  * deterministic default is whitespace (TextFns.tokens).
  *
  * Chunk i covers tokens [i*step, i*step+size) with step = size - overlap;
  * n chunks = 1 if tokens <= size else ceil((tokens - overlap) / step), so
  * every token is covered and consecutive chunks share `overlap` tokens.
  */
object Chunker {

  def chunkCount(nToks: Column, chunkSize: Int, overlap: Int): Column = {
    val step = chunkSize - overlap
    when(nToks <= chunkSize, 1L)
      .otherwise(ceil((nToks - overlap).cast("double") / step).cast("long"))
  }

  /** Explode `textCol` into (chunk_id, chunk_text) rows, preserving all other
    * columns (preserve_metadata semantics).
    *
    * `neighbors > 0` additionally emits `prev_context` / `next_context`
    * columns carrying up to `neighbors` chunk-steps of tokens on either side
    * of the chunk — the DocETL "gather" peripheral-context analog
    * (arXiv:2410.12189 §4.2: split chunks lose cross-boundary context, so
    * downstream maps receive a bounded neighbor window). Default off; the
    * context is cut from the same token array inside the same codegen'd
    * expression, so it adds no extra pass or shuffle.
    */
  def split(df: DataFrame, textCol: String, chunkSize: Int, overlap: Int,
            chunkIdCol: String = "chunk_id", chunkCol: String = "chunk_text",
            neighbors: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    require(neighbors >= 0, "neighbors must be >= 0")
    val step = chunkSize - overlap
    // Materialized ONCE as a column, never inlined into the lambda: Spark HOF
    // lambdas have no let-binding, so referencing the tokens(...) EXPRESSION
    // inside `transform` would re-split the whole document per chunk —
    // O(doc_len x n_chunks), quadratic in document length. An attribute
    // reference is a row-field read, so tokenization stays O(doc_len).
    // (CollapseProject keeps it hoisted: __toks is referenced more than once
    // and array-split is not a "cheap" expression, so the rule won't inline.)
    val toks = col("__toks")
    val n = chunkCount(size(toks), chunkSize, overlap)
    val chunks = transform(
      sequence(lit(0L), n - 1),
      i => {
        val base = Seq(
          i.as("id"),
          concat_ws(" ", slice(toks, (i * step + 1).cast("int"), lit(chunkSize))).as("text"))
        val ctx =
          if (neighbors == 0) Nil
          else {
            val pstart = greatest(i * step - lit(neighbors.toLong * step), lit(0L))
            Seq(
              concat_ws(" ", slice(toks, (pstart + 1).cast("int"),
                (i * step - pstart).cast("int"))).as("prev"),
              concat_ws(" ", slice(toks, (i * step + chunkSize + 1).cast("int"),
                lit(neighbors * step))).as("next"))
          }
        struct(base ++ ctx: _*)
      })
    val exploded = df.withColumn("__toks", TextFns.tokens(col(textCol)))
      .withColumn("__c", explode(chunks))
      .withColumn(chunkIdCol, col("__c.id"))
      .withColumn(chunkCol, col("__c.text"))
    val withCtx =
      if (neighbors == 0) exploded
      else exploded
        .withColumn("prev_context", col("__c.prev"))
        .withColumn("next_context", col("__c.next"))
    withCtx.drop("__c", "__toks")
  }
}
