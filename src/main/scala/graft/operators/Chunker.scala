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
    */
  def split(df: DataFrame, textCol: String, chunkSize: Int, overlap: Int,
            chunkIdCol: String = "chunk_id", chunkCol: String = "chunk_text"): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = TextFns.tokens(col(textCol))
    val n = chunkCount(size(toks), chunkSize, overlap)
    val chunks = transform(
      sequence(lit(0L), n - 1),
      i => struct(
        i.as("id"),
        concat_ws(" ", slice(toks, (i * step + 1).cast("int"), lit(chunkSize))).as("text")))
    df.withColumn("__c", explode(chunks))
      .withColumn(chunkIdCol, col("__c.id"))
      .withColumn(chunkCol, col("__c.text"))
      .drop("__c")
  }
}
