package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** Offset-based sequence packing — the final layout step of an LLM
  * pre-training pipeline: documents are (conceptually) concatenated in a
  * deterministic order and cut into fixed `seqLen`-token training rows, so
  * each document needs its absolute token offset in the concatenated
  * stream. Emits, per document: its global start offset, the sequence id
  * its first token lands in, and the offset within that sequence.
  *
  * The global offset is an exclusive running sum of token counts in id
  * order. A window `SUM OVER (ORDER BY id)` would funnel the whole corpus
  * through ONE partition; instead this is the classic two-phase
  * distributed scan: range-partition by id (so partitions are contiguous
  * id ranges in order), count tokens per partition, collect only the
  * per-partition totals (bounded by the partition count, not the data),
  * and broadcast their prefix sums back as each partition's base offset.
  * Shuffle cost: one range exchange — same as any global sort.
  */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int): DataFrame =
    packCounted(docs.select(col(idCol),
        TextFns.wordCount(lower(col(textCol))).cast("long").as("n_toks")),
      idCol, "n_toks", seqLen)

  /** Same layout over a PRE-COMPUTED token-count column — so the packing
    * offsets can come from any tokenizer (e.g. [[Bpe.encode]]'s subword
    * counts) instead of the whitespace count. `counts` must carry one row
    * per document.
    */
  def packCounted(counts: DataFrame, idCol: String, countCol: String,
                  seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = counts.sparkSession
    val counted = counts
      .select(col(idCol).as("__id"), col(countCol).cast("long").as("n_toks"))
      .repartitionByRange(col("__id"))
      .sortWithinPartitions(col("__id"))

    // one RDD instance for both passes (see Scan's invariant)
    val countedRdd = counted.rdd
    val base = Scan.partitionBases(countedRdd)(_.getLong(1))

    val outSchema = StructType(Seq(
      StructField("__id", LongType), StructField("n_toks", LongType),
      StructField("tok_start", LongType), StructField("seq_id", LongType),
      StructField("seq_offset", LongType)))
    val packed = spark.createDataFrame(
      countedRdd.mapPartitionsWithIndex { case (pi, rows) =>
        var off = base(pi)
        rows.map { r =>
          val n = r.getLong(1)
          val start = off
          off += n
          Row(r.getLong(0), n, start, start / seqLen, start % seqLen)
        }
      }, outSchema)
    packed.select(col("__id").as(idCol), col("n_toks"),
      col("tok_start"), col("seq_id"), col("seq_offset"))
  }
}
