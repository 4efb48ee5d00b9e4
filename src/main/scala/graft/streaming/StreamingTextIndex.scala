package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextIndex

/** Continuous inverted-index maintenance — the streaming twin of the
  * batch [[TextIndex.mergeIntoTextIndex]] append discipline: documents
  * arrive as a stream, each microbatch tokenizes and folds its posting
  * / length / stats deltas into the index, and a batch's documents are
  * retrievable one microbatch after they land.
  *
  * EXACTLY-ONCE BY THE THREE-LEDGER DISCIPLINE: an index append is NOT
  * idempotent (a replayed batch doubles tf, dl, and the corpus
  * counts), so the microbatch id rides as the merge's `appliedId`
  * through the postings → dl → stats ledger order — `foreachBatch`
  * replays a failed batch under the SAME id, fully-applied legs skip,
  * and each leg's delta is a deterministic function of the batch alone
  * so a half-applied sequence resumes mid-order without drift. Purged
  * documents stay purged across replays (the suppression list is
  * consulted inside the merge).
  *
  * Scale shape per microbatch: one tokenize of the batch, three
  * touched-bucket merges, three one-file renames — cost ∝ arrival rate
  * plus touched-bucket volume, never ∝ index size.
  */
object StreamingTextIndex {

  /** Start the fold sink over a `(id, text)` document stream; the
    * first batch builds the index.
    */
  def textIndexSink(stream: DataFrame, path: String, checkpoint: String,
                    idCol: String = "id", textCol: String = "text",
                    nBuckets: Int = 16): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty replay batch must not burn a ledger entry
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val id = Some(s"batch-$batchId")
          if (!TextIndex.textIndexExists(spark, path))
            TextIndex.buildTextIndex(batch, path, idCol, textCol,
              nBuckets, id)
          else
            TextIndex.mergeIntoTextIndex(batch, path, idCol, textCol, id)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
