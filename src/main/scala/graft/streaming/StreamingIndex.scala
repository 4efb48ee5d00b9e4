package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Continuous ANN-index maintenance — the streaming twin of the batch
  * [[Similarity.appendToIvfPqIndex]] increment discipline (q275), closing
  * the same batch↔stream pairing every other persisted store here has
  * (dedup corpus: `StreamingDedup`; cluster store: `clusteredSink`;
  * SCD/entity stores: `StreamingScd`/`StreamingEntities`): vectors arrive
  * as a stream, each microbatch PQ-encodes against the index's frozen
  * centroids/codebooks and lands as one append increment, and the serving
  * path ([[Similarity.serveIvfPq]]) sees every batch that has committed —
  * a vector is searchable one microbatch after it arrives, with no
  * retrain, no rewrite of existing cells, and no stop-the-world swap.
  *
  * EXACTLY-ONCE BY THE APPEND LEDGER: Structured Streaming's only replay
  * unit is the microbatch, and `foreachBatch` replays a failed batch
  * under the SAME `batchId` — which this sink passes through as the
  * append's increment identity (`appendId = "batch-<id>"`). The append
  * operator makes that id exactly-once all the way down: a replay of a
  * batch whose catalog commit landed finds the id in the durable
  * applied-append ledger and returns without touching a file (detected
  * no-op — robust even across an intervening compaction that remapped
  * the batch's cells), while a replay of a half-landed batch (codes
  * written, catalog commit lost) rewrites the same `appends/batch-<id>`
  * staging directory in place and commits it once. No transactional sink
  * coordination is needed — idempotence of the per-batch write IS the
  * exactly-once guarantee, the same argument the cluster-store stream
  * (q288) makes with its empty-quotient replay.
  *
  * Scale shape per microbatch: encode is one narrow pass over the
  * increment against broadcast constants (shuffle-free), the landed
  * directory is increment-sized, and the commit is a one-file atomic
  * rename — cost ∝ arrival rate, never ∝ index size. The index must
  * exist before the stream starts ([[Similarity.buildIvfPqIndex]] /
  * `rebuildIvfPqIndex`): codebooks are frozen serving constants, and
  * training them belongs to the rebuild cadence (q290's drift policy),
  * not to a microbatch. Contract on ids, inherited from the append
  * operator: an arriving id must be new to the index or previously
  * tombstoned — updates are delete-then-reinsert, not blind re-append.
  *
  * Ref: the reference materializes each processed article into its
  * output store one directory at a time as runs arrive
  * (airflow/dags/zara_hybrid_etl.py:245-256, materialize_articles);
  * re-expressed as Structured Streaming over the versioned-index
  * lifecycle rather than a driver-side per-item write loop.
  */
object StreamingIndex {

  /** Start the append sink: one [[Similarity.appendToIvfPqIndex]] call
    * per microbatch, `appendId` keyed by the batch id. `path` may be a
    * plain or versioned (`CURRENT`-manifested) index root; resolution
    * happens per batch, so a concurrent atomic rebuild cuts the stream
    * over to the new version at the next microbatch boundary — with the
    * documented caveat that increments landed in the OLD version before
    * the cutover are part of the old lineage (the rebuild trained on
    * what it read; re-shipping missed increments into the new version
    * is the orchestrator's fence, `Similarity.appendToIvfPqIndex`'s
    * ledger note).
    */
  def indexAppendSink(stream: DataFrame, path: String, checkpoint: String,
                      cId: String = "nid", cVec: String = "ne"): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty replay batch (possible on restart) must not burn a
        // ledger entry for a no-row append — skip it entirely
        if (!batch.isEmpty)
          Similarity.appendToIvfPqIndex(batch, path, cId, cVec,
            appendId = s"batch-$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
