package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.AggStore

/** Continuous aggregate-store maintenance — the streaming twin of the
  * batch [[AggStore.mergeIntoAggStore]] increment discipline, completing
  * the batch↔stream pairing every persisted store here carries (dedup
  * corpus: `StreamingDedup`; cluster store: `clusteredSink`; ANN index:
  * `StreamingIndex`): rows arrive as a stream, each microbatch folds its
  * per-key counts/sums into the store, and a batch's contribution is
  * queryable one microbatch after it arrives — with full time travel
  * (each batch IS a committed generation).
  *
  * EXACTLY-ONCE BY THE APPLIED LEDGER — and it must be, because unlike
  * the cluster store's quotient merge (exactly-once by algebra: a
  * replayed shard's quotient is empty), an aggregate increment is NOT
  * idempotent: replaying a batch double-counts. `foreachBatch` replays a
  * failed batch under the SAME `batchId`, which this sink passes through
  * as the merge's `appliedId` (`batch-<id>`). The merge makes that id
  * exactly-once all the way down: a replay of a batch whose manifest
  * commit landed finds the id in the ledger and returns without touching
  * a file, while a replay of a half-landed batch (generation directory
  * written, manifest commit lost) rewrites the SAME `d<gen+1>` staging
  * directory in overwrite mode — the manifest still names `gen`, so the
  * directory name and its content (derived from committed state + the
  * same increment) are identical — and commits once, ledger entry and
  * merged state in one atomic rename. The first batch may CREATE the
  * store ([[AggStore.buildAggStore]] stamps the ledger so the merge path
  * detects its replay).
  *
  * Scale shape per microbatch: one narrow aggregation of the increment,
  * one join against only the touched buckets (≤ nBuckets partitions,
  * listed explicitly), one increment-sized write, one one-file rename —
  * cost ∝ arrival rate plus touched-bucket volume, never ∝ store size.
  *
  * Ref: the reference accumulates run-level aggregate summaries batch by
  * batch as articles land (airflow/dags/zara_hybrid_etl.py:259-287);
  * re-expressed as Structured Streaming over a snapshot store.
  */
object StreamingAggStore {

  /** Start the fold sink: one [[AggStore.mergeIntoAggStore]] per
    * microbatch, `appliedId` keyed by the batch id; the first batch
    * builds the store with `nBuckets` when it does not exist yet.
    * `extrema = true` builds an EXTREMA store (per-key vmin/vmax riding
    * the same buckets — the insert-only min/max monoid a stream
    * satisfies by construction); merges self-detect the shape from the
    * store's marker, so only the build needs the flag.
    */
  def aggStoreSink(stream: DataFrame, path: String, checkpoint: String,
                   keyCol: String = "key", valCol: String = "val",
                   nBuckets: Int = 16,
                   extrema: Boolean = false): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty replay batch (possible on restart) must not burn a
        // ledger entry or mint an empty generation — skip it entirely
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val id = Some(s"batch-$batchId")
          if (!AggStore.aggStoreExists(spark, path))
            AggStore.buildAggStore(batch, path, keyCol, valCol, nBuckets, id,
              extrema)
          else
            AggStore.mergeIntoAggStore(batch, path, keyCol, valCol, id)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
