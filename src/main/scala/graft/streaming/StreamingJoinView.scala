package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ViewStore

/** Continuous join-view maintenance — the streaming twin of the batch
  * [[ViewStore.mergeIntoJoinView]] delta rule, completing the
  * batch↔stream pairing every persisted store here carries: the two
  * sides arrive as ONE tagged change feed (`side` ∈ `a` | `b` — the
  * union'd CDC shape, so a single stream carries ordered increments to
  * both relations), each microbatch splits by tag and folds as one
  * two-sided increment, and a batch's pairs are queryable in the view
  * one microbatch after they arrive.
  *
  * EXACTLY-ONCE BY THE THREE-LEDGER DISCIPLINE: a join-view increment
  * is NOT idempotent (a replayed batch double-counts the view and both
  * side states), so the microbatch id rides as the merge's `appliedId`
  * into all three substore ledgers — `foreachBatch` replays a failed
  * batch under the SAME id, fully-applied legs detect it and skip,
  * half-applied sequences resume mid-order (view → a → b; the view leg
  * reads side states that mutate only after it commits — the
  * [[ViewStore]] crash-replay argument). Purged subjects stay purged
  * across replays: the suppression lists are consulted inside the
  * merge, before any state is read.
  *
  * Scale shape per microbatch: two narrow aggregations of the
  * increment, one join against only the touched side buckets, one
  * changed-group view rewrite, three one-file renames — cost ∝ arrival
  * rate plus touched-bucket volume, never ∝ store size.
  */
object StreamingJoinView {

  /** Start the fold sink over a tagged feed `(side, key, grp?, v?)`:
    * rows with `side = "a"` carry `(key, grp)`, rows with `side = "b"`
    * carry `(key, v)`; the first batch builds the store.
    *
    * `extrema = true` builds an EXTREMA view (per-group vmin/vmax riding
    * the same buckets) at NO protocol change: a stream is insert-only
    * BY CONSTRUCTION — exactly the least/greatest-monoid contract the
    * extrema columns need ([[ViewStore.hasExtrema]]) — so the tagged
    * feed carries them for free; merges self-detect the shape from the
    * store's marker, so only the first-batch build needs the flag.
    */
  def joinViewSink(stream: DataFrame, path: String, checkpoint: String,
                   sideCol: String = "side", keyCol: String = "key",
                   grpCol: String = "grp", valCol: String = "v",
                   nBuckets: Int = 16,
                   extrema: Boolean = false): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // an empty replay batch must not burn a ledger entry
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val da = batch.filter(col(sideCol) === "a")
            .select(col(keyCol), col(grpCol))
          val db = batch.filter(col(sideCol) === "b")
            .select(col(keyCol), col(valCol))
          val id = Some(s"batch-$batchId")
          if (!ViewStore.joinViewExists(spark, path))
            ViewStore.buildJoinView(da, db, path, keyCol, grpCol,
              keyCol, valCol, nBuckets, id, extrema)
          else
            ViewStore.mergeIntoJoinView(da, db, path, keyCol, grpCol,
              keyCol, valCol, id)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
