package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ZoneMap

/** Continuous zone-map maintenance — the streaming twin of the batch
  * [[ZoneMap.appendWithStats]] increment discipline, completing the
  * batch↔stream pairing for the scan-pruning wing: rows arrive as a
  * stream, each microbatch lands as new data files and extends the
  * stats map with ONLY those files' rows, and a batch's data is
  * prunable one microbatch after it lands.
  *
  * Exactly-once is BY CONSTRUCTION here, not by a ledger: the map is a
  * pure function of the data files on disk (one row per file), and
  * `foreachBatch`'s replay of a failed batch re-runs the same
  * append+describe — a replayed batch whose files already landed adds
  * new files again ONLY if the previous write itself was lost with the
  * checkpoint. The residual double-append window (files landed, then
  * the checkpoint lost the batch) is parquet-append's own semantics —
  * the map stays CONSISTENT with whatever files exist (every landed
  * file is described exactly once, because `appendWithStats` diffs the
  * directory listing), so pruned reads remain exact; duplicate ROWS
  * are the upstream sink contract, as with any file-append sink. The
  * skipping contract never breaks: stats always describe the files
  * actually present.
  */
object StreamingZoneMap {

  /** Start the append sink: each microbatch lands as data files with
    * the stats map extended incrementally.
    */
  def zoneMapSink(stream: DataFrame, dataPath: String,
                  statCols: Seq[String], zonePath: String,
                  checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty replay batch appends no files and describes nothing
        if (!batch.isEmpty)
          ZoneMap.appendWithStats(batch, dataPath, statCols, zonePath)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
