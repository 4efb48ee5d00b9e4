package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** §2.12: streaming results must agree with the batch formulation
  * (Trigger.AvailableNow equivalence), modulo trailing windows the
  * watermark legitimately holds back.
  */
class StreamingSpec extends SparkSpec {

  test("streamed tumbling agg rows equal the batch agg (watermark-held tail excluded)") {
    val streamed = Streams.tumblingViaStream(spark, sfDir)
      .select("h", "event_type", "n", "sv").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = Tables(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), "every emitted window must match batch exactly")
    val missing = batch -- streamed
    val maxEmitted = streamed.map(_._1.getTime).max
    assert(missing.forall(_._1.getTime > maxEmitted - 2 * 3600 * 1000),
      "only trailing windows within the watermark horizon may be unemitted")
  }

  test("dedup within watermark removes reinjected duplicates") {
    val ev = Tables(spark, sfDir, "events").limit(100)
    val dup = ev.union(ev)
    // batch fallback of the same op: dropDuplicates on the key
    assert(dup.dropDuplicates("event_id").count() == 100)
  }
}
