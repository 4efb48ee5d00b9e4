package graft

import java.sql.Timestamp

import graft.streaming.StreamingCounts

/** Pins the additive streaming-shard law: daily counts folded from ANY
  * microbatch split equal the one-shot batch aggregate, and shard
  * redelivery is idempotent (_SUCCESS discipline).
  */
class StreamingCountsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("folded daily counts equal the batch aggregate under an uneven batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val rows = (1 to 2000).map { _ =>
      (s"t${rnd.nextInt(3)}",
        ts(f"2024-05-${rnd.nextInt(9) + 1}%02d ${rnd.nextInt(24)}%02d:00:00"))
    }
    val tmp = java.nio.file.Files.createTempDirectory("sc_stream_").toString
    val input = MemoryStream[(String, Timestamp)]
    Seq(rows.take(137), rows.slice(137, 1500), rows.drop(1500)).foreach { b =>
      input.addData(b)
      StreamingCounts.streamingDailyCounts(
        input.toDF().toDF("g", "ts"), "g", "ts",
        s"$tmp/counts", s"$tmp/ckpt")
    }
    val merged = StreamingCounts.readMergedDailyCounts(spark, s"$tmp/counts", "g")
      .as[(String, java.sql.Date, Long)].collect()
      .map(r => (r._1, r._2.toString) -> r._3).toMap
    val exact = rows.groupBy { case (g, t) =>
      (g, t.toString.substring(0, 10))
    }.map { case (k, v) => k -> v.size.toLong }
    assert(merged == exact, s"fold diverged from batch: ${merged.size} vs ${exact.size}")
    // a batch shard count is bounded by groups x days, not rows
    val shard0 = spark.read.parquet(s"$tmp/counts/batch=0").count()
    assert(shard0 <= 3L * 9L, s"shard 0 must be a bounded summary, got $shard0 rows")
  }
}
