package graft

import org.apache.spark.sql.functions._

import graft.operators.Purge

/** Targeted delete: read-back equals the filter, untouched bucket
  * partitions stay byte-for-byte on disk, fully-emptied buckets drop
  * their partition directory, and the deleted count is exact.
  */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOfKey(k: Long, n: Int): Int =
    (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"p:$k").take(8),
      16) % n).toInt

  test("deleteKeys rewrites only touched buckets, drops emptied ones, " +
    "and the survivors equal the filter") {
    val tmp = java.nio.file.Files.createTempDirectory("purge_").toString
    val store = s"$tmp/store"
    val nBuckets = 32
    val rows = (1L to 400L).map(k => (k, s"payload_$k", k % 7))
    Purge.writeBucketed(rows.toDF("k", "payload", "grp"), "k", store, nBuckets)

    // delete a scattered key set
    val doomed = (1L to 400L).filter(_ % 37 == 0)
    val touched = doomed.map(bucketOfKey(_, nBuckets)).toSet
    val untouched = (0 until nBuckets).toSet -- touched
    assert(untouched.nonEmpty, "fixture must leave some buckets untouched")
    def files(b: Int): Map[String, Long] = {
      val d = new java.io.File(s"$store/__bucket=$b")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val beforeFiles = untouched.map(b => b -> files(b)).toMap
    assert(beforeFiles.values.forall(_.nonEmpty))

    val deleted = Purge.deleteKeys(spark, store, "k",
      doomed.map(Tuple1(_)).toDF("k"), nBuckets)
    assert(deleted === doomed.size.toLong)
    // survivors equal the filter
    val got = Purge.read(spark, store).select("k").as[Long].collect().toSet
    assert(got === (1L to 400L).filterNot(_ % 37 == 0).toSet)
    // untouched partitions byte-identical (same files, same mtimes)
    untouched.foreach { b =>
      assert(files(b) === beforeFiles(b),
        s"untouched bucket $b was rewritten")
    }

    // now delete EVERYTHING in one bucket: its partition dir must vanish
    val b0 = touched.head
    val inB0 = got.filter(k => bucketOfKey(k, nBuckets) == b0)
    assert(inB0.nonEmpty)
    val d2 = Purge.deleteKeys(spark, store, "k",
      inB0.toSeq.map(Tuple1(_)).toDF("k"), nBuckets)
    assert(d2 === inB0.size.toLong)
    assert(!new java.io.File(s"$store/__bucket=$b0").exists(),
      "fully-emptied bucket must drop its partition directory")
    assert(Purge.read(spark, store).select("k").as[Long].collect().toSet ===
      got -- inB0)

    // deleting absent keys is a no-op that reports zero
    assert(Purge.deleteKeys(spark, store, "k",
      Seq(99999L).map(Tuple1(_)).toDF("k"), nBuckets) === 0L)
  }
}
