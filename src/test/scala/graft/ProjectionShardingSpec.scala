package graft

import java.security.MessageDigest

import graft.operators.{Projection, Sharding}

/** Hash-defined projection and rendezvous sharding: exact driver-side
  * reference replays, partitioning invariance, minimal movement.
  */
class ProjectionShardingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("project equals the driver-side reference and is partitioning-invariant") {
    val vecs = (1L to 20L).map(i =>
      (i, (1 to 16).map(d => ((i * 31 + d * 7) % 100 - 50) / 100.0f).toArray))
    val df = vecs.toDF("id", "vec")
    val got = Projection.project(df.repartition(5), "id", "vec", k = 4)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val one = Projection.project(df.coalesce(1), "id", "vec", k = 4)
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === one)
    val expected = (for {
      (id, vec) <- vecs
      j <- 1 to 4
    } yield {
      val p = vec.zipWithIndex.map { case (x, i) =>
        val q = math.round(x.toDouble * 100000L)
        val sign =
          if (Integer.parseInt(md5hex(s"p:${i + 1}:$j").substring(0, 1), 16)
            % 2 == 0) 1L else -1L
        q * sign
      }.sum
      (id, j) -> p
    }).toMap
    assert(got === expected)
  }

  test("rendezvous: growing 7 -> 8 shards moves ONLY keys won by the new shard") {
    val keys = (1L to 500L).toDF("k")
    val a8 = Sharding.assign(keys, "k", 8).as[(Long, Int)].collect().toMap
    val a7 = Sharding.assign(keys, "k", 7).as[(Long, Int)].collect().toMap
    val moved = (1L to 500L).filter(k => a7(k) != a8(k))
    assert(moved.nonEmpty)
    assert(moved.forall(k => a8(k) == 7)) // movement only INTO the new shard
    // every shard gets some keys at this cardinality
    assert(a8.values.toSet === (0 until 8).toSet)
  }
}
