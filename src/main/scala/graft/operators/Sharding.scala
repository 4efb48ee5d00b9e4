package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding: each key goes to the
  * shard with the highest md5(key, shard) weight. Unlike `key mod N`,
  * adding or removing a shard moves ONLY the keys whose winning shard
  * changed (~1/N of them) — the property that makes consistent routing,
  * state-store partitioning, and cache assignment survive resharding
  * without a full shuffle of history.
  *
  * Pure Column arithmetic: the weight argmax over N shards is a
  * greatest-of-structs expression — no shuffle, no UDF, pushes through
  * whole-stage codegen, and replays in any engine with md5.
  */
object Sharding {

  def assign(df: DataFrame, keyCol: String, nShards: Int,
             seed: String = "rv"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val weighted = (0 until nShards).map { sh =>
      struct(
        conv(substring(md5(concat_ws(":", lit(seed), col(keyCol).cast("string"),
          lit(sh)).cast("binary")), 1, 15), 16, 10).cast("long").as("w"),
        lit(sh).as("shard"))
    }
    df.withColumn("shard", greatest(weighted: _*).getField("shard"))
  }
}
