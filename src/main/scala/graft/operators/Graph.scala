package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames.
  *
  * `pageRankFixed` is PageRank in FIXED-POINT integer arithmetic: ranks
  * are integer micro-units of `scale`, the teleport base and every edge
  * contribution use integer division, and per-node totals are integer
  * sums — so the result is EXACT, reproducible bit-for-bit in any engine
  * (a float PageRank's per-node sums depend on addition order, which no
  * two engines share). This is the same determinism trade the repo's
  * md5-bucket samplers make.
  *
  * Scale shape: each iteration is one join of the edge list with the
  * current rank vector plus one partial-aggregated sum by destination —
  * the standard distributed PageRank step (shuffle ∝ edges). Lineage is
  * cut with `localCheckpoint` every few rounds, the
  * [[Dedup.connectedComponents]] discipline, so ten iterations don't
  * compound into a thousand-stage plan. At cluster scale the edge list
  * is pre-partitioned by `src` once and every iteration reuses that
  * exchange.
  *
  * CONTRACT: every node must have at least one outgoing and one incoming
  * edge (no dangling mass) — symmetric edge sets satisfy this by
  * construction; violations fail loudly.
  */
object Graph {

  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int = 10, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct().persist()
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      try {
        val noOut = nodes
          .join(e.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
          .count()
        require(noOut == 0,
          s"pageRankFixed: $noOut node(s) have no out-edge — rank mass " +
            "would leak; make the edge set symmetric or add self-loops")
        // and the dual: a node with no IN-edge would silently drop from
        // the groupBy(dst)-built rank vector after iteration 1, taking its
        // outgoing contributions with it
        val noIn = nodes
          .join(e.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
          .count()
        require(noIn == 0,
          s"pageRankFixed: $noIn node(s) have no in-edge — they would " +
            "vanish from the rank vector; make the edge set symmetric")
        val n = nodes.count()
        val init = scale / n
        val base = ((15L * scale) / 100L) / n
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
        var rank = nodes.select(col("node"), lit(init).as("r"))
        var i = 1
        while (i <= iters) {
          rank = e
            .join(rank.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(col("dst").as("node"),
              expr("(85 * r) div (100 * od)").as("c"))
            .groupBy(col("node"))
            .agg((lit(base) + sum(col("c"))).as("r"))
          // cut lineage so ten iterations don't stack into one mega-plan
          if (i % 4 == 0 || i == iters) rank = rank.localCheckpoint(true)
          i += 1
        }
        rank
      } finally nodes.unpersist(false)
    } finally e.unpersist(false)
  }
}
