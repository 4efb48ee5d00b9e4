package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-based collaborative filtering over a binary user-item matrix:
  * nearest neighbors by co-consumption, then unseen-item
  * recommendations — the "users like you also bought" query, exact and
  * float-free.
  *
  * Similarity is squared cosine in integer ppm — `co²·10⁶ div (n_a·n_b)`
  * — which ranks identically to cosine (all terms non-negative, squaring
  * is monotone) without a square root, so the whole pipeline stays in
  * BIGINT and replays in any engine. Ties break by neighbor id, then
  * candidate item id: fully deterministic output.
  *
  * Scale shape — the three standard CF blow-ups, each bounded:
  *  - pair generation is ITEM-BLOCKED (the LSH-bucket discipline): a
  *    self-join on item only ever multiplies within an item's user list;
  *  - `maxDf` drops stop-items up front (an item half the corpus bought
  *    contributes df² pairs and no signal — the classic stop-word cut,
  *    applied before any join and replayed by the oracle);
  *  - `minCo` prunes the accidental one-item overlaps before the
  *    neighbor ranking, bounding the per-user neighbor candidate list.
  * Shuffles: one per groupBy/join, all on user/item/pair keys AQE can
  * split. Windows are per-user, never global. Overflow: co ≤ min(n_a,
  * n_b), so `co²·10⁶` needs per-user item counts below ~3·10⁶.
  */
object Cf {

  /** Distinct (u, i) pairs with the stop-item cut applied, materialized
    * ONCE (`localCheckpoint`): the base distinct + df filter feed the
    * per-user counts, BOTH sides of the pair self-join, and (in
    * [[recommend]]) the candidate expansion and the seen-item anti-join
    * — five readers that would otherwise each replay the corpus
    * distinct (the [[Trend.corrMatrix]] materialize-once discipline).
    */
  private def keptPairs(ui: DataFrame, uCol: String, iCol: String,
                        maxDf: Long): DataFrame = {
    val base = ui.select(col(uCol).cast("long").as("u"),
      col(iCol).cast("long").as("i")).distinct()
    base.join(
      base.groupBy(col("i")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select(col("i")), "i")
      .localCheckpoint(true)
  }

  /** `ui`: one row per DISTINCT (user, item). Returns per-user top-`k`
    * neighbors `(u, nb, co, sim2_ppm)`.
    */
  def userNeighbors(ui: DataFrame, uCol: String, iCol: String,
                    maxDf: Long, minCo: Long, k: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be positive, got $maxDf")
    require(minCo >= 1, s"minCo must be positive, got $minCo")
    require(k >= 1, s"k must be positive, got $k")
    neighborsFromKept(keptPairs(ui, uCol, iCol, maxDf), minCo, k)
  }

  private def neighborsFromKept(kept: DataFrame, minCo: Long,
                                k: Int): DataFrame = {
    val nu = kept.groupBy(col("u")).agg(count(lit(1)).as("__n"))
    // co-consumption is SYMMETRIC — co(a,b) == co(b,a) == |shared items|
    // — so the item-blocked self-join generates each unordered pair ONCE
    // (ua < ub instead of ua ≠ ub: HALF the generated rows through the
    // pipeline's heaviest exchange and aggregation, guide §2.3) and the
    // ordered view the per-user ranking needs is the mirror of the
    // AGGREGATED, minCo-pruned pairs — orders of magnitude fewer rows
    // than the generated ones. The checkpoint keeps the second
    // orientation from re-running the half-join (and sim2_ppm is
    // symmetric too: co²·10⁶ div (na·nb) commutes in na, nb).
    val half = kept.select(col("i"), col("u").as("ua"))
      .join(kept.select(col("i"), col("u").as("ub")), "i")
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .localCheckpoint(true)
    val co = half.unionByName(
      half.select(col("ub").as("ua"), col("ua").as("ub"), col("co")))
    val sim = co
      .join(nu.select(col("u").as("ua"), col("__n").as("__na")), "ua")
      .join(nu.select(col("u").as("ub"), col("__n").as("__nb")), "ub")
      .select(col("ua").as("u"), col("ub").as("nb"), col("co"),
        expr("(co * co * 1000000) div (__na * __nb)").as("sim2_ppm"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("sim2_ppm").desc, col("nb"))
    sim.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("u"), col("nb"), col("co"), col("sim2_ppm"))
  }

  /** Top-`topN` unseen-item recommendations per user: candidates are the
    * top-`k` neighbors' NON-stop items minus the user's own (the
    * anti-join runs against the user's FULL basket — a stop item the
    * user already owns is never re-recommended), scored by the sum of
    * the recommending neighbors' `sim2_ppm`. Returns
    * `(u, item, score, n_nb, rank)`.
    */
  def recommend(ui: DataFrame, uCol: String, iCol: String,
                maxDf: Long, minCo: Long, k: Int, topN: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be positive, got $maxDf")
    require(minCo >= 1, s"minCo must be positive, got $minCo")
    require(k >= 1, s"k must be positive, got $k")
    require(topN >= 1, s"topN must be positive, got $topN")
    // the seen-item anti-join runs against the user's FULL basket (stop
    // items included), so `base` stays alongside the kept pairs
    val base = ui.select(col(uCol).cast("long").as("u"),
      col(iCol).cast("long").as("i")).distinct().localCheckpoint(true)
    val kept = base.join(
      base.groupBy(col("i")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select(col("i")), "i")
      .localCheckpoint(true)
    val nbrs = neighborsFromKept(kept, minCo, k)
    val cand = nbrs
      .join(kept.select(col("u").as("nb"), col("i")), "nb")
      .join(base.select(col("u"), col("i")), Seq("u", "i"), "left_anti")
      .groupBy(col("u"), col("i"))
      .agg(sum(col("sim2_ppm")).as("score"), count(lit(1)).as("n_nb"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("score").desc, col("i"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("u"), col("i").as("item"), col("score"), col("n_nb"),
        col("rank"))
  }
}
