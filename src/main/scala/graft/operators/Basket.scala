package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — exact a-priori over item PAIRS: for
  * every directed rule `a → b` with pair support ≥ `minSupport`, the
  * exact support counts, confidence, and lift in integer ppm. The
  * "customers who bought X also bought Y" query, float-free.
  *
  * Scale shape — the basket self-join is the one quadratic step, bounded
  * two ways before it runs:
  *  - `maxBasketSize` drops oversized baskets up front (a crawler or
  *    test account with 10⁴ items would contribute 10⁸ pairs and no
  *    signal — the Cf `maxDf` stop-cut applied to the basket axis; the
  *    drop is part of the operator's definition and replays in the
  *    oracle);
  *  - pair generation is BASKET-BLOCKED (equi-join on the basket id),
  *    so candidates only multiply within one basket's (bounded) item
  *    list, with `ia < ib` halving the block.
  * Everything downstream is hash aggregates and broadcast-sized
  * per-item support joins; shuffle ∝ distinct pairs above support.
  *
  * Overflow budget (documented, required): lift's numerator is
  * `sup_ab · N · 10⁶` — callers need `sup_ab · N < 9.2·10¹²`. At larger
  * scales divide in two exact steps (conf first, then `· N div sup_b`)
  * and accept the documented one-unit floor drift, or raise minSupport.
  */
object Basket {

  /** `items`: one row per (basket, item) occurrence — duplicates within
    * a basket collapse. Returns one row per DIRECTED rule:
    * `(ante, cons, sup_ab, sup_a, sup_b, conf_ppm, lift_ppm)` where
    * `conf_ppm = sup_ab·10⁶ div sup_a` and
    * `lift_ppm = sup_ab·N·10⁶ div (sup_a·sup_b)` (10⁶ = independence).
    */
  def rules(items: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long, maxBasketSize: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be positive, got $minSupport")
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    // the basket id is internal (never emitted) — keep its ORIGINAL type,
    // so callers can pass a struct/string composite key that cannot alias
    // (a numeric user*K+sess composite silently merges baskets past K
    // sessions per user)
    val base = items.select(col(basketCol).as("b"),
      col(itemCol).cast("long").as("i")).distinct()
    val kept = base.join(
      base.groupBy(col("b")).agg(count(lit(1)).as("__sz"))
        .filter(col("__sz") <= maxBasketSize).select(col("b")), "b")
    // N and per-item supports count KEPT baskets only: support, confidence
    // and lift all live in the same post-filter universe (the oracle
    // replays the same drop)
    val nBaskets = kept.select(col("b")).distinct().count()
    val supI = kept.groupBy(col("i")).agg(count(lit(1)).as("sup"))
    val pairs = kept.select(col("b"), col("i").as("ia"))
      .join(kept.select(col("b"), col("i").as("ib")), "b")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSupport)
    val directed = pairs.select(col("ia").as("ante"), col("ib").as("cons"),
        col("sup_ab"))
      .unionByName(pairs.select(col("ib").as("ante"), col("ia").as("cons"),
        col("sup_ab")))
    directed
      .join(supI.select(col("i").as("ante"), col("sup").as("sup_a")), "ante")
      .join(supI.select(col("i").as("cons"), col("sup").as("sup_b")), "cons")
      .select(col("ante"), col("cons"), col("sup_ab"), col("sup_a"),
        col("sup_b"),
        expr("(sup_ab * 1000000) div sup_a").as("conf_ppm"),
        expr(s"(sup_ab * CAST($nBaskets AS BIGINT) * 1000000) " +
          "div (sup_a * sup_b)").as("lift_ppm"))
  }
}
