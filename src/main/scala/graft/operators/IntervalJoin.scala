package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General interval-overlap join — two interval tables joined on equal
  * keys plus [s, e) overlap (sessions × campaign windows, downtime ×
  * orders, the second most common temporal join after as-of). The naive
  * formulation — an equi-join on the key with `a.s < b.e AND b.s < a.e`
  * residuals — is fine when keys are selective, but with no key (or one
  * hot key) Spark plans it as a broadcast-nested-loop/cartesian: O(|A|·|B|)
  * comparisons, dead at scale.
  *
  * This operator fragments both sides onto a fixed-width grid instead:
  * each interval explodes to the cells it touches, candidates equi-join
  * on (key…, cell) — a plain shuffled hash/sort-merge join, never BNLJ —
  * and each qualifying pair is emitted EXACTLY ONCE with no distinct:
  * only at the cell containing max(a.s, b.s), which both fragments cover
  * whenever the intervals overlap (it lies in [a.s, a.e) ∩ [b.s, b.e)).
  * `PlanSpec` pins the no-BNLJ shape.
  *
  * Scale: shuffle ∝ Σ fragments = Σ ceil(len/binWidth); pick `binWidth`
  * near the typical interval length so most intervals produce 1–2
  * fragments. Intervals longer than `maxBinsPerInterval` bins raise a
  * loud error (the repo's loud-cap discipline) rather than silently
  * exploding the fragment count — re-bin with a wider grid instead.
  * Degenerate (s >= e) intervals match nothing and are dropped, matching
  * the half-open SQL predicate. Bounds must be non-negative integers
  * (epoch days/seconds/micros — `DIV` is floor only for non-negatives).
  */
object IntervalJoin {

  def overlap(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              sCol: String, eCol: String, binWidth: Long,
              rightSuffix: String = "_r",
              maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(keyCols.nonEmpty, "interval overlap join needs at least one key")

    def frags(df: DataFrame, s: String, e: String): DataFrame = {
      val lo = expr(s"$s DIV $binWidth")
      val hi = expr(s"($e - 1) DIV $binWidth")
      df.filter(col(s) < col(e))
        .withColumn("__cell",
          explode(sequence(lo,
            when(hi - lo >= maxBinsPerInterval,
              raise_error(concat(lit(s"IntervalJoin: interval spans more than " +
                s"$maxBinsPerInterval bins of width $binWidth at "), col(s)))
              .cast("long")).otherwise(hi))))
    }

    val sR = sCol + rightSuffix
    val eR = eCol + rightSuffix
    val renamed = right.toDF(right.columns.map(c =>
      if (keyCols.contains(c)) c else c + rightSuffix): _*)
    val l = frags(left, sCol, eCol)
    val r = frags(renamed, sR, eR)
    val emitCell: Column =
      expr(s"greatest($sCol, $sR) DIV $binWidth")
    l.join(r, keyCols :+ "__cell")
      .filter(col(sCol) < col(eR) && col(sR) < col(eCol) &&
        col("__cell") === emitCell)
      .drop("__cell")
  }

  /** Per-key COVERAGE of a set of possibly-overlapping [s, e) intervals:
    * the total length of their union (uptime from overlapping
    * maintenance windows, billed time from concurrent sessions) plus the
    * interval count. The classic sweep: every interval contributes a +1
    * boundary at s and a −1 at e, deltas are summed PER POSITION first
    * (so touching/equal boundaries never depend on processing order),
    * the running level is a key-partitioned cumulative sum, and each
    * segment [pos, next_pos) counts iff the level after `pos` is
    * positive. One explode + one aggregate + one key-partitioned window
    * — per-key work ∝ the key's boundary count, never a cross join;
    * degenerate intervals drop as in [[overlap]].
    */
  def coverage(df: DataFrame, keyCols: Seq[String],
               sCol: String, eCol: String): DataFrame = {
    require(keyCols.nonEmpty, "coverage needs at least one key")
    import org.apache.spark.sql.expressions.Window
    val g = keyCols.map(col)
    val iv = df.filter(col(sCol) < col(eCol))
    val bounds = iv
      .select(g ++ Seq(col(sCol).as("__pos"), lit(1L).as("__d")): _*)
      .unionByName(iv.select(g ++ Seq(col(eCol).as("__pos"),
        lit(-1L).as("__d")): _*))
      .groupBy(g :+ col("__pos"): _*)
      .agg(sum(col("__d")).as("__d"))
    val w = Window.partitionBy(g: _*).orderBy(col("__pos"))
    val n = iv.groupBy(g: _*).agg(count(lit(1)).as("n_intervals"))
    bounds
      .withColumn("__lvl", sum(col("__d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__nxt", lead(col("__pos"), 1).over(w))
      .groupBy(g: _*)
      .agg(coalesce(sum(when(col("__lvl") > 0,
        col("__nxt") - col("__pos"))), lit(0L)).as("covered"))
      .join(n, keyCols)
  }
}
