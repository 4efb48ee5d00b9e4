package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional clustering for file
  * skipping, the `OPTIMIZE ZORDER BY` shape: sort 100 TB by the
  * bit-interleaved key of two filter columns and every file's min/max
  * stats become selective on BOTH columns at once, so a predicate on
  * either column prunes most files (a 1-D sort makes the second column
  * span the full range in every file).
  *
  * Everything is exact integer arithmetic: each column is affinely
  * scaled to [0, 2^bits) with one integral division against its global
  * min/max (a two-row bounded aggregate, broadcast as literals), and the
  * z-value is the bit-interleave — a sum of disjoint powers of two, no
  * shifts with column distances needed. Both steps replay verbatim in
  * any engine with integer div, which is how the q154 oracle proves the
  * whole layout.
  *
  * Scale shape: one bounded min/max aggregate + one narrow map to attach
  * `__z`, then `repartitionByRange(__z)` (one range-exchange — the same
  * shuffle a plain sort-by would pay) to get z-contiguous files. The
  * top 2k bits of z address a 2^k x 2^k grid cell, so per-file spans of
  * each dimension shrink ~2^k-fold — `layoutStats` materializes exactly
  * that contract and `ZOrderSpec` pins it.
  */
object ZOrder {

  /** `v` (already in its [[ZoneMap.statExpr]] long image) scaled
    * affinely into [0, 2^bits): ((v - mn) * (2^bits - 1)) div (mx - mn),
    * exact in Long (requires range * 2^bits < 2^63 — fine for any real
    * key space at bits <= 16).
    */
  private def scaled(v: Column, mn: Column, mx: Column, bits: Int): Column =
    when(mx === mn, lit(0L)).otherwise(
      call_function("div",
        (v - mn) * lit((1L << bits) - 1), mx - mn))

  /** Bit-interleave of two `bits`-wide non-negative ints: bit i of `a`
    * lands at position 2i+1, bit i of `b` at 2i. Disjoint powers of two,
    * so + is |.
    */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    (0 until bits).map { i =>
      call_function("div", a, lit(1L << i)).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        call_function("div", b, lit(1L << i)).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Attach `__z` for (colA, colB) scaled against their global min/max.
    * The min/max aggregate is two rows collected once (bounded driver
    * artifact, codebook rule); the z map itself is narrow.
    */
  def assign(df: DataFrame, colA: String, colB: String, bits: Int = 8): DataFrame = {
    // the [[ZoneMap.statExpr]] integer image — dates as epoch days,
    // timestamps as epoch micros, numerics as cast(long) — so a layout
    // clustered on a date column and its zone map speak the same unit
    val ia = ZoneMap.statExpr(df.schema(colA).dataType, col(colA))
    val ib = ZoneMap.statExpr(df.schema(colB).dataType, col(colB))
    val r = df.agg(min(ia), max(ia), min(ib), max(ib)).head()
    val (amn, amx, bmn, bmx) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("__z", interleave(
      scaled(ia, lit(amn), lit(amx), bits),
      scaled(ib, lit(bmn), lit(bmx), bits), bits))
  }

  /** Write path: z-assign then range-partition by `__z` so files are
    * z-contiguous — one range exchange, the sort-by shuffle.
    */
  def layout(df: DataFrame, colA: String, colB: String, bits: Int = 8,
             partitions: Int = 32): DataFrame =
    assign(df, colA, colB, bits).repartitionByRange(partitions, col("__z"))

  /** The skipping contract, materialized: bucket rows by the top 2k z
    * bits (the 2^k x 2^k grid cell) and report each bucket's count and
    * per-dimension min/max — the stats a file-skipping reader consults.
    * Narrow per-dimension spans in every bucket ARE the z-order win.
    */
  def layoutStats(df: DataFrame, colA: String, colB: String, bits: Int = 8,
                  gridBits: Int = 2): DataFrame = {
    require(gridBits <= bits, s"gridBits $gridBits must be <= bits $bits")
    val ia = ZoneMap.statExpr(df.schema(colA).dataType, col(colA))
    val ib = ZoneMap.statExpr(df.schema(colB).dataType, col(colB))
    assign(df, colA, colB, bits)
      .withColumn("bucket", call_function("div", col("__z"),
        lit(1L << (2 * bits - 2 * gridBits))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(ia).as("a_min"), max(ia).as("a_max"),
        min(ib).as("b_min"), max(ib).as("b_max"))
  }
}
