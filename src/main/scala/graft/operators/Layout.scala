package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order clustering).
  *
  * At warehouse scale, scans are pruned by parquet row-group / file min-max
  * statistics. A table sorted by one column prunes only on that column; a
  * table clustered on the Z-order (Morton) curve of two columns keeps BOTH
  * columns' per-file ranges tight, so 2-D predicates (user x time, key x
  * date, lat x lon) skip most files. This is the same technique Delta/
  * Iceberg expose as `ZORDER BY` / sort-order transforms, expressed here as
  * plain Column arithmetic + `repartitionByRange` — no engine extension
  * needed, and the curve computation is codegen'd.
  *
  * Scale notes: the min/max stats pass is one tiny agg job; binning is
  * linear (skewed columns should be pre-ranked or log-scaled by the caller
  * — documented, not hidden); the range partitioner samples the z column,
  * so output files hold contiguous curve segments.
  */
object Layout {

  /** Deterministic training-order shuffle: a global permutation of the
    * corpus keyed by md5(seed:id) — the "shuffle the packed sequences
    * before training" step, with no RNG state (rerun-stable, replayable
    * in any engine with md5). The global position is computed by the same
    * two-phase range-partitioned scan as [[Packing]]: range-partition by
    * the hash key, count per partition (bounded driver collect), then
    * offset within partition — never a one-partition window over the
    * corpus. Output: all input columns plus `pos` (0-based position in
    * the shuffled order). Hash collisions tie-break on the id so the
    * permutation is total.
    */
  def shuffledOrder(df: DataFrame, idCol: String, seed: Long): DataFrame = {
    import org.apache.spark.sql.types._
    // CONTRACT: ids must be UNIQUE — duplicate ids share a sort key, so
    // their relative order (and thus the pos-to-payload mapping) would
    // depend on shuffle arrival order, breaking rerun stability. The
    // check is the CALLER's responsibility (deliberately unenforced: a
    // uniqueness probe is a full groupBy-count job per call, priced at
    // corpus scale for a property the upstream id mint already owns).
    require(!df.columns.contains("__k") && !df.columns.contains("pos"),
      "shuffledOrder: input must not carry reserved columns __k/pos")
    val spark = df.sparkSession
    val keyed = df
      .withColumn("__k", md5(concat(lit(seed.toString), lit(":"),
        col(idCol).cast("string")).cast("binary")))
      .repartitionByRange(col("__k"), col(idCol))
      .sortWithinPartitions(col("__k"), col(idCol))
    val fields = keyed.schema.fields
    // one RDD instance for both passes (see Scan's invariant)
    val keyedRdd = keyed.rdd
    val base = Scan.partitionBases(keyedRdd)(_ => 1L)
    val outSchema = StructType(fields :+ StructField("pos", LongType))
    spark.createDataFrame(
      keyedRdd.mapPartitionsWithIndex { case (pi, rows) =>
        var p = base(pi)
        rows.map { r =>
          val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ p)
          p += 1
          out
        }
      }, outSchema)
      .drop("__k")
  }

  /** Interleave the low `bits` bits of two non-negative int columns into
    * the Morton (Z-curve) code: x occupies even bit positions, y odd.
    */
  def mortonCode(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "mortonCode supports 1..31 bits per dimension")
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(1).cast("long") * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(1).cast("long") * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Linear bin of `c` into [0, 2^bits) given column bounds. Values at the
    * upper bound land in the top cell; the clamp guards rounding drift.
    */
  def bin(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = (1 << bits) - 1
    val span = if (hi > lo) hi - lo else 1.0
    greatest(lit(0),
      least(lit(cells),
        floor((c.cast("double") - lit(lo)) / lit(span) * cells).cast("int")))
  }

  /** Write `df` clustered on the Z-curve of (colX, colY): one stats job for
    * the bounds, then bin -> morton -> range-partition -> in-partition sort
    * -> parquet. Each output file covers a contiguous curve segment, so its
    * min-max envelope is tight in BOTH dimensions.
    */
  def writeZOrdered(df: DataFrame, path: String, colX: String, colY: String,
                    bits: Int = 12, numFiles: Int = 0): Unit = {
    val s = df.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).head()
    if (s.isNullAt(0) || s.isNullAt(2)) {
      // empty input or an all-null cluster column: no meaningful curve —
      // write as-is rather than NPE on the missing bounds
      df.write.mode("overwrite").parquet(path)
      return
    }
    // per-row nulls have no position on the curve; pin them to cell 0 so
    // they cluster together instead of propagating null z values
    def nn(c: Column) = coalesce(c.cast("double"), lit(Double.MinValue))
    val z = mortonCode(
      bin(nn(col(colX)), s.getDouble(0), s.getDouble(1), bits),
      bin(nn(col(colY)), s.getDouble(2), s.getDouble(3), bits), bits)
    val parts =
      if (numFiles > 0) numFiles else df.sparkSession.sparkContext.defaultParallelism
    df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
