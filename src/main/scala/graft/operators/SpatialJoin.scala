package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-grid spatial radius join: all `(left, right)` point pairs within
  * L∞ (Chebyshev) distance `radius`, without the cross join the naive
  * inequality predicate plans to (the 2-D analog of
  * [[IntervalJoin.overlap]]'s grid fragmentation).
  *
  * Both sides bucket onto a square grid of cell side = `radius`; a
  * qualifying pair's cells then differ by at most 1 in each axis, so
  * replicating the RIGHT side to its 3×3 cell neighborhood and
  * equi-joining on the cell key finds every candidate — each pair exactly
  * once (the left point lives in exactly one cell, and the replicated
  * right point covers that cell at most once). An exact integer
  * coordinate filter keeps the true pairs; the emitted distance is the
  * exact Chebyshev `max(|dx|, |dy|)`.
  *
  * Scale shape: work ∝ points (×9 replication of one side — put the
  * SMALLER side right) + candidate pairs ∝ local density; the join is an
  * equi-join on cell keys, so the plan is a plain hash join (PlanSpec
  * pins no-BNLJ/no-cartesian) and AQE can split hot cells. A radius far
  * below the point spacing degenerates gracefully (empty candidates); a
  * radius spanning the whole space belongs in a cross join, not here —
  * callers pick `radius` ≪ extent, the classic grid-join contract.
  */
object SpatialJoin {

  def radiusJoin(left: DataFrame, lid: String, lx: String, ly: String,
                 right: DataFrame, rid: String, rx: String, ry: String,
                 radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be positive, got $radius")
    def cell(c: Column): Column = floorDiv(c, lit(radius))
    val l = left.select(col(lid).cast("long").as("__lid"),
      col(lx).cast("long").as("__lx"), col(ly).cast("long").as("__ly"),
      cell(col(lx)).as("__cx"), cell(col(ly)).as("__cy"))
    val offsets = Seq(-1L, 0L, 1L)
    val r = right.select(col(rid).cast("long").as("__rid"),
        col(rx).cast("long").as("__rx"), col(ry).cast("long").as("__ry"))
      .withColumn("__dx", explode(array(offsets.map(lit): _*)))
      .withColumn("__dy", explode(array(offsets.map(lit): _*)))
      .select(col("__rid"), col("__rx"), col("__ry"),
        (cell(col("__rx")) + col("__dx")).as("__cx"),
        (cell(col("__ry")) + col("__dy")).as("__cy"))
    l.join(r, Seq("__cx", "__cy"))
      .filter(abs(col("__lx") - col("__rx")) <= radius &&
        abs(col("__ly") - col("__ry")) <= radius)
      .select(col("__lid").as(lid), col("__rid").as(rid),
        greatest(abs(col("__lx") - col("__rx")),
          abs(col("__ly") - col("__ry"))).as("dist"))
  }

  /** Floor division that matches SQL `//` on negatives (Spark's `div`
    * truncates): subtract the positive remainder first, so the quotient
    * is exact — a point just left of zero lands in cell −1, not 0.
    * `(a − pmod(a,b))` is exactly divisible by `b`, making the double
    * division integer-valued (exact for |coord| ≤ 2⁵²).
    */
  private def floorDiv(a: Column, b: Column): Column =
    ((a.cast("long") - pmod(a.cast("long"), b)) / b).cast("long")
}
