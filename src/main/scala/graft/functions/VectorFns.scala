package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Column
  * expressions (higher-order functions; codegen'd, no UDF).
  *
  * Everything casts elements to double *before* multiplying and folds
  * left-to-right, so results are bit-reproducible across engines that do the
  * same (the DuckDB oracle mirrors this exactly).
  */
object VectorFns {

  /** Left-fold sum of a double array. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product — native codegen'd expression (bit-identical to the
    * double-cast left-fold HOF formulation, ~order-of-magnitude faster).
    */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorExpressions.dot(a, b)

  /** L2 norm. */
  def norm(v: Column): Column =
    sqrt(fsum(transform(v, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity — native codegen'd expression (same fold order as
    * the HOF/oracle version => bit-identical results).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine(a, b)

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }))

  /** Sign bit (0/1) of the projection of v onto a deterministic pseudo-random
    * hyperplane derived from `seed` — building block for embedding LSH.
    *
    * The plane is materialized DRIVER-SIDE as an array literal (components
    * in [-1,1), seeded PRNG), so per row the work is one fused
    * multiply-accumulate pass — no per-element hashing in the hot path.
    * `dim` must be >= the vector length (excess components are ignored by
    * zip semantics on the shorter array).
    */
  def hyperplaneBit(v: Column, seed: Int, dim: Int = 64): Column = {
    val proj = fsum(zip_with(v, array(planeFor(seed, dim).map(lit): _*),
      (x, p) => coalesce(x.cast("double") * p, lit(0.0))))
    when(proj >= 0, 1L).otherwise(0L)
  }

  /** Deterministic plane for seed (shared by the HOF and native paths). */
  private[graft] def planeFor(seed: Int, dim: Int): Array[Double] = {
    val rnd = new java.util.Random(seed.toLong * 2654435761L + 0x9E3779B9L)
    Array.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  /** nBits-bit LSH bucket id for an embedding (random-hyperplane SimHash).
    * Near-duplicate vectors land in the same bucket with high probability;
    * at 100 TB this turns O(n^2) similarity search into a bucket-local join.
    * `seedBase` decorrelates multiple hash tables. Native codegen'd
    * expression: one pass over the vector computes all bits.
    */
  def lshBucket(v: Column, nBits: Int, seedBase: Int = 0, dim: Int = 64): Column = {
    val planes = Array.tabulate(nBits)(b => planeFor(seedBase + b, dim))
    org.apache.spark.sql.GraftShim.column(
      graft.expressions.HyperplaneLsh(org.apache.spark.sql.GraftShim.expression(v), planes))
  }
}
