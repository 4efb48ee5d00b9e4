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

  /** Dot product of two float/double vectors (element-wise double mult). */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. */
  def norm(v: Column): Column =
    sqrt(fsum(transform(v, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }))

  /** Sign bit (+1) of the projection of v onto a deterministic pseudo-random
    * hyperplane derived from `seed` — building block for embedding LSH.
    * Plane component i = hash(seed, i) mapped to [-1, 1).
    */
  def hyperplaneBit(v: Column, seed: Int): Column = {
    val proj = fsum(zip_with(
      v,
      sequence(lit(0), size(v) - 1),
      (x, i) => x.cast("double") *
        (pmod(xxhash64(concat(lit(seed.toString), lit("_"), i)), lit(1000000L)).cast("double") / 500000.0 - 1.0)))
    when(proj >= 0, 1L).otherwise(0L)
  }

  /** nBits-bit LSH bucket id for an embedding (random-hyperplane SimHash).
    * Near-duplicate vectors land in the same bucket with high probability;
    * at 100 TB this turns O(n^2) similarity search into a bucket-local join.
    * `seedBase` decorrelates multiple hash tables.
    */
  def lshBucket(v: Column, nBits: Int, seedBase: Int = 0): Column =
    (0 until nBits).map(b => hyperplaneBit(v, seedBase + b) * lit(1L << b)).reduce(_ + _)
}
