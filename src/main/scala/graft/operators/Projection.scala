package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a HASH-DEFINED sign
  * matrix: dim-d vectors down to k dims via p_j = Σ_i q_i · s(i, j),
  * s(i, j) ∈ {+1, −1} derived from md5("p:i:j") — no materialized
  * projection matrix, no driver state, no RNG: any executor (or any
  * engine with md5) regenerates the same matrix entry on demand, which is
  * what makes a distributed projection reproducible across backfills and
  * replayable by a SQL oracle.
  *
  * Inputs are quantized once (round(x·scale), the q177 discipline), so
  * the projection is exact integer arithmetic — summation-order-free.
  * Shape: one posexplode (rows × d), explode over the k output dims
  * (rows × d × k intermediate, never materialized past the partial agg),
  * one shuffle keyed (id, j). Distance preservation is the JL guarantee;
  * what this implementation adds is bit-reproducibility.
  */
object Projection {

  def project(emb: DataFrame, idCol: String, vecCol: String, k: Int,
              scale: Long = 100000L, seed: String = "p"): DataFrame = {
    require(k > 0, "k must be positive")
    val q = emb
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos0", "x")))
      .select(col(idCol), (col("pos0") + 1).as("pos"),
        round(col("x").cast("double") * scale).cast("long").as("q"))
    val terms = q.select(col(idCol), col("pos"), col("q"),
      explode(array((1 to k).map(lit): _*)).as("j"))
    // sign = +1 iff the first md5 nibble of "seed:pos:j" is even
    val sign = when(
      conv(substring(md5(concat_ws(":", lit(seed), col("pos"), col("j"))
        .cast("binary")), 1, 1), 16, 10).cast("long") % 2 === 0,
      lit(1L)).otherwise(lit(-1L))
    terms
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("q") * sign).as("p"))
  }
}
