package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteTopK` is the exact baseline: broadcast the (small) query side so the
  * corpus scans once without shuffling; ranking is a per-query window.
  *
  * `lshTopK` is the scale path: multi-table random-hyperplane LSH. Each table
  * hashes every vector to a bucket; queries join the corpus only inside
  * matching buckets, so per-query work drops from |corpus| to
  * ~tables * |corpus| / 2^nBits while recall stays high for near vectors
  * (multiple tables recover neighbors lost to one unlucky cut). At cluster
  * scale the corpus bucketing is computed once and reusable across query
  * batches (write bucketed-by-`bucket` parquet).
  */
object Similarity {

  /** Exact cosine top-k per query row. */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                qId: String = "qid", qVec: String = "qe",
                cId: String = "nid", cVec: String = "ne"): DataFrame = {
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    broadcast(queries)
      .crossJoin(corpus)
      .filter(col(cId) =!= col(qId))
      .select(col(qId), col(cId), VectorFns.cosine(col(qVec), col(cVec)).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** IVF (inverted-file) ANN: KMeans partitions the corpus into nCells
    * cells once; each query probes only its nProbe nearest cells. The
    * classic trade: one offline clustering pass buys per-query work of
    * ~nProbe/nCells of the corpus. At cluster scale the cell assignment is
    * computed once and persisted (write bucketed-by-cell), queries join
    * only their probed cells.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 3,
              qId: String = "qid", qVec: String = "qe",
              cId: String = "nid", cVec: String = "ne"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val withFeatures = corpus.withColumn("features",
      array_to_vector(transform(col(cVec), x => x.cast("double"))))
    val model = new KMeans().setK(nCells).setSeed(42).setMaxIter(10)
      .fit(withFeatures)
    val assigned = model.transform(withFeatures)
      .select(col(cId), col(cVec), col("prediction").as("cell"))

    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.map(_.toFloat).toSeq) }.toSeq
      .toDF("cell", "cvec")
    val probed = broadcast(queries)
      .crossJoin(broadcast(centroids))
      .select(col(qId), col(qVec), col("cell"),
        VectorFns.l2sq(col(qVec), col("cvec")).as("cdist"))
      .withColumn("crn", row_number().over(
        Window.partitionBy(col(qId)).orderBy(col("cdist"), col("cell"))))
      .filter(col("crn") <= nProbe)
      .select(col(qId), col(qVec), col("cell"))

    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    probed.join(assigned, "cell")
      .filter(col(cId) =!= col(qId))
      .select(col(qId), col(cId), VectorFns.cosine(col(qVec), col(cVec)).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Approximate top-k via nTables independent hyperplane-LSH bucketings.
    * All tables' buckets are computed in ONE scan per side (explode over a
    * per-table struct array) — a union of per-table scans would read the
    * input nTables times and multiply stage/codegen overhead.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nBits: Int = 6, nTables: Int = 4,
              qId: String = "qid", qVec: String = "qe",
              cId: String = "nid", cVec: String = "ne"): DataFrame = {
    def bucketed(df: DataFrame, vec: String, keep: Seq[String]): DataFrame =
      df.select(keep.map(col) :+ explode(array((0 until nTables).map { t =>
          struct(lit(t).as("tbl"),
            VectorFns.lshBucket(col(vec), nBits, seedBase = t * nBits).as("bkt"))
        }: _*)).as("__tb"): _*)
        .select(keep.map(col) :+ col("__tb.tbl").as("tbl") :+ col("__tb.bkt").as("bkt"): _*)

    val qb = bucketed(queries, qVec, Seq(qId, qVec))
    val cb = bucketed(corpus, cVec, Seq(cId, cVec))
    val cand = qb.join(cb, Seq("tbl", "bkt"))
      .filter(col(cId) =!= col(qId))
      .select(col(qId), col(cId), col(qVec), col(cVec))
      .dropDuplicates(qId, cId)
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    cand
      .select(col(qId), col(cId), VectorFns.cosine(col(qVec), col(cVec)).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
