package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns

/** Embedding-column queries (similarity-search surface over
  * `embeddings.parquet`): vector norms and brute-force cosine top-k. The
  * LSH-bucketed scale path lives in graft.operators.Similarity.
  */
object VectorQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- Per-label mean L2 norm (higher-order fns, no UDF). ----
    Q("q40_vector_norm",
      (s, dir) => {
        t(s, dir, "embeddings")
          .select(col("label"), VectorFns.norm(col("embedding")).as("nrm"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 4).as("avg_norm"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, count(*) AS n,
             |  round(avg(sqrt(list_sum(list_transform(embedding,
             |    x -> x::DOUBLE * x::DOUBLE)))), 4) AS avg_norm
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)),

    // ---- Brute-force cosine top-k (the exact baseline for ANN). The query
    // side is broadcast so the corpus never shuffles; per-query ranking is a
    // window over the similarity column.
    Q("q41_knn_brute",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val sim = VectorFns.cosine(col("qe"), col("ne"))
        val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
        broadcast(q)
          .crossJoin(emb.select(col("vec_id").as("nid"), col("embedding").as("ne")))
          .filter(col("nid") =!= col("qid"))
          .select(col("qid"), col("nid"), sim.as("sim"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("nid"), round(col("sim"), 4).as("sim"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
             |           FROM embeddings WHERE vec_id < 5),
             |s AS (SELECT qid, e.vec_id AS nid,
             |        list_sum(list_transform(list_zip(qe, e.embedding),
             |          x -> x[1]::DOUBLE * x[2]::DOUBLE))
             |        / (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))
             |           * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS sim
             |      FROM q, embeddings e WHERE e.vec_id <> qid)
             |SELECT qid, nid, round(sim, 4) AS sim, rn
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM s)
             |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin))
  )
}
