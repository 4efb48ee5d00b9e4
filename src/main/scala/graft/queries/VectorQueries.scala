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
             |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)),

    // ---- Learned quality classifier (operators/Classifier): logistic
    // regression trained driver-side on the labeled embeddings (binary
    // task: label < 5), scored distributedly via the codegen'd DotProduct
    // with the weights inlined as array literals. The oracle-compared
    // columns are the LOGIT and keep — pure multiply-add, bit-identical
    // cross-engine; the sigmoid probability stays out of the hash compare
    // (repo rule: no transcendental recomputed independently on both
    // sides — JVM Math.exp and libm exp may differ in the last ulp;
    // Classifier.score's sigmoid is spec-tested instead). ----
    Q("q120_quality_classifier",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .withColumn("y", (col("label") < 5).cast("int"))
        val m = graft.operators.Classifier.train(emb, "vec_id", "embedding", "y")
        graft.operators.Classifier.score(emb, "embedding", m)
          .select(col("vec_id"), col("label"),
            round(col("logit"), 4).as("logit"), col("keep"))
          .orderBy(col("vec_id"))
      },
      None,
      oracleGen = Some(q120OracleGen _)),

    // ---- Exact distributed AUC (operators/Metrics) of that classifier:
    // Mann-Whitney with midrank ties over the LINEAR logit (AUC is
    // invariant under the sigmoid, and the logit is bit-deterministic).
    // The rank statistic stays in integer space until one final division,
    // so the DuckDB replay — same grouping, same integer midrank formula —
    // must agree exactly. ----
    Q("q121_classifier_auc",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .withColumn("y", (col("label") < 5).cast("int"))
        val m = graft.operators.Classifier.train(emb, "vec_id", "embedding", "y")
        val scored = graft.operators.Classifier.score(emb, "embedding", m)
        graft.operators.Metrics.auc(scored, "logit", "y")
          .select(round(col("auc"), 6).as("auc"), col("n_pos"), col("n_neg"))
      },
      None,
      oracleGen = Some(q121OracleGen _))
  )

  /** Shared by the q120/q121 generators: train the (deterministic) model
    * and render the logit expression with weights inlined as
    * shortest-round-trip double literals.
    */
  private def trainedLogitSql(s: SparkSession, dir: String): String = {
    val emb = Tables(s, dir, "embeddings")
      .withColumn("y", (col("label") < 5).cast("int"))
    val m = graft.operators.Classifier.train(emb, "vec_id", "embedding", "y")
    val w = m.w.map(java.lang.Double.toString).mkString("[", ", ", "]")
    s"""list_sum(list_transform(list_zip(embedding, $w),
       |          x -> CAST(x[1] AS DOUBLE) * x[2])) + ${java.lang.Double.toString(m.b)}""".stripMargin
  }

  private def q120OracleGen(s: SparkSession, dir: String): String =
    s"""WITH sc AS (SELECT vec_id, label,
       |        ${trainedLogitSql(s, dir)} AS logit
       |      FROM embeddings)
       |SELECT vec_id, label,
       |  round(logit, 4) AS logit,
       |  logit >= 0 AS keep
       |FROM sc ORDER BY vec_id""".stripMargin

  private def q121OracleGen(s: SparkSession, dir: String): String =
    s"""WITH sc AS (SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
       |        ${trainedLogitSql(s, dir)} AS logit
       |      FROM embeddings),
       |g AS (SELECT logit AS sv, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(y) AS BIGINT) AS np
       |      FROM sc GROUP BY logit),
       |r AS (SELECT n, np,
       |        CAST(coalesce(sum(n) OVER (ORDER BY sv
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
       |      FROM g),
       |t AS (SELECT sum(np * (2 * c + n + 1)) AS s2, sum(np) AS p,
       |        sum(n) - sum(np) AS nn
       |      FROM r)
       |SELECT round(CAST(s2 - p * (p + 1) AS DOUBLE) / 2.0
       |         / (CAST(p AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc,
       |  CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
       |FROM t""".stripMargin
}
