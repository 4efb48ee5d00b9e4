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
      oracleGen = Some(q121OracleGen _)),

    // ---- Hybrid retrieval: reciprocal-rank fusion of BM25 (lexical) and
    // brute-cosine (vector) top-20 lists per query (operators/Fusion).
    // Each query is a (text, embedding-of-doc-qid) pair; fused scores are
    // integer micro-units 1000000 div (60 + rank) so the fused ORDER is
    // bit-portable. The oracle replays both retrievers end-to-end (the
    // q97 BM25 CTEs + the q41 cosine shape) and the integer fusion. ----
    Q("q151_hybrid_rrf",
      (s, dir) => {
        fusedLists(s, dir)
          .select(col("qid"), col("doc_id"), col("lex_rn"), col("ann_rn"),
            col("rrf"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(rrfOracleCtes +
        """SELECT qid, doc_id, CAST(lex_rn AS BIGINT) AS lex_rn,
          |  CAST(ann_rn AS BIGINT) AS ann_rn, rrf, rn
          |FROM (SELECT *, row_number() OVER (PARTITION BY qid
          |        ORDER BY rrf DESC, doc_id) AS rn FROM f)
          |WHERE rn <= 10 ORDER BY qid, rn""".stripMargin)),

    // ---- Retrieval-quality eval of that fused list (Fusion.rankMetrics):
    // MRR@10 / DCG@10 / NDCG@10 against exact-cosine-top-10 truth, every
    // metric an exact integer in micro-units — the log2 position discounts
    // are StrictMath-computed ONCE on the driver and inlined as literals
    // on both sides, so the whole evaluation (including the ideal-DCG
    // denominator) hash-verifies cross-engine. The q136-recall convention,
    // extended from set overlap to position-weighted ranking quality. ----
    Q("q152_rank_eval",
      (s, dir) => {
        val fused = fusedLists(s, dir)
          .select(col("qid"), col("doc_id"), col("rn"))
        val emb = t(s, dir, "embeddings")
        val qe = emb.filter(col("vec_id").isin(1L, 2L, 3L))
          .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        val wT = Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("doc_id"))
        val truth = broadcast(qe)
          .crossJoin(emb.select(col("vec_id").as("doc_id"),
            col("embedding").as("ne")))
          .select(col("qid"), col("doc_id"),
            VectorFns.cosine(col("qe"), col("ne")).as("sim"))
          .withColumn("rn", row_number().over(wT))
          .filter(col("rn") <= 10)
          .select(col("qid"), col("doc_id"))
        graft.operators.Fusion
          .rankMetrics(fused, truth, "qid", "doc_id", "rn", k = 10)
          .orderBy(col("qid"))
      },
      Some(rrfOracleCtes +
        """, fused AS (SELECT qid, doc_id, rn FROM (
          |           SELECT *, row_number() OVER (PARTITION BY qid
          |             ORDER BY rrf DESC, doc_id) AS rn FROM f)
          |         WHERE rn <= 10),
          |tr AS (SELECT qid, doc_id FROM annr WHERE rn <= 10),
          |d(rn, disc) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
          |    (4, 430677), (5, 386853), (6, 356207), (7, 333333),
          |    (8, 315465), (9, 301030), (10, 289065)),
          |rel AS (SELECT fused.qid, fused.rn,
          |          CASE WHEN tr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
          |        FROM fused LEFT JOIN tr
          |          ON fused.qid = tr.qid AND fused.doc_id = tr.doc_id)
          |SELECT qid, CAST(sum(rel) AS BIGINT) AS hits,
          |  CAST(coalesce(max(CASE WHEN rel = 1 THEN 1000000 // rel2.rn END), 0)
          |    AS BIGINT) AS mrr_micro,
          |  CAST(sum(rel * disc) AS BIGINT) AS dcg_micro,
          |  CAST(4543560 AS BIGINT) AS idcg_micro,
          |  CAST((1000000 * sum(rel * disc)) // 4543560 AS BIGINT) AS ndcg_micro
          |FROM rel rel2 JOIN d ON rel2.rn = d.rn
          |GROUP BY qid ORDER BY qid""".stripMargin)),

    // ---- Per-class embedding outliers (Centroids.classOutliers): which
    // vectors sit farthest from their label's centroid — the mislabeled/
    // corrupt-example sweep of a training-data pipeline — EXACT in
    // integers. Floats quantized once as round((x+1)·10⁵) (the +1 keeps
    // the domain positive so floor and truncating division agree, and it
    // cancels in the centroid difference); per-(label,pos) floor
    // centroids broadcast back; integer squared-L2; top-10 per label.
    // No float ever crosses a row boundary, so the result is summation-
    // order-free and fully oracle-checkable. ----
    Q("q177_embedding_outliers",
      (s, dir) => {
        graft.operators.Centroids.classOutliers(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label")
          .orderBy(col("label"), col("rn"))
      },
      Some("""WITH e AS (SELECT vec_id, label, pos,
             |        CAST(round((CAST(embedding[pos] AS DOUBLE) + 1)
             |          * 100000) AS BIGINT) AS q
             |      FROM embeddings,
             |        unnest(generate_series(1, len(embedding))) AS t(pos)),
             |c AS (SELECT label, pos,
             |        CAST(sum(q) AS BIGINT) // CAST(count(*) AS BIGINT)
             |          AS cq
             |      FROM e GROUP BY 1, 2),
             |d AS (SELECT e.vec_id, e.label,
             |        CAST(sum((e.q - c.cq) * (e.q - c.cq)) AS BIGINT) AS d2
             |      FROM e JOIN c ON e.label = c.label AND e.pos = c.pos
             |      GROUP BY 1, 2),
             |r AS (SELECT vec_id, label, d2,
             |        CAST(row_number() OVER (PARTITION BY label
             |          ORDER BY d2 DESC, vec_id) AS BIGINT) AS rn
             |      FROM d)
             |SELECT vec_id, label, d2, rn FROM r WHERE rn <= 10
             |ORDER BY label, rn""".stripMargin)),

    // ---- Johnson–Lindenstrauss random projection (Projection.project):
    // 64 → 8 dims via a HASH-DEFINED ±1 sign matrix (md5("p:pos:j")) —
    // no materialized matrix, no driver state, no RNG; any executor or
    // engine regenerates each entry on demand, so a distributed
    // projection reproduces across backfills and replays in SQL. Inputs
    // quantized once (q177 discipline) → exact integer sums,
    // summation-order-free. ----
    Q("q180_jl_projection",
      (s, dir) => {
        graft.operators.Projection
          .project(t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
          .select(col("vec_id"), col("j").cast("long").as("j"), col("p"))
          .orderBy(col("vec_id"), col("j"))
      },
      Some("""WITH e AS (SELECT vec_id, pos,
             |        CAST(round(CAST(embedding[pos] AS DOUBLE) * 100000)
             |          AS BIGINT) AS q
             |      FROM embeddings,
             |        unnest(generate_series(1, len(embedding))) AS t(pos)),
             |t2 AS (SELECT vec_id, pos, q, j
             |       FROM e, unnest(generate_series(1, 8)) AS u(j)),
             |sg AS (SELECT vec_id, j, q,
             |        CASE WHEN CAST(concat('0x',
             |            substr(md5(concat('p:', pos, ':', j)), 1, 1))
             |          AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
             |      FROM t2)
             |SELECT vec_id, j, CAST(sum(q * s) AS BIGINT) AS p
             |FROM sg GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin)),

    // ---- Reliability diagram for the q120 classifier — the calibration
    // eval that belongs next to AUC (q121): score → micro-logit integers
    // (round(logit·10⁴), one shared rounding, then all-integer) →
    // equal-frequency deciles (Selection.equiFreqBins) → per-bin
    // positive rate in ppm. A well-ordered model shows pos_ppm rising
    // with the bucket. Stays on the LINEAR logit scale: the sigmoid is a
    // transcendental and never enters the hash compare (repo rule). The
    // oracle regenerates with the trained weights inlined (q120's
    // oracleGen pattern) and replays binning + rates exactly. ----
    Q("q186_reliability",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .withColumn("y", (col("label") < 5).cast("int"))
        val m = graft.operators.Classifier.train(emb, "vec_id", "embedding", "y")
        val scored = graft.operators.Classifier.score(emb, "embedding", m)
          .select(col("vec_id"), col("y"),
            round(col("logit") * 10000).cast("long").as("ml"))
          .withColumn("g", lit("all"))
        graft.operators.Selection.equiFreqBins(scored, "g", "ml", 10)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("y").cast("long")).as("n_pos"),
            min(col("ml")).as("logit_lo"), max(col("ml")).as("logit_hi"))
          .withColumn("pos_ppm", expr("n_pos * 1000000 DIV n"))
          .orderBy(col("bucket"))
      },
      None,
      oracleGen = Some(q186OracleGen _))
  )

  /** q151/q152 shared Spark side: RRF-fuse BM25 and brute-cosine top-20
    * lists for three fixed queries (each query text paired with the
    * embedding of the same-id document).
    */
  private def fusedLists(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val queries = Seq(
      (1L, "fast table scan"),
      (2L, "hash join merge"),
      (3L, "stream window batch group")).toDF("qid", "qtext")
    val lex = graft.operators.Bm25.search(
        t(s, dir, "documents"), "doc_id", "text",
        queries, "qid", "qtext", k = 20)
      .select(col("qid"), col("doc_id"), col("rn"))
    val emb = t(s, dir, "embeddings")
    val qe = emb.filter(col("vec_id").isin(1L, 2L, 3L))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wA = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("doc_id"))
    val ann = broadcast(qe)
      .crossJoin(emb.select(col("vec_id").as("doc_id"),
        col("embedding").as("ne")))
      .select(col("qid"), col("doc_id"),
        VectorFns.cosine(col("qe"), col("ne")).as("sim"))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") <= 20)
      .select(col("qid"), col("doc_id"), col("rn"))
    graft.operators.Fusion.rrf(
      Seq("lex" -> lex, "ann" -> ann), "qid", "doc_id", "rn", topK = 10)
  }

  /** q151/q152 shared oracle prefix: replay both retrievers end-to-end
    * (the q97 BM25 CTEs + the q41 cosine shape) and the integer RRF
    * fold, ending at CTE `f` (qid, doc_id, rrf, lex_rn, ann_rn) with
    * `annr` (cosine top-20) still in scope; no trailing comma.
    */
  private val rrfOracleCtes: String =
    """WITH q(qid, qtext) AS (VALUES
             |    (1::BIGINT, 'fast table scan'),
             |    (2::BIGINT, 'hash join merge'),
             |    (3::BIGINT, 'stream window batch group')),
             |toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
             |         FROM documents WHERE length(trim(text)) > 0),
             |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
             |stats AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS BIGINT) AS nd FROM dl),
             |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
             |qt AS (SELECT DISTINCT qid, unnest(string_split_regex(lower(trim(qtext)), '\s+')) AS t
             |       FROM q),
             |contrib AS (SELECT qt.qid, tf.doc_id, qt.t,
             |    round(ln(1.0 + (stats.nd - df.df + 0.5) / (df.df + 0.5)), 6)
             |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS c
             |  FROM qt JOIN tf ON tf.t = qt.t
             |          JOIN dl ON dl.doc_id = tf.doc_id
             |          JOIN df ON df.t = qt.t
             |          CROSS JOIN stats),
             |scored AS (SELECT qid, doc_id, list_sum(list(c ORDER BY t)) AS score
             |           FROM contrib GROUP BY qid, doc_id),
             |lexr AS (SELECT qid, doc_id, rn FROM (
             |           SELECT qid, doc_id,
             |             row_number() OVER (PARTITION BY qid
             |               ORDER BY score DESC, doc_id) AS rn
             |           FROM scored) WHERE rn <= 20),
             |qe AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
             |       WHERE vec_id IN (1, 2, 3)),
             |sim AS (SELECT qid, e.vec_id AS doc_id,
             |          list_sum(list_transform(list_zip(qe, e.embedding),
             |            x -> x[1]::DOUBLE * x[2]::DOUBLE))
             |          / (sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))
             |             * sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))) AS sim
             |        FROM qe, embeddings e),
             |annr AS (SELECT qid, doc_id, rn FROM (
             |           SELECT qid, doc_id,
             |             row_number() OVER (PARTITION BY qid
             |               ORDER BY sim DESC, doc_id) AS rn
             |           FROM sim) WHERE rn <= 20),
             |u AS (SELECT qid, doc_id, rn, 'lex' AS src FROM lexr
             |      UNION ALL SELECT qid, doc_id, rn, 'ann' FROM annr),
             |f AS (SELECT qid, doc_id,
             |        CAST(sum(1000000 // (60 + rn)) AS BIGINT) AS rrf,
             |        min(CASE WHEN src = 'lex' THEN rn END) AS lex_rn,
             |        min(CASE WHEN src = 'ann' THEN rn END) AS ann_rn
             |      FROM u GROUP BY 1, 2)
             |""".stripMargin

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

  private def q186OracleGen(s: SparkSession, dir: String): String = {
    val bounds = (1 to 9).map { i =>
      s"min(CASE WHEN cum >= (tot * $i + 9) // 10 THEN v END) AS b$i"
    }.mkString(",\n|        ")
    val bucketExpr = (1 to 9).map { i =>
      s"(CASE WHEN sc.ml > b.b$i THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH sc AS (SELECT vec_id,
       |        CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
       |        CAST(round((${trainedLogitSql(s, dir)}) * 10000) AS BIGINT)
       |          AS ml
       |      FROM embeddings),
       |g AS (SELECT ml AS v, count(*) AS n FROM sc GROUP BY 1),
       |w AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum,
       |        CAST((SELECT sum(n) FROM g) AS BIGINT) AS tot
       |      FROM g),
       |b AS (SELECT $bounds
       |      FROM w),
       |x AS (SELECT sc.y, sc.ml, 1 + $bucketExpr AS bucket
       |      FROM sc, b)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(y) AS BIGINT) AS n_pos,
       |  min(ml) AS logit_lo, max(ml) AS logit_hi,
       |  CAST(sum(y) AS BIGINT) * 1000000 // CAST(count(*) AS BIGINT)
       |    AS pos_ppm
       |FROM x GROUP BY 1 ORDER BY bucket""".stripMargin
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
