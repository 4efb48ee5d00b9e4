package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.expressions.VectorExpressions
import graft.sources.Sources

/** SQL entry-point coverage (spark.sql over registered views, GROUPING SETS,
  * custom functions in the registry) and the lenient-JSON normalization
  * surface (F8).
  */
object SqlQueries {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def all: Seq[Q] = Seq(

    // ---- A6 GROUPING SETS through the SQL surface. ----
    Q("q14_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                |  round(sum(o_totalprice), 2) AS total
                |FROM orders_v
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
                |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // ---- Custom Catalyst expression exposed to SQL via FunctionRegistry
    // (SparkSessionExtensions path); oracle mirrors the same math. ----
    Q("q42_sql_cosine",
      (s, dir) => {
        VectorExpressions.register(s)
        t(s, dir, "embeddings").createOrReplaceTempView("emb_v")
        s.sql("""SELECT a.vec_id AS qid, b.vec_id AS nid,
                |  round(cosine_similarity(a.embedding, b.embedding), 4) AS sim
                |FROM emb_v a JOIN emb_v b ON a.vec_id < b.vec_id
                |WHERE a.vec_id < 3 AND b.vec_id < 20
                |ORDER BY qid, nid""".stripMargin)
      },
      Some("""SELECT a.vec_id AS qid, b.vec_id AS nid,
             |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
             |      x -> x[1]::DOUBLE * x[2]::DOUBLE))
             |    / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
             |       * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4) AS sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE a.vec_id < 3 AND b.vec_id < 20
             |ORDER BY qid, nid""".stripMargin)),

    // ---- G1 chunker through SQL: custom Generator expression via
    // LATERAL VIEW; must match the DataFrame chunker's oracle (q55). ----
    Q("q19_sql_chunk",
      (s, dir) => {
        VectorExpressions.register(s)
        t(s, dir, "documents").createOrReplaceTempView("documents_v")
        s.sql("""SELECT doc_id, c.chunk_id,
                |  md5(cast(c.chunk_text AS BINARY)) AS h,
                |  CAST(size(split(trim(c.chunk_text), '\\s+')) AS BIGINT) AS n_toks
                |FROM documents_v
                |LATERAL VIEW split_tokens(text, 30, 5) c AS chunk_id, chunk_text
                |ORDER BY doc_id, chunk_id""".stripMargin)
      },
      Some("""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |           FROM documents),
             |n AS (SELECT doc_id, toks,
             |        CASE WHEN len(toks) <= 30 THEN 1
             |             ELSE CAST(ceil((len(toks) - 5) / 25.0) AS BIGINT) END AS nc
             |      FROM d),
             |c AS (SELECT doc_id, unnest(generate_series(0, nc - 1)) AS chunk_id, toks
             |      FROM n)
             |SELECT doc_id, chunk_id,
             |  md5(array_to_string(toks[chunk_id*25+1 : chunk_id*25+30], ' ')) AS h,
             |  len(toks[chunk_id*25+1 : chunk_id*25+30]) AS n_toks
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- Typed Dataset[T] + custom Aggregator path; oracle is the plain
    // SQL formulation — typed and untyped must agree exactly. ----
    Q("q91_typed_aggregator",
      (s, dir) => graft.typed.TypedQueries.revenueByFlag(s, dir),
      Some("""SELECT l_returnflag AS flag, count(*) AS n,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem WHERE l_quantity > 10
             |GROUP BY l_returnflag ORDER BY flag""".stripMargin)),

    // ---- S1: the DSv2 search source as a queryable table (per-category
    // partitions + pushed limit; synthetic deterministic rows). ----
    Q("q90_search_source",
      (s, dir) => {
        s.read.format("graft.sources.SearchSource")
          .option("categories", "cs.AI,cs.DB,cs.LG")
          .option("maxResults", "30")
          .load()
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n"),
            min(col("published")).cast("date").as("first_pub"))
          .orderBy(col("category"))
      },
      None),

    // ---- F8: lenient JSON shape normalization (bare list | {articles} |
    // {data}) — each doc round-trips through its shape variant, so the
    // normalized output must equal the identity projection. ----
    Q("q16_json_normalize",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val payload = to_json(array(struct(col("doc_id"), col("lang"))))
        val jdoc = when(col("doc_id") % 3 === 0, payload)
          .when(col("doc_id") % 3 === 1, concat(lit("{\"articles\": "), payload, lit("}")))
          .otherwise(concat(lit("{\"data\": "), payload, lit("}")))
        val itemSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType)))
        Sources.normalizeJsonShapes(d.select(jdoc.as("jdoc")), "jdoc", itemSchema)
          .select(col("record.doc_id").as("doc_id"), col("record.lang").as("lang"))
          .orderBy(col("doc_id"))
      },
      Some("SELECT doc_id, lang FROM documents ORDER BY doc_id"))
  )
}
