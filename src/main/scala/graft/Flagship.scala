package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.pipeline._
import graft.semantic.StubModelClient
import graft.sinks.Sinks

/** The reference DAG (airflow/dags/zara_hybrid_etl.py:290-316) as ONE Spark
  * job: ingest -> [auto-chunked] semantic extract -> synthesize -> generate
  * article -> quality gate. The deterministic StubModelClient stands in for
  * the LLM (zero-egress; same contract as production).
  *
  * The extract map is declared `optimize = true` over the full text and the
  * Rewriter decomposes it into split -> chunk-map -> hierarchical reduce —
  * the same plan DocETL's optimizer builds for long documents.
  */
object Flagship {

  val spec: PipelineSpec = PipelineSpec(
    name = "article_pipeline",
    ops = Seq(
      MapOp(
        name = "extract_paper_content",
        prompt = "Extract structured content from this document: {{ input.text }}",
        output = Map(
          "title" -> "string",
          "abstract_summary" -> "string",
          "key_findings" -> "list[string]",
          "confidence" -> "number"),
        validations = Seq("length(abstract_summary) > 0"),
        optimize = true),
      MapOp(
        name = "generate_news_article",
        prompt = "Write a news article about: {{ input.abstract_summary }} " +
          "citing {{ input.title }}",
        output = Map(
          "headline" -> "string",
          "subtitle" -> "string",
          "article_body" -> "string",
          "meta_description" -> "string",
          "pull_quotes" -> "list[string]",
          "key_takeaways" -> "list[string]",
          "word_count" -> "integer"),
        validations = Seq("length(headline) > 0", "word_count >= 0"))))

  /** Run the full pipeline on `documents` under `dir`; returns scored
    * articles with their quality bucket (rows > 0 is the driver's t1 gate).
    */
  def run(spark: SparkSession, dir: String,
          qualityThreshold: Double = 0.7): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val rewritten = Rewriter.rewrite(spec, textCol = "text",
      chunkSize = 120, overlap = 20, docKeys = Seq("doc_id"))
    val compiled = Compiler.run(docs, rewritten, new StubModelClient())
    val scored = compiled.result.withColumn("quality_score",
      round(TextFns.qualityScore(col("headline"), col("subtitle"),
        col("article_body"), col("meta_description"),
        col("pull_quotes"), col("key_takeaways")), 4))
    scored
      .withColumn("bucket",
        when(col("quality_score") >= qualityThreshold, "high").otherwise("failed"))
      .orderBy(col("doc_id"))
  }

  /** Full material run with sinks (t1 shape): articles + markdown + stats. */
  def runWithSinks(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val articles = run(spark, dir)
    Sinks.thresholdJson(articles, "quality_score", 0.7, s"$outDir/articles")
    val hi = articles.filter(col("bucket") === "high")
    // `source` does not survive the synthesize reduce (keys + output schema
    // only) — attribute the pipeline itself, as the reference does for
    // missing authors.
    val md = Sinks.markdownColumn(col("headline"), col("subtitle"),
      col("key_takeaways"), array(lit("article_pipeline")), col("doc_id"),
      col("word_count"), col("meta_description"), col("article_body"),
      col("pull_quotes"), col("key_takeaways"))
    Sinks.writeMarkdown(hi, "headline", md, s"$outDir/markdown")
    val stats = Sinks.qualityStats(articles, "quality_score", 0.7)
    Sinks.writeManifest(stats, stats.columns.toSeq, s"$outDir/summary")
    articles
  }
}
