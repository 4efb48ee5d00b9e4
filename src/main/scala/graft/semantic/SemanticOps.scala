package graft.semantic

import scala.util.matching.Regex

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantic (LLM) operators — the reference's workhorse ops (SURVEY.md
  * §2.11: M1-M10, A1, P6) re-expressed for distributed execution.
  *
  * Shape: render prompt as a Column (template compiled once at plan time,
  * per-row binding is pure codegen) -> mapPartitions with a batched
  * ModelClient -> from_json against the declared output schema -> SQL
  * validation predicates -> bounded distributed retry (re-prompt only the
  * failing rows with an attempt salt) -> dead-letter channel for rows that
  * never validate (K5: failures must not kill the job).
  *
  * The retry loop is DataFrame-level: each attempt is one distributed pass
  * over only the still-invalid rows (the reference retries per record in a
  * Python loop — same semantics, but here attempt k is a narrow pass over a
  * shrinking DataFrame instead of a per-row blocking loop).
  */
object SemanticOps extends Serializable {

  /** ok = validated rows (input columns merged with parsed output columns,
    * output wins on name collision); dead = rows exhausting retries, with a
    * `__error` column.
    */
  case class SemanticResult(ok: DataFrame, dead: DataFrame)

  private val Placeholder: Regex = "\\{\\{\\s*input\\.([A-Za-z0-9_]+)\\s*\\}\\}".r

  /** Compile a "{{ input.field }}" template into a concat Column.
    * (The reference's two-level Jinja templating collapses to this one
    * row-binding level — SURVEY §7.4 item 3.)
    */
  def renderTemplate(tmpl: String): Column = {
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    for (m <- Placeholder.findAllMatchIn(tmpl)) {
      if (m.start > last) parts += lit(tmpl.substring(last, m.start))
      parts += coalesce(col(m.group(1)).cast("string"), lit(""))
      last = m.end
    }
    if (last < tmpl.length) parts += lit(tmpl.substring(last))
    if (parts.isEmpty) lit(tmpl) else concat(parts.toSeq: _*)
  }

  /** Per-session model-call accounting (A3/§4.1: accumulators instead of
    * the reference's stdout scraping; driver-readable after any action).
    * `calls` counts model invocations (one per request batch — the unit API
    * cost scales with); `rows` counts documents sent through those calls;
    * `retriedRows` counts rows re-sent on retry attempts.
    */
  case class Metrics(calls: org.apache.spark.util.LongAccumulator,
                     rows: org.apache.spark.util.LongAccumulator,
                     retriedRows: org.apache.spark.util.LongAccumulator)

  private val metricsBySession =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, Metrics]()

  def metrics(spark: org.apache.spark.sql.SparkSession): Metrics =
    metricsBySession.computeIfAbsent(spark.sparkContext, sc => Metrics(
      sc.longAccumulator("graft.model.calls"),
      sc.longAccumulator("graft.model.rows"),
      sc.longAccumulator("graft.model.retried_rows")))

  /** One model pass: adds a `__resp` string column via batched client calls. */
  private def callModel(in: DataFrame, promptCol: Column, client: ModelClient,
                        schemaDdl: String, batchSize: Int, isRetry: Boolean = false): DataFrame = {
    val withPrompt = in.withColumn("__prompt", promptCol)
    val outSchema = StructType(withPrompt.schema.fields :+ StructField("__resp", StringType))
    val idx = withPrompt.schema.fieldIndex("__prompt")
    val m = metrics(in.sparkSession)
    withPrompt.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        m.calls.add(1)
        m.rows.add(batch.size)
        if (isRetry) m.retriedRows.add(batch.size)
        val resps = client.completeBatch(batch.map(_.getString(idx)), schemaDdl)
        batch.lazyZip(resps).map((r, resp) => Row.fromSeq(r.toSeq :+ resp))
      }
    }(Encoders.row(outSchema)).drop("__prompt")
  }

  /** Schema-constrained map with validate/retry/dead-letter. `validations`
    * are SQL boolean expressions over the *output* fields (P4 style, e.g.
    * "size(split(abstract_summary, '\\s+')) >= 25").
    */
  def semanticMap(df: DataFrame, template: String, outputSchema: StructType,
                  client: ModelClient, validations: Seq[String] = Nil,
                  retries: Int = 2, batchSize: Int = 16): SemanticResult = {
    val ddl = outputSchema.toDDL
    val inCols = df.columns
    val keepCols = inCols.filterNot(outputSchema.fieldNames.contains)
    val validExpr = validations.map(expr).reduceOption(_ && _).getOrElse(lit(true))

    var pending = df
    var ok: Option[DataFrame] = None
    var attempt = 0
    while (attempt <= retries && !pending.isEmpty) {
      val salted = concat(renderTemplate(template), lit(s"\n#attempt=$attempt"))
      val parsed = callModel(pending, salted, client, ddl, batchSize, isRetry = attempt > 0)
        .withColumn("__out", from_json(col("__resp"), outputSchema))
        .drop("__resp")
      // Checkpoint each attempt: without this the retry chain's lineage
      // grows multiplicatively (attempt k replays every earlier model pass
      // on re-execution) — and model passes are the expensive stage by far.
      val flat = parsed.select(
        (keepCols.map(col) ++ outputSchema.fieldNames.map(n => col(s"__out.$n").as(n))): _*)
        .localCheckpoint()
      val good = flat.filter(validExpr)
      ok = Some(ok.map(_.unionByName(good)).getOrElse(good))
      pending = flat.filter(!validExpr).select(inCols.map(col): _*)
      attempt += 1
    }
    val dead = pending.withColumn("__error",
      lit(s"validation failed after ${retries + 1} attempts"))
    SemanticResult(ok.getOrElse(df.limit(0)), dead)
  }

  /** Semantic reduce (A1): fold all records of a group into one synthesized
    * record with a declared (possibly nested) output schema.
    *
    * Distribution shape: records serialize to JSON, collect_list per key
    * (partial aggregation applies), then a hierarchical fold inside the
    * executor — batches of `fanIn` docs are synthesized, then the summaries
    * are synthesized again until one remains. This is the distributed analog
    * of DocETL's optimizer decomposing a too-large reduce (SURVEY §4.1), and
    * it bounds every single model call to fanIn documents regardless of
    * group size.
    */
  def semanticReduce(df: DataFrame, keyCols: Seq[String], instruction: String,
                     outputSchema: StructType, client: ModelClient,
                     fanIn: Int = 8): DataFrame = {
    require(fanIn >= 2, "fanIn < 2 cannot converge (n items fold to n summaries)")
    val ddl = outputSchema.toDDL
    val payload = df.columns.filterNot(keyCols.contains)
    val grouped = df
      .withColumn("__doc", to_json(struct(payload.map(col): _*)))
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col("__doc"))).as("__docs"))

    val outSchema = StructType(grouped.schema.fields.dropRight(1) :+ StructField("__resp", StringType))
    val docsIdx = grouped.schema.fieldIndex("__docs")
    val folded = grouped.mapPartitions { rows =>
      rows.map { r =>
        def fold(items: Seq[String]): String =
          if (items.isEmpty) client.complete(s"$instruction\n(no documents)", ddl)
          else if (items.size <= fanIn) client.complete(s"$instruction\n" + items.mkString("\n"), ddl)
          else fold(items.grouped(fanIn).map(g => client.complete(s"$instruction\n" + g.mkString("\n"), ddl)).toSeq)
        val docs = r.getSeq[String](docsIdx)
        Row.fromSeq(r.toSeq.dropRight(1) :+ fold(docs))
      }
    }(Encoders.row(outSchema))

    folded
      .withColumn("__out", from_json(col("__resp"), outputSchema))
      .select((keyCols.map(col) ++ outputSchema.fieldNames.map(n => col(s"__out.$n").as(n))): _*)
  }

  /** Semantic (LLM-judge) filter (P6): boolean verdict + rationale per row;
    * keeps rows the judge passes. Judge output is schema-constrained like
    * any other semantic map.
    */
  def semanticFilter(df: DataFrame, criteria: String, client: ModelClient,
                     batchSize: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField("passed", BooleanType), StructField("rationale", StringType)))
    val res = semanticMap(df, criteria, schema, client, validations = Nil,
      retries = 0, batchSize = batchSize)
    res.ok.filter(col("passed")).drop("passed", "rationale")
  }
}
