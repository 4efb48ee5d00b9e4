package graft.pipeline

import org.apache.spark.sql.types._

/** Declarative pipeline spec — the analog of the reference's DocETL YAML
  * pipelines (docetl/config/article_pipeline.yaml.j2) and its programmatic
  * builder (DocETLConfigGenerator, airflow/plugins/docetl_operator.py:337-415).
  *
  * A spec is data; `Validator` is the analyzer (docetl_operator.py:126-158
  * analog), `Rewriter` is the optimize pass (the `docetl build` analog,
  * SURVEY §4.1), and `Compiler` lowers it onto DataFrame transformations
  * where Catalyst takes over.
  */
sealed trait OpSpec { def name: String }

/** G1: token-window chunking; metadata preserved. `neighbors > 0` carries
  * ±neighbors chunk-steps of peripheral context (the DocETL gather analog).
  */
case class SplitOp(name: String, textCol: String, chunkSize: Int, overlap: Int,
                   neighbors: Int = 0) extends OpSpec

/** M-ops: schema-constrained semantic map with P4 validations + retries. */
case class MapOp(name: String, prompt: String, output: Map[String, String],
                 validations: Seq[String] = Nil, retries: Int = 2,
                 optimize: Boolean = false) extends OpSpec

/** A1: semantic reduce over a key. */
case class ReduceOp(name: String, keys: Seq[String], prompt: String,
                    output: Map[String, String], fanIn: Int = 8) extends OpSpec

/** P6: LLM-judge filter. */
case class JudgeFilterOp(name: String, criteria: String) extends OpSpec

/** P3-style deterministic filter (SQL expr). */
case class FilterOp(name: String, predicate: String) extends OpSpec

case class PipelineSpec(name: String, ops: Seq[OpSpec])

/** DocETL type-string -> Spark DataType compiler (SURVEY §1.1 row 2:
  * `string`, `number`, `integer`, `boolean`, `list`, `list[x]`, `object`,
  * nested maps of these).
  */
object SchemaCompiler {
  private val ListRe = "list\\[(.+)\\]".r

  def toDataType(t: Any): DataType = t match {
    case s: String => s match {
      case "string"  => StringType
      case "number"  => DoubleType
      case "integer" => LongType
      case "boolean" => BooleanType
      case "list"    => ArrayType(StringType)
      case ListRe(inner) => ArrayType(toDataType(inner))
      case "object"  => MapType(StringType, StringType)
      case other => throw new IllegalArgumentException(s"unknown schema type: $other")
    }
    case m: Map[_, _] =>
      StructType(m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).map {
        case (k, v) => StructField(k, toDataType(v))
      })
    case other => throw new IllegalArgumentException(s"unknown schema type: $other")
  }

  def toStruct(fields: Map[String, String]): StructType =
    StructType(fields.toSeq.sortBy(_._1).map { case (k, v) => StructField(k, toDataType(v)) })
}

/** Spec analyzer — fails fast on malformed specs, mirroring the reference's
  * config validation (required name/type/prompt per op, non-empty schema).
  */
object Validator {
  def validate(spec: PipelineSpec): Unit = {
    require(spec.name.nonEmpty, "pipeline name required")
    require(spec.ops.nonEmpty, "pipeline must have operations")
    val names = spec.ops.map(_.name)
    require(names.distinct.size == names.size, s"duplicate op names: $names")
    spec.ops.foreach {
      case m: MapOp =>
        require(m.prompt.nonEmpty, s"${m.name}: prompt required")
        require(m.output.nonEmpty, s"${m.name}: output schema required")
        SchemaCompiler.toStruct(m.output) // throws on bad types
      case r: ReduceOp =>
        require(r.keys.nonEmpty, s"${r.name}: reduce keys required")
        require(r.prompt.nonEmpty, s"${r.name}: prompt required")
        SchemaCompiler.toStruct(r.output)
      case s: SplitOp =>
        require(s.overlap >= 0 && s.overlap < s.chunkSize, s"${s.name}: 0 <= overlap < chunkSize")
      case f: FilterOp => require(f.predicate.nonEmpty, s"${f.name}: predicate required")
      case j: JudgeFilterOp => require(j.criteria.nonEmpty, s"${j.name}: criteria required")
    }
  }
}

/** Spec -> Spec optimize pass (the `docetl build` analog): a MapOp marked
  * `optimize` that consumes a long-document column gets decomposed into
  * split -> map-per-chunk -> hierarchical reduce, which is exactly the
  * rewrite DocETL's agentic optimizer performs for context-exceeding maps
  * (arXiv:2410.12189; SURVEY §4.1 row 1).
  */
object Rewriter {
  def rewrite(spec: PipelineSpec, textCol: String = "text",
              chunkSize: Int = 3000, overlap: Int = 300,
              docKeys: Seq[String] = Seq("doc_id"),
              neighbors: Int = 0): PipelineSpec = {
    val ops = spec.ops.flatMap {
      case m: MapOp if m.optimize =>
        Seq(
          SplitOp(s"${m.name}_split", textCol, chunkSize, overlap, neighbors),
          m.copy(name = s"${m.name}_chunked", optimize = false,
            prompt = m.prompt.replace(s"{{ input.$textCol }}", "{{ input.chunk_text }}")),
          ReduceOp(s"${m.name}_synthesize", docKeys,
            "Synthesize one consolidated record from the per-chunk extractions, " +
              "prioritizing information appearing in multiple chunks.",
            m.output))
      case other => Seq(other)
    }
    spec.copy(ops = ops)
  }
}
