package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** The YAML loader must parse a DocETL-shaped pipeline config (the
  * reference's declarative plan format) into the same PipelineSpec the
  * Scala DSL builds.
  */
class YamlSpecSpec extends AnyFunSuite {

  test("parser: scalars, inline lists, block scalars, nesting, comments") {
    val y =
      """name: demo  # trailing comment
        |count: 42
        |ratio: 0.25
        |flag: true
        |nothing: null
        |quoted: "a: b # not a comment"
        |items: [a, 2, true]
        |block: |
        |  line one
        |  line two
        |nested:
        |  inner:
        |    deep: yes_str
        |""".stripMargin
    val m = Yaml.parse(y).asInstanceOf[Map[String, Any]]
    assert(m("name") == "demo")
    assert(m("count") == 42L)
    assert(m("ratio") == 0.25)
    assert(m("flag") == true)
    assert(m("nothing") == null)
    assert(m("quoted") == "a: b # not a comment")
    assert(m("items") == Seq("a", 2L, true))
    assert(m("block") == "line one\nline two")
    assert(m("nested").asInstanceOf[Map[String, Any]]("inner")
      .asInstanceOf[Map[String, Any]]("deep") == "yes_str")
  }

  test("parser: list of maps with dash-line first entry and nested blocks") {
    val y =
      """ops:
        |  - name: first
        |    kind: a
        |    conf:
        |      x: 1
        |  - name: second
        |    kind: b
        |""".stripMargin
    val m = Yaml.parse(y).asInstanceOf[Map[String, Any]]
    val ops = m("ops").asInstanceOf[Seq[Map[String, Any]]]
    assert(ops.map(_("name")) == Seq("first", "second"))
    assert(ops.head("conf").asInstanceOf[Map[String, Any]]("x") == 1L)
  }

  test("DocETL-shaped pipeline config loads to the expected PipelineSpec") {
    val y =
      """name: article_pipeline
        |default_model: stub
        |operations:
        |  - name: split_text
        |    type: split
        |    split_key: text
        |    method: token_count
        |    method_kwargs:
        |      chunk_size: 120
        |      chunk_overlap: 20
        |  - name: extract
        |    type: map
        |    prompt: |
        |      Summarize this chunk:
        |      {{ input.chunk_text }}
        |    output:
        |      schema:
        |        summary: string
        |        tags: list[string]
        |    validate:
        |      - length(summary) > 0
        |    num_retries_on_validate_failure: 1
        |    optimize: false
        |  - name: synthesize
        |    type: reduce
        |    reduce_key: doc_id
        |    prompt: Combine the chunk summaries into one.
        |    fold_batch_size: 4
        |    output:
        |      schema:
        |        summary: string
        |  - name: gate
        |    type: filter
        |    predicate: length(summary) > 0
        |""".stripMargin
    val spec = YamlSpec.load(y)
    assert(spec == PipelineSpec("article_pipeline", Seq(
      SplitOp("split_text", "text", 120, 20),
      MapOp("extract", "Summarize this chunk:\n{{ input.chunk_text }}",
        Map("summary" -> "string", "tags" -> "list[string]"),
        validations = Seq("length(summary) > 0"), retries = 1),
      ReduceOp("synthesize", Seq("doc_id"), "Combine the chunk summaries into one.",
        Map("summary" -> "string"), fanIn = 4),
      FilterOp("gate", "length(summary) > 0"))))
  }

  test("loader rejects malformed configs loudly") {
    intercept[IllegalArgumentException](YamlSpec.load("name: x\n"))
    intercept[IllegalArgumentException](YamlSpec.load(
      "operations:\n  - name: a\n    type: wat\n"))
    intercept[IllegalArgumentException](YamlSpec.load(
      "operations:\n  - name: a\n    type: map\n    prompt: p\n"))
  }
}
