package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.semantic.{SemanticOps, StubModelClient}
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("jsonDataset: valid rows parse, malformed rows dead-letter, job survives") {
    val dir = Files.createTempDirectory("graft_src_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """[{"id": 1, "name": "one"}, {"id": 2, "name": "two"}]""")
    val good = Sources.jsonDataset(spark, s"$dir/a.json", schema)
    assert(good.ok.count() == 2 && good.dead.count() == 0)

    val dir2 = Files.createTempDirectory("graft_src2_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir2/b.json"),
      "{\"id\": 1, \"name\": \"ok\"}\n{not json at all\n{\"id\": 3, \"name\": \"three\"}")
    val mixed = Sources.jsonDataset(spark, s"$dir2/b.json", schema, multiLine = false)
    assert(mixed.ok.count() == 2)
    assert(mixed.dead.count() == 1)
    assert(mixed.dead.select("error").as[String].head() == "malformed json")
  }

  test("binaryDocuments: binaryFile glob + registered parser yields full_text") {
    val dir = Files.createTempDirectory("graft_bin_").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d1.txt"), "hello binary world")
    Files.writeString(java.nio.file.Paths.get(s"$dir/d2.txt"), "second doc")
    val out = Sources.binaryDocuments(spark, s"$dir/*.txt", "txt")
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("path", "modificationTime", "segment", "full_text"))
    val texts = out.select("full_text").as[String].collect().toSet
    assert(texts == Set("hello binary world", "second doc"))
    intercept[IllegalArgumentException](Sources.binaryDocuments(spark, dir, "docx"))
  }

  test("PdfLite: binaryFile -> full_text over the checked-in PDF fixture") {
    val fixture = new java.io.File("src/test/resources/fixtures/sample.pdf")
    assert(fixture.exists, s"missing fixture ${fixture.getAbsolutePath}")
    val out = Sources.binaryDocuments(spark, fixture.getAbsolutePath, "pdf")
      .orderBy("segment")
      .select("segment", "full_text").as[(Int, String)].collect()
    assert(out.length == 2, "one row per page content stream")
    assert(out(0) == (0, "Spark-native analytics engine\ngraft parses (lite) PDFs natively."),
      s"page 1 got: ${out(0)}")
    assert(out(1) == (1, "Page two\nhex string"), s"page 2 got: ${out(1)}")
  }

  test("PdfLite: uncompressed streams, octal escapes, and non-PDF bytes") {
    import graft.sources.PdfLite
    val raw = ("1 0 obj << /Length 60 >>\nstream\n" +
      "BT (A\\051B) Tj ET\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(PdfLite.extract(raw) == Seq("A)B"), "octal \\051 is ')'")
    // backslash-EOL inside a literal string is a line continuation (7.3.4.2)
    val cont = ("2 0 obj << >>\nstream\n" +
      "BT (hel\\\nlo) Tj ET\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(PdfLite.extract(cont) == Seq("hello"), "escaped EOL produces no chars")
    assert(PdfLite.extract("not a pdf at all".getBytes("UTF-8")).isEmpty)
    assert(PdfLite.extract(Array.fill[Byte](64)(0x7f)).isEmpty)
  }

  test("pendingFetches: anti-join idempotence (arxiv_hook.py:126-128 analog)") {
    val requested = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("key", "v")
    val manifest = Seq("b").toDF("key")
    val pending = Sources.pendingFetches(requested, manifest, "key")
    assert(pending.select("key").as[String].collect().toSet == Set("a", "c"))
    // re-running with an updated manifest fetches nothing new
    val done = Seq("a", "b", "c").toDF("key")
    assert(Sources.pendingFetches(requested, done, "key").isEmpty)
  }

  test("model-call accumulators: calls per batch, rows per document") {
    val m = SemanticOps.metrics(spark)
    val (calls0, rows0, retried0) = (m.calls.value, m.rows.value, m.retriedRows.value)
    val docs = Seq((1L, "x y z"), (2L, "p q r")).toDF("doc_id", "text")
      .repartition(1) // one partition => batching is deterministic
    val schema = StructType(Seq(StructField("summary", StringType), StructField("n", LongType)))
    SemanticOps.semanticMap(docs, "S: {{ input.text }}", schema, new StubModelClient(),
      validations = Seq("n < 0"), retries = 2, batchSize = 16).dead.count()
    // 2 rows, batchSize 16 => ceil(2/16) = 1 call per attempt, 3 attempts
    assert(m.calls.value - calls0 == 3,
      s"expected 3 calls (1 batch x 3 attempts), got ${m.calls.value - calls0}")
    assert(m.rows.value - rows0 == 6, "2 rows x 3 attempts")
    assert(m.retriedRows.value - retried0 == 4, "2 rows x 2 retry attempts")
  }
}
