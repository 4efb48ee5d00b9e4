package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpServer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline._
import graft.semantic.{HttpModelClient, SemanticOps, StubModelClient}

class SemanticOpsSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val chatRequests = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  private val chatHits = new AtomicInteger(0)
  private val flakyModelHits = new AtomicInteger(0)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    } + "\""

  private def envelope(content: String): Array[Byte] =
    s"""{"id":"chatcmpl-test","choices":[{"index":0,
       |"message":{"role":"assistant","content":${jstr(content)}}}]}"""
      .stripMargin.getBytes("UTF-8")

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", { ex =>
      val req = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      chatRequests.add((Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""), req))
      // first call returns a verdict that FAILS the SQL validation, every
      // later call a passing one — so semanticMap's attempt-salt retry loop
      // is exercised through the HTTP boundary, not just the HTTP retry.
      val content =
        if (chatHits.incrementAndGet() == 1) """{"verdict": "no"}"""
        else """{"verdict": "a sufficiently long verdict"}"""
      val body = envelope(content)
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/flaky-model", { ex =>
      // transient 503 first, then healthy — the client-level retry path
      if (flakyModelHits.incrementAndGet() == 1) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val body = envelope("""{"verdict": "recovered"}""")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/rate-limited", { ex =>
      // 429 + Retry-After: 1 first, then healthy — the header must govern
      // the backoff instead of the 50ms linear default
      if (rateLimitHits.incrementAndGet() == 1) {
        ex.getResponseHeaders.set("Retry-After", "1")
        ex.sendResponseHeaders(429, -1); ex.close()
      } else {
        val body = envelope("""{"verdict": "after the wait"}""")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/huge-model", { ex =>
      val body = envelope("x" * 65536)
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  private val rateLimitHits = new AtomicInteger(0)

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private val client = new StubModelClient()
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven"),
    (3L, "red green blue cyan magenta yellow")).toDF("doc_id", "text")

  private val schema = StructType(Seq(
    StructField("summary", StringType),
    StructField("n", LongType)))

  test("semanticMap output conforms to the declared schema and is deterministic") {
    def run() = SemanticOps.semanticMap(docs, "Summarize: {{ input.text }}",
      schema, client).ok.orderBy("doc_id").collect().toSeq
    val a = run(); val b = run()
    assert(a == b, "stub-backed semantic map must be deterministic")
    assert(a.size == 3)
    val out = SemanticOps.semanticMap(docs, "Summarize: {{ input.text }}", schema, client).ok
    assert(out.columns.toSet == Set("doc_id", "text", "summary", "n"))
    assert(out.schema("summary").dataType == StringType)
  }

  test("retries recover rows the first attempt fails; dead-letter catches the rest") {
    // n is in [0, 1000); demand a narrow band so attempt salts matter.
    val lax = SemanticOps.semanticMap(docs, "S: {{ input.text }}", schema, client,
      validations = Seq("n >= 0"), retries = 0)
    assert(lax.ok.count() == 3 && lax.dead.count() == 0)

    val impossible = SemanticOps.semanticMap(docs, "S: {{ input.text }}", schema, client,
      validations = Seq("n < 0"), retries = 1)
    assert(impossible.ok.count() == 0)
    assert(impossible.dead.count() == 3)
    assert(impossible.dead.columns.contains("__error"))

    // a band some attempt satisfies: more retries -> no fewer successes
    def okAt(r: Int) = SemanticOps.semanticMap(docs, "S: {{ input.text }}", schema, client,
      validations = Seq("n % 2 = 0"), retries = r).ok.count()
    assert(okAt(4) >= okAt(0))
  }

  test("semanticReduce folds each group to one schema-conformant row, fanIn-invariant determinism") {
    val grouped = Seq((1L, "g1", "aa"), (2L, "g1", "bb"), (3L, "g2", "cc"))
      .toDF("doc_id", "grp", "text")
    val out = SemanticOps.semanticReduce(grouped, Seq("grp"), "Synthesize:",
      schema, client, fanIn = 8)
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("grp", "summary", "n"))
    // hierarchical path (fanIn=2 forces a multi-level fold) still yields one row per group
    val deep = SemanticOps.semanticReduce(grouped, Seq("grp"), "Synthesize:",
      schema, client, fanIn = 2)
    assert(deep.count() == 2)
    intercept[IllegalArgumentException] {
      SemanticOps.semanticReduce(grouped, Seq("grp"), "S:", schema, client, fanIn = 1)
    }
  }

  test("pipeline spec: validator rejects bad specs, rewriter decomposes optimized maps") {
    val bad = PipelineSpec("p", Seq(MapOp("m", "", Map("a" -> "string"))))
    intercept[IllegalArgumentException](Validator.validate(bad))

    val spec = PipelineSpec("p", Seq(
      MapOp("extract", "E {{ input.text }}", Map("s" -> "string"), optimize = true)))
    val rw = Rewriter.rewrite(spec, textCol = "text", chunkSize = 10, overlap = 2)
    assert(rw.ops.map(_.getClass.getSimpleName) ==
      Seq("SplitOp", "MapOp", "ReduceOp"))
    val m = rw.ops(1).asInstanceOf[MapOp]
    assert(m.prompt.contains("{{ input.chunk_text }}"))
    Validator.validate(rw)
  }

  test("schema compiler maps docetl type strings") {
    assert(SchemaCompiler.toDataType("list[string]") == ArrayType(StringType))
    assert(SchemaCompiler.toDataType("number") == DoubleType)
    assert(SchemaCompiler.toDataType("integer") == LongType)
    assert(SchemaCompiler.toDataType(Map("a" -> "string", "b" -> "list[integer]")) ==
      StructType(Seq(StructField("a", StringType), StructField("b", ArrayType(LongType)))))
    intercept[IllegalArgumentException](SchemaCompiler.toDataType("tensor"))
  }

  test("judge filter keeps a deterministic subset") {
    val kept = SemanticOps.semanticFilter(docs, "Good? {{ input.text }}", client)
    assert(kept.count() < 3 || kept.count() > 0)
    assert(kept.columns.toSet == Set("doc_id", "text"))
  }

  test("Aggregator-based semantic reduce equals mapPartitions semanticReduce") {
    import graft.semantic.SemanticAgg
    val ev = Tables(spark, sfDir, "documents")
      .select(col("lang"), col("doc_id"), col("text")).limit(200)
    val schema = StructType(Seq(
      StructField("summary", StringType), StructField("themes", ArrayType(StringType))))
    val viaAgg = SemanticAgg.semanticReduceAgg(ev, Seq("lang"),
        "Synthesize a summary of these documents:", schema, client, fanIn = 4)
      .select(col("lang"), col("summary"), size(col("themes")).as("nt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val viaMap = SemanticOps.semanticReduce(ev, Seq("lang"),
        "Synthesize a summary of these documents:", schema, client, fanIn = 4)
      .select(col("lang"), col("summary"), size(col("themes")).as("nt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(viaAgg == viaMap)
  }

  test("semanticMap through the HTTP client: OpenAI wire shape, validation retry, bearer auth") {
    chatHits.set(0); chatRequests.clear()
    val httpClient = new HttpModelClient(
      s"http://127.0.0.1:$port/v1/chat/completions", "graft-test-model",
      apiKey = Some("sk-test-key"))
    val one = Seq((1L, "judge this document")).toDF("doc_id", "text")
    val vSchema = StructType(Seq(StructField("verdict", StringType)))

    val res = SemanticOps.semanticMap(one, "Verdict for: {{ input.text }}",
      vSchema, httpClient, validations = Seq("length(verdict) >= 10"), retries = 2)
    val ok = res.ok.select("doc_id", "verdict").as[(Long, String)].collect()

    assert(ok.toSeq == Seq((1L, "a sufficiently long verdict")),
      "the failing first response must be retried through the validation loop")
    assert(res.dead.isEmpty)
    assert(chatHits.get() == 2, "attempt 0 invalid + attempt 1 valid = exactly 2 model calls")

    val (auth, req) = chatRequests.asScala.head
    assert(auth == "Bearer sk-test-key", "api key must travel as a bearer header")
    assert(req.contains("\"model\":\"graft-test-model\""))
    assert(req.contains("\"response_format\":{\"type\":\"json_object\"}"))
    assert(req.contains("Verdict for: judge this document"))
    assert(req.contains("verdict STRING"), "schema DDL must reach the system message")
    // the retried prompt carries a different attempt salt than the first
    val prompts = chatRequests.asScala.map(_._2).toSeq
    assert(prompts.exists(_.contains("#attempt=0")) && prompts.exists(_.contains("#attempt=1")))
  }

  test("HTTP model client retries a transient 503 to success") {
    flakyModelHits.set(0)
    val httpClient = new HttpModelClient(s"http://127.0.0.1:$port/flaky-model", "m")
    val out = httpClient.complete("p", "verdict STRING")
    assert(out == """{"verdict": "recovered"}""")
    assert(flakyModelHits.get() >= 2)
  }

  test("HTTP model client honors Retry-After on 429") {
    rateLimitHits.set(0)
    val httpClient = new HttpModelClient(s"http://127.0.0.1:$port/rate-limited", "m")
    val t0 = System.nanoTime()
    val out = httpClient.complete("p", "verdict STRING")
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out == """{"verdict": "after the wait"}""")
    assert(rateLimitHits.get() == 2)
    assert(elapsedMs >= 900,
      s"Retry-After: 1 must govern the wait (default backoff is 50ms), got ${elapsedMs}ms")

    // header parsing edges: clamp, garbage, HTTP-date form
    import graft.semantic.HttpBodies
    assert(HttpBodies.retryAfterMs("1") == Some(1000L))
    assert(HttpBodies.retryAfterMs("999") == Some(30000L), "clamped to 30s")
    assert(HttpBodies.retryAfterMs("Wed, 21 Oct 2026 07:28:00 GMT").isEmpty)
    assert(HttpBodies.retryAfterMs("-5").isEmpty)
    assert(HttpBodies.retryAfterMs(null).isEmpty)
  }

  test("HTTP model client rejects an oversized response body") {
    val httpClient = new HttpModelClient(s"http://127.0.0.1:$port/huge-model", "m",
      maxBodyBytes = 1024)
    val e = intercept[java.io.IOException](httpClient.complete("p", "verdict STRING"))
    assert(e.getMessage.contains("exceeds 1024 bytes"), e.getMessage)
  }

  test("semantic UDAF through spark.sql groups and synthesizes") {
    import graft.semantic.SemanticAgg
    val schema = StructType(Seq(StructField("summary", StringType)))
    SemanticAgg.register(spark, "semantic_synthesize",
      "Summarize:", schema, client, fanIn = 4)
    Tables(spark, sfDir, "documents").limit(50).createOrReplaceTempView("docs_udaf")
    val out = spark.sql(
      """SELECT lang, count(*) AS n, semantic_synthesize(text) AS resp
        |FROM docs_udaf GROUP BY lang ORDER BY lang""".stripMargin)
    assert(out.count() > 0)
    assert(out.filter(col("resp").isNull || length(col("resp")) === 0).count() == 0)
  }
}
