package graft.semantic

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** OpenAI-wire-shape HTTP implementation of the `ModelClient` boundary —
  * the reference's LLM call (docetl_operator.py:160-216: model + prompt ->
  * schema-constrained JSON response) as pure configuration: endpoint,
  * model name, optional bearer key. The deterministic `StubModelClient`
  * stays the default in this zero-egress container; this client is what a
  * deployment plugs in, and `SemanticOpsSpec` drives `semanticMap` through
  * it end-to-end against an in-process localhost server.
  *
  * Request: POST {endpoint} with `{"model", "messages":[system(schema
  * instruction), user(prompt)], "response_format":{"type":"json_object"}}`.
  * Response: `choices[0].message.content` — the JSON document the semantic
  * ops then `from_json` against the declared output schema.
  *
  * Executor shape: instances ship inside mapPartitions closures, so the
  * JDK HttpClient and Jackson mapper are `@transient lazy` (one per
  * executor JVM after deserialization, never serialized themselves).
  * Transient failures (IO errors, 5xx, 429 rate limits) retry with linear
  * backoff — except when a 429/503 carries `Retry-After` (delta-seconds),
  * which is honored up to 30s: a provider telling a 1000-executor fleet
  * when to come back beats every executor hammering on its own schedule.
  * Other 4xx fail loudly — a misconfigured model endpoint must surface,
  * not dead-letter every row as a validation failure. Response bodies are
  * read through a hard byte cap (default 8 MiB): a misbehaving endpoint
  * streaming an unbounded body would otherwise OOM the executor.
  */
class HttpModelClient(endpoint: String, model: String,
                      apiKey: Option[String] = None,
                      timeoutMs: Int = 60000, retries: Int = 2,
                      maxBodyBytes: Int = 8 << 20) extends ModelClient {

  @transient private lazy val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs.toLong))
    .build()

  @transient private lazy val mapper = new ObjectMapper()

  override def complete(prompt: String, schemaDdl: String): String = {
    val body = mapper.createObjectNode()
    body.put("model", model)
    val messages = body.putArray("messages")
    val sys = messages.addObject()
    sys.put("role", "system")
    sys.put("content",
      s"Respond ONLY with a single JSON object matching this schema: $schemaDdl")
    val user = messages.addObject()
    user.put("role", "user")
    user.put("content", prompt)
    body.putObject("response_format").put("type", "json_object")
    val payload = mapper.writeValueAsString(body)

    val resp = send(payload)
    val content = mapper.readTree(resp)
      .path("choices").path(0).path("message").path("content")
    if (content.isMissingNode)
      throw new java.io.IOException(
        s"model response carries no choices[0].message.content: ${resp.take(200)}")
    content.asText()
  }

  private def send(payload: String): String = {
    var attempt = 0
    while (attempt <= retries) {
      var waitMs = 50L * (attempt + 1)
      val resp =
        try {
          val b = HttpRequest.newBuilder(URI.create(endpoint))
            .timeout(Duration.ofMillis(timeoutMs.toLong))
            .header("Content-Type", "application/json")
          apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
          Some(http.send(b.POST(HttpRequest.BodyPublishers.ofString(payload)).build(),
            HttpResponse.BodyHandlers.ofInputStream()))
        } catch {
          case e: Exception =>
            if (attempt == retries) throw e
            None
        }
      resp.foreach { r =>
        if (r.statusCode() == 200)
          return HttpBodies.bounded(r.body(), maxBodyBytes, endpoint)
        try r.body().close() catch { case _: Exception => () }
        val transient = r.statusCode() >= 500 || r.statusCode() == 429
        if (!transient || attempt == retries)
          throw new java.io.IOException(s"HTTP ${r.statusCode()} from $endpoint")
        waitMs = HttpBodies.retryAfterMs(
          r.headers().firstValue("Retry-After").orElse(null)).getOrElse(waitMs)
      }
      attempt += 1
      Thread.sleep(waitMs)
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Shared HTTP-plane guards for every client in this library (model calls,
  * search-source fetches): bounded body reads and Retry-After parsing.
  */
private[graft] object HttpBodies {

  /** Read an InputStream body to a UTF-8 string, failing once `cap` bytes
    * are exceeded — the stream is abandoned, not buffered to completion.
    */
  def bounded(in: java.io.InputStream, cap: Int, origin: String): String =
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > cap)
          throw new java.io.IOException(s"response body from $origin exceeds $cap bytes")
        n = in.read(buf)
      }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()

  /** `Retry-After` delta-seconds (the form rate limiters send), clamped to
    * [0, 30]s; HTTP-date or garbage values -> None (caller keeps its own
    * backoff).
    */
  def retryAfterMs(header: String): Option[Long] =
    Option(header).flatMap(h => scala.util.Try(h.trim.toLong).toOption)
      .filter(_ >= 0).map(s => math.min(s, 30L) * 1000L)
}
