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
  * backoff; other 4xx fail loudly — a misconfigured model endpoint must
  * surface, not dead-letter every row as a validation failure.
  */
class HttpModelClient(endpoint: String, model: String,
                      apiKey: Option[String] = None,
                      timeoutMs: Int = 60000, retries: Int = 2) extends ModelClient {

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
      val resp =
        try {
          val b = HttpRequest.newBuilder(URI.create(endpoint))
            .timeout(Duration.ofMillis(timeoutMs.toLong))
            .header("Content-Type", "application/json")
          apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
          Some(http.send(b.POST(HttpRequest.BodyPublishers.ofString(payload)).build(),
            HttpResponse.BodyHandlers.ofString()))
        } catch {
          case e: Exception =>
            if (attempt == retries) throw e
            None
        }
      resp.foreach { r =>
        if (r.statusCode() == 200) return r.body()
        val transient = r.statusCode() >= 500 || r.statusCode() == 429
        if (!transient || attempt == retries)
          throw new java.io.IOException(s"HTTP ${r.statusCode()} from $endpoint")
      }
      attempt += 1
      Thread.sleep(50L * attempt)
    }
    throw new IllegalStateException("unreachable")
  }
}
