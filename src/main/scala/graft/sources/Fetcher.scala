package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2: distributed idempotent document fetch — the reference's download loop
  * (arxiv_hook.py:37-143: fetch each result, skip already-downloaded, retry
  * transient failures, record a manifest) re-expressed Spark-first.
  *
  * The fetch runs in EXECUTORS via mapPartitions: one `java.net.http
  * .HttpClient` per partition (connection reuse within the partition, no
  * driver bottleneck), bounded retries with backoff per URL, and failures
  * captured as rows — a dead host cannot fail the job. Idempotence is the
  * manifest anti-join (`Sources.pendingFetches`) composed in `fetchNew`.
  *
  * Scale notes: parallelism == partitions of the url set — `repartition(n)`
  * IS the politeness/bandwidth knob, and a per-request `delayMs` throttles
  * within a partition. Bodies land in the result DataFrame as binary; write
  * to the lake and append the manifest from the same result so a re-run
  * fetches only what is still missing.
  */
object Fetcher {

  val resultSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("url", StringType),
    StructField("status", IntegerType),
    StructField("body", BinaryType),
    StructField("error", StringType)))

  /** Fetch every (key, url) row; one client per partition; `retries`
    * re-attempts on IO errors and 5xx with linear backoff.
    */
  def fetchAll(urls: DataFrame, keyCol: String, urlCol: String,
               timeoutMs: Int = 10000, retries: Int = 2,
               delayMs: Int = 0): DataFrame = {
    val enc = Encoders.row(resultSchema)
    val kIdx = urls.schema.fieldIndex(keyCol)
    val uIdx = urls.schema.fieldIndex(urlCol)
    urls.mapPartitions { rows =>
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(timeoutMs.toLong))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build()
      rows.map { r =>
        val key = r.getString(kIdx)
        val url = r.getString(uIdx)
        if (delayMs > 0) Thread.sleep(delayMs.toLong)
        fetchOne(client, url, timeoutMs, retries) match {
          case Right((status, body)) => Row(key, url, status, body, null)
          case Left(err)             => Row(key, url, -1, null, err)
        }
      }
    }(enc)
  }

  /** Idempotent form: anti-join the manifest first (S2/J2), then fetch only
    * the pending keys. Returns (fetched, stillPending==failed) so the caller
    * appends successes to the manifest and dead-letters the failures.
    */
  def fetchNew(urls: DataFrame, manifest: DataFrame, keyCol: String, urlCol: String,
               timeoutMs: Int = 10000, retries: Int = 2): (DataFrame, DataFrame) = {
    val pending = Sources.pendingFetches(urls, manifest, keyCol)
    // Materialize ONCE before splitting: the fetch is a side-effecting,
    // non-deterministic pass — without this, consuming the two outputs would
    // re-run every HTTP request per action, and a URL flapping between
    // attempts could land in both outputs or neither.
    val fetched = fetchAll(pending, keyCol, urlCol, timeoutMs, retries)
      .localCheckpoint(true)
    (fetched.filter(col("status").between(200, 299)),
      fetched.filter(!col("status").between(200, 299)))
  }

  private def fetchOne(client: HttpClient, url: String, timeoutMs: Int,
                       retries: Int): Either[String, (Int, Array[Byte])] = {
    var attempt = 0
    var lastErr = ""
    while (attempt <= retries) {
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(timeoutMs.toLong))
          .GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
        val code = resp.statusCode()
        // 5xx is transient -> retry; anything else is a definitive answer
        if (code < 500 || attempt == retries) return Right((code, resp.body()))
        lastErr = s"HTTP $code"
      } catch {
        case e: Exception =>
          lastErr = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          if (attempt == retries) return Left(lastErr)
      }
      attempt += 1
      Thread.sleep(50L * attempt) // linear backoff between attempts
    }
    Left(lastErr)
  }
}
