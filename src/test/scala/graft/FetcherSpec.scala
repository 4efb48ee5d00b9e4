package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer

import org.apache.spark.sql.functions._

import graft.sources.Fetcher

/** S2 fetch over a REAL HTTP client against an in-process JDK HttpServer
  * (localhost only — the zero-egress equivalent of the reference's arXiv
  * download loop): success bodies, transient-5xx retry, 404 dead-letter,
  * and manifest idempotence.
  */
class FetcherSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val flakyHits = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/doc", { ex =>
      val body = s"doc:${ex.getRequestURI.getPath.split('/').last}".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/flaky", { ex =>
      // first attempt 503, second succeeds — exercises the retry path
      if (flakyHits.incrementAndGet() == 1) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val body = "recovered".getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/missing", { ex =>
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def base = s"http://127.0.0.1:$port"

  test("fetchAll: bodies, retried 5xx, 404 and dead hosts as rows") {
    val urls = Seq(
      ("a", s"$base/doc/a"),
      ("b", s"$base/flaky"),
      ("c", s"$base/missing"),
      ("d", s"http://127.0.0.1:1/unreachable")) // closed port -> IO error
      .toDF("key", "url").repartition(2)
    val got = Fetcher.fetchAll(urls, "key", "url", timeoutMs = 3000, retries = 2)
      .collect().map(r => r.getString(0) -> r).toMap

    assert(got("a").getInt(2) == 200 &&
      new String(got("a").getAs[Array[Byte]](3), "UTF-8") == "doc:a")
    assert(got("b").getInt(2) == 200 &&
      new String(got("b").getAs[Array[Byte]](3), "UTF-8") == "recovered",
      "503 then 200 must be retried to success")
    assert(got("c").getInt(2) == 404, "4xx is definitive, not retried")
    assert(got("d").getInt(2) == -1 && got("d").getString(4) != null,
      "unreachable host becomes an error row, not a job failure")
  }

  test("fetchNew: manifest anti-join makes the fetch idempotent") {
    val urls = Seq(("a", s"$base/doc/a"), ("z", s"$base/doc/z"), ("m", s"$base/missing"))
      .toDF("key", "url")
    val manifest = Seq("a").toDF("key")
    val (ok, failed) = Fetcher.fetchNew(urls, manifest, "key", "url", retries = 0)
    assert(ok.select("key").as[String].collect().toSet == Set("z"),
      "already-manifested 'a' must not be fetched again")
    assert(failed.select("key").as[String].collect().toSet == Set("m"))
    // appending successes to the manifest drives the next run to a no-op
    val m2 = manifest.unionByName(ok.select("key"))
    val (ok2, _) = Fetcher.fetchNew(
      urls.filter(col("key") =!= "m"), m2, "key", "url", retries = 0)
    assert(ok2.isEmpty, "re-run with updated manifest fetches nothing")
  }
}
