package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpServer

import org.apache.spark.sql.functions._

import graft.streaming.StatefulSessions

class SearchSourceSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val atomRequests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val flakyHits = new AtomicInteger(0)

  private def atomFeed(cat: String, n: Int): Array[Byte] = {
    val entries = (0 until n).map { i =>
      s"""<entry>
         |  <id>http://arxiv.org/abs/2401.1000$i</id>
         |  <title>Paper $i &amp; friends</title>
         |  <category term="$cat"/>
         |  <published>2024-01-0${i % 9 + 1}T12:00:00Z</published>
         |  <link title="pdf" href="http://example.org/pdf/$i"/>
         |  <summary>Abstract $i for $cat.</summary>
         |</entry>""".stripMargin
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<feed xmlns="http://www.w3.org/2005/Atom">
       |$entries
       |</feed>""".stripMargin.getBytes("UTF-8")
  }

  private def queryParam(q: String, name: String): Option[String] =
    s"$name=([^&]*)".r.findFirstMatchIn(q).map(_.group(1))

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/atom", { ex =>
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      atomRequests.add(q)
      val cat = queryParam(q, "search_query").getOrElse("cat:cs.XX").stripPrefix("cat:")
      val n = queryParam(q, "max_results").map(_.toInt).getOrElse(0)
      val body = atomFeed(cat, n)
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/flakyatom", { ex =>
      // first attempt 503, then healthy — exercises the reader's retry path
      if (flakyHits.incrementAndGet() == 1) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val body = atomFeed("cs.AI", 2)
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/limited-atom", { ex =>
      // 429 + Retry-After: 1 first, then healthy
      if (limitedHits.incrementAndGet() == 1) {
        ex.getResponseHeaders.set("Retry-After", "1")
        ex.sendResponseHeaders(429, -1); ex.close()
      } else {
        val body = atomFeed("cs.AI", 2)
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.start()
    port = server.getAddress.getPort
  }

  private val limitedHits = new java.util.concurrent.atomic.AtomicInteger(0)

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("DSv2 search source: per-category partitions, quota, deterministic rows") {
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB").option("maxResults", "20").load()
    assert(df.count() == 20) // 2 categories x quota 10
    assert(df.select("category").distinct().as[String].collect().toSet == Set("cs.AI", "cs.DB"))
    assert(df.rdd.getNumPartitions == 2, "one input partition per category")
    val again = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB").option("maxResults", "20").load()
    assert(df.collect().toSeq == again.collect().toSeq, "source must be deterministic")
  }

  test("DSv2 limit pushdown reaches the scan; column pruning reaches readSchema") {
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB,cs.LG,cs.CV").option("maxResults", "1000")
      .load()
      .select("arxiv_id", "category")
      .limit(8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=8"), s"limit must push into the source:\n$plan")
    assert(plan.contains("prunedColumns=arxiv_id,category"),
      s"column pruning must reach the source:\n$plan")
    assert(df.count() == 8)
  }

  test("pushed limit is honored exactly for non-divisible and tiny limits") {
    def rows(limit: Int): Long =
      spark.read.format("graft.sources.SearchSource")
        .option("categories", "cs.AI,cs.DB,cs.LG,cs.CV").option("maxResults", "1000")
        .load().limit(limit).count()
    assert(rows(10) == 10, "remainder must be distributed, not floored")
    assert(rows(2) == 2, "limit below #categories must not over-produce")
    assert(rows(8) == 8)
  }

  test("HTTP mode: end-to-end DSv2 read against a local server, pushed limit on the wire") {
    atomRequests.clear()
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI").option("maxResults", "100")
      .option("endpoint", s"http://127.0.0.1:$port/atom")
      .load()
      .limit(3)
    val rows = df.collect()
    assert(rows.length == 3)

    // the PUSHED limit is what reached the wire — the reader asked the
    // server for 3 results, it did not fetch 100 and filter post-scan
    val served = atomRequests.asScala.toSeq
    assert(served.nonEmpty && served.forall(_.contains("max_results=3")),
      s"pushed limit must reach the HTTP request, got: $served")
    assert(served.forall(_.contains("search_query=cat:cs.AI")))

    // parsed fields are faithful to the feed (incl. XML entity unescape,
    // /abs/ id stripping, ISO-8601 -> timestamp)
    val r0 = rows.sortBy(_.getString(0)).head
    assert(r0.getString(0) == "2401.10000")
    assert(r0.getString(1) == "Paper 0 & friends")
    assert(r0.getString(2) == "cs.AI")
    assert(r0.getTimestamp(3).toInstant == java.time.Instant.parse("2024-01-01T12:00:00Z"))
    assert(r0.getString(4) == "http://example.org/pdf/0")
    assert(r0.getString(5) == "Abstract 0 for cs.AI.")
  }

  test("HTTP mode: multi-category quota split, each category hits its own request") {
    atomRequests.clear()
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI,cs.DB").option("maxResults", "10")
      .option("endpoint", s"http://127.0.0.1:$port/atom")
      .load()
    assert(df.count() == 10)
    val served = atomRequests.asScala.toSeq
    assert(served.exists(q => q.contains("cat:cs.AI") && q.contains("max_results=5")))
    assert(served.exists(q => q.contains("cat:cs.DB") && q.contains("max_results=5")))
    assert(df.select("category").distinct().as[String].collect().toSet ==
      Set("cs.AI", "cs.DB"))
  }

  test("HTTP mode: transient 503 is retried to success") {
    flakyHits.set(0)
    val df = spark.read.format("graft.sources.SearchSource")
      .option("categories", "cs.AI").option("maxResults", "2")
      .option("endpoint", s"http://127.0.0.1:$port/flakyatom")
      .load()
    assert(df.count() == 2)
    assert(flakyHits.get() >= 2, "the 503 must have been retried")
  }

  test("search plane: 429 Retry-After honored, oversized body rejected") {
    import graft.sources.SearchHttp
    limitedHits.set(0)
    val t0 = System.nanoTime()
    val rows = SearchHttp.search(s"http://127.0.0.1:$port/limited-atom", "cs.AI", 2)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(rows.length == 2 && limitedHits.get() == 2)
    assert(elapsedMs >= 900,
      s"Retry-After: 1 must govern the wait, got ${elapsedMs}ms")

    // /atom serves ~n entries; a 2-result feed is far beyond a 64-byte cap
    val e = intercept[java.io.IOException](
      SearchHttp.search(s"http://127.0.0.1:$port/atom", "cs.AI", 2, maxBodyBytes = 64))
    assert(e.getMessage.contains("exceeds 64 bytes"), e.getMessage)
  }

  test("flatMapGroupsWithState sessionization equals gaps-and-islands batch") {
    val ev = Tables(spark, sfDir, "events")
    val stateful = StatefulSessions.sessionize(ev, 30)
      .select("user_id", "n", "first_ev", "last_ev")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch gaps-and-islands reference (same as q23)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    val batch = ev
      .withColumn("new_s", when(gapUs.isNull || gapUs > 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_ev"),
        max(col("event_id")).as("last_ev"))
      .select("user_id", "n", "first_ev", "last_ev")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(stateful == batch)
  }
}
