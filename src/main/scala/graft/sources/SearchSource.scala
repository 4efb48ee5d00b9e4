package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 search source — the at-scale mapping of the reference's
  * arXiv API source (SURVEY §2.1 S1: "a DataSource V2 TableProvider with
  * SupportsPushDownLimit, maps max_results").
  *
  * Two data planes behind the same DSv2 contract (TableProvider ->
  * ScanBuilder -> Batch -> partition readers):
  *
  *   - `endpoint` option set: REAL HTTP. Each per-category partition issues
  *     one arXiv-wire-shape GET (`?search_query=cat:C&start=0&max_results=N`)
  *     from its executor and parses the Atom feed (entry/id/title/category/
  *     published/link[pdf]/summary — arxiv_hook.py:80-94's fields). Transient
  *     5xx/IO errors retry with backoff; 4xx fails the scan loudly. Tested
  *     against an in-process localhost server (zero egress) in
  *     SearchSourceSpec, which also asserts the PUSHED limit is what reaches
  *     the wire as max_results.
  *   - no `endpoint`: deterministic synthetic metadata (the offline default
  *     in this container).
  *
  * Limit pushdown (`SupportsPushDownLimit` — the driver-side `max_results`
  * cap reaches the reader instead of filtering post-scan), column pruning
  * (`SupportsPushDownRequiredColumns`) and per-category partition planning
  * (one input partition per category, the parallel form of the reference's
  * per-category quota loop, zara_hybrid_etl.py:139-147) apply to both modes.
  *
  * Usage:
  *   spark.read.format("graft.sources.SearchSource")
  *     .option("categories", "cs.AI,cs.DB").option("maxResults", "20")
  *     .option("endpoint", "https://export.arxiv.org/api/query")  // optional
  *     .load()
  */
class SearchSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SearchSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SearchTable(new CaseInsensitiveStringMap(properties))
}

object SearchSource {
  /** 6-field core of the reference's 13-field paper record (arxiv_hook.py:80-94). */
  val schema: StructType = StructType(Seq(
    StructField("arxiv_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("published", TimestampType, nullable = false),
    StructField("pdf_url", StringType, nullable = false),
    StructField("summary", StringType, nullable = false)))
}

class SearchTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_search"
  override def schema(): StructType = SearchSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SearchScanBuilder(
      o.getOrDefault("categories", "cs.AI").split(",").toSeq,
      o.getInt("maxResults", 100),
      Option(o.get("endpoint")))
}

class SearchScanBuilder(categories: Seq[String], maxResults: Int,
                        endpoint: Option[String])
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {

  private var limit: Int = maxResults
  private var required: StructType = SearchSource.schema

  // Partially pushed: the scan caps its output at `limit` but Spark keeps its
  // own Limit operator, so any per-partition rounding can never change the
  // query's row count.
  override def pushLimit(l: Int): Boolean = { limit = math.min(limit, l); true }
  override def isPartiallyPushed(): Boolean = true
  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftSearch(categories=${categories.mkString("|")}, pushedLimit=$limit, " +
        s"prunedColumns=${required.fieldNames.mkString(",")}, " +
        s"mode=${if (endpoint.isDefined) "http" else "synthetic"})"

    // One partition per category — the distributed form of the reference's
    // sequential quota loop (L2, zara_hybrid_etl.py:141-145). The pushed
    // limit is distributed exactly (remainder spread over the first
    // limit % k categories) so the partitions produce `limit` rows in total.
    override def planInputPartitions(): Array[InputPartition] = {
      val k = categories.size
      val base = limit / k
      val rem = limit % k
      categories.zipWithIndex
        .map { case (c, i) => SearchPartition(c, base + (if (i < rem) 1 else 0), endpoint) }
        .filter(_.quota > 0)
        .map(p => p: InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val schema = required
      (partition: InputPartition) =>
        new SearchPartitionReader(partition.asInstanceOf[SearchPartition], schema)
    }
  }
}

case class SearchPartition(category: String, quota: Int,
                           endpoint: Option[String]) extends InputPartition

class SearchPartitionReader(p: SearchPartition, schema: StructType)
    extends PartitionReader[InternalRow] {

  private var i = 0

  /** The network boundary: one HTTP search per partition when an endpoint is
    * configured, deterministic synthetic rows otherwise. Materialized lazily
    * on first `next()` in the executor — the driver never fetches.
    */
  private lazy val records: IndexedSeq[Map[String, Any]] = p.endpoint match {
    case Some(ep) => SearchHttp.search(ep, p.category, p.quota).take(p.quota).toIndexedSeq
    case None     => (0 until p.quota).map(synthetic)
  }

  private def synthetic(idx: Int): Map[String, Any] = {
    val id = s"${p.category}.${2400 + idx % 12}.${10000 + idx}"
    Map(
      "arxiv_id" -> id,
      "title" -> s"Synthetic ${p.category} paper $idx",
      "category" -> p.category,
      // deterministic timestamps: 2024-01-01 + idx days (micros since epoch)
      "published" -> (1704067200000000L + idx.toLong * 86400L * 1000000L),
      "pdf_url" -> s"https://example.org/pdf/$id",
      "summary" -> s"Deterministic abstract $idx for category ${p.category}.")
  }

  override def next(): Boolean = { i += 1; i <= records.length }

  override def get(): InternalRow = {
    val rec = records(i - 1)
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      rec(f.name) match {
        case s: String => UTF8String.fromString(s)
        case l: Long   => l
        case other     => other
      }
    })
  }

  override def close(): Unit = ()
}

/** The real-HTTP data plane of the S1 source: arXiv-wire-shape request, Atom
  * feed response. Kept dependency-free (JDK HttpClient + regex field
  * extraction over the handful of Atom elements the schema needs — not a
  * general XML parser, and documented as such).
  */
object SearchHttp {

  /** GET `endpoint?search_query=cat:CAT&start=0&max_results=QUOTA` and parse
    * the Atom entries. Retries transient failures (IO errors, 5xx, 429 rate
    * limits) with linear backoff, honoring a delta-seconds `Retry-After`
    * when the server sends one (arXiv's API does exactly this under load);
    * any other 4xx is definitive and fails the scan loudly — a
    * misconfigured source must never quietly read as empty. Bodies read
    * through a hard byte cap so a runaway feed can't OOM the executor.
    */
  def search(endpoint: String, category: String, quota: Int,
             timeoutMs: Int = 10000, retries: Int = 2,
             maxBodyBytes: Int = 8 << 20): Seq[Map[String, Any]] = {
    val url = s"$endpoint?search_query=cat:$category&start=0&max_results=$quota"
    parseAtom(get(url, timeoutMs, retries, maxBodyBytes), category)
  }

  private def get(url: String, timeoutMs: Int, retries: Int, maxBodyBytes: Int): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    var attempt = 0
    while (attempt <= retries) {
      var waitMs = 50L * (attempt + 1)
      val resp =
        try {
          Some(client.send(
            java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
              .timeout(java.time.Duration.ofMillis(timeoutMs.toLong)).GET().build(),
            java.net.http.HttpResponse.BodyHandlers.ofInputStream()))
        } catch {
          case e: Exception =>
            if (attempt == retries) throw e
            None
        }
      resp.foreach { r =>
        if (r.statusCode() == 200)
          return graft.semantic.HttpBodies.bounded(r.body(), maxBodyBytes, url)
        try r.body().close() catch { case _: Exception => () }
        val transient = r.statusCode() >= 500 || r.statusCode() == 429
        if (!transient || attempt == retries)
          throw new java.io.IOException(s"HTTP ${r.statusCode()} from $url")
        waitMs = graft.semantic.HttpBodies.retryAfterMs(
          r.headers().firstValue("Retry-After").orElse(null)).getOrElse(waitMs)
      }
      attempt += 1
      Thread.sleep(waitMs)
    }
    throw new IllegalStateException("unreachable")
  }

  private val entryRe = "(?s)<entry\\b[^>]*>(.*?)</entry>".r

  private def tagText(block: String, name: String): Option[String] =
    s"(?s)<$name\\b[^>]*>(.*?)</$name>".r
      .findFirstMatchIn(block).map(m => unescape(m.group(1).trim))

  private def attrOf(block: String, tag: String, attr: String): Option[String] =
    s"""<$tag\\b[^>]*\\b$attr="([^"]*)"""".r
      .findFirstMatchIn(block).map(m => unescape(m.group(1)))

  /** The pdf <link> carries title="pdf" (arXiv convention); attribute order
    * is not fixed, so match the tag first, then pull href out of it.
    */
  private def pdfLink(block: String): Option[String] =
    "<link\\b[^>]*>".r.findAllIn(block).toSeq
      .find(_.contains("title=\"pdf\""))
      .flatMap(l => "href=\"([^\"]*)\"".r.findFirstMatchIn(l).map(m => unescape(m.group(1))))

  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&")

  private[sources] def parseAtom(xml: String, fallbackCategory: String): Seq[Map[String, Any]] =
    entryRe.findAllMatchIn(xml).map(_.group(1)).map { e =>
      val rawId = tagText(e, "id").getOrElse("")
      val published = tagText(e, "published").map { s =>
        val t = java.time.Instant.parse(s)
        t.getEpochSecond * 1000000L + t.getNano / 1000L
      }.getOrElse(0L)
      Map[String, Any](
        // arXiv ids arrive as http://arxiv.org/abs/<id>; keep the <id> part
        "arxiv_id" -> rawId.split("/abs/").last,
        "title" -> tagText(e, "title").getOrElse(""),
        "category" -> attrOf(e, "category", "term").getOrElse(fallbackCategory),
        "published" -> published,
        "pdf_url" -> pdfLink(e).getOrElse(""),
        "summary" -> tagText(e, "summary").getOrElse(""))
    }.toSeq
}
