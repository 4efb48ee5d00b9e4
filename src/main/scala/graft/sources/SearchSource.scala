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
  * This implementation serves deterministic synthetic paper metadata (the
  * container has no egress; a real HTTP-backed reader drops into
  * `SearchPartitionReader.fetch`). What is REAL and exercised:
  * the DSv2 contract (TableProvider -> ScanBuilder -> Batch -> partition
  * readers), limit pushdown (`SupportsPushDownLimit` — the driver-side
  * `max_results` cap reaches the reader instead of filtering post-scan) and
  * column pruning (`SupportsPushDownRequiredColumns`), plus per-category
  * partition planning (one input partition per category, the parallel
  * form of the reference's per-category quota loop, zara_hybrid_etl.py:139-147).
  *
  * Usage:
  *   spark.read.format("graft.sources.SearchSource")
  *     .option("categories", "cs.AI,cs.DB").option("maxResults", "20").load()
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
      o.getInt("maxResults", 100))
}

class SearchScanBuilder(categories: Seq[String], maxResults: Int)
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
        s"prunedColumns=${required.fieldNames.mkString(",")})"

    // One partition per category — the distributed form of the reference's
    // sequential quota loop (L2, zara_hybrid_etl.py:141-145). The pushed
    // limit is distributed exactly (remainder spread over the first
    // limit % k categories) so the partitions produce `limit` rows in total.
    override def planInputPartitions(): Array[InputPartition] = {
      val k = categories.size
      val base = limit / k
      val rem = limit % k
      categories.zipWithIndex
        .map { case (c, i) => SearchPartition(c, base + (if (i < rem) 1 else 0)) }
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

case class SearchPartition(category: String, quota: Int) extends InputPartition

class SearchPartitionReader(p: SearchPartition, schema: StructType)
    extends PartitionReader[InternalRow] {

  private var i = 0

  /** The network boundary. Deterministic synthetic results stand in for the
    * arXiv HTTP call (zero-egress container).
    */
  private def fetch(idx: Int): Map[String, Any] = {
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

  override def next(): Boolean = { i += 1; i <= p.quota }

  override def get(): InternalRow = {
    val rec = fetch(i - 1)
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
