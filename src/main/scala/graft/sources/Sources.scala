package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source layer (SURVEY.md §2.1).
  *
  * S4 JSON dataset: explicit schema, lenient parse, corrupt records routed
  * to a dead-letter channel instead of failing the read (F8's "accept
  * whatever shape arrives" + K5's error sink, distributed).
  *
  * S3/S5 binary documents: `binaryFile` source + a `DocParser` registry —
  * the reference ships parser *source code strings* in its config
  * (docetl_operator.py:360-373); we deliberately do NOT eval code, parsers
  * are named Scala implementations resolved from the registry.
  *
  * S2/J2 idempotent fetch: anti-join against a manifest of already-fetched
  * keys (the distributed form of `skip if file exists`,
  * arxiv_hook.py:126-128).
  */
object Sources {

  /** S4: JSON array/lines file with declared schema; malformed rows land in
    * `dead` with the raw text preserved.
    */
  case class JsonRead(ok: DataFrame, dead: DataFrame)

  def jsonDataset(spark: SparkSession, path: String, schema: StructType,
                  multiLine: Boolean = true): JsonRead = {
    val withCorrupt = StructType(schema.fields :+ StructField("_corrupt_record", StringType))
    val raw = spark.read
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
      .cache() // corrupt-record column requires the same pass to be observed consistently
    JsonRead(
      ok = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      dead = raw.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("record"), lit("malformed json").as("error")))
  }

  /** F8: normalize the three accepted output shapes — a bare JSON array, or
    * an object with `articles` / `data` — into one records column
    * (zara_hybrid_etl.py:82-94). Input: one JSON document per row.
    */
  def normalizeJsonShapes(df: DataFrame, jsonCol: String, itemSchema: StructType): DataFrame = {
    val arr = ArrayType(itemSchema)
    // Shape dispatch mirrors the reference's isinstance(list) check: from_json
    // with an array schema "helpfully" wraps a JSON object into a 1-element
    // array, so the bare-list branch must be syntactic, not a parse attempt.
    val records = when(ltrim(col(jsonCol)).startsWith("["),
        from_json(col(jsonCol), arr))                                // bare list
      .otherwise(coalesce(
        from_json(get_json_object(col(jsonCol), "$.articles"), arr), // {"articles": [...]}
        from_json(get_json_object(col(jsonCol), "$.data"), arr),     // {"data": [...]}
        array().cast(arr)))                                          // anything else -> empty
    df.withColumn("__records", records)
      .withColumn("record", explode_outer(col("__records")))
      .drop("__records")
  }

  /** S3/S5 parser boundary: bytes -> rows of parsed text (can fan out, e.g.
    * one row per page). Registered by name; never eval'd from config.
    */
  trait DocParser extends Serializable {
    def parse(path: String, content: Array[Byte]): Seq[String]
  }

  /** Plain-text parser (the deterministic stand-in for the PDF extractor —
    * a PDFBox-backed parser drops in behind the same trait).
    */
  class TextParser extends DocParser {
    override def parse(path: String, content: Array[Byte]): Seq[String] =
      Seq(new String(content, java.nio.charset.StandardCharsets.UTF_8))
  }

  val parserRegistry: Map[String, DocParser] =
    Map("txt" -> new TextParser, "pdf" -> new PdfLiteParser)

  /** S5: glob of binary documents -> (path, modificationTime, full_text)
    * via a registered parser; fan-out parsers yield one row per segment.
    */
  def binaryDocuments(spark: SparkSession, globPath: String,
                      parserName: String): DataFrame = {
    val parser = parserRegistry.getOrElse(parserName,
      throw new IllegalArgumentException(s"unknown parser: $parserName"))
    import spark.implicits._
    spark.read.format("binaryFile").load(globPath)
      .select(col("path"), col("modificationTime"), col("content"))
      .as[(String, java.sql.Timestamp, Array[Byte])]
      .flatMap { case (p, mt, bytes) => parser.parse(p, bytes).zipWithIndex.map {
        case (txt, i) => (p, mt, i, txt)
      } }
      .toDF("path", "modificationTime", "segment", "full_text")
  }

  /** S2/J2: idempotent-fetch planning — which keys still need fetching,
    * given a manifest of done keys. Pure anti-join; at scale both sides
    * shuffle on the key once (or broadcast if the manifest is small).
    */
  def pendingFetches(requested: DataFrame, manifest: DataFrame, keyCol: String): DataFrame =
    requested.join(manifest.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
}
