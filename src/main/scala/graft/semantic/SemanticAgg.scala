package graft.semantic

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Buffer wrapper: gives List[String] a product encoder. */
case class DocBuf(items: List[String])

/** Semantic reduce as a custom `Aggregator[IN, BUF, OUT]` (SURVEY §2.13:
  * the agg()-syntax integration of A1). The buffer accumulates serialized
  * documents (same state shape as semanticReduce's collect_list, partial
  * aggregation included); the model runs once per group in `finish`, via
  * the identical hierarchical fanIn fold — so this composes with any other
  * aggregate in one groupBy/agg pass and registers as a SQL UDAF.
  *
  * Determinism: finish sorts the collected docs, so the fold order (and
  * with it the stub client's output) is independent of partial-aggregation
  * merge order.
  */
case class SemanticAgg(instruction: String, schemaDdl: String,
                       client: ModelClient, fanIn: Int = 8)
    extends Aggregator[String, DocBuf, String] {
  require(fanIn >= 2, "fanIn < 2 cannot converge")

  override def zero: DocBuf = DocBuf(Nil)
  override def reduce(b: DocBuf, doc: String): DocBuf = DocBuf(doc :: b.items)
  override def merge(a: DocBuf, b: DocBuf): DocBuf = DocBuf(a.items ::: b.items)

  override def finish(r: DocBuf): String = {
    def fold(items: Seq[String]): String =
      if (items.isEmpty) client.complete(s"$instruction\n(no documents)", schemaDdl)
      else if (items.size <= fanIn)
        client.complete(s"$instruction\n" + items.mkString("\n"), schemaDdl)
      else fold(items.grouped(fanIn).map(g =>
        client.complete(s"$instruction\n" + g.mkString("\n"), schemaDdl)).toSeq)
    fold(r.items.sorted)
  }

  override def bufferEncoder: Encoder[DocBuf] = Encoders.product[DocBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object SemanticAgg {

  /** agg()-syntax column: synthesize one record per group from the given
    * JSON-doc column. Apply `from_json` on the result for typed fields.
    */
  def synthesize(docCol: Column, instruction: String, outputSchema: StructType,
                 client: ModelClient, fanIn: Int = 8): Column =
    udaf(SemanticAgg(instruction, outputSchema.toDDL, client, fanIn),
      Encoders.STRING)(docCol)

  /** Same semantics as SemanticOps.semanticReduce but through the
    * Aggregator: one groupBy/agg pass, composable with other aggregates.
    */
  def semanticReduceAgg(df: DataFrame, keyCols: Seq[String], instruction: String,
                        outputSchema: StructType, client: ModelClient,
                        fanIn: Int = 8): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains)
    df.withColumn("__doc", to_json(struct(payload.map(col): _*)))
      .groupBy(keyCols.map(col): _*)
      .agg(synthesize(col("__doc"), instruction, outputSchema, client, fanIn).as("__resp"))
      .withColumn("__out", from_json(col("__resp"), outputSchema))
      .select((keyCols.map(col) ++
        outputSchema.fieldNames.map(n => col(s"__out.$n").as(n))): _*)
  }

  /** Register as a SQL UDAF: `SELECT <name>(doc) FROM ... GROUP BY ...`. */
  def register(spark: SparkSession, name: String, instruction: String,
               outputSchema: StructType, client: ModelClient, fanIn: Int = 8): Unit =
    spark.udf.register(name,
      udaf(SemanticAgg(instruction, outputSchema.toDDL, client, fanIn), Encoders.STRING))
}
