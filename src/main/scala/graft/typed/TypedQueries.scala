package graft.typed

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset[T] surface (SURVEY §1.1: "typed core records as Dataset[T]
  * with case classes"): compile-time field checks where the schema is
  * static, plus a custom `Aggregator[IN, BUF, OUT]` (§2.13's typed-aggregate
  * vehicle) usable both with agg() syntax and as a registered SQL UDAF.
  */
object TypedQueries {

  case class Line(l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
                  l_discount: Double, l_returnflag: String)

  case class FlagStats(flag: String, n: Long, revenue: Double)

  /** Discounted-revenue aggregator: partial+final merge (algebraic), so
    * Spark runs it map-side like any built-in sum.
    */
  object RevenueAgg extends Aggregator[Line, (Long, Double), (Long, Double)] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), l: Line): (Long, Double) =
      (b._1 + 1, b._2 + l.l_extendedprice * (1 - l.l_discount))
    override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Long, Double)): (Long, Double) = r
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
  }

  /** Typed end-to-end: Dataset[Line] -> filter -> groupByKey -> custom
    * Aggregator -> Dataset[FlagStats]. Result matches the untyped/SQL
    * formulation exactly (oracle-checked as q91).
    */
  def revenueByFlag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .as[Line]
    lines
      .filter(_.l_quantity > 10)
      .groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("agg"))
      .map { case (flag, (n, rev)) => FlagStats(flag, n, rev) }
      .toDF()
      .select(col("flag"), col("n"), round(col("revenue"), 2).as("revenue"))
      .orderBy(col("flag"))
  }
}
