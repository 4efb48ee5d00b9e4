package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query per implemented operator (SURVEY.md §2).
  *
  * Each entry pairs a Spark implementation with (where SQL-expressible) an
  * ANSI/DuckDB oracle over the same parquet tables. Column names are aligned
  * on both sides; every query carries a deterministic total ORDER BY and
  * doubles are rounded identically so the driver's hash compare is stable.
  */
case class Q(name: String,
             fn: (SparkSession, String) => DataFrame,
             oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    RelationalQueries.all ++ CarrierQueries.all ++ EventQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ DedupQueries.all ++ ScalarQueries.all ++
      SemanticQueries.all ++ QualityQueries.all ++ SqlQueries.all ++
      MiscQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
