package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query per implemented operator (SURVEY.md §2).
  *
  * Each entry pairs a Spark implementation with (where SQL-expressible) an
  * ANSI/DuckDB oracle over the same parquet tables. Column names are aligned
  * on both sides; every query carries a deterministic total ORDER BY and
  * doubles are rounded identically so the driver's hash compare is stable.
  */
/** `oracle` is a fixed SQL string; `oracleGen` derives the SQL from a live
  * session + data dir at Verify time — for oracles that must inline
  * data-dependent driver-side constants (e.g. q57's k-means codebook, which
  * is trained on the corpus being verified). At most one should be set.
  */
case class Q(name: String,
             fn: (SparkSession, String) => DataFrame,
             oracle: Option[String],
             oracleGen: Option[(SparkSession, String) => String] = None)

object Registry {
  def all: Seq[Q] =
    RelationalQueries.all ++ CarrierQueries.all ++ EventQueries.all ++ TextQueries.all ++
      VectorQueries.all ++ DedupQueries.all ++ ScalarQueries.all ++
      SemanticQueries.all ++ QualityQueries.all ++ SqlQueries.all ++
      MiscQueries.all ++ AnalyticsQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Static oracles plus the session-generated ones (codebooks etc.). A
    * failing generator downgrades ITS query to rows-only instead of
    * crashing the dump — one bad generator must never zero the whole
    * correctness run's oracle file.
    */
  /** `keep` prunes BEFORE the generators run — a subset dump must not pay
    * every generator's driver-side training just to discard the SQL.
    */
  def oraclesFor(spark: SparkSession, dir: String,
                 keep: String => Boolean = _ => true): Map[String, String] =
    all.filter(q => keep(q.name)).flatMap { q =>
      val gen = q.oracleGen.flatMap { g =>
        try Some(g(spark, dir))
        catch {
          case e: Exception =>
            System.err.println(s"[oracle-gen] ${q.name} failed, demoted to rows-only: ${e.getMessage}")
            None
        }
      }
      gen.orElse(q.oracle).map(q.name -> _)
    }.toMap
}
