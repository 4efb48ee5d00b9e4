package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full reference-DAG-equivalent pipeline (chunk -> semantic
    * extract -> synthesize -> article -> quality gate) with the stub client.
    */
  def entry(spark: SparkSession): DataFrame =
    Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracles

  /** Same, plus oracles whose SQL must be GENERATED with a live session on
    * the verified dir (driver-side constants inlined — e.g. the q57 IVF
    * codebook, trained on the same corpus the query runs over). Verify dumps
    * THIS map, so the driver's DuckDB gate covers the generated oracles too.
    */
  def oracleSqlFor(spark: SparkSession, dir: String): Map[String, String] =
    Registry.oraclesFor(spark, dir)

  /** Subset form for Verify's local-iteration mode: generators outside
    * `keep` never run (some train models driver-side).
    */
  def oracleSqlFor(spark: SparkSession, dir: String,
                   keep: String => Boolean): Map[String, String] =
    Registry.oraclesFor(spark, dir, keep)
}
