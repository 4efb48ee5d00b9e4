package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ-shaped gate a training-data
  * pipeline runs before anything ships): each check reduces a table to ONE
  * row — (check_name, violations, pass) — and the suite is the union.
  * Every check is a single aggregate or anti-join: fully
  * partial-aggregated, no check materializes violating rows (count-only),
  * so the suite's output is bounded by the number of checks regardless of
  * data size.
  */
object Checks {

  private def one(name: String, violations: DataFrame): DataFrame =
    violations.select(lit(name).as("check_name"),
      col("violations").cast("long").as("violations"),
      (col("violations") === 0L).as("pass"))

  /** Rows whose key occurs more than once (dup rows counted, minus one
    * allowed occurrence per key — 0 iff the key is unique).
    */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame =
    one(name, df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(when(col("__n") > 1, col("__n") - 1)), lit(0L))
        .as("violations")))

  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    one(name, df.agg(count(when(col(c).isNull, 1)).as("violations")))

  /** Child rows whose NON-NULL foreign key has no parent (left-anti
    * count). Null FKs are excluded by definition — SQL `NOT IN` / `IN`
    * never matches a null key, so counting them here would diverge from
    * the relational reading; detecting null FKs is `notNull`'s job
    * (compose both checks in a suite when nulls are themselves
    * violations).
    */
  def refIntegrity(child: DataFrame, fk: String, parent: DataFrame,
                   pk: String, name: String): DataFrame =
    one(name, child.select(col(fk)).filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("violations")))

  def inRange(df: DataFrame, c: String, lo: Long, hi: Long,
              name: String): DataFrame =
    one(name, df.agg(count(when(col(c) < lo || col(c) > hi, 1))
      .as("violations")))

  /** k-anonymity over quasi-identifiers: rows living in groups smaller
    * than k (each such row is re-identifiable to fewer than k peers).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long,
                 name: String): DataFrame =
    one(name, df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L))
        .as("violations")))

  def suite(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    checks.reduce(_ unionByName _)
  }

  /** l-diversity report — [[kAnonymity]]'s companion: a quasi-identifier
    * group is safe only when its SENSITIVE column also takes at least `l`
    * distinct values (k-anonymity alone leaks when the whole group shares
    * one diagnosis). One row per quasi group with its size, distinct
    * sensitive count, and the diverse flag — the full table a release
    * review wants, not just a count (feed the flagged groups to a
    * generalization/suppression pass).
    *
    * Scale shape: one two-level aggregate — (quasi…, sensitive) counts,
    * then a grouped count over those — shuffle ∝ distinct combinations,
    * partial-aggregated map-side.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensCol: String,
                 l: Long): DataFrame = {
    require(l >= 1, s"l must be positive, got $l")
    df.groupBy((quasiCols :+ sensCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }
}
