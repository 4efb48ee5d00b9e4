package graft.operators

/** LANDED-FILE FINGERPRINT of a materialized view's BASE table — the
  * freshness evidence the MV-rewrite rules check before serving a
  * store instead of the base ([[graft.plans.AggStoreRewrite]] /
  * [[graft.plans.JoinViewRewrite]]). Registration alone makes
  * freshness a pure caller contract; this closes the one window where
  * a wrong answer was reachable WITHOUT a loud contract violation: a
  * base table that gained files after the last store merge would
  * silently serve stale aggregates.
  *
  * MECHANISM. Every store build/merge records the NORMALIZED file
  * listing of its source frame (`DataFrame.inputFiles` — exactly the
  * files whose rows the mutation folded) into the one-file
  * `<storePath>/BASEFILES` manifest ([[Snapshot.writeLines]]'s atomic
  * rename, union semantics across mutations). At rewrite time the rule
  * compares the scan relation's `inputFiles` against the fingerprint:
  * every file the query would scan must already be REFLECTED in the
  * store, else the rewrite refuses (logged) and the query answers from
  * the base — correct, just not accelerated. The day's load merging
  * into the store records the day's files, restoring the rewrite.
  *
  * FAIL-SAFE ORDERING: the fingerprint lands strictly AFTER the store
  * mutation commits, so a crash between the two leaves files
  * under-recorded — rewrites refuse (conservative) until the next
  * mutation heals the listing; the reverse order could fingerprint
  * files the store never folded and serve stale state. A store with NO
  * fingerprint (built before this guard, or from a non-file source
  * such as a memory stream) keeps the registration-contract behavior.
  *
  * At 100 TB the fingerprint is listing-scale metadata — the same
  * driver-side file list every parquet scan's planning already
  * materializes; a real deployment would roll per-partition digests,
  * which this layout accommodates without changing the check.
  *
  * COMPLIANCE interaction: a store-side purge deliberately diverges
  * the store from a base that still holds the subject, and the
  * fingerprint keeps the rewrite serving the PURGED state — which is
  * the compliant answer (the erased subject must not be served). When
  * the base itself purges by rewriting files, the new file names fall
  * outside the fingerprint, the rewrite refuses, and the normal merge
  * discipline re-records them — fail-safe in both directions.
  */
private[graft] object BaseFiles {

  private def norm(p: String): String = p.replaceFirst("^file:/+", "/")

  /** Union `files` into the store's fingerprint (no-op for an empty
    * listing — non-file sources leave the fingerprint untouched).
    */
  def record(spark: org.apache.spark.sql.SparkSession, storePath: String,
             files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val cur = read(spark, storePath).getOrElse(Set.empty[String])
    val next = cur ++ files.map(norm)
    if (next != cur)
      Snapshot.writeLines(spark, s"$storePath/BASEFILES", next.toSeq.sorted)
  }

  /** The recorded fingerprint, or None when the store has none. */
  def read(spark: org.apache.spark.sql.SparkSession,
           storePath: String): Option[Set[String]] =
    Snapshot.readLines(spark, s"$storePath/BASEFILES")
      .map(_.filter(_.nonEmpty).map(norm).toSet)

  /** Is every file of the scan relation reflected in the store? True
    * when no fingerprint exists (registration contract, unchanged);
    * false — refuse the rewrite — when the base has files the store's
    * mutations never saw.
    */
  def covers(spark: org.apache.spark.sql.SparkSession, storePath: String,
             relFiles: Seq[String]): Boolean =
    read(spark, storePath) match {
      case None => true
      case Some(fp) => relFiles.nonEmpty && relFiles.map(norm).forall(fp)
    }
}
