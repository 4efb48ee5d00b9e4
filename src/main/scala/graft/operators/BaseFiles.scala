package graft.operators

/** LANDED-FILE FINGERPRINT of a materialized view's BASE table — the
  * freshness evidence the MV-rewrite rules check before serving a
  * store instead of the base ([[graft.plans.AggStoreRewrite]] /
  * [[graft.plans.JoinViewRewrite]]). Registration alone makes
  * freshness a pure caller contract; this closes the windows where a
  * wrong answer was reachable WITHOUT a loud contract violation, in
  * BOTH directions: a base that GAINED files after the last store
  * mutation (the rewrite would silently serve stale aggregates), and
  * a base that LOST files the store folded (file-level retention, a
  * partition drop — the rewrite would silently serve rows the base no
  * longer holds).
  *
  * MECHANISM. Every store build/merge records the NORMALIZED file
  * listing of its source frame (`DataFrame.inputFiles` — exactly the
  * files whose rows the mutation folded) into the one-file
  * `<storePath>/BASEFILES` manifest ([[Snapshot.writeLines]]'s atomic
  * rename; MERGES union into it, a BUILD/rebuild [[reset]]s it to
  * exactly its source's listing — the rebuilt state is a pure function
  * of those files alone, and carrying older names would refuse forever
  * after a legitimate base compaction). At rewrite time the rule
  * compares the scan relation's `inputFiles` against the fingerprint
  * BOTH WAYS: every file the query would scan must be reflected in the
  * store (no unseen additions), and every fingerprinted file UNDER THE
  * SCANNED ROOTS must still be in the scan (no deletions of folded
  * files — fingerprint entries under other roots are a multi-base
  * store's other side and are out of this scan's scope). Either
  * violation refuses the rewrite (logged) and the query answers from
  * the base — correct, just not accelerated. The day's load merging
  * into the store records the day's files, restoring the rewrite; a
  * shrunken base requires the rebuild that deletion semantics demand
  * anyway (the store's merge contract is insert-only), and the rebuild
  * resets the fingerprint.
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
    * listing — non-file sources leave the fingerprint untouched). The
    * MERGE verb: increments fold on top of recorded state.
    */
  def record(spark: org.apache.spark.sql.SparkSession, storePath: String,
             files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val cur = read(spark, storePath).getOrElse(Set.empty[String])
    val next = cur ++ files.map(norm)
    if (next != cur)
      Snapshot.writeLines(spark, s"$storePath/BASEFILES", next.toSeq.sorted)
  }

  /** Replace the fingerprint with exactly `files` — the BUILD/rebuild
    * verb: the rebuilt state is a pure function of its source files
    * alone, so names from superseded base generations must not linger
    * (they would trip the shrinkage check forever after a legitimate
    * base compaction). An empty listing (non-file source) DELETES the
    * fingerprint — an empty-set fingerprint would refuse every scan,
    * where "no fingerprint" correctly falls back to the registration
    * contract.
    */
  def reset(spark: org.apache.spark.sql.SparkSession, storePath: String,
            files: Seq[String]): Unit =
    if (files.isEmpty) {
      val p = new org.apache.hadoop.fs.Path(s"$storePath/BASEFILES")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, false)
    } else Snapshot.writeLines(spark, s"$storePath/BASEFILES",
      files.map(norm).distinct.sorted)

  /** The recorded fingerprint, or None when the store has none. */
  def read(spark: org.apache.spark.sql.SparkSession,
           storePath: String): Option[Set[String]] =
    Snapshot.readLines(spark, s"$storePath/BASEFILES")
      .map(_.filter(_.nonEmpty).map(norm).toSet)

  /** Does the fingerprint and the scan agree on the base's files? True
    * when no fingerprint exists (registration contract, unchanged);
    * false — refuse the rewrite — when the base has files the store's
    * mutations never saw (ADDITION: a stale rewrite would under-count),
    * OR when a fingerprinted file under the scan's root paths is gone
    * from the scan (SHRINKAGE: file-level retention or a partition
    * drop deleted rows the store still serves). The root scoping keeps
    * a multi-base store (the join view records BOTH sides into one
    * fingerprint) checkable one relation at a time.
    */
  def covers(spark: org.apache.spark.sql.SparkSession, storePath: String,
             relFiles: Seq[String], relRoots: Seq[String]): Boolean =
    read(spark, storePath) match {
      case None => true
      case Some(fp) =>
        val rf = relFiles.map(norm).toSet
        val roots = relRoots.map(r => norm(r).stripSuffix("/"))
        val fpUnderRoots = fp.filter(f =>
          roots.exists(r => f == r || f.startsWith(r + "/")))
        relFiles.nonEmpty && rf.forall(fp) && fpUnderRoots.forall(rf)
    }
}
