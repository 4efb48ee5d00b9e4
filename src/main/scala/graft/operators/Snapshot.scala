package graft.operators

/** The ONE-FILE atomic-commit primitive shared by every snapshot store in
  * this engine — the IVF-PQ codes catalog (`CODESMAP`), the cluster
  * store's generation manifest (`CURRENT`), and the versioned-index
  * pointer ([[Similarity.rebuildIvfPqIndex]]'s `CURRENT`): a manifest is
  * a short text file, written to a `.tmp` sibling and committed by
  * rename-with-overwrite, which is atomic on HDFS and the local FS — a
  * reader sees the old manifest or the new one, never neither and never
  * a torn mixture (a delete-then-rename would open exactly that window).
  * Factored here so a durability or commit-protocol fix lands once, not
  * in per-store copies that can drift.
  *
  * CONCURRENCY CONTRACT (every store built on this): any number of
  * readers, ONE maintenance writer at a time. Readers resolve the
  * manifest once and scan immutable data directories, so they are
  * isolated from any in-flight mutation; but two concurrent mutations —
  * including a vacuum running beside an append/merge/compaction — race
  * on the staging directories and the manifest swap. The mutating
  * operators guard the staging leg loudly (a vanished staging directory
  * fails the commit instead of committing emptiness), but the contract
  * is the caller's to schedule, as with any lakehouse table's
  * maintenance window.
  */
private[operators] object Snapshot {

  /** Read a manifest's lines, or None if the file does not exist. */
  def readLines(spark: org.apache.spark.sql.SparkSession,
                file: String): Option[List[String]] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList)
      finally in.close()
    }
  }

  /** Write-tmp + atomic rename-overwrite: THE commit point. */
  def writeLines(spark: org.apache.spark.sql.SparkSession,
                 file: String, lines: Seq[String]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dst = new org.apache.hadoop.fs.Path(file)
    val fs = dst.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(s"$file.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf).rename(
      fs.makeQualified(tmp), fs.makeQualified(dst),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The `key=N` partition subdirectories of `dir`, sorted; empty when
    * the directory does not exist.
    */
  def listKvDirs(spark: org.apache.spark.sql.SparkSession,
                 dir: String, key: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(s"$key="))
      .map(_.stripPrefix(s"$key=").toLong).toSeq.sorted
  }

  /** Does this directory exist? (The staging-vanished guard probe.) */
  def dirExists(spark: org.apache.spark.sql.SparkSession,
                dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Recursive delete. */
  def delete(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }
}
