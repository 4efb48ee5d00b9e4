package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SERVE-LEG timing for the persisted text index — the evidence the
  * headline bench cannot give: q315 times the COMPLETE
  * build-append-serve lifecycle, so the serve leg (the part a 100 TB
  * deployment pays per query) needs its own capture, and the max-score
  * pruning's effect is a serve-leg property. Builds the index over the
  * `documents` table at `SPARK_GRAFT_SF_DIR` once, then times, as
  * min-of-three each: the BM25 serve with max-score pruning (the
  * default path), the same serve with pruning disabled, and the
  * conjunctive serve. Prints ONE JSON line, like [[Bench]].
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val path = java.nio.file.Files
      .createTempDirectory("graft_servebench_").toString + "/ix"
    val tBuild = time { graft.operators.TextIndex.buildTextIndex(
      docs, path, "doc_id", "text", nBuckets = 16, appliedId = Some("b0")) }
    // the query mix deliberately includes HIGH-DF terms (the pruning's
    // target case) alongside selective ones
    val queries = Seq(
      (1L, "the data model quality"), (2L, "learning training corpus"),
      (3L, "analysis results language"), (4L, "the and of"),
      (5L, "distributed systems performance")).toDF("qid", "qtext")
    def serve(prune: Boolean, requireAll: Boolean = false): Long =
      graft.operators.TextIndex.serveTextIndex(spark, path, queries,
        "qid", "qtext", "doc_id", k = 10, requireAll = requireAll,
        maxScorePrune = prune).count()
    serve(prune = true) // warm-up (JIT, page cache) — untimed
    def minOf3(f: => Unit): Double = (1 to 3).map(_ => time(f)).min
    val tPruned = minOf3 { serve(prune = true) }
    val tUnpruned = minOf3 { serve(prune = false) }
    val tConj = minOf3 { serve(prune = true, requireAll = true) }
    spark.stop()
    println(f"""{"metric":"text_index_serve","build_sec":$tBuild%.3f,""" +
      f""""serve_pruned_sec":$tPruned%.3f,""" +
      f""""serve_unpruned_sec":$tUnpruned%.3f,""" +
      f""""serve_conjunctive_sec":$tConj%.3f,"sf":"$sfDir"}""")
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
}
