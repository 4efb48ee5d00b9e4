package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the minhash dedup pipeline (the slowest
  * non-streaming bench queries). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup
    Tables(spark, sfDir, "documents").count()

    import graft.functions.TextFns
    import graft.operators.Dedup
    val docs = Tables(spark, sfDir, "documents")
    time("scan only")(docs.count())
    time("tokens")(docs.select(TextFns.tokens(col("text")).as("t"))
      .agg(sum(size(col("t")))).collect())
    time("shingles")(docs.select(
        TextFns.wordShingles(TextFns.tokens(col("text")), 3).as("s"))
      .agg(sum(size(col("s")))).collect())
    time("shingles+distinct")(docs.select(
        array_distinct(TextFns.wordShingles(TextFns.tokens(col("text")), 3)).as("s"))
      .agg(sum(size(col("s")))).collect())
    time("shingles+distinct+sig")(docs.select(
        graft.expressions.MinHashSig(
          array_distinct(TextFns.wordShingles(TextFns.tokens(col("text")), 3)), 32, 7).as("g"))
      .agg(sum(size(col("g")))).collect())
    val sh = array_distinct(TextFns.wordShingles(TextFns.tokens(col("text")), 3))
    val base = docs.select(col("doc_id").as("__id"), sh.as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", graft.expressions.MinHashSig(col("__sh"), 32, 7))
      .persist()
    time("base materialize")(base.count())
    val banded = base
      .select(col("__id"), explode(Dedup.bandKeys(col("__sig"), 32, 8)).as("__b"))
      .select(col("__id"), col("__b.band").as("band"), col("__b.key").as("key"))
    time("banded count")(banded.count())
    val hot = banded.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("__cnt")).filter(col("__cnt") > 1000)
      .select(col("band"), col("key"))
    val bucketed = banded.join(broadcast(hot), Seq("band", "key"), "left_anti")
    time("bucketed count")(bucketed.count())
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    val nCand = time("candidates")(cand.count())
    println(s"[profile] nCand=$nCand")
    val withSets = cand
      .join(base.select(col("__id").as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__sh").as("sh_b")), "id_b")
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val pairs = withSets
      .select(col("id_a"), col("id_b"), round(jac, 4).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
    time("verify+filter")(pairs.count())
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobTimes.put(js.jobId, (js.time, js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, nt) = jobTimes.getOrDefault(je.jobId, (je.time, -1))
        println(f"[profile]   job ${je.jobId}%3d ${(je.time - t0) / 1e3}%.3f s tasks=$nt")
      }
    })
    for (i <- 1 to 3)
      time(s"full q50 fresh #$i")(
        Dedup.minhashPairs(Tables(spark, sfDir, "documents"), "doc_id", "text",
          numHashes = 32, bands = 8, shingleK = 3, threshold = 0.2).count())
    for (i <- 1 to 2)
      time(s"full q56 fresh #$i")(
        Dedup.dedupCorpus(Tables(spark, sfDir, "documents"), "doc_id", "text",
          threshold = 0.8).count())
    spark.stop()
  }
}
