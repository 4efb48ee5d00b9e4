package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming SUFFICIENT-MOMENT shards — the additive-sums member of the
  * streaming-shard family (counts q239, HLL q153, KMV q159, GK q215, MG
  * q223): each microbatch writes its per-group zeroth/first/second
  * cross moments (n, Σxᵢ, Σxᵢxⱼ) as its own `batch=<id>` shard under
  * the `_SUCCESS` discipline, and the fold on read SUMS each moment —
  * sums of products are associative/commutative and every row lands in
  * exactly one batch, so the folded table EQUALS the batch aggregate
  * over the same rows for ANY batch split. Downstream, any
  * sufficient-statistics consumer ([[graft.operators.Trend.corrMatrix]]
  * components, OLS slopes, variances) answers with its batch oracle
  * verbatim.
  *
  * Scale shape: per-batch output is groups × (p·(p+3)/2 + 1) columns —
  * bounded by groups touched in the batch, not batch rows; the fold is
  * one sum-aggregate over the (tiny) shard table.
  */
object StreamingMoments {

  private def momentCols(valCols: Seq[String]) = {
    val n = valCols.size
    Seq(count(lit(1)).as("n")) ++
      valCols.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast("long")).as(s"s$i") } ++
      (for (i <- 0 until n; j <- i until n) yield
        sum(col(valCols(i)).cast("long") * col(valCols(j)).cast("long"))
          .as(s"p${i}_$j"))
  }

  def streamingMoments(stream: DataFrame, groupCol: String,
                       valCols: Seq[String], targetPath: String,
                       checkpoint: String): Unit = {
    require(valCols.nonEmpty, "need at least one measure")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = s"$targetPath/batch=$batchId"
        Streams.idempotentShardWrite(batch.sparkSession, dir) {
          val aggs = momentCols(valCols)
          batch.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
            .write.mode("overwrite").parquet(dir)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Fold every batch shard into whole-stream moments (sum law). */
  def readMergedMoments(spark: SparkSession, targetPath: String,
                        groupCol: String, nVals: Int): DataFrame = {
    val moments = Seq("n") ++ (0 until nVals).map(i => s"s$i") ++
      (for (i <- 0 until nVals; j <- i until nVals) yield s"p${i}_$j")
    spark.read.parquet(targetPath)
      .groupBy(col(groupCol))
      .agg(sum(col(moments.head)).as(moments.head),
        moments.tail.map(m => sum(col(m)).as(m)): _*)
  }

  /** Assemble the correlation-matrix rows ([[graft.operators.Trend
    * .corrMatrix]]'s exact output shape) from a folded moment table —
    * so the drained stream's matrix can be hash-compared against the
    * batch operator's oracle verbatim.
    */
  def corrMatrixFromMoments(moments: DataFrame, groupCol: String,
                            valCols: Seq[String]): DataFrame = {
    val n = valCols.size
    require(n >= 2, "need >= 2 measures")
    val pairs = for (i <- 0 until n; j <- (i + 1) until n) yield
      moments.select(col(groupCol),
        lit(valCols(i)).as("col_a"), lit(valCols(j)).as("col_b"),
        col("n"),
        (col("n") * col(s"p${i}_$j") - col(s"s$i") * col(s"s$j"))
          .as("cov_num"),
        (col("n") * col(s"p${i}_$i") - col(s"s$i") * col(s"s$i"))
          .as("varx_num"),
        (col("n") * col(s"p${j}_$j") - col(s"s$j") * col(s"s$j"))
          .as("vary_num"))
    pairs.reduce(_ unionByName _)
      .withColumn("r2_6",
        when(col("varx_num") === 0L || col("vary_num") === 0L,
          lit(null).cast("double"))
          .otherwise(round(
            col("cov_num").cast("double") * col("cov_num").cast("double") /
              (col("varx_num").cast("double") *
                col("vary_num").cast("double")), 6)))
  }
}
