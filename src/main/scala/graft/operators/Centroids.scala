package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-class centroid-distance outliers over embeddings — the curation
  * question "which vectors don't belong to their class" (mislabeled or
  * corrupt training examples), answered EXACTLY in integers.
  *
  * Floats are quantized once as q = round((x + 1)·scale): the +1 offset
  * keeps the domain positive so truncating and flooring division agree in
  * every engine, and it cancels exactly in the centroid difference
  * (floor((Σq + n·scale)/n) = floor(Σq/n) + scale). The per-(label, pos)
  * floor centroid then gives each vector an exact integer squared L2 to
  * its class centroid; top-k per class by a label-partitioned window.
  *
  * Scale shape: one posexplode pass (rows × dim), centroid table bounded
  * by labels × dim (BROADCAST back), per-vector reduce is one
  * partial-aggregated shuffle on vec_id, and the rank window partitions
  * by label. No float crosses a row boundary, so the result is
  * independent of partitioning and summation order — what makes it
  * oracle-checkable at all.
  */
object Centroids {

  def classOutliers(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, scale: Long = 100000L,
                    topK: Int = 10): DataFrame = {
    require(topK > 0 && scale > 0, "topK and scale must be positive")
    val q = emb
      .select(col(idCol), col(labelCol),
        posexplode(col(vecCol)).as(Seq("pos0", "x")))
      .select(col(idCol), col(labelCol), (col("pos0") + 1).as("pos"),
        round((col("x").cast("double") + 1d) * scale).cast("long").as("q"))
    val cent = q.groupBy(col(labelCol), col("pos"))
      .agg(expr("sum(q) DIV count(1)").as("cq"))
    val d2 = q.join(broadcast(cent), Seq(labelCol, "pos"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d2"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(col("d2").desc, col(idCol))
    d2.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= topK)
  }
}
