package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row

/** The two-phase distributed exclusive scan shared by [[Packing]] (token
  * offsets), [[Metrics]] (rank bases), and [[Layout]] (shuffle positions):
  * over a range-partitioned, within-partition-sorted frame, collect ONE
  * weight total per partition (bounded by the partition count, never the
  * data) and prefix-sum them into each partition's exclusive base offset.
  * This is what replaces a corpus-wide one-partition window everywhere a
  * global running total is needed.
  *
  * INVARIANT: the caller must pass the SAME `RDD` instance here and to
  * its second (offset-applying) pass — `Dataset.rdd` is a lazy val, so
  * binding it once (`val rdd = frame.rdd`) shares one ShuffleDependency
  * whose RangePartitioner bounds are computed exactly once; two separate
  * `.rdd` materializations of equivalent plans would sample range bounds
  * independently and could disagree on partition membership.
  */
private[graft] object Scan {

  def partitionBases(rdd: RDD[Row])(weight: Row => Long): Array[Long] = {
    val per = rdd.mapPartitionsWithIndex { case (pi, rows) =>
      var t = 0L
      rows.foreach(r => t += weight(r))
      Iterator((pi, t))
    }.collect().sortBy(_._1)
    per.scanLeft(0L)(_ + _._2).dropRight(1)
  }
}
