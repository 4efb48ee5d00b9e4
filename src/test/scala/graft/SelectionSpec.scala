package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Selection

/** Counting selection equals the sorted-array definition, at every
  * percentile, regardless of partitioning and duplicate skew.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(11L)
    (1 to n).map { _ =>
      val t = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
  }

  test("exactQuantiles equals the sorted definition on skewed generated data") {
    // heavy duplication: values from a tiny domain so cumulative-count
    // boundaries land ON ties — the case naive implementations get wrong
    val vals = sampleN(Gen.frequency(
      5 -> Gen.const(7L), 3 -> Gen.chooseNum(0L, 20L),
      1 -> Gen.chooseNum(0L, 1000000L)), 977)
    val pcts = Seq(1, 25, 50, 90, 99, 100)
    val got = Selection.exactQuantiles(vals.toDF("v").repartition(13), "v", pcts)
      .select("pct", "value").as[(Int, Long)].collect().toMap
    val sorted = vals.sorted
    val expected = pcts.map { p =>
      val target = (sorted.length.toLong * p + 99L) / 100L
      p -> sorted((target - 1).toInt)
    }.toMap
    assert(got === expected)
  }

  test("groupMad equals the brute-force median-of-absolute-deviations per group") {
    val rows = sampleN(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.frequency(
      4 -> Gen.chooseNum(0L, 30L), 1 -> Gen.chooseNum(0L, 100000L))), 701)
    val got = Selection.groupMad(rows.toDF("g", "v").repartition(9), "g", "v")
      .select("g", "n", "med", "mad")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def ceilMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.length.toLong * 50 + 99) / 100 - 1).toInt)
    }
    val expected = rows.groupBy(_._1).map { case (g, xs) =>
      val vs = xs.map(_._2)
      val med = ceilMedian(vs)
      g -> (vs.length.toLong, med, ceilMedian(vs.map(v => math.abs(v - med))))
    }
    assert(got === expected)
  }

  test("imputeMedian fills with the group ceil-median; all-null groups stay null") {
    val rows = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", Some(30L)),
      ("a", None), ("b", Some(5L)), ("b", None), ("c", None))
    val got = Selection.imputeMedian(
        rows.toDF("g", "v"), "g", "v", "filled")
      .select("g", "v", "filled")
      .as[(String, Option[Long], Option[Long])].collect().toSet
    assert(got === Set(
      ("a", Some(10L), Some(10L)), ("a", Some(20L), Some(20L)),
      ("a", Some(30L), Some(30L)), ("a", None, Some(20L)),
      ("b", Some(5L), Some(5L)), ("b", None, Some(5L)),
      ("c", None, None))) // no non-null basis -> honest null
  }

  test("tukeyOutliers flags exactly the rows outside the integer-doubled fences") {
    val vals = Seq.tabulate(100)(i => ("g", i.toLong, (i % 20 + 40).toLong)) ++
      Seq(("g", 100L, 0L), ("g", 101L, 500L)) // planted extremes
    val flagged = Selection.tukeyOutliers(vals.toDF("g", "id", "v"), "g", "v")
      .filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(flagged === Set(100L, 101L))
  }

  test("count-table merge law: sharded valueCounts fold to the whole-input quantiles") {
    val vals = sampleN(Gen.chooseNum(0L, 300L), 600).zipWithIndex
    val shards = (0 until 3).map { k =>
      Selection.valueCounts(
        vals.filter(_._2 % 3 == k).map(_._1).toDF("v"), "v")
    }
    val merged = Selection.quantilesFromCounts(
      shards.reduce(_ unionByName _), Seq(25, 50, 99)).collect().toSeq
      .sortBy(_.getInt(0))
    val whole = Selection.exactQuantiles(
      vals.map(_._1).toDF("v"), "v", Seq(25, 50, 99)).collect().toSeq
      .sortBy(_.getInt(0))
    assert(merged === whole)
  }

  test("exactQuantiles is partitioning-invariant") {
    val vals = sampleN(Gen.chooseNum(0L, 500L), 400)
    val a = Selection.exactQuantiles(vals.toDF("v").repartition(11), "v", Seq(50, 95))
      .collect().toSeq.sortBy(_.getInt(0))
    val b = Selection.exactQuantiles(vals.toDF("v").coalesce(1), "v", Seq(50, 95))
      .collect().toSeq.sortBy(_.getInt(0))
    assert(a === b)
  }
}
