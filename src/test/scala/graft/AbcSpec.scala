package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Abc, Selection}

/** ABC classification vs the sorted-reference definition, plus the
  * per-group quantile-bounds contract behind winsorization.
  */
class AbcSpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(23L)
    (1 to n).map { _ =>
      val t = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
  }

  test("Abc.classify equals the sorted cumulative-share reference, any partitioning") {
    val rows = sampleN(Gen.chooseNum(1L, 10000L), 300).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val got = Abc.classify(rows.toDF("k", "v").repartition(9), "k", "v")
      .select("k", "cls").as[(Long, String)].collect().toMap
    val tot = rows.map(_._2).sum
    var cum = 0L
    val expected = rows.sortBy { case (k, v) => (-v, k) }.map { case (k, v) =>
      cum += v
      k -> (if (cum * 100 <= tot * 80) "A"
            else if (cum * 100 <= tot * 95) "B" else "C")
    }.toMap
    assert(got === expected)
    assert(Set("A", "B", "C").subsetOf(got.values.toSet))
  }

  test("equiFreqBins: buckets match the driver-side ceil-rank reference, ties share") {
    val rows = sampleN(Gen.zip(Gen.oneOf("a", "b"),
      Gen.chooseNum(0L, 40L)), 400) // tiny domain forces heavy ties
    val got = Selection.equiFreqBins(
      rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
        .toDF("id", "g", "v").repartition(5), "g", "v", 4)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val expected = rows.zipWithIndex.flatMap { case ((g, v), i) =>
      val grp = rows.filter(_._1 == g).map(_._2).sorted
      val n = grp.length.toLong
      val bounds = (1 until 4).map(k => grp(((n * k + 3) / 4 - 1).toInt))
      Some(i.toLong -> (1 + bounds.count(v > _)))
    }.toMap
    assert(got === expected)
    // equal values always land in the same bucket
    val byVal = rows.zipWithIndex.groupBy { case ((g, v), _) => (g, v) }
    byVal.foreach { case (_, members) =>
      assert(members.map { case (_, i) => got(i.toLong) }.distinct.size == 1)
    }
  }

  test("groupQuantileBounds: bounds are the ceil-rank order statistics per group") {
    val rows = sampleN(Gen.zip(Gen.oneOf("g1", "g2", "g3"),
      Gen.chooseNum(0L, 999L)), 500)
    val got = Selection.groupQuantileBounds(
      rows.toDF("g", "v").repartition(7), "g", "v", 10, 90)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = sorted(((n * 10 + 99) / 100 - 1).toInt)
      val hi = sorted(((n * 90 + 99) / 100 - 1).toInt)
      assert(got(g) === ((lo, hi, n)), s"group $g")
    }
  }
}
