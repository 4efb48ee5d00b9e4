package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Sketches, Skyline}

/** Skyline: the two-phase distributed frontier equals the O(n²) dominance
  * definition on generated data (ties in both dimensions included), and
  * the hllCube rolled-up levels obey the register merge law.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(7L)
    (1 to n).map { _ =>
      val t = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
  }

  test("skyline2d equals brute-force dominance on 400 generated points with ties") {
    // small coordinate ranges force duplicate x, duplicate y, and exact
    // duplicate points — every tie case the strictness rules must handle
    val ptGen = for {
      x <- Gen.chooseNum(0L, 19L)
      y <- Gen.chooseNum(0L, 19L)
    } yield (x, y)
    val pts = sampleN(ptGen, 400).zipWithIndex
      .map { case ((x, y), i) => (i.toLong, x, y) }
    val df = pts.toDF("id", "x", "y")

    val got = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().toSet

    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }.map(_._1).toSet

    assert(got === expected)
    assert(got.nonEmpty)
    // with 400 points on a 20x20 grid, duplicate frontier points are
    // guaranteed by pigeonhole — and both copies must survive, since
    // neither strictly dominates the other
    val frontierPts = pts.filter(p => got.contains(p._1)).map(p => (p._2, p._3))
    assert(frontierPts.size > frontierPts.distinct.size)
  }

  test("skyline2d: unhinted join-back above the broadcast guard equals the hinted result; " +
    "int-typed and null y are handled") {
    val pts = sampleN(Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)), 150)
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val df = pts.toDF("id", "x", "y")
    val hinted = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    // broadcastThreshold = 0 forces the AQE/shuffle fallback path — the
    // anti-correlated-staircase safety valve must produce the same frontier
    val unhinted = Skyline.skyline2d(df, "x", "y", broadcastThreshold = 0L)
      .select("id").as[Long].collect().toSet
    assert(unhinted === hinted)

    // int-typed y: the candidate min is cast to long internally (the
    // scaladoc contract says "integral", not "long")
    val intDf = pts.map { case (i, x, y) => (i, x.toInt, y.toInt) }
      .toDF("id", "x", "y")
    val gotInt = Skyline.skyline2d(intDf, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(gotInt === hinted)

    // null y rows are never on the frontier and never NPE the scan
    val withNulls = pts.map { case (i, x, y) => (i, x, Option(y)) } ++
      Seq((9001L, 0L, None: Option[Long]), (9002L, 31L, None: Option[Long]))
    val gotNull = Skyline.skyline2d(withNulls.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(gotNull === hinted)
  }

  test("skyline2d on a single partition equals the many-partition result") {
    val pts = sampleN(Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 50L)), 200)
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val many = Skyline.skyline2d(pts.toDF("id", "x", "y").repartition(7), "x", "y")
      .select("id").as[Long].collect().toSet
    val one = Skyline.skyline2d(pts.toDF("id", "x", "y").coalesce(1), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(many === one)
  }

  test("hllCube levels equal estimates over registers built directly at each grain") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cube = Sketches.hllCube(docs, "doc_id", Seq("lang", "source"))

    // rolled-up (lang) level == registers built at (lang) grain
    val byLang = Sketches.hllEstimate(
      Sketches.hllRegisters(docs, "doc_id", Seq("lang")), Seq("lang"))
      .select(col("lang"), col("est")).as[(String, Long)].collect().toMap
    val cubeLang = cube.filter(col("source") === "*" && col("lang") =!= "*")
      .select(col("lang"), col("est")).as[(String, Long)].collect().toMap
    assert(cubeLang === byLang)

    // global level == registers built with no grouping at all
    val global = Sketches.hllEstimate(
      Sketches.hllRegisters(docs, "doc_id", Nil), Nil)
      .select(col("est")).as[Long].collect().head
    val cubeGlobal = cube.filter(col("lang") === "*" && col("source") === "*")
      .select(col("est")).as[Long].collect()
    assert(cubeGlobal.toSeq === Seq(global))
  }
}
