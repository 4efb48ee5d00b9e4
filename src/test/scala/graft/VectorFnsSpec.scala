package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.multimodal.Multimodal
import graft.operators.Similarity

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm/cosine basics") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b")
    val rows = df.select(
      VectorFns.dot(col("a"), col("b")).as("d"),
      VectorFns.cosine(col("a"), col("b")).as("c")).as[(Double, Double)].collect()
    assert(rows(0) == ((0.0, 0.0)))
    assert(math.abs(rows(1)._2 - 1.0) < 1e-12)
  }

  test("NearestCellDist returns NearestCell's own distance; drift stats flag " +
      "a shifted increment against the frozen codebooks") {
    import org.apache.spark.sql.GraftShim.{column, expression}
    val cents = Array(Array(0.0, 0.0), Array(10.0, 10.0))
    val df = Seq(Seq(1.0, 1.0), Seq(9.0, 8.0), Seq(4.0, 5.0)).toDF("v")
    val rows = df.select(
      column(graft.expressions.NearestCell(expression(col("v")), cents)).as("c"),
      column(graft.expressions.NearestCellDist(expression(col("v")), cents)).as("d"))
      .as[(Int, Double)].collect().toSeq
    // (1,1)->cell 0 d=2; (9,8)->cell 1 d=5; (4,5)->cell 0 d=41 (< 61)
    assert(rows == Seq((0, 2.0), (1, 5.0), (0, 41.0)), s"got $rows")
    // a genuinely shifted increment must score a larger avg error than the
    // base cohort it was NOT trained on
    val emb = Tables(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift_").toString
    Similarity.buildIvfPqIndex(base, tmp)
    val shifted = emb.select(
      when(col("vec_id") % 3 === 0, lit("shifted")).otherwise(lit("base")).as("cohort"),
      col("vec_id").as("nid"),
      when(col("vec_id") % 3 === 0,
        transform(col("embedding"), x => x * lit(3.0f) + lit(2.0f)))
        .otherwise(col("embedding")).as("ne"))
    val avg = Similarity.ivfPqDriftStats(shifted, tmp, "cohort")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(avg("shifted") > 2 * avg("base"),
      s"a 3x+2 affine shift must blow up quantization error, got $avg")
  }

  test("lsh bucket is deterministic and identical vectors collide") {
    val v = Seq.fill(8)(0.5f)
    val df = Seq(v, v).toDF("v")
    val b = df.select(VectorFns.lshBucket(col("v"), 8)).as[Long].collect()
    assert(b(0) == b(1))
  }

  test("lshTopK recall vs brute force on real embeddings") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val exact = Similarity.bruteTopK(q, c, 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, c, 10, nBits = 3, nTables = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.2, s"LSH recall unreasonably low: $recall")
    assert(approx.nonEmpty)
  }

  test("ivfTopK recall vs brute force on real embeddings") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val exact = Similarity.bruteTopK(q, c, 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, c, 10, nCells = 8, nProbe = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall unreasonably low: $recall")
  }

  test("pqTopK equals a driver-side ADC mirror, distances included") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val got = Similarity.pqTopK(q, c, k = 5, m = 8, kSub = 16)
      .select(col("qid"), col("nid"), col("adist"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSet

    // independent scala mirror of the whole pipeline (same arithmetic order)
    val all = emb.select(col("vec_id"), col("embedding")).orderBy("vec_id")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toSeq
    val cbs = Similarity.trainPq(all.map(_._2).toArray, 8, 16)
    val sub = cbs(0)(0).length
    def subL2(v: Array[Double], mi: Int, cen: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < sub) { val df = v(mi * sub + i) - cen(i); d += df * df; i += 1 }
      d
    }
    val codes = all.map { case (id, v) =>
      id -> Array.tabulate(8) { mi =>
        var best = 0; var bestD = Double.MaxValue
        cbs(mi).zipWithIndex.foreach { case (cen, ci) =>
          val d = subL2(v, mi, cen)
          if (d < bestD) { bestD = d; best = ci }
        }
        best
      }
    }.toMap
    val expected = all.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val ranked = all.filter(_._1 != qid).map { case (nid, _) =>
        val ad = (0 until 8).map(mi => subL2(qv, mi, cbs(mi)(codes(nid)(mi)))).sum
        (nid, ad)
      }.sortBy { case (nid, ad) => (ad, nid) }.take(5)
      ranked.zipWithIndex.map { case ((nid, ad), i) => (qid, nid, ad, i + 1) }
    }.toSet
    assert(got == expected, "distributed PQ/ADC must equal the driver mirror exactly")
  }

  test("ivfPqTopK equals a driver-side IVFADC mirror, distances included") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val got = Similarity.ivfPqTopK(q, c, k = 5, nCells = 16, nProbe = 4, m = 8, kSub = 16)
      .select(col("qid"), col("nid"), col("adist"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSet

    // independent scala mirror of the whole composition (same arithmetic
    // order: coarse assign, residual codes, probe, residual ADC)
    val all = emb.select(col("vec_id"), col("embedding")).orderBy("vec_id")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toSeq
    val vecs = all.map(_._2).toArray
    val cents = Similarity.lloyd(vecs, 16, iters = 10, seed = 42)
    val cbs = Similarity.trainPq(Similarity.residualsOf(vecs, cents), 8, 16)
    val sub = cbs(0)(0).length
    def subL2(v: Array[Double], mi: Int, cen: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < sub) { val df = v(mi * sub + i) - cen(i); d += df * df; i += 1 }
      d
    }
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def resid(v: Array[Double], cell: Int): Array[Double] =
      Array.tabulate(v.length)(i => v(i) - cents(cell)(i))
    val cellOf = all.map { case (id, v) => id -> Similarity.nearestIdx(v, cents) }.toMap
    val codes = all.map { case (id, v) =>
      val rv = resid(v, cellOf(id))
      id -> Array.tabulate(8) { mi =>
        var best = 0; var bestD = Double.MaxValue
        cbs(mi).zipWithIndex.foreach { case (cen, ci) =>
          val d = subL2(rv, mi, cen)
          if (d < bestD) { bestD = d; best = ci }
        }
        best
      }
    }.toMap
    val expected = all.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val probedCells = cents.indices.map(cc => (l2(qv, cents(cc)), cc))
        .sorted.take(4).map(_._2).toSet
      val qrByCell = probedCells.map(cc => cc -> resid(qv, cc)).toMap
      val ranked = all
        .filter { case (nid, _) => nid != qid && probedCells.contains(cellOf(nid)) }
        .map { case (nid, _) =>
          val cell = cellOf(nid)
          val qr = qrByCell(cell)
          val ad = (0 until 8).map(mi => subL2(qr, mi, cbs(mi)(codes(nid)(mi)))).sum
          (nid, ad)
        }.sortBy { case (nid, ad) => (ad, nid) }.take(5)
      ranked.zipWithIndex.map { case ((nid, ad), i) => (qid, nid, ad, i + 1) }
    }.toSet
    assert(got == expected, "distributed IVF-PQ must equal the driver IVFADC mirror exactly")
  }

  test("ivfPqTopK refine: exact distances on the shortlist, exact ordering") {
    val emb = Tables(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val refined = Similarity.ivfPqTopK(q, c, k = 5, refine = 4)
      .select(col("qid"), col("nid"), col("adist"), col("rn"))
      .as[(Long, Long, Double, Int)].collect().toSeq

    val all = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Number](1).map(_.doubleValue()).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    assert(refined.nonEmpty && refined.forall(_._4 <= 5))
    refined.foreach { case (qid, nid, ad, _) =>
      assert(ad == l2(all(qid), all(nid)),
        s"refined adist must be the EXACT raw L2 for ($qid,$nid)")
    }
    refined.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(r => (r._3, r._2)) == sorted.map(r => (r._3, r._2)).sorted,
        "refined ranking is by exact distance")
    }
  }

  test("pqTopK on clustered data: top neighbor comes from the same cluster") {
    val rnd = new scala.util.Random(3)
    val pts = for (cl <- 0 until 4; i <- 0 until 10) yield {
      val base = Array.tabulate(16)(d => if (d % 4 == cl) 5.0f else 0.0f)
      ((cl * 10 + i).toLong,
        base.map(v => v + rnd.nextGaussian().toFloat * 0.1f).toSeq, cl)
    }
    val df = pts.toDF("id", "vec", "cluster")
    val q = df.select(col("id").as("qid"), col("vec").as("qe"))
    val c = df.select(col("id").as("nid"), col("vec").as("ne"))
    val top1 = Similarity.pqTopK(q, c, k = 1, m = 4, kSub = 8)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(top1.length == 40)
    top1.foreach { case (qid, nid) =>
      assert(qid / 10 == nid / 10,
        s"query $qid's PQ nearest neighbor $nid must share its cluster")
    }
  }

  test("multimodal stub codec: deterministic features, unit norm") {
    val codec = new Multimodal.StubCodec()
    val f1 = codec.features("hello world".getBytes, 16)
    val f2 = codec.features("hello world".getBytes, 16)
    assert(f1.toSeq == f2.toSeq)
    val norm = math.sqrt(f1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("resize stage: exact target byte count, meta updated, deterministic") {
    import org.apache.spark.sql.functions._
    val codec = new Multimodal.StubCodec()
    val fixture = Multimodal.fixtureFromDocuments(
      Seq((1L, "some binary-ish payload content", "en", "s"))
        .toDF("doc_id", "text", "lang", "source"))
    val resized = Multimodal.resize(Multimodal.decode(fixture, codec), codec, 8, 4)
    val r = resized.select(length(col("content")), col("meta.width"), col("meta.height"))
      .as[(Int, Int, Int)].collect().head
    assert(r == ((32, 8, 4)))
    val b1 = codec.resize("abcdef".getBytes, 4, 2)
    val b2 = codec.resize("abcdef".getBytes, 4, 2)
    assert(b1.toSeq == b2.toSeq && b1.length == 8)
    assert(codec.resize(Array.emptyByteArray, 2, 2).length == 4)
  }

  test("audio segmentation: full coverage, exact overlap, clipped tail") {
    import org.apache.spark.sql.functions._
    // 16 kB/s, 500ms seg = 8000 B, 100ms overlap -> 6400 B step
    val payload = ("x" * 20000).getBytes
    val df = Seq((1L, payload)).toDF("doc_id", "content")
    val segs = Multimodal.segmentAudio(df, bytesPerSecond = 16000,
        segmentMs = 500, overlapMs = 100)
      .select(col("segment_id"), col("start_ms"), length(col("segment")).as("n"))
      .as[(Int, Long, Int)].collect().sortBy(_._1)
    // windows: [0,8000), [6400,14400), [12800,20000-): 3 segments
    assert(segs.map(_._1).toSeq == Seq(0, 1, 2))
    assert(segs.map(_._2).toSeq == Seq(0L, 400L, 800L))
    assert(segs.map(_._3).toSeq == Seq(8000, 8000, 7200), "tail clipped to payload")
    // coverage: last segment reaches the end; overlap = segBytes - step
    assert(12800 + 7200 == payload.length)

    // short payload -> exactly one clipped segment
    val one = Multimodal.segmentAudio(
        Seq((1L, "abc".getBytes)).toDF("doc_id", "content"),
        16000, 500, 100)
      .select(length(col("segment"))).as[Int].collect().toSeq
    assert(one == Seq(3))
  }
}
