package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFns
import graft.operators.Chunker

/** Property-based coverage (SURVEY §5.2 item 4): sanitizer idempotence and
  * charset invariants, chunker coverage, MinHash signature laws. Inputs are
  * ScalaCheck-generated with a FIXED seed and evaluated in single Spark
  * passes (one DataFrame of all samples per law, not one job per sample).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sampleN[T](g: Gen[T], n: Int): Seq[T] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val t = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
  }

  // BMP chars excluding surrogates: adversarial mix of alnum, separators,
  // punctuation, accents, CJK, control chars
  private val charGen: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '-', '_', '.', '!', '?', '/', '\\', '\t', '\n'),
    2 -> Gen.oneOf('é', 'ß', 'Ω', '中', 'ル', 'ä'),
    1 -> Gen.choose(1.toChar, 0xD7FF.toChar))
  private val strGen: Gen[String] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)

  test("slugify: output charset, idempotence, untitled fallback (300 generated strings)") {
    val inputs = sampleN(strGen, 300) :+ "" :+ "---" :+ "中文タイトル"
    val out = inputs.toDF("s")
      .select(col("s"), TextFns.slugify(col("s")).as("slug"))
      .withColumn("slug2", TextFns.slugify(col("slug")))
      .as[(String, String, String)].collect()
    out.foreach { case (in, slug, slug2) =>
      assert(slug.matches("[a-z0-9]+(-[a-z0-9]+)*") || slug == "untitled",
        s"bad slug for ${in.take(30)}: '$slug'")
      assert(slug2 == slug, s"not idempotent: '$slug' -> '$slug2'")
    }
  }

  test("safe_filename: charset, bounded length, no spaces (300 generated strings)") {
    val inputs = sampleN(strGen, 300)
    val out = inputs.toDF("s")
      .select(TextFns.safeFilename(col("s")).as("f"))
      .as[String].collect()
    out.foreach { f =>
      assert(f.matches("[A-Za-z0-9_-]*"), s"bad filename chars: '$f'")
      assert(f.length <= 50, s"too long: ${f.length}")
    }
  }

  test("chunker: every token covered, overlap exact, ids dense (100 generated docs)") {
    val tokGen = Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(6))))
    val docs = sampleN(tokGen, 100).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" "), toks) }
    val chunked = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
    val out = Chunker.split(chunked, "text", chunkSize = 30, overlap = 5)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, _, toks) =>
      val chunks = out.getOrElse(id, Array.empty[(Long, Long, String)]).toSeq
      if (toks.isEmpty) {
        // empty doc -> single empty chunk
        assert(chunks.map(_._3).forall(_.isEmpty))
      } else {
        assert(chunks.map(_._2) == chunks.indices.map(_.toLong), "dense chunk ids")
        // step-based reconstruction: dropping the 5-token overlap from every
        // chunk after the first must give back the original token stream
        val rebuilt = chunks.head._3.split(" ").toSeq ++
          chunks.tail.flatMap(_._3.split(" ").drop(5))
        assert(rebuilt == toks, s"doc $id: coverage broken")
      }
    }
  }

  test("minhash signature: length, bounds, permutation invariance, union monotonicity") {
    val setGen = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))))
    val sets = sampleN(setGen, 80).map(_.distinct)
    val rnd = new scala.util.Random(7)
    val rows = sets.zipWithIndex.map { case (s, i) =>
      (i.toLong, s, rnd.shuffle(s), s ++ s.map(_ + "X"))
    }
    val df = rows.toDF("id", "a", "shuffled", "superset")
    val sig = (c: String) => graft.expressions.MinHashSig(col(c), 16, 7)
    val out = df.select(sig("a").as("sa"), sig("shuffled").as("sp"), sig("superset").as("su"))
      .as[(Seq[Long], Seq[Long], Seq[Long])].collect()
    val P = 2147483647L
    out.foreach { case (sa, sp, su) =>
      assert(sa.length == 16)
      assert(sa.forall(v => v >= 0 && v < P), "slots within the hash field")
      assert(sa == sp, "signature must not depend on shingle order")
      assert(sa.lazyZip(su).forall((x, y) => y <= x),
        "adding shingles can only lower each min slot")
    }
  }

  test("packing laws: exclusive scan invariants on 200 generated documents") {
    import graft.operators.Packing
    val wordCounts = sampleN(Gen.chooseNum(0, 40), 200)
    val docs = wordCounts.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text").repartition(7)
    val out = Packing.packSequences(docs, "doc_id", "text", seqLen = 64)
      .orderBy("doc_id")
      .select("doc_id", "n_toks", "tok_start", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // law 1: offsets are the exclusive prefix sum in id order
    out.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 == a._3 + a._2, s"gap between $a and $b")
      case _ => ()
    }
    assert(out.head._3 == 0L, "stream starts at offset 0")
    // law 2: (seq_id, seq_offset) is exactly the div/mod decomposition
    out.foreach { case (_, _, start, sid, off) =>
      assert(sid == start / 64 && off == start % 64)
    }
  }

  test("count-min law: estimates never undercount on 100 generated corpora rows") {
    import graft.operators.Sketches
    val rows = sampleN(Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e", "f")), 100)
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val docs = rows.toDF("doc_id", "text")
    val truth = rows.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size.toLong)
    val sketch = Sketches.countMin(docs, "text", depth = 3, width = 8) // tiny: force collisions
    val est = Sketches.estimate(sketch, truth.keys.toSeq.toDF("term"), "term",
        depth = 3, width = 8)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS undercounted $t: ${est(t)} < $n")
    }
  }

  test("hll law: sharded registers merge by max to the whole-set registers; estimate within 3σ") {
    import graft.operators.Sketches
    val ids = sampleN(Gen.chooseNum(1L, 1000000L), 400).distinct
    val (a, b) = ids.splitAt(ids.length / 2)
    val whole = ids.map(Tuple1(_)).toDF("id")
    def regs(xs: Seq[Long]) =
      Sketches.hllRegisters(xs.map(Tuple1(_)).toDF("id"), "id", Seq.empty)
    // merge law: max-per-bucket over shard registers == whole-set registers
    val merged = regs(a).unionByName(regs(b))
      .groupBy(col("bucket")).agg(max(col("r")).as("r"))
      .as[(Long, Long)].collect().toSet
    val direct = regs(ids).as[(Long, Long)].collect().toSet
    assert(merged == direct, "sharded registers must merge to the whole-set ones")
    // sanity: estimate within 3 * 1.04/sqrt(64) ≈ 39% of truth (loose 3σ)
    val est = Sketches.hllEstimate(regs(ids), Seq.empty)
      .select(col("est")).as[Long].head()
    val n = ids.length
    assert(math.abs(est - n) <= 0.39 * n, s"estimate $est too far from $n")
  }

  test("kmv law: sharded registers merge to the whole-set bottom-k; exact below k") {
    import graft.operators.Kmv
    val ids = sampleN(Gen.chooseNum(1L, 1000000L), 400).distinct
    val (a, b) = ids.splitAt(ids.length / 3)
    def regs(xs: Seq[Long]) =
      Kmv.kmvRegisters(xs.map(Tuple1(_)).toDF("id"), "id", Seq.empty, k = 32)
    // merge law: bottom-k over the union of shard bottom-ks == whole-set
    val merged = Kmv.mergeRegisters(regs(a).unionByName(regs(b)), Seq.empty, k = 32)
      .select(col("hs")).as[Seq[Long]].head()
    val direct = regs(ids).select(col("hs")).as[Seq[Long]].head()
    assert(merged == direct, "sharded registers must merge to the whole-set ones")
    // registers are the k smallest distinct hashes, sorted
    assert(direct == direct.sorted && direct.distinct == direct)
    // exact regime: below k the estimate IS the distinct count
    val small = ids.take(10)
    val exact = Kmv.kmvEstimate(regs(small), Seq.empty, k = 32)
      .select(col("n_seen"), col("est")).as[(Long, Long)].head()
    assert(exact == ((small.length.toLong, small.length.toLong)),
      s"below-k estimate must be exact, got $exact")
    // sanity: estimate within 3 * 1/sqrt(k-2) ≈ 55% of truth (loose 3σ)
    val est = Kmv.kmvEstimate(regs(ids), Seq.empty, k = 32)
      .select(col("est")).as[Long].head()
    val n = ids.length
    assert(math.abs(est - n) <= 0.55 * n, s"estimate $est too far from $n")
  }

  test("kmv intersection law: inclusion-exclusion is EXACT when all sets fit below k") {
    import graft.operators.Kmv
    // two groups with a known overlap, every set (A, B, A∪B) under k=64
    val ids = sampleN(Gen.chooseNum(1L, 1000000L), 80).distinct.take(40)
    val (onlyA, rest) = ids.splitAt(15)
    val (shared, onlyB) = rest.splitAt(10)
    val rows = (onlyA ++ shared).map(("a", _)) ++ (shared ++ onlyB).map(("b", _))
    val regs = Kmv.kmvRegisters(rows.toDF("g", "id"), "id", Seq("g"), k = 64)
    val r = Kmv.kmvIntersect(regs, "g", k = 64)
      .select(col("est_a"), col("est_b"), col("est_union"), col("est_intersect"))
      .as[(Long, Long, Long, Long)].head()
    assert(r == ((onlyA.length + shared.length, shared.length + onlyB.length,
      ids.length, shared.length)),
      s"below-k intersection must be exact, got $r")
    // trailing window degenerate case: 1-day window is the identity
    val daily = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-02", 3L))
      .toDF("day", "id").select(to_date(col("day")).as("day"), col("id"))
    val dRegs = Kmv.kmvRegisters(daily, "id", Seq("day"), k = 8)
    val same = Kmv.kmvTrailing(dRegs, Seq.empty, "day", days = 1, k = 8)
    assert(same.orderBy(col("day")).select(col("hs")).as[Seq[Long]].collect().toSeq ==
      dRegs.orderBy(col("day")).select(col("hs")).as[Seq[Long]].collect().toSeq,
      "1-day trailing window must be the identity on registers")
  }

  test("histogram law: shards merge by sum; quantile bin contains the exact quantile") {
    import graft.operators.Sketches
    val vals = sampleN(Gen.chooseNum(0L, 50000L), 300)
    val width = 1000L
    val whole = vals.map(Tuple1(_)).toDF("v")
    val (s1, s2) = vals.splitAt(vals.length / 3)
    def hist(xs: Seq[Long]) =
      Sketches.histogram(xs.map(Tuple1(_)).toDF("v"), "v", Seq.empty, width)
    // merge law: summing shard histograms == whole-set histogram
    val merged = hist(s1).unionByName(hist(s2))
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
      .as[(Long, Long)].collect().toSet
    val direct = hist(vals).as[(Long, Long)].collect().toSet
    assert(merged == direct, "shard histograms must merge to the whole-set one")
    // containment: the exact ceil(q*n)-th order statistic lies in [lo, hi)
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val est = Sketches.histQuantiles(
        Sketches.histogram(whole, "v", Seq.empty, width), Seq.empty, width, qs)
      .select(col("q"), col("lo"), col("hi"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val sorted = vals.sorted
    qs.foreach { case (label, qn, qd) =>
      val k = (qn.toLong * vals.length + qd - 1) / qd
      val exact = sorted((k - 1).toInt)
      val (lo, hi) = est(label)
      assert(lo <= exact && exact < hi,
        s"$label: exact $exact outside sketch bin [$lo, $hi)")
    }
  }

  test("gk law: exact weight, rank-error bound at every q, partition-invariant, " +
    "union+compress stays bounded") {
    import graft.operators.Gk
    // heavy-tailed doubles with ties (squared small ints / 4)
    val vals = sampleN(Gen.chooseNum(0L, 300L), 2000).map(v => (v * v).toDouble / 4.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (k, buckets) = (50, 4)
    val regs = Gk.registers(df, "v", "id", Nil, k, buckets)
    val collected = regs.as[(Double, Long)].collect()
    // weight conservation is EXACT, not approximate
    assert(collected.map(_._2).sum === vals.length.toLong)
    // register count bounded by (k+1) x buckets
    assert(collected.length <= (k + 1) * buckets)

    // partition invariance: construction is a pure function of the multiset
    val reg1 = Gk.registers(df.coalesce(1), "v", "id", Nil, k, buckets)
      .as[(Double, Long)].collect().sorted
    val reg7 = Gk.registers(df.repartition(7), "v", "id", Nil, k, buckets)
      .as[(Double, Long)].collect().sorted
    assert(reg1 === reg7)

    // rank bound for EVERY 5%-step quantile at once:
    // sum_b (m_b - 1) <= n/k + buckets
    val errBound = vals.length.toLong / k + buckets
    val sorted = vals.sorted
    val qs = (1 to 20).map(i => (s"q$i", i, 20))
    Gk.estimate(regs, Nil, qs)
      .select(col("q"), col("w_total"), col("k_target"), col("est"))
      .as[(String, Long, Long, Double)].collect().foreach {
        case (label, w, kt, est) =>
          assert(w === vals.length.toLong)
          assert(vals.contains(est), s"$label: est $est is not a data value")
          // selection rule: register cum <= true cum, so true_count(<=est) >= kt
          assert(sorted.count(_ <= est) >= kt,
            s"$label: est $est sits below target rank $kt")
          // and every value below est had register cum < kt, with register
          // cum >= true cum - errBound -> true_count(<est) < kt + errBound
          assert(sorted.count(_ < est) < kt + errBound,
            s"$label: est $est overshoots rank $kt by more than $errBound")
      }

    // union of shard builds conserves weight exactly; compress re-bounds
    // size with error err1 + err2 + ceil(W/k') - 1
    val (h1, h2) = vals.zipWithIndex.partition(_._2 % 2 == 0)
    def half(xs: Seq[(Double, Int)]) = Gk.registers(
      xs.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"), "v", "id",
      Nil, k, buckets)
    val merged = half(h1).unionByName(half(h2))
    assert(merged.as[(Double, Long)].collect().map(_._2).sum === vals.length.toLong)
    val kC = 25
    val comp = Gk.compress(merged, Nil, kC)
    val compRows = comp.as[(Double, Long)].collect()
    assert(compRows.map(_._2).sum === vals.length.toLong)
    assert(compRows.length <= kC + 1)
    val errC = 2L * (vals.length / 2 / k + buckets) +
      (vals.length.toLong + kC - 1) / kC - 1
    Gk.estimate(comp, Nil, Seq(("p50", 1, 2), ("p90", 9, 10)))
      .select(col("q"), col("k_target"), col("est"))
      .as[(String, Long, Double)].collect().foreach { case (label, kt, est) =>
        assert(sorted.count(_ <= est) >= kt &&
          sorted.count(_ < est) < kt + errC,
          s"$label after union+compress: est $est outside rank window " +
            s"[$kt, ${kt + errC})")
      }
  }

  test("gk rollup laws: finest level equals plain estimate; '*' weight is the " +
    "whole corpus; non-string dims refuse") {
    import graft.operators.Gk
    val rows = sampleN(Gen.chooseNum(0L, 500L), 1500).zipWithIndex.map {
      case (v, i) =>
        (if (i % 3 == 0) "a" else "b", if (i % 2 == 0) "x" else "y",
          i.toLong, (v * v).toDouble)
    }
    val df = rows.toDF("d1", "d2", "id", "v").repartition(5)
    val regs = Gk.registers(df, "v", "id", Seq("d1", "d2"), 40, 4)
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10))
    val roll = Gk.rollupEstimate(regs, Seq("d1", "d2"), qs)
      .as[(String, String, String, Long, Long, Double)].collect()
    // finest level rows == the plain estimate, register-for-register
    val plain = Gk.estimate(regs, Seq("d1", "d2"), qs)
      .as[(String, String, String, Long, Long, Double)].collect().toSet
    assert(roll.filter(r => r._1 != "*" && r._2 != "*").toSet == plain)
    // the (*, *) level's total weight is the whole corpus, exactly
    val top = roll.filter(r => r._1 == "*" && r._2 == "*")
    assert(top.nonEmpty && top.forall(_._4 == rows.length.toLong),
      s"top-level w_total must equal n: ${top.toSeq}")
    // intermediate level (d1, *) conserves each d1 slice's weight
    val mid = roll.filter(r => r._1 != "*" && r._2 == "*")
    val byD1 = rows.groupBy(_._1).map { case (g, rs) => g -> rs.size.toLong }
    assert(mid.forall(r => r._4 == byD1(r._1)), s"mid-level weights: ${mid.toSeq}")
    // non-string dims must refuse loudly, not coerce
    val bad = rows.toDF("d1", "d2", "id", "v")
      .withColumn("d2", lit(1L))
    intercept[IllegalArgumentException] {
      Gk.rollupEstimate(Gk.registers(bad, "v", "id", Seq("d1", "d2"), 40, 4),
        Seq("d1", "d2"), qs)
    }
  }

  test("gk sliding law: windowDays=1 equals the plain per-day estimate") {
    import graft.operators.Gk
    val rows = sampleN(Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 5000L)), 800)
      .zipWithIndex.map { case ((d, v), i) => (d, i.toLong, v.toDouble) }
    val df = rows.toDF("day", "id", "v")
    val regs = Gk.registers(df, "v", "id", Seq("day"), 16, 2)
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10))
    val slid = Gk.slidingEstimate(regs, "day", 1, qs)
      .select(col("day"), col("q"), col("est"))
      .as[(Long, String, Double)].collect().toSet
    val plain = Gk.estimate(regs, Seq("day"), qs)
      .select(col("day"), col("q"), col("est"))
      .as[(Long, String, Double)].collect().toSet
    assert(slid === plain)
  }

  test("gk cdf law: percentile ppm undercounts only, within the build's rank error") {
    import graft.operators.Gk
    val vals = sampleN(Gen.chooseNum(0L, 500L), 1200).map(_.toDouble)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("g", "id", "v")
    val (k, buckets) = (50, 4)
    val regs = Gk.registers(df, "v", "id", Seq("g"), k, buckets)
    val ann = Gk.cdfPpm(regs, df, "v", Seq("g"))
      .select(col("v"), col("pctl_ppm")).as[(Double, Long)].collect()
    val n = vals.length.toLong
    val sorted = vals.sorted
    val err = n / k + buckets
    ann.foreach { case (v, ppm) =>
      val trueCnt = sorted.count(_ <= v).toLong
      assert(ppm <= trueCnt * 1000000L / n,
        s"cdf($v)=$ppm ppm overcounts true ${trueCnt * 1000000L / n}")
      assert(ppm >= (trueCnt - err) * 1000000L / n - 1,
        s"cdf($v)=$ppm ppm undershoots beyond the $err-rank error")
    }
  }

  test("gk weighted law: exact weight, weighted-rank window at every q, " +
    "all-ones weights equal the unweighted build") {
    import graft.operators.Gk
    val rows = sampleN(Gen.zip(Gen.chooseNum(0L, 400L), Gen.chooseNum(1L, 9L)), 1500)
      .zipWithIndex.map { case ((v, w), i) => (i.toLong, v.toDouble, w) }
    val df = rows.map { case (i, v, w) => (i, v, w) }.toDF("id", "v", "w")
    val (k, buckets) = (40, 4)
    val regs = Gk.weightedRegisters(df, "v", "w", "id", Nil, k, buckets)
    val totalW = rows.map(_._3).sum
    val collected = regs.as[(Double, Long)].collect()
    assert(collected.map(_._2).sum === totalW, "weighted build must conserve sum w")

    // weighted rank window: expand each value w times, same bound with
    // the per-bucket block M = ceil(W_b/k) <= W/k + 1 -> err <= W/k + buckets
    val expanded = rows.flatMap { case (_, v, w) => Seq.fill(w.toInt)(v) }.sorted
    val errBound = totalW / k + buckets
    Gk.estimate(regs, Nil, (1 to 10).map(i => (s"q$i", i, 10)))
      .select(col("q"), col("k_target"), col("est"))
      .as[(String, Long, Double)].collect().foreach { case (label, kt, est) =>
        assert(expanded.count(_ <= est) >= kt &&
          expanded.count(_ < est) < kt + errBound,
          s"$label: weighted est $est outside window [$kt, ${kt + errBound})")
      }

    // degeneration law: all weights 1 == the unweighted build, register
    // for register
    val ones = rows.map { case (i, v, _) => (i, v, 1L) }.toDF("id", "v", "w")
    val wRegs = Gk.weightedRegisters(ones, "v", "w", "id", Nil, k, buckets)
      .as[(Double, Long)].collect().sorted
    val uRegs = Gk.registers(rows.map { case (i, v, _) => (i, v) }
        .toDF("id", "v"), "v", "id", Nil, k, buckets)
      .as[(Double, Long)].collect().sorted
    assert(wRegs === uRegs)
  }

  test("gk vs exact selection: estimates sit within n/k+buckets ranks of q170's " +
    "counting-selection answers on real data") {
    import graft.operators.{Gk, Selection}
    val cents = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey") * 10 + col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long"))
      .toDF("id", "c")
    val n = cents.count()
    val (k, buckets) = (64, 8)
    val regs = Gk.registers(cents, "c", "id", Nil, k, buckets)
    val est = Gk.estimate(regs, Nil,
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      .select(col("q"), col("k_target"), col("est").cast("long"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Selection.exactQuantiles(cents, "c", Seq(50, 90, 99))
      .select(col("pct"), col("value")).as[(Int, Long)].collect().toMap
    val errBound = n / k + buckets
    Seq("p50" -> 50, "p90" -> 90, "p99" -> 99).foreach { case (label, pct) =>
      val (kt, e) = est(label)
      // exact rank window: count rows <= est vs the shared ceil-rank target
      val le = cents.filter(col("c") <= e).count()
      val lt = cents.filter(col("c") < e).count()
      assert(le >= kt && lt < kt + errBound,
        s"$label: gk est $e (exact ${exact(pct)}) outside rank window " +
          s"[$kt, ${kt + errBound}) — le=$le lt=$lt")
    }
  }

  test("domain-mix law: thresholds feasible, scarcest target saturated") {
    import graft.operators.DomainMix
    val gen = for {
      k <- Gen.chooseNum(2, 6)
      counts <- Gen.listOfN(k, Gen.chooseNum(1L, 5000L))
      weights <- Gen.listOfN(k, Gen.chooseNum(1, 10))
    } yield (counts, weights)
    sampleN(gen, 50).foreach { case (counts, weights) =>
      val cm = counts.zipWithIndex.map { case (n, i) => s"d$i" -> n }.toMap
      val tm = weights.zipWithIndex.map { case (w, i) => s"d$i" -> w.toDouble }.toMap
      val th = DomainMix.thresholds(cm, tm, buckets = 10000)
      assert(th.values.forall(v => v >= 0 && v <= 10000), s"rates must be in [0,1]: $th")
      // the binding domain's rate is t*(n/t)/n == 1 up to a few ulps; the
      // pre-floor epsilon absorbs that, so its threshold is EXACTLY the
      // full bucket range — the domain the scale math says is "kept whole"
      // really keeps every bucket
      assert(th.values.max == 10000L,
        s"the binding domain must keep everything: $th counts=$cm weights=$tm")
    }
  }

  test("temperature-mix laws: alpha=1 is identity, alpha=0 is the uniform floor") {
    import graft.operators.DomainMix
    val gen = Gen.chooseNum(2, 6).flatMap(k => Gen.listOfN(k, Gen.chooseNum(1L, 5000L)))
    sampleN(gen, 50).foreach { counts =>
      val cm = counts.zipWithIndex.map { case (n, i) => s"d$i" -> n }.toMap
      val total = cm.values.sum.toDouble
      def thAt(alpha: Double) = DomainMix.thresholds(cm,
        cm.map { case (d, n) => d -> math.pow(n / total, alpha) }, 10000)
      // alpha=1: targets == the natural distribution -> every domain's
      // rate is 1 and mixing keeps the whole corpus
      assert(thAt(1.0).values.forall(_ == 10000L),
        s"alpha=1 must keep everything: ${thAt(1.0)} counts=$cm")
      // alpha=0: uniform targets -> every domain downsamples to the
      // scarcest domain's size (the no-upsampling uniform mix). The
      // expected value mirrors thresholds' exact double op order, so the
      // comparison is ulp-stable.
      val t0 = thAt(0.0)
      val t = 1.0 / cm.size
      val scale = cm.values.map(n => n / t).min
      cm.foreach { case (d, n) =>
        val want = math.floor(math.min(1.0, t * scale / n) * 10000 + 1e-9).toLong
        assert(t0(d) == want, s"alpha=0: $d got ${t0(d)}, want $want (n=$n)")
        assert(math.abs(t0(d) - math.floor(10000.0 * cm.values.min / n)) <= 1,
          s"alpha=0 must track the scarcest-domain rate: $d -> ${t0(d)}")
      }
    }
  }
}
