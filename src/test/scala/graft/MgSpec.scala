package graft

import org.apache.spark.sql.functions._

import graft.operators.Mg

/** Misra–Gries: the three published invariants hold — under several
  * physical partitionings, since only the GUARANTEES (not the counters)
  * are order-free — per group and globally, on a zipf-ish multiset.
  */
class MgSlidingSpec extends SparkSpec {
  import spark.implicits._

  test("slidingSupport equals the direct exact windowed threshold computation") {
    // 10 days, a planted heavy value on days 4-8, background noise
    val rows = (1 to 10).flatMap { d =>
      val day = java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, d))
      val heavy = if (d >= 4 && d <= 8) Seq.fill(20)(("hot", day)) else Nil
      val noise = (1 to 10).map(i => (s"v$i", day))
      heavy ++ noise
    }
    val df = rows.toDF("value", "day").repartition(5)
    val got = graft.operators.Mg.slidingSupport(df, "value", "day",
        windowDays = 3, k = 4)
      .as[(java.sql.Date, String, Long, Long, Long)].collect().toSet

    // brute force: exact trailing-3-day counts vs W div 5 + 1
    val byDay = rows.groupBy(_._2)
    val days = byDay.keys.toSeq.sortBy(_.toLocalDate.toEpochDay)
    val expect = days.flatMap { t =>
      val win = days.filter(d =>
        !d.after(t) && d.toLocalDate.isAfter(t.toLocalDate.minusDays(3)))
      val counts = win.flatMap(byDay).groupBy(_._1)
        .map { case (v, rs) => v -> rs.size.toLong }
      val w = counts.values.sum
      val thr = w / 5 + 1
      counts.filter(_._2 >= thr).map { case (v, c) => (t, v, c, w, thr) }
    }.toSet
    assert(got == expect, s"got ${got.toSeq.sortBy(_._1.toString)}\n" +
      s"want ${expect.toSeq.sortBy(_._1.toString)}")
    assert(expect.exists(_._2 == "hot"), "fixture must surface the hot value")
  }
}

class MgSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: value j appears ~3000/(j+1) times, two groups with
  // different skews
  private val rows: Seq[(String, String)] = (0 until 60).flatMap { j =>
    Seq.fill(3000 / (j + 1))(("a", s"v$j"))
  } ++ (0 until 40).flatMap { j =>
    Seq.fill(1000 / (j * j + 1))(("b", s"w$j"))
  }

  test("MG invariants per group: size <= k, undercount only, bounded error, " +
    "no false negatives above N/(k+1) — for any partitioning") {
    val k = 16
    val exact = rows.groupBy(identity).map { case ((g, v), xs) =>
      (g, v) -> xs.size.toLong
    }
    val nByG = rows.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }

    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val summ = Mg.summary(df, "v", Seq("g"), k)
        .as[(String, String, Long)].collect()
      val byG = summ.groupBy(_._1)
      nByG.foreach { case (g, n) =>
        val counters = byG.getOrElse(g, Array.empty).map(r => r._2 -> r._3).toMap
        assert(counters.size <= k, s"parts=$parts g=$g: more than $k counters")
        // never overcount
        counters.foreach { case (v, c) =>
          assert(c <= exact((g, v)), s"parts=$parts $g/$v: c=$c > f=${exact((g, v))}")
          assert(c > 0L)
        }
        // error bound: f_v - c_v <= (N - sum c)/(k+1), for EVERY value
        val d = (n - counters.values.sum) / (k + 1)
        exact.filter(_._1._1 == g).foreach { case ((_, v), f) =>
          val c = counters.getOrElse(v, 0L)
          assert(f - c <= d, s"parts=$parts $g/$v: f=$f c=$c exceeds bound $d")
        }
        // no false negatives above the support bound
        exact.filter { case ((gg, _), f) => gg == g && f * (k + 1) > n }
          .foreach { case ((_, v), f) =>
            assert(counters.contains(v),
              s"parts=$parts $g/$v (f=$f > N/(k+1)=${n / (k + 1)}) missing")
          }
      }
    }
  }

  test("streaming shards fold by the merge law: invariants and support set " +
    "survive any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 12
    val vals = rows.map(_._2)
    val n = vals.length.toLong
    val exact = vals.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val tmp = java.nio.file.Files.createTempDirectory("mg_stream_").toString
    val input = MemoryStream[String]
    // three uneven microbatches over one checkpoint
    Seq(vals.take(500), vals.slice(500, 3000), vals.drop(3000)).foreach { b =>
      input.addData(b)
      Mg.streamingSummary(input.toDF().toDF("v"), "v", Nil,
        s"$tmp/shards", s"$tmp/ckpt", k)
    }
    val merged = Mg.readMergedSummary(spark, s"$tmp/shards", Nil, k)
      .as[(String, Long)].collect().toMap
    assert(merged.size <= k)
    merged.foreach { case (v, c) => assert(c <= exact(v) && c > 0L) }
    val d = (n - merged.values.sum) / (k + 1)
    exact.foreach { case (v, f) =>
      assert(f - merged.getOrElse(v, 0L) <= d,
        s"$v: f=$f c=${merged.getOrElse(v, 0L)} exceeds merged bound $d")
    }
    val support = exact.filter { case (_, f) => f * (k + 1) > n }.keySet
    assert(support.nonEmpty && support.subsetOf(merged.keySet),
      s"support ${support -- merged.keySet} escaped the streamed summary")
  }

  test("ungrouped summary: same invariants, support set recoverable exactly") {
    val k = 8
    val vals = rows.map(_._2)
    val n = vals.length.toLong
    val exact = vals.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val df = vals.map(Tuple1(_)).toDF("v").repartition(5)
    val summ = Mg.summary(df, "v", Nil, k)
      .as[(String, Long)].collect().toMap
    assert(summ.size <= k)
    summ.foreach { case (v, c) => assert(c <= exact(v) && c > 0L) }
    val support = exact.filter { case (_, f) => f * (k + 1) > n }.keySet
    assert(support.nonEmpty, "fixture must have heavy hitters")
    assert(support.subsetOf(summ.keySet),
      s"support set ${support -- summ.keySet} escaped the summary")
  }
}
