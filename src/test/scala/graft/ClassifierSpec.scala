package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classifier, Metrics}

/** Pins the learned-filter pair: deterministic logistic-regression
  * training, logit-boundary keep flags, and the exact Mann-Whitney AUC
  * (midrank ties, two-phase distributed ranking).
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("train is deterministic and separates a separable toy task") {
    val data = Seq(
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(0.9f, 0.1f), 1), (3L, Seq(1.1f, -0.1f), 1),
      (4L, Seq(-1.0f, 0.0f), 0), (5L, Seq(-0.9f, 0.1f), 0), (6L, Seq(-1.1f, -0.2f), 0)
    ).toDF("id", "embedding", "y")
    val a = Classifier.train(data, "id", "embedding", "y", iters = 200, lr = 1.0)
    val b = Classifier.train(data, "id", "embedding", "y", iters = 200, lr = 1.0)
    assert(a.w.toSeq == b.w.toSeq && a.b == b.b, "training must be a pure function")
    val keep = Classifier.score(data, "embedding", a)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(keep) && !Seq(4L, 5L, 6L).exists(keep),
      s"separable task must classify perfectly: $keep")
  }

  test("score: sigmoid column matches driver math (excluded from the oracle by design)") {
    val data = Seq((1L, Seq(0.5f, -0.25f), 1), (2L, Seq(-2.0f, 1.5f), 0))
      .toDF("id", "embedding", "y")
    val m = Classifier.train(data, "id", "embedding", "y", iters = 5, lr = 0.1)
    val rows = Classifier.score(data, "embedding", m)
      .select("id", "logit", "score").as[(Long, Double, Double)].collect()
    rows.foreach { case (_, logit, score) =>
      assert(score == 1.0 / (1.0 + math.exp(-logit)),
        "sigmoid must be the exact JVM math of the logit")
    }
  }

  test("auc: hand-checked midrank ties, perfect ranking, and partition independence") {
    // scores 0.9(+), 0.8(+), 0.8(-), 0.1(-): midranks 4, 2.5, 2.5, 1
    // => U = (4 + 2.5) - 2*3/2 = 3.5 => AUC = 3.5 / (2*2) = 0.875
    val tied = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.1, 0)).toDF("s", "y")
    val got = Metrics.auc(tied, "s", "y").select("auc").as[Double].head()
    assert(math.abs(got - 0.875) < 1e-12, s"midrank AUC: got $got")

    val perfect = Seq((3.0, 1), (2.0, 1), (1.0, 0), (0.5, 0)).toDF("s", "y")
    assert(Metrics.auc(perfect, "s", "y").select("auc").as[Double].head() == 1.0)

    // many partitions, many ties: equals the single-threaded formula
    val rows = (0 until 400).map { i =>
      val s = (i * 7919 % 23).toDouble // heavy ties
      val y = if ((i * 104729) % 31 < 13) 1 else 0
      (s, y)
    }
    val df = rows.toDF("s", "y").repartition(16)
    val got2 = Metrics.auc(df, "s", "y").select("auc").as[Double].head()
    // driver mirror with midranks
    val byS = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var c = 0L; var s2 = 0L
    byS.foreach { case (_, g) =>
      val n = g.size.toLong; val np = g.count(_._2 == 1).toLong
      s2 += np * (2 * c + n + 1); c += n
    }
    val p = rows.count(_._2 == 1).toLong
    val nn = rows.size - p
    val want = (s2 - p * (p + 1)).toDouble / 2.0 / (p.toDouble * nn)
    assert(got2 == want, s"partitioned AUC $got2 != driver mirror $want")
  }

  test("ksStatistic equals the brute-force max-cdf-gap with smallest-value tie, " +
    "partition-independent") {
    val as_ = (0 until 300).map(i => (i * 7919 % 40).toLong)
    val bs = (0 until 200).map(i => (i * 104729 % 40 + 5).toLong)
    val got = Metrics.ksStatistic(
        as_.map(Tuple1(_)).toDF("v").repartition(11),
        bs.map(Tuple1(_)).toDF("v").repartition(3), "v")
      .select("n_a", "n_b", "ks_num", "at_value")
      .as[(Long, Long, Long, Long)].head()
    val (na, nb) = (as_.length.toLong, bs.length.toLong)
    val allV = (as_ ++ bs).distinct.sorted
    val cands = allV.map { v =>
      (math.abs(nb * as_.count(_ <= v) - na * bs.count(_ <= v)), v)
    }
    val mx = cands.map(_._1).max
    val atV = cands.filter(_._1 == mx).map(_._2).min
    assert(got === ((na, nb, mx, atV)))
    // identical under a different physical layout
    val again = Metrics.ksStatistic(
        as_.map(Tuple1(_)).toDF("v").coalesce(1),
        bs.map(Tuple1(_)).toDF("v").coalesce(1), "v")
      .select("n_a", "n_b", "ks_num", "at_value")
      .as[(Long, Long, Long, Long)].head()
    assert(again === got)
  }


  test("ksByGroup matches per-group brute force; one-sided groups dropped") {
    val rows = (0 until 500).map { i =>
      val g = "g" + (i % 3)
      val isA = i % 2 == 0
      (g, isA, ((i * 7919) % 35).toLong)
    } ++ Seq(("solo", true, 1L)) // one-sided group must be dropped
    val got = Metrics.ksByGroup(rows.toDF("g", "is_a", "v").repartition(7),
        "g", "is_a", "v")
      .select("g", "n_a", "n_b", "ks_num", "at_value")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(!got.contains("solo"))
    rows.filter(_._1 != "solo").groupBy(_._1).foreach { case (g, xs) =>
      val as_ = xs.filter(_._2).map(_._3)
      val bs = xs.filterNot(_._2).map(_._3)
      val (na, nb) = (as_.length.toLong, bs.length.toLong)
      val cands = (as_ ++ bs).distinct.sorted.map { v =>
        (math.abs(nb * as_.count(_ <= v) - na * bs.count(_ <= v)), v)
      }
      val mx = cands.map(_._1).max
      assert(got(g) === ((na, nb, mx, cands.filter(_._1 == mx).map(_._2).min)))
    }
  }

}
