package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, TimeSeries}

/** Pins the CDC merge semantics (last-writer-wins, tombstones, inserts,
  * untouched keys) and the gap-fill/interpolation contract on hand
  * fixtures small enough to assert row-by-row.
  */
class CdcTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("applyDeltas: latest delta wins, deletes remove, inserts appear, rest kept") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "payload")
    val deltas = Seq(
      // key 1: two updates out of order — seq 2 must win
      (1L, "a2", "U", 2L), (1L, "a1", "U", 1L),
      // key 2: update then delete — tombstone wins
      (2L, "b1", "U", 1L), (2L, "gone", "D", 2L),
      // key 3: delete then a LATER re-insert — the row comes back
      (3L, "gone", "D", 1L), (3L, "c2", "U", 2L),
      // key 5: insert of a key the snapshot never had
      (5L, "e", "U", 1L)
    ).toDF("id", "payload", "op", "seq")
    val got = Cdc.applyDeltas(snap, deltas, "id", Seq("seq"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a2", 3L -> "c2", 4L -> "d", 5L -> "e"),
      s"merge semantics broke: $got")
  }

  test("applyDeltas is insensitive to delta arrival order (latest-seq-wins is commutative)") {
    val snap = Seq((1L, 10L)).toDF("id", "v")
    val deltas = Seq((1L, 30L, "U", 3L), (1L, 20L, "U", 2L), (1L, 40L, "D", 1L))
    val a = Cdc.applyDeltas(snap, deltas.toDF("id", "v", "op", "seq"),
      "id", Seq("seq")).as[(Long, Long)].collect().toSeq
    val b = Cdc.applyDeltas(snap, deltas.reverse.toDF("id", "v", "op", "seq"),
      "id", Seq("seq")).as[(Long, Long)].collect().toSeq
    assert(a == Seq((1L, 30L)) && a == b)
  }

  test("gapFillInterpolate: dense grid, step fill, exact linear midpoints") {
    // key 7: observations on days 1, 4, 5 — gap days 2 and 3 interpolate
    // along the 100 -> 400 slope; day 5 closes the series
    val daily = Seq(
      (7L, ts("2024-01-01 00:00:00"), 100L),
      (7L, ts("2024-01-04 00:00:00"), 400L),
      (7L, ts("2024-01-05 00:00:00"), 150L),
      // key 8: a single observation — a one-row grid, no interpolation arms
      (8L, ts("2024-03-10 00:00:00"), 55L)
    ).toDF("k", "day", "cents")
    val got = TimeSeries.gapFillInterpolate(daily, "k", "day", "cents")
      .orderBy("k", "day")
      .select(col("k"), col("day"), col("observed"), col("ffill"), col("interp"))
      .as[(Long, Timestamp, Option[Long], Option[Long], Option[Double])]
      .collect().toSeq
    val exp = Seq(
      (7L, ts("2024-01-01 00:00:00"), Some(100L), Some(100L), Some(100.0)),
      (7L, ts("2024-01-02 00:00:00"), None, Some(100L), Some(200.0)),
      (7L, ts("2024-01-03 00:00:00"), None, Some(100L), Some(300.0)),
      (7L, ts("2024-01-04 00:00:00"), Some(400L), Some(400L), Some(400.0)),
      (7L, ts("2024-01-05 00:00:00"), Some(150L), Some(150L), Some(150.0)),
      (8L, ts("2024-03-10 00:00:00"), Some(55L), Some(55L), Some(55.0)))
    assert(got == exp, s"gap fill broke:\n$got")
  }

  test("gapFillInterpolate: non-divisible slope rounds half-up at 2 decimals") {
    // 0 -> 100 over 3 days: day 1 = 100/3 = 33.33, day 2 = 66.67
    val daily = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0L),
      (1L, ts("2024-01-04 00:00:00"), 100L)).toDF("k", "day", "cents")
    val interp = TimeSeries.gapFillInterpolate(daily, "k", "day", "cents")
      .orderBy("day").select("interp").as[Option[Double]].collect().toSeq
    assert(interp == Seq(Some(0.0), Some(33.33), Some(66.67), Some(100.0)))
  }

  test("changePoint: a planted step lands on the last pre-step day; flat series tie to day one") {
    val days = (1 to 6).map(d => ts(f"2024-02-0$d 00:00:00"))
    val step = days.zip(Seq(10L, 10L, 10L, 20L, 20L, 20L))
      .map { case (d, v) => ("step", d, v) }
    val flat = days.take(4).map(d => ("flat", d, 5L))
    val got = TimeSeries.changePoint(
        (step ++ flat).toDF("g", "day", "v").repartition(5), "g", "day", "v")
      .as[(String, Long, Long, Timestamp, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // step: S_d = |6*cum - d*90| peaks at 90 on day 3 (the last low day)
    assert(got("step") == ((6L, 90L, days(2), 90L)), s"step: ${got("step")}")
    // flat: S is 0 everywhere -> smallest day wins the tie
    assert(got("flat") == ((4L, 20L, days(0), 0L)), s"flat: ${got("flat")}")
  }

  test("binarySegment: level 1 takes the bigger planted break, level 2 the smaller") {
    // 12 days: 10,10,10,10 | 50,50,50,50 | 60,60,60,60 — the big jump
    // (10→50 after day 4) should win level 1; the small one (50→60
    // after day 8) is level 2's side-1 find
    val days = (1 to 12).map(d => ts(f"2024-03-$d%02d 00:00:00"))
    val vals = Seq.fill(4)(10L) ++ Seq.fill(4)(50L) ++ Seq.fill(4)(60L)
    val df = days.zip(vals).map { case (d, v) => ("s", d, v) }
      .toDF("g", "day", "v").repartition(4)
    val got = TimeSeries.binarySegment(df, "g", "day", "v")
      .as[(String, Long, Long, Long, Long, Timestamp, Long)].collect()
      .map(r => (r._2, r._3) -> ((r._4, r._5, r._6, r._7))).toMap
    assert(got((1L, -1L))._3 == days(3), s"level1 split: ${got((1L, -1L))}")
    // side 0 = the flat 10s: S=0 everywhere, tie to its first day
    assert(got((2L, 0L)) == ((4L, 40L, days(0), 0L)),
      s"side 0: ${got((2L, 0L))}")
    // side 1 = 50,50,50,50,60,60,60,60: split after its 4th day
    assert(got((2L, 1L))._3 == days(7), s"side 1: ${got((2L, 1L))}")
    assert(got.size == 3)
  }

  test("acf matches a driver mirror on a random series; constant series has den 0") {
    val rnd = new scala.util.Random(11)
    val vals = (1 to 40).map(_ => rnd.nextInt(500).toLong)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("g", ts(f"2024-03-${i / 24 + 1}%02d ${i % 24}%02d:00:00"), v)
    } // distinct timestamps, ordered like the index
    val sorted = rows.sortBy(_._2.getTime).map(_._3)
    val got = TimeSeries.acf(rows.toDF("g", "day", "v").repartition(7),
        "g", "day", "v", maxLag = 5)
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    val n = sorted.length.toLong
    val t = sorted.sum
    val dev = sorted.map(v => n * v - t)
    val den = dev.map(d => d * d).sum
    (1 to 5).foreach { k =>
      val num = dev.dropRight(k).zip(dev.drop(k)).map { case (a, b) => a * b }.sum
      assert(got(k.toLong) == ((num, den)), s"lag $k: ${got(k.toLong)} vs ($num, $den)")
    }
    val const = TimeSeries.acf(
        (1 to 4).map(d => ("c", ts(f"2024-04-0$d 00:00:00"), 9L))
          .toDF("g", "day", "v"), "g", "day", "v", maxLag = 2)
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(const.forall(r => r._3 == 0L && r._4 == 0L && r._5.isEmpty),
      s"constant series must have 0/0 rational and null r6: ${const.toSeq}")
  }
}
