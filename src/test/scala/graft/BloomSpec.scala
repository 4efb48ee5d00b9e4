package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Pins the Bloom semi-join reduction contract: no false negatives (the
  * reduced join equals the plain join row-for-row), shard mergeability,
  * and the scale shape — the probe side is pruned by a pure expression,
  * never an exchange or a join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val m = 1024
  private val k = 3

  test("no false negatives: every dim key passes, reduced join equals plain join") {
    val dim = Seq((2L, "x"), (5L, "y"), (9L, "z")).toDF("k", "d")
    val fact = Seq((1L, 10L), (2L, 20L), (5L, 50L), (7L, 70L), (9L, 90L))
      .toDF("k", "v")
    val words = Bloom.bitWords(Bloom.positions(dim, "k", m, k), m)
    // every dim key must pass its own filter
    val dimPass = dim.filter(Bloom.mightContain(words, col("k"), m, k)).count()
    assert(dimPass == 3, "a dim key failed its own filter: false negative")
    val reduced = Bloom.reduce(fact, dim, "k", m, k)
    val a = reduced.join(dim, Seq("k")).orderBy(col("k"))
      .as[(Long, Long, String)].collect().toSeq
    val b = fact.join(dim, Seq("k")).orderBy(col("k"))
      .as[(Long, Long, String)].collect().toSeq
    assert(a == b && a.map(_._1) == Seq(2L, 5L, 9L),
      s"reduced join must equal plain join: $a vs $b")
  }

  test("filters over dim shards merge by union-distinct of positions") {
    val shardA = Seq(1L, 2L, 3L).toDF("k")
    val shardB = Seq(3L, 4L).toDF("k")
    val whole = shardA.unionByName(shardB)
    val merged = Bloom.positions(shardA, "k", m, k)
      .unionByName(Bloom.positions(shardB, "k", m, k)).distinct()
      .as[Long].collect().toSet
    val direct = Bloom.positions(whole, "k", m, k).as[Long].collect().toSet
    assert(merged == direct, "sharded filters must merge to the whole-set filter")
  }

  test("the pruned probe side is expression-only: no exchange, no join in its plan") {
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("k"))
    val dim = Seq(1L, 3L, 5L).toDF("k")
    val words = Bloom.bitWords(Bloom.positions(dim, "k", m, k), m)
    val pass = fact.filter(Bloom.mightContain(words, col("k"), m, k))
    val p = pass.queryExecution.executedPlan
    assert(p.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "bloom probe must not shuffle the fact side")
    assert(p.collect {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec => j
    }.isEmpty, "bloom probe must not be planned as a join")
    assert(pass.count() > 0)
  }

  test("posLocal/mightContainLocal are position-for-position identical " +
    "to the aggregated side — the planner's driver-side bloom test") {
    val m = 4096
    val k = 3
    // strings, integrals-as-strings, negatives, non-ASCII: all render
    // exactly as cast-to-string did on the aggregated side
    val vals = Seq("0", "42", "-7", "hello", "ümlaut", "1994-01-10")
    vals.foreach { v =>
      val agg = Bloom.positions(Seq(v).toDF("key"), "key", m, k)
        .collect().map(_.getLong(0)).toSet
      val loc = (0 until k).map(i => Bloom.posLocal(i, v, m)).toSet
      assert(agg == loc, s"position parity for '$v': agg=$agg loc=$loc")
    }
    // long-typed dim: cast-to-string is the decimal rendering
    val aggL = Bloom.positions(Seq(42L).toDF("key"), "key", m, k)
      .collect().map(_.getLong(0)).toSet
    assert(aggL == (0 until k).map(i => Bloom.posLocal(i, "42", m)).toSet)
    // membership over packed words: inserted values pass, an absent one
    // fails (md5 is deterministic, so this is a fixed outcome, not luck)
    val words = Bloom.bitWords(
      Bloom.positions(vals.toDF("key"), "key", m, k), m)
    vals.foreach(v =>
      assert(Bloom.mightContainLocal(words, v, m, k), s"'$v' must pass"))
    assert(!Bloom.mightContainLocal(words, "absent-value", m, k))
  }

  test("BloomKm (the injected runtime-filter probe): no false " +
    "negatives by construction, sane FP rate, executor probe equals " +
    "the driver twin, and non-power-of-two m refuses") {
    import graft.operators.BloomKm
    val (m, k) = (4096, 5)
    val members = (0 until 200).map(i => s"key-$i")
    val words = new Array[Long](m / 64)
    members.foreach(s => BloomKm.setBits(words, s, m, k))
    // fold and probe are ONE code path: every member passes, always
    members.foreach(s =>
      assert(BloomKm.mightContain(words, s, m, k), s"'$s' must pass"))
    // FP sanity at m = 20.5·n, k = 5: expect a few percent, not a sieve
    val fps = (0 until 2000).count(i =>
      BloomKm.mightContain(words, s"absent-$i", m, k))
    assert(fps < 200, s"false-positive rate out of band: $fps / 2000")
    // the executor-side probe (UTF8String + ArrayData, what the
    // StaticInvoke calls) decides identically to the driver twin
    val arr = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(words)
    (members.take(20) ++ (0 until 20).map(i => s"absent-$i")).foreach { s =>
      assert(BloomKm.probe(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        arr, m, k) == BloomKm.mightContain(words, s, m, k),
        s"probe/twin disagreement on '$s'")
    }
    // m must be a power of two (the mask arithmetic relies on it)
    intercept[IllegalArgumentException] {
      BloomKm.setBits(new Array[Long](3), "x", 192, k)
    }
  }
}
