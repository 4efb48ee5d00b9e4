package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2 scale notes; complements AQE's runtime skew
  * splitting with a plan-time option for *known* hot keys).
  *
  * Salted join: the skewed (big) side gets a deterministic salt in
  * [0, factor); the other side is replicated `factor` times with every salt
  * value; the join key becomes (key, salt). A key whose rows previously
  * crushed one reducer now spreads over `factor` reducers. Correctness is
  * unaffected — every left row still meets every matching right row exactly
  * once (on its own salt).
  *
  * Cost model: replicates the right side `factor` times — use when
  * |right| * factor is still far below the skewed key's row count.
  *
  * Limitations: only join types where an unmatched RIGHT row produces no
  * output are sound (its `factor` replicas would each be emitted otherwise),
  * so `joinType` is restricted to inner/left/left_semi/left_anti. And since
  * the salt is a content hash, fully identical duplicate rows of a hot key
  * share one salt and are not spread — mix in a per-partition counter
  * (mapPartitions) if that shape matters.
  */
object Skew {

  // all spellings Spark's JoinType.apply accepts for the sound types
  private val soundJoinTypes = Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor >= 2, "factor < 2 is a plain join")
    require(soundJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin is only sound for ${soundJoinTypes.mkString("/")}; " +
        s"a right/full outer join would emit each unmatched right replica ($joinType)")
    // Deterministic salt from the full row content: any distribution is
    // correct, content-hash avoids nondeterministic re-execution issues
    // (rand() would break task retry idempotence).
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(factor)).cast("int"))
    val replicated = other
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation for heavily skewed group keys whose
    * partial aggregates are themselves too hot: aggregate on (key, salt)
    * first, then merge. `partials` must be algebraic (re-aggregatable).
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
                partials: Seq[(String, Column)], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val phase1 = salted.groupBy(col(key), col("__salt"))
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }

  /** Skew diagnosis — the decision input for [[saltedJoin]]/[[saltedAgg]]:
    * per key its row share in ppm and the hot flag at `thresholdPpm`. One
    * partial-aggregated count per key plus a broadcast scalar total;
    * integer shares so the report replays exactly. Run it on the join/
    * group key BEFORE picking a plan — salting cold keys wastes a
    * shuffle, not salting hot ones loses the stage.
    */
  def skewReport(df: DataFrame, keyCol: String,
                 thresholdPpm: Long): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col(keyCol), col("n"),
        expr("n * 1000000 DIV __tot").as("share_ppm"))
      .withColumn("is_hot", col("share_ppm") > thresholdPpm)
  }
}
