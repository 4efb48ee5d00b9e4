package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov-chain (removal-effect) attribution — the data-driven
  * alternative to q147's positional rules: model each user journey as a
  * first-order chain over touch states plus START/CONV/NULL, then credit
  * each channel by how much the chain's conversion probability DROPS
  * when that channel is removed (Anderl et al.'s removal effect).
  *
  * Journey contract: events per user ordered by `(ts, tie)`; the journey
  * ends at the FIRST conversion event (mapped to the absorbing CONV
  * state — later events are ignored) or, if the user never converts, at
  * their last event with a final transition to the absorbing NULL state;
  * START precedes every user's first event.
  *
  * Determinism: transition probabilities and all absorption arithmetic
  * are integer ppm with floored division; conversion probabilities come
  * from `iters` fixed value-iteration rounds (p_CONV ≡ 10⁶, p_NULL ≡ 0,
  * p_i ← Σ_j n_ij·p_j div row_i), removal of channel c forces p_c ≡ 0 —
  * every step replays in a recursive-CTE oracle, no linear solver whose
  * float pivoting no two engines share.
  *
  * Scale shape: the distributed work is the journey scan — two window
  * passes and one grouped count, shuffle ∝ events. The transition
  * matrix is at most (distinct states + 3)² rows — a BOUNDED driver
  * artifact (the codebook/vocab discipline, enforced by a loud
  * `require` at 64 states); the value iteration over it is
  * driver-side exact-integer arithmetic on that bounded matrix,
  * (channels+1)·iters·|matrix| ops, microseconds at any data scale.
  */
object Attribution {

  /** Returns one row per touch channel:
    * `(channel, p_full_ppm, p_removed_ppm, removal_ppm, share_ppm)` —
    * full-chain conversion probability from START, the same with the
    * channel removed, their (clamped) difference, and the channel's
    * normalized share of all removal effects.
    */
  def markovRemoval(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, stateCol: String, convState: String,
                    iters: Int = 30, maxStates: Int = 64): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = events.sparkSession
    val w = Window.partitionBy(col("u")).orderBy(col("ts0"), col("tie0"))
    val r = events.select(col(userCol).as("u"), col(tsCol).as("ts0"),
        col(tieCol).as("tie0"), col(stateCol).as("st"))
      .withColumn("rn", row_number().over(w).cast("long"))
    // in-band sentinel guard: START/CONV/NULL are absorbing-state markers
    // INJECTED by this operator — a real channel carrying one of those
    // names would silently merge with its absorbing state (a channel
    // literally named "NULL" would absorb every non-converting journey's
    // exit credit). convState itself maps to CONV by contract, so "CONV"
    // is only forbidden when it isn't the declared conversion state.
    val sentinelPred =
      if (convState == "CONV") col("st").isin("START", "NULL")
      else col("st").isin("START", "NULL", "CONV")
    require(r.filter(sentinelPred).isEmpty,
      "markovRemoval: state column contains a reserved sentinel name " +
        "(START/CONV/NULL) — rename or namespace real channels")
    val fp = r.filter(col("st") === convState)
      .groupBy(col("u")).agg(min(col("rn")).as("fprn"))
    val kept = r.join(fp, Seq("u"), "left")
      .filter(col("fprn").isNull || col("rn") <= col("fprn"))
      .select(col("u"), col("rn"),
        when(col("st") === convState, lit("CONV")).otherwise(col("st"))
          .as("st"))
    val wk = Window.partitionBy(col("u")).orderBy(col("rn"))
    val wkd = Window.partitionBy(col("u")).orderBy(col("rn").desc)
    val consec = kept.withColumn("j", lead(col("st"), 1).over(wk))
      .filter(col("j").isNotNull)
      .select(col("st").as("i"), col("j"))
    val starts = kept.withColumn("rr", row_number().over(wk))
      .filter(col("rr") === 1)
      .select(lit("START").as("i"), col("st").as("j"))
    val ends = kept.withColumn("rr", row_number().over(wkd))
      .filter(col("rr") === 1 && col("st") =!= "CONV")
      .select(col("st").as("i"), lit("NULL").as("j"))
    // persisted across the two actions below (guard count + collect) so
    // the heavy journey pipeline — two window passes, join, three-way
    // union, aggregate — runs ONCE, not once per action
    val m = consec.unionByName(starts).unionByName(ends)
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
      .persist()
    val (rows, states) = try {
      // bounded driver artifact: (states+3)^2 rows at most — but PROVE
      // the bound DISTRIBUTED before collecting, or a high-cardinality
      // state column would pull the full matrix onto the driver just to
      // fail the require (the guard must run before the risk it guards
      // against)
      val nStates = m.select(col("i").as("s"))
        .unionByName(m.select(col("j").as("s"))).distinct().count()
      require(nStates <= maxStates,
        s"markovRemoval: $nStates states exceeds maxStates=$maxStates")
      val rs = m.collect().map(r0 =>
        (r0.getString(0), r0.getString(1), r0.getLong(2)))
      (rs, (rs.map(_._1) ++ rs.map(_._2)).distinct)
    } finally m.unpersist(false)
    val rowTot = rows.groupBy(_._1).map { case (i, rs) => i -> rs.map(_._3).sum }
    val channels = rows.map(_._1).distinct.filter(_ != "START").sorted

    // exact integer value iteration, p in ppm; CONV/NULL absorbing
    def converge(removed: Option[String]): Long = {
      var p = states.map(s => s -> (if (s == "CONV") 1000000L else 0L)).toMap
      val byI = rows.groupBy(_._1)
      var k = 0
      while (k < iters) {
        p = states.map { s =>
          val v =
            if (s == "CONV") 1000000L
            else if (s == "NULL") 0L
            else if (removed.contains(s)) 0L
            else byI.get(s) match {
              case Some(out) =>
                out.map { case (_, j, n) =>
                  n * (if (removed.contains(j)) 0L else p(j))
                }.sum / rowTot(s)
              case None => 0L
            }
          s -> v
        }.toMap
        k += 1
      }
      p.getOrElse("START", 0L)
    }

    val pFull = converge(None)
    val eff = channels.map { c =>
      val pr = converge(Some(c))
      (c, pFull, pr, math.max(pFull - pr, 0L))
    }
    val tot = eff.map(_._4).sum
    val out = eff.map { case (c, pf, pr, rem) =>
      Row(c, pf, pr, rem, if (tot > 0) rem * 1000000L / tot else 0L)
    }
    val schema = StructType(Seq(
      StructField("channel", StringType), StructField("p_full_ppm", LongType),
      StructField("p_removed_ppm", LongType),
      StructField("removal_ppm", LongType), StructField("share_ppm", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), schema)
  }
}
