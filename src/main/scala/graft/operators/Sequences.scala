package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining over per-key ordered streams: the first-order
  * Markov transition matrix ("after a view, what comes next?") and
  * frequent contiguous n-grams ("the top click-paths") — the two
  * sequence summaries a behavioral warehouse serves daily.
  *
  * Both are ONE window pass over key-partitioned data (`lead` per
  * following position) plus one grouped count — never a self-join of the
  * event table against itself per lag/position (the q210 skip-gram and
  * q236 ACF discipline). Order within a key is total: ties on the
  * timestamp break on `tieCol`, so the lead chain — and therefore every
  * count — is deterministic and replays in any engine.
  *
  * Scale shape: windows are per-key (bounded by one user's history,
  * never a global sort); the transition/gram count is a hash aggregate
  * with map-side partials, shuffle ∝ distinct (state, next) pairs —
  * states² at worst, tiny next to the event table. Probabilities are
  * exact integer ppm via cross-free floor division (counts are
  * non-negative, so `div` agrees with any engine's integer division).
  */
object Sequences {

  /** First-order transition counts and probabilities. One row per
    * observed `(from_state, to_state)`: `n` transitions, `row_n` the
    * from-state's total outgoing transitions, `p_ppm = n·10⁶ div row_n`,
    * and `rnk` the 1-based rank of this successor among the from-state's
    * successors (by n desc, then to_state — deterministic). The last
    * event of each key has no successor and contributes nothing.
    */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(tsCol), col(tieCol),
        col(stateCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_state"))
    val wr = Window.partitionBy(col("from_state"))
      .orderBy(col("n").desc, col("to_state"))
    counts
      .withColumn("row_n", sum(col("n")).over(wf))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .select(col("from_state"), col("to_state"), col("n"), col("row_n"),
        expr("(n * 1000000) div row_n").as("p_ppm"), col("rnk"))
  }

  /** Frequent CONTIGUOUS n-grams of states per key order: `gram` is the
    * `>`-joined state path (length `n`), counted once per occurrence
    * (overlapping occurrences each count), kept at `minSupport`. A key
    * with fewer than `n` events contributes nothing. `n` is the gram
    * length (2..8 — windows carry n−1 leads, so the cap is a sanity
    * bound, not a scale limit).
    */
  def frequentNgrams(events: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, stateCol: String, n: Int,
                     minSupport: Long): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in 2..8, got $n")
    require(minSupport >= 1, s"minSupport must be positive, got $minSupport")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val withLeads = (1 until n).foldLeft(
      events.select(col(keyCol), col(tsCol), col(tieCol),
        col(stateCol).as("__s0"))) { (df, i) =>
      df.withColumn(s"__s$i", lead(col("__s0"), i).over(w))
    }
    val parts = (0 until n).map(i => col(s"__s$i"))
    withLeads
      .filter(parts.map(_.isNotNull).reduce(_ && _))
      .select(concat_ws(">", parts: _*).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minSupport)
  }
}
