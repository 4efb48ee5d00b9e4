package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution — char-level fuzzy matching of names/identifiers,
  * the "same real-world entity, slightly different string" problem that
  * MinHash (token-level) and SemDeDup (embedding-level) don't address.
  *
  * Blocking is the deletion neighborhood (the FastSS / SymSpell shape),
  * generalized to edit distance k: two strings within Levenshtein
  * distance k always share at least one variant in their delete-0..k
  * neighborhoods (FastSS's theorem — each side deletes the characters
  * its alignment edits), so candidates come from a self-join on the
  * variant key — O(n · len^k) variant rows and bounded groups instead of
  * the O(n²) all-pairs scan. Candidates are verified with the exact
  * integer Levenshtein distance (identical in any engine — the DP has no
  * floating point), so the oracle replays the whole pipeline.
  *
  * Scale shape: the variant explode is a narrow map (the neighborhood is
  * built by k rounds of "delete one more character from everything so
  * far", deduplicated per round); the self-join shuffles on the variant
  * key; a shared-prefix corpus can make some variants hot, which AQE's
  * skew-join handles. The per-name fan-out is bounded by a length cap
  * that SCALES WITH k (the blow-up is ~len^k/k!): the default cap is 64
  * chars at k ≤ 2 (~2k variants/name) and 32 at k = 3 (~5.5k — a 64-char
  * cap there would allow 40k+), overridable via `maxLen`; names over the
  * cap fail loudly rather than silently exploding the block index (cap
  * or pre-truncate upstream).
  */
object Entities {

  /** The k-scaled default cap (see class doc); an explicit positive
    * `maxLen` always wins.
    */
  private[graft] def effectiveMaxLen(maxDist: Int, maxLen: Int): Int =
    if (maxLen > 0) maxLen else if (maxDist >= 3) 32 else 64

  /** One side of the blocking join, pre-exploded: `(__id, __nm, __v)` —
    * one row per (name, delete-0..k variant). This is also the persisted
    * variant-index schema for continuously-running entity resolution
    * ([[graft.streaming.StreamingEntities]]): variants are written at
    * merge time, so later increments join against stored rows and history
    * is never re-exploded.
    */
  def variantSide(df: DataFrame, idCol: String, nameCol: String,
                  maxDist: Int = 1, maxLen: Int = -1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      "variantSide supports maxDist 1..3 (variant fan-out is len^k)")
    val cap = effectiveMaxLen(maxDist, maxLen)
    // length guard rides the name column itself (a separate check column
    // would be pruned as dead): any over-long name fails the scan loudly,
    // with no extra validation job. Only k >= 2 needs it — the k = 1
    // neighborhood is linear in the name length, so long names are merely
    // bigger there, not explosive. NULL names stay out of scope silently
    // (their variant array is null => zero exploded rows), as before the
    // guard existed — the isNull arm keeps them off the raise_error path.
    val guarded =
      if (maxDist <= 1) col(nameCol)
      else when(col(nameCol).isNull || length(col(nameCol)) <= cap,
          col(nameCol))
        .otherwise(raise_error(concat(
          lit(s"Entities: name longer than maxLen=$cap chars — the " +
            s"delete-$maxDist neighborhood would explode; cap or truncate " +
            "upstream: "), col(nameCol))))
    // the delete-0 variant (the string itself) is REQUIRED: an
    // insertion/deletion pair shares no same-depth variant — the shorter
    // string IS the longer one's deeper variant (FastSS's 0..k set). The
    // neighborhood accumulates k rounds of single-character deletions over
    // everything collected so far; array_distinct per round keeps the
    // blow-up at distinct-variant size (deleting positions i<j and j<i
    // collide constantly).
    val neighborhood = expr(
      s"""aggregate(sequence(1, $maxDist), array(__nm),
         |  (acc, step) -> array_distinct(concat(acc,
         |    flatten(transform(acc, v ->
         |      transform(sequence(1, length(v)), i ->
         |        concat(substring(v, 1, i - 1),
         |               substring(v, i + 1, length(v)))))))))""".stripMargin)
    df.select(col(idCol).as("__id"), guarded.as("__nm"))
      .select(col("__id"), col("__nm"), explode(neighborhood).as("__v"))
  }

  /** Pairs of ids whose names are within Levenshtein distance `maxDist`
    * (id_a < id_b, deduplicated across blocking variants).
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
                 maxDist: Int = 1, maxLen: Int = -1): DataFrame = {
    // materialize the variant table ONCE and self-join the materialization:
    // the explode is the dominant cost and can never silently run twice,
    // regardless of join strategy (broadcast at small scale picks a
    // BroadcastExchange build side that ReuseExchange would NOT fold with
    // the streamed side; sort-merge at corpus scale would reuse, but only
    // while the subtrees stay canonically equal). PlanSpec pins both join
    // sides to the same materialized RDD.
    val vars = variantSide(df, idCol, nameCol, maxDist, maxLen)
      .localCheckpoint(true)
    vars.alias("a")
      .join(vars.alias("b"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__nm").as("na"), col("b.__nm").as("nb"))
      // dedup on the id pair alone — hashing/comparing skips the string
      // payload. min() (not first()) keeps the result DETERMINISTIC even
      // if a caller violates id uniqueness and one id carries several
      // names; for well-formed input the names are functionally dependent
      // and min is the identity
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("na")).as("na"), min(col("nb")).as("nb"))
      // thresholded levenshtein: banded O(k·len) DP with early exit
      // (returns -1 above maxDist) instead of the full O(len²) table —
      // the verify step only ever needs distances <= maxDist, and on a
      // templated corpus (weak blocking) it dominates the runtime
      .withColumn("dist",
        levenshtein(col("na"), col("nb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Core of INCREMENTAL entity resolution, fed with pre-exploded variant
    * sides (the [[variantSide]] schema): pair NEW names against the
    * EXISTING corpus and against each other, never the existing corpus
    * against itself — a daily increment is a sliver of the corpus, and
    * re-exploding history every run would dominate the cost for zero
    * information. A production caller feeds `existingVars` straight from
    * a persisted variant index ([[graft.streaming.StreamingEntities]]'s
    * store, bucket-pruned to the increment's variant-key buckets), so
    * history contributes a column scan, not an explode.
    *
    * Contract: the sides' ids are DISJOINT (the streaming wrapper
    * guarantees it structurally via its replay anti-join; the batch
    * convenience wrapper checks). `newVars` is consumed three times —
    * materialize it (the wrappers do).
    *
    * Output: (new_id, peer_id, peer_is_existing, dist); new-new pairs
    * appear once with the smaller id as new_id.
    */
  def incrementalPairs(newVars: DataFrame, existingVars: DataFrame,
                       maxDist: Int = 1): DataFrame = {
    val nx = newVars.alias("a")
      .join(existingVars.alias("b"), col("a.__v") === col("b.__v"))
      .select(col("a.__id").as("new_id"), col("b.__id").as("peer_id"),
        col("a.__nm").as("na"), col("b.__nm").as("nb"),
        lit(true).as("peer_is_existing"))
    val nn = newVars.alias("a")
      .join(newVars.alias("b"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("new_id"), col("b.__id").as("peer_id"),
        col("a.__nm").as("na"), col("b.__nm").as("nb"),
        lit(false).as("peer_is_existing"))
    nx.unionByName(nn)
      // a pair can collide through many variants and the kind flag is
      // functionally dependent on the pair (disjoint sides), so max is
      // exact; min(names) is the fuzzyPairs determinism convention
      .groupBy(col("new_id"), col("peer_id"))
      .agg(min(col("na")).as("na"), min(col("nb")).as("nb"),
        max(col("peer_is_existing")).as("peer_is_existing"))
      .withColumn("dist",
        levenshtein(col("na"), col("nb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("new_id"), col("peer_id"), col("peer_is_existing"),
        col("dist"))
  }

  /** Batch convenience form of [[incrementalPairs]]: explodes both sides
    * from names (the existing side once — in production prefer the
    * persisted index) and checks the disjointness contract with a
    * broadcast probe of the (bounded, by the incremental premise) new-id
    * set — a groupBy-all-ids guard would shuffle one row per corpus name,
    * the exact old-corpus-proportional cost this mode exists to avoid.
    */
  def incrementalFuzzyPairs(newDf: DataFrame, existing: DataFrame,
                            idCol: String, nameCol: String,
                            maxDist: Int = 1, maxLen: Int = -1): DataFrame = {
    val overlap = existing
      .join(broadcast(newDf.select(col(idCol))), Seq(idCol), "left_semi")
      .count()
    require(overlap == 0,
      "incrementalFuzzyPairs: newDf and existing share ids — the sides " +
        "must be disjoint (key increments globally, e.g. date-prefixed ids)")
    val nv = variantSide(newDf, idCol, nameCol, maxDist, maxLen)
      .localCheckpoint(true)
    incrementalPairs(nv,
      variantSide(existing, idCol, nameCol, maxDist, maxLen), maxDist)
  }
}
