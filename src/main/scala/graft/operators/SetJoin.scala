package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — the
  * AllPairs/PPJoin shape (Bayardo et al.) that removes q52's block cap:
  * instead of an O(n²) cross join, each set is sorted by a global
  * rarest-first token order and only its PREFIX (the |d| - ceil(t·|d|) + 1
  * rarest tokens) is indexed; two sets with Jaccard >= t MUST share a
  * prefix token (pigeonhole on the (1-t)·|∪| tokens a pair may miss), so
  * an equi-join on prefix tokens finds every qualifying pair — no false
  * negatives by construction, which is exactly what the q155 oracle
  * (an independent brute-force threshold join) proves.
  *
  * Every similarity decision is integer arithmetic: the threshold is a
  * rational tNum/tDen and J >= t is tested as tDen·|∩| >= tNum·|∪|, so
  * the keep set replays bit-identically in any engine. The prefix-order
  * tie-break never needs to be portable — ANY total order satisfies the
  * theorem, and the verified output is order-independent.
  *
  * Scale shape: one explode + token-keyed df aggregate (shuffle ∝
  * distinct tokens), one token-keyed rank join-back, one per-set sort
  * (bounded by set size), then an equi-join on PREFIX tokens only —
  * candidate work ∝ Σ prefix co-occurrence, which the rarest-first order
  * minimizes — a pair-keyed distinct, and two join-backs for the exact
  * verify. The length filter tDen·min >= tNum·max prunes candidates
  * before the verify; AQE handles residual hot prefix tokens.
  */
object SetJoin {

  /** All pairs (id_a < id_b) with Jaccard(toksCol_a, toksCol_b) >=
    * tNum/tDen, returned with the exact integer |∩| and |∪|.
    */
  def allPairs(sets: DataFrame, idCol: String, toksCol: String,
               tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"need 0 < tNum/tDen <= 1, got $tNum/$tDen")
    val base = sets
      .select(col(idCol).as("__id"), array_distinct(col(toksCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
    val tokDf = base.select(explode(col("__tk")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    // per-set tokens in global (df, token) order; prefix keeps the rarest
    // |d| - ceil(t|d|) + 1 — the most selective index keys
    val ordered = base.select(col("__id"), explode(col("__tk")).as("t"))
      .join(tokDf, Seq("t"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("t")))).as("st"))
      .select(col("__id"), col("st"), size(col("st")).cast("long").as("len"))
      .withColumn("plen",
        col("len") - call_function("div",
          col("len") * tNum + (tDen - 1), lit(tDen.toLong)) + 1L)
    // a candidate needs a SHARED prefix token, and a shared token has
    // df >= 2 — so df=1 prefix entries (the bulk, since the prefix keeps
    // each set's rarest tokens) can be dropped from BOTH sides losslessly
    val pref = ordered
      .select(col("__id"), col("len"),
        explode(slice(col("st"), lit(1), col("plen").cast("int"))).as("s"))
      .filter(col("s.df") >= 2L)
      .select(col("__id"), col("len"), col("s.t").as("t"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.t") === col("b.t") && col("a.__id") < col("b.__id") &&
          col("a.len") * tDen >= col("b.len") * tNum &&
          col("b.len") * tDen >= col("a.len") * tNum)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    // verify arrays come straight from `base`, string-sorted — a NARROW,
    // join-free pipeline (scan + tokenize + array_sort), so deriving them
    // for the two join-backs never replays the df-join/collect/sort
    // machinery above; the fused merge-count kernel then does at most
    // |a|+|b| binary string compares per pair with zero allocation.
    // `size(array_intersect)` + `size(array_union)` instead hash every
    // element of BOTH arrays twice and allocate both result arrays — with
    // ~310k candidates for 256 real pairs at sf0.1 that hashing was the
    // query's dominant cost; |∪| now follows free by inclusion–exclusion
    // on the duplicate-free inputs.
    val side = base.select(col("__id"), array_sort(col("__tk")).as("tks"))
    cand
      .join(side.select(col("__id").as("id_a"), col("tks").as("ta")), Seq("id_a"))
      .join(side.select(col("__id").as("id_b"), col("tks").as("tb")), Seq("id_b"))
      .withColumn("isect",
        graft.expressions.SortedIntersectCount(col("ta"), col("tb")))
      .withColumn("uni",
        size(col("ta")).cast("long") + size(col("tb")).cast("long") - col("isect"))
      .filter(col("isect") * tDen >= col("uni") * tNum)
      .select(col("id_a"), col("id_b"), col("isect"), col("uni"))
  }

  /** Bipartite (R–S) variant: every (left, right) pair with
    * Jaccard >= tNum/tDen — the symmetric two-corpus similarity query
    * (corpus vs a reference corpus; for the asymmetric decontamination
    * predicate |L∩R|/|L| see [[bipartiteContainment]]). Same machinery
    * as [[allPairs]] with the two-corpus refinements:
    *
    *  - the global rarest-first token order comes from the df over the
    *    UNION of both corpora (the prefix theorem needs one COMMON total
    *    order; any works, so the union df is both valid and the most
    *    selective);
    *  - the df=1 drop strengthens to a cross-presence drop: a candidate
    *    shares a prefix token ACROSS corpora, so prefix entries for
    *    tokens absent from the other side are dropped losslessly from
    *    each side — typically the bulk, since reference sets share few
    *    rare tokens with the corpus;
    *  - no id ordering between sides (ids may even collide across
    *    corpora); the pair key is (id_l, id_r).
    */
  def bipartite(left: DataFrame, leftId: String,
                right: DataFrame, rightId: String, toksCol: String,
                tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"need 0 < tNum/tDen <= 1, got $tNum/$tDen")
    def base(df: DataFrame, id: String) = df
      .select(col(id).as("__id"), array_distinct(col(toksCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
    val bl = base(left, leftId)
    val br = base(right, rightId)
    val tokDf = bl.select(explode(col("__tk")).as("t"), lit(1L).as("__s"))
      .unionByName(br.select(explode(col("__tk")).as("t"), lit(2L).as("__s")))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("df"),
        sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("dfl"),
        sum(when(col("__s") === 2L, 1L).otherwise(0L)).as("dfr"))
    def prefix(b: DataFrame, needOther: String) = b
      .select(col("__id"), explode(col("__tk")).as("t"))
      .join(tokDf, Seq("t"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("t"),
        col(needOther)))).as("st"))
      .select(col("__id"), col("st"), size(col("st")).cast("long").as("len"))
      .withColumn("plen",
        col("len") - call_function("div",
          col("len") * tNum + (tDen - 1), lit(tDen.toLong)) + 1L)
      .select(col("__id"), col("len"),
        explode(slice(col("st"), lit(1), col("plen").cast("int"))).as("s"))
      .filter(col(s"s.$needOther") >= 1L) // token must exist on the other side
      .select(col("__id"), col("len"), col("s.t").as("t"))
    val cand = prefix(bl, "dfr").as("a").join(prefix(br, "dfl").as("b"),
        col("a.t") === col("b.t") &&
          col("a.len") * tDen >= col("b.len") * tNum &&
          col("b.len") * tDen >= col("a.len") * tNum)
      .select(col("a.__id").as("id_l"), col("b.__id").as("id_r"))
      .distinct()
    val sl = bl.select(col("__id").as("id_l"), array_sort(col("__tk")).as("ta"))
    val sr = br.select(col("__id").as("id_r"), array_sort(col("__tk")).as("tb"))
    cand
      .join(sl, Seq("id_l"))
      .join(sr, Seq("id_r"))
      .withColumn("isect",
        graft.expressions.SortedIntersectCount(col("ta"), col("tb")))
      .withColumn("uni",
        size(col("ta")).cast("long") + size(col("tb")).cast("long") - col("isect"))
      .filter(col("isect") * tDen >= col("uni") * tNum)
      .select(col("id_l"), col("id_r"), col("isect"), col("uni"))
  }

  /** ASYMMETRIC containment variant of [[bipartite]]: every (left, right)
    * pair with |L∩R| / |L| >= tNum/tDen — the set-level decontamination
    * predicate ("this corpus doc is mostly contained in some reference
    * doc"), where Jaccard under-fires when the reference side is much
    * larger (a 20-shingle doc fully inside a 500-shingle reference has
    * J ≈ 0.04 but containment 1.0).
    *
    * Prefix theorem, containment form: |L∩R| >= ceil(t·|L|) means L may
    * miss at most |L| - ceil(t·|L|) of its tokens from R, so L's prefix
    * of the |L| - ceil(t·|L|) + 1 RAREST tokens (union-df order, as in
    * [[bipartite]]) must contain a shared token — the prefix cut applies
    * to the CONTAINED side only. The containing side gets NO prefix: the
    * required overlap depends only on |L|, which is unknown at R's index
    * time and can be arbitrarily small, so R expands fully — but the
    * cross-presence drop still applies losslessly on both sides (a
    * shared token exists on both), and R's expansion joins only against
    * L's rare prefix tokens, so candidate work stays ∝ Σ prefix
    * co-occurrence, not |R|·|L|. Length filter: |R|·tDen >= |L|·tNum
    * (the overlap can't exceed |R|); there is no upper bound on |R| by
    * construction. Verification is the same fused integer kernel:
    * keep iff isect·tDen >= len_l·tNum — bit-exact in any engine.
    */
  def bipartiteContainment(left: DataFrame, leftId: String,
                           right: DataFrame, rightId: String, toksCol: String,
                           tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"need 0 < tNum/tDen <= 1, got $tNum/$tDen")
    def base(df: DataFrame, id: String) = df
      .select(col(id).as("__id"), array_distinct(col(toksCol)).as("__tk"))
      .filter(size(col("__tk")) > 0)
    val bl = base(left, leftId)
    val br = base(right, rightId)
    val tokDf = bl.select(explode(col("__tk")).as("t"), lit(1L).as("__s"))
      .unionByName(br.select(explode(col("__tk")).as("t"), lit(2L).as("__s")))
      .groupBy(col("t"))
      .agg(sum(when(col("__s") === 1L, 1L).otherwise(0L)).as("dfl"),
        sum(when(col("__s") === 2L, 1L).otherwise(0L)).as("dfr"),
        count(lit(1)).as("df"))
    // contained side: rarest-first prefix, entries for tokens absent from
    // the reference dropped losslessly
    val prefL = bl
      .select(col("__id"), explode(col("__tk")).as("t"))
      .join(tokDf, Seq("t"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("df"), col("t"), col("dfr"))))
        .as("st"))
      .select(col("__id"), col("st"), size(col("st")).cast("long").as("len"))
      .withColumn("plen",
        col("len") - call_function("div",
          col("len") * tNum + (tDen - 1), lit(tDen.toLong)) + 1L)
      .select(col("__id"), col("len"),
        explode(slice(col("st"), lit(1), col("plen").cast("int"))).as("s"))
      .filter(col("s.dfr") >= 1L)
      .select(col("__id"), col("len"), col("s.t").as("t"))
    // containing side: full expansion (no prefix bound exists), tokens
    // absent from the left dropped losslessly before the join
    val fullR = br
      .select(col("__id"), size(col("__tk")).cast("long").as("len"),
        explode(col("__tk")).as("t"))
      .join(tokDf.filter(col("dfl") >= 1L).select(col("t")), Seq("t"))
    val cand = prefL.as("a").join(fullR.as("b"),
        col("a.t") === col("b.t") &&
          col("b.len") * tDen >= col("a.len") * tNum)
      .select(col("a.__id").as("id_l"), col("b.__id").as("id_r"))
      .distinct()
    val sl = bl.select(col("__id").as("id_l"), array_sort(col("__tk")).as("ta"))
    val sr = br.select(col("__id").as("id_r"), array_sort(col("__tk")).as("tb"))
    cand
      .join(sl, Seq("id_l"))
      .join(sr, Seq("id_r"))
      .withColumn("isect",
        graft.expressions.SortedIntersectCount(col("ta"), col("tb")))
      .withColumn("len_l", size(col("ta")).cast("long"))
      .filter(col("isect") * tDen >= col("len_l") * tNum)
      .select(col("id_l"), col("id_r"), col("isect"), col("len_l"))
  }
}
