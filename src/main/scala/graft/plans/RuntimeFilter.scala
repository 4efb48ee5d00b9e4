package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, In, IsNotNull, Literal}


import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, Limit, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.BloomKm

/** PLANNER-INJECTED RUNTIME FILTERS — [[graft.operators.Bloom.reduce]]
  * made automatic, the join twin of [[ZoneMapPrune]]'s scan rewrite: a
  * selective fact⋈dim equi-join at 100 TB moves every fact row to the
  * exchange only to drop most of them at the probe; the engine's best
  * join primitive (fold the dim keys once, broadcast the bit-words as
  * literals, drop non-joining fact rows INSIDE the scan's
  * WholeStageCodegen filter) previously had to be called by hand. This
  * rule injects it for free — the Spark/Delta "runtime filter" /
  * dynamic semi-join reduction, expressed over the engine's own
  * portable bloom.
  *
  * Match (CONSERVATIVE — a rewrite must never change semantics, and
  * anything unrecognized is left alone): an INNER or LEFT SEMI join
  * with a single-column equi-pair — each side a bare column OR a
  * column under an INJECTIVE widening cast ([[widens]]: integral
  * widening, date→timestamp under UTC), because the real-schema norm
  * is `cast(l_partkey as bigint) = p_partkey`; keys harvest on the
  * bare dim column, render through the cast inverse
  * ([[convertKeys]]), and inject on the BARE fact column (where the
  * parquet pushdown and the zone-map union both live). A lossy cast
  * refuses. The DIM side must (a) carry a
  * real filter (some conjunct beyond the optimizer's inferred
  * `IsNotNull`s — an unfiltered dim reduces nothing worth a plan-time
  * job), (b) size under `spark.graft.runtimeFilters.maxDimBytes`, and
  * (c) be smaller than the fact side. The dim side's DISTINCT non-null
  * keys are collected ONCE at plan time (memoized by the dim subtree's
  * canonicalized form, so re-planning and repeated queries pay zero
  * jobs) and become a predicate merged into the fact side's filter:
  *
  *  - ≤ `maxInKeys` keys: an exact `key IN (...)` — semantically exact
  *    row pruning (an inner/semi join emits nothing for a fact row
  *    whose key is not among the dim keys), pushed to the parquet scan
  *    as row-group filters, lowered to `InSet` by `OptimizeIn`, and —
  *    the composition this subsystem exists for — FILE-skipped by
  *    [[ZoneMapPrune]]'s per-literal survivor union when the fact is a
  *    registered zone-map layout;
  *  - ≤ `maxBloomKeys`: the bloom predicate — the keys fold into m/64
  *    bit-words driver-side (m sized to 16·|keys|, FP ≈ 2^-k at k=5)
  *    and the injected predicate is a `StaticInvoke` of
  *    [[graft.operators.BloomKm.probe]]: Kirsch–Mitzenmacher double
  *    hashing, ONE md5 + k bit tests per fact row, the same code path
  *    the driver fold ran (build/probe parity by construction;
  *    false-positive-only, so reduced join ≡ unreduced join — see
  *    [[BloomKm]] for why the portable md5-family expression was the
  *    wrong shape here). Date/timestamp keys render through
  *    [[ZoneMapRender]] under the same UTC discipline as the
  *    zone-map blooms; a key that fails to render aborts the injection
  *    (a missing key would wrongly DROP its fact rows). The probe
  *    predicate is opaque to [[ZoneMapPrune]]'s harvest, so on a
  *    registered zone-map fact layout the SAME bounded key set hands
  *    to the manifest directly ([[ZoneMapPrune.keySkipSurvivors]]) and
  *    the fact scan is swapped for its survivor files — a >maxInKeys
  *    dim still FILE-skips the 100 TB fact, with the bloom kept as the
  *    row-level residual;
  *  - more: skip, logged — a filter that passes almost everything is
  *    pure overhead.
  *
  * NULL soundness: dim nulls are excluded from the key set and fact
  * nulls fail both predicate shapes (null semantics propagate to the
  * filter, which drops) — exactly the rows an inner/semi equi-join can
  * never emit. Idempotence is by memoized injection, keyed on the
  * (canonical dim, fact-key exprId) pair, so optimizer fixed-point
  * iterations converge instead of stacking filters. Every failure path
  * logs and leaves the join alone — a rewrite must never fail a query
  * that would succeed unrewritten.
  *
  * OFF by default: plan-time jobs must be opted into —
  * `spark.conf.set("spark.graft.runtimeFilters.enabled", "true")`
  * (readable per-session; [[graft.GraftExtensions]] injects the rule
  * inert). Reference analog: the don't-move-what-you'll-drop manifest
  * anti-join discipline (arxiv_hook.py:184-215), applied to join input
  * instead of re-fetch.
  */
object RuntimeFilterJoin {
  /** Test seam: how many times a dim harvest actually RAN a job (memo
    * misses), process-wide — the spec pins re-plans at zero. */
  private[graft] val harvestRuns =
    new java.util.concurrent.atomic.AtomicInteger(0)
  private[plans] val EnabledKey = "spark.graft.runtimeFilters.enabled"
  private[plans] val MaxDimBytesKey = "spark.graft.runtimeFilters.maxDimBytes"
  private[plans] val MaxInKeysKey = "spark.graft.runtimeFilters.maxInKeys"
  private[plans] val MaxBloomKeysKey =
    "spark.graft.runtimeFilters.maxBloomKeys"
}

case class RuntimeFilterJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  import RuntimeFilterJoin._

  // plan-time memoization, both bounded below and SYNCHRONIZED (ADVICE
  // r18, low: the optimizer may run concurrently for parallel queries
  // on one session; unguarded mutation could corrupt the memo —
  // degrading to lost injections at best): collected key sets per
  // canonical dim subtree
  // (matched via sameResult — the API made for "is this the plan I
  // already saw", robust where string forms drift), and the
  // (dim, fact-key) pairs already injected (exprIds are unique per
  // analyzed query, so this is exactly once-per-query — fixed-point
  // iterations and AQE re-plans hit it). Both evict OLDEST on overflow
  // (never clear wholesale — a wholesale clear mid-fixed-point could
  // re-inject a filter already placed this run).
  //
  // SNAPSHOT SEMANTICS (ADVICE r18, low — documented + cap-keyed): a
  // harvest memo entry pins the dim's key set
  // for the LIFE of this rule instance — correctness relies on the
  // dim's logical plan identity changing whenever its data does. A
  // fresh `spark.read` re-lists and gets a new relation (new identity);
  // a CACHED/reused relation object whose underlying files mutate
  // replays the plan-time keys — the same stale-read window Spark's
  // own scan snapshotting has, documented here because an injected
  // filter turns a stale read into stale ROW DROPS on the fact side.
  // The third slot records the maxBloomKeys cap the harvest ran under:
  // a None (oversize) refusal is only honored while the current cap is
  // ≤ the recorded one — raising the cap re-harvests instead of
  // replaying a refusal the new cap might not make. A Some is always
  // the COMPLETE distinct key set (the cap+1 limit did not bite), so
  // it stays valid under any cap; the CURRENT cap still gates whether
  // it is small enough to inject.
  private val harvested = scala.collection.mutable.ArrayBuffer
    .empty[(LogicalPlan, Int, Int, Option[Seq[Any]])]
  private val injected =
    scala.collection.mutable.LinkedHashSet.empty[(Long, Int, Int)]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (spark.conf.get(EnabledKey, "false") != "true") return plan
    plan.transformUp {
      case j: Join =>
        try reduce(j).getOrElse(j)
        catch {
          case scala.util.control.NonFatal(e) =>
            log.warn(s"runtime-filter injection skipped (a rewrite must " +
              s"not fail the query): ${e.getMessage}")
            j
        }
    }
  }

  /** In-path key types: the equality-joinable atomics whose internal
    * values wrap losslessly back into [[Literal]]s. */
  private def inable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | BooleanType => true
    case _ => false
  }

  /** One side of an equi-comparison: the BARE column plus the widening
    * cast the comparison sees it through (None = compared as-is). */
  private case class Key(attr: AttributeReference, cast: Option[DataType]) {
    def comparedType: DataType = cast.getOrElse(attr.dataType)
  }

  private def intRank(t: DataType): Int = t match {
    case ByteType => 1
    case ShortType => 2
    case IntegerType => 3
    case LongType => 4
    case _ => 0
  }

  /** INJECTIVE widening casts only — the real-schema norm is
    * `cast(l_partkey as bigint) = p_partkey` (int fact key, bigint dim
    * key), and an injective widening is sound to unwrap: every narrow
    * value maps to exactly one wide value, so keys can be rendered
    * through the cast inverse onto the bare column. Integral widening
    * (byte→short→int→long) always; date→timestamp ONLY under a UTC
    * session (the cast is then exactly `days · MICROS_PER_DAY`; under
    * any other zone the mapping shifts with the zone's history and the
    * driver-side inverse could disagree). Anything lossy — narrowing,
    * timestamp→date, float/decimal/string targets — refuses: the pair
    * simply does not extract and the join is left alone.
    */
  private def widens(from: DataType, to: DataType, utc: Boolean): Boolean =
    (intRank(from) > 0 && intRank(to) > intRank(from)) ||
      (from == DateType && to == TimestampType && utc)

  private def unwrapKey(e: Expression, utc: Boolean): Option[Key] = e match {
    case a: AttributeReference => Some(Key(a, None))
    // the date→timestamp arm additionally requires the Cast NODE's own
    // timeZoneId (resolved at analysis, possibly under a different
    // session zone than the one this rule runs under) to be UTC: a plan
    // analyzed under a non-UTC zone and executed after the session
    // flips to UTC carries a non-UTC cast, and convertKeys'
    // days·MICROS_PER_DAY mapping would disagree with the cast's actual
    // semantics — wrongly DROPPING joinable fact rows (ADVICE r19, low)
    case Cast(a: AttributeReference, t, tzId, _)
        if widens(a.dataType, t, utc) &&
          (!(a.dataType == DateType && t == TimestampType) ||
            tzId.forall(_ == "UTC")) =>
      Some(Key(a, Some(t)))
    case _ => None
  }

  private val MicrosPerDay = 86400000000L

  /** Harvested dim keys (the DIM attr's internal type) rendered into
    * the FACT attr's internal type, through the compared type: the dim
    * side's widening (if any) applies forward — total and exact, except
    * a date→timestamp multiplication that would overflow ABORTS the
    * whole injection (None: in that regime Spark's own cast behavior is
    * mode-dependent, and guessing could wrongly drop fact rows) — and
    * the fact side's widening applies INVERSE: a wide key outside the
    * narrow type's image (a long beyond int range, a non-midnight
    * timestamp against a date column) is DROPPED, which is sound
    * because the fact cast is total and exact, so no fact value can
    * ever widen onto the dropped key and no joinable row is lost.
    */
  private def convertKeys(keys: Seq[Any], dk: Key,
                          fk: Key): Option[Seq[Any]] = {
    if (dk.cast.isEmpty && fk.cast.isEmpty) return Some(keys)
    def toLong(v: Any): Long = v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    }
    def widen(v: Any, from: DataType, to: DataType): Option[Any] =
      (from, to) match {
        case (f, t) if f == t => Some(v)
        case (DateType, TimestampType) =>
          try Some(Math.multiplyExact(toLong(v), MicrosPerDay))
          catch { case _: ArithmeticException => None }
        case (_, ShortType) => Some(toLong(v).toShort)
        case (_, IntegerType) => Some(toLong(v).toInt)
        case (_, LongType) => Some(toLong(v))
        case _ => None
      }
    def narrowInv(v: Any, from: DataType, to: DataType): Option[Any] =
      (from, to) match {
        case (f, t) if f == t => Some(v)
        case (TimestampType, DateType) =>
          val m = v.asInstanceOf[Long]
          if (Math.floorMod(m, MicrosPerDay) != 0L) None
          else {
            val d = Math.floorDiv(m, MicrosPerDay)
            if (d >= Int.MinValue && d <= Int.MaxValue) Some(d.toInt)
            else None
          }
        case (_, ByteType) =>
          val l = toLong(v)
          if (l >= Byte.MinValue && l <= Byte.MaxValue) Some(l.toByte)
          else None
        case (_, ShortType) =>
          val l = toLong(v)
          if (l >= Short.MinValue && l <= Short.MaxValue) Some(l.toShort)
          else None
        case (_, IntegerType) =>
          val l = toLong(v)
          if (l >= Int.MinValue && l <= Int.MaxValue) Some(l.toInt)
          else None
        case _ => None
      }
    val out = Seq.newBuilder[Any]
    keys.foreach { v =>
      widen(v, dk.attr.dataType, dk.comparedType) match {
        case None => return None // mode-dependent cast: abort, never guess
        case Some(w) => narrowInv(w, fk.comparedType, fk.attr.dataType)
          .foreach(out += _) // inverse miss: unmatchable key, drop
      }
    }
    Some(out.result())
  }

  private def reduce(j: Join): Option[LogicalPlan] = {
    val cond = j.condition.getOrElse(return None)
    val utc = spark.sessionState.conf.sessionLocalTimeZone == "UTC"
    val eqPairs: Seq[(Key, Key)] = conjuncts(cond).flatMap {
      case EqualTo(l, r) =>
        for {
          lk <- unwrapKey(l, utc)
          rk <- unwrapKey(r, utc)
          if lk.comparedType == rk.comparedType &&
            inable(lk.attr.dataType) && inable(rk.attr.dataType)
        } yield (lk, rk)
      case _ => None
    }
    if (eqPairs.isEmpty) return None
    // orient: (factSide, dimSide, factKey, dimKey) candidates — for a
    // LEFT SEMI the left side is the one whose rows survive (the fact);
    // for INNER either side may be the dim
    val orientations: Seq[(LogicalPlan, LogicalPlan, Key, Key)] =
      j.joinType match {
        case LeftSemi => eqPairs.flatMap { case (a, b) =>
          keyOf(j.left, a, b).flatMap(fk => keyOf(j.right, a, b).map(dk =>
            (j.left, j.right, fk, dk)))
        }
        case Inner => eqPairs.flatMap { case (a, b) =>
          keyOf(j.left, a, b).flatMap(fk => keyOf(j.right, a, b).map(dk =>
            Seq((j.left, j.right, fk, dk), (j.right, j.left, dk, fk))))
            .getOrElse(Seq.empty)
        }
        case _ => Seq.empty
      }
    val maxDim = spark.conf.get(MaxDimBytesKey, (64L << 20).toString).toLong
    val maxIn = spark.conf.get(MaxInKeysKey, "4096").toInt
    def qualifies(fact: LogicalPlan, dim: LogicalPlan): Boolean =
      // a NON-DETERMINISTIC dim (rand()-sampled filter, shuffle-order-
      // dependent expression) can produce a DIFFERENT row set at
      // runtime than the plan-time harvest saw — an injected key set
      // missing a runtime key would wrongly DROP its fact rows, the
      // one direction this rule must never err; streaming dims cannot
      // be executed at plan time at all
      hasRealFilter(dim) && !dim.isStreaming &&
        !dim.exists(_.expressions.exists(e =>
          e.exists(!_.deterministic))) &&
        dim.stats.sizeInBytes <= maxDim &&
        fact.stats.sizeInBytes > dim.stats.sizeInBytes
    // EVERY qualifying orientation injects — a composite equi-key
    // (k1 = a AND k2 = b) contributes one predicate per column, each
    // independently sound (a fact row failing either key set cannot
    // satisfy that equality, hence cannot join)
    val leftPreds = Vector.newBuilder[Expression]
    val rightPreds = Vector.newBuilder[Expression]
    // SEMI-JOIN ELIMINATION: a LEFT SEMI whose ONLY condition is the
    // one equi-pair, with the dim's COMPLETE key set harvested into an
    // exact predicate (an IN over the converted keys, or `false` for
    // an empty dim), IS that predicate — semi output ≡ "fact rows
    // whose key equals some dim key" ≡ Filter(In): dim nulls are
    // excluded from the harvest exactly as the equality never matches
    // them, a null fact key fails IN exactly as it fails the join, dim
    // duplicates dedup on both sides, and convertKeys' inverse drops
    // only keys no fact value can widen onto. The join node, its
    // exchange, and the build side disappear — and what remains is a
    // plain Filter-over-scan, which [[ZoneMapPrune]]'s file-skipping
    // AND metadata-AGGREGATE arms can then answer ("sum of revenue
    // for these parts" becomes a manifest read on a key-clustered
    // layout). NEVER for the bloom path: false positives would ADD
    // rows with no join left to re-check. Same plan-time-snapshot
    // caveat as the injection itself (documented on the memo above) —
    // the IN path was already semantically exact row pruning, the
    // elimination just stops re-checking it.
    val semiExact = j.joinType == LeftSemi && conjuncts(cond).length == 1
    var semiEliminate = false
    // BLOOM × ZONE-MAP COMPOSITION: past maxInKeys the injected
    // predicate is the md5 expression, which ZoneMapPrune cannot
    // harvest — so the bounded key set is handed to the zone map
    // DIRECTLY ([[ZoneMapPrune.keySkipSurvivors]]: sorted keys + one
    // binary search per file, driver-only) and the fact relation is
    // swapped for its survivor projection. Several filters landing on
    // one relation INTERSECT their survivor sets (each is a false-
    // positive-only superset). The predicate always stays as the
    // row-level residual; any refusal just means predicate-only.
    val factSurv =
      new java.util.IdentityHashMap[org.apache.spark.sql.execution
        .datasources.LogicalRelation, (Set[String], Int)]()
    def zoneSkipInto(fact: LogicalPlan, factKey: AttributeReference,
                     keys: Seq[Any]): Unit = {
      val rels = fact.collect {
        case r: org.apache.spark.sql.execution.datasources
          .LogicalRelation => r
      }
      if (rels.length != 1) return // one scan only: no ambiguity
      val rel = rels.head
      if (!rel.outputSet.contains(factKey)) return
      zmHelper.keySkipSurvivors(rel, factKey, keys).foreach {
        case (surv, total) =>
          val set = surv.toSet
          val merged = Option(factSurv.get(rel)) match {
            case Some((prev, t)) => (prev intersect set, t)
            case None => (set, total)
          }
          factSurv.put(rel, merged)
          log.info(s"runtime filter zone-map skip: ${merged._1.size} of " +
            s"$total fact files survive the ${keys.length}-key set on " +
            s"${factKey.name}")
      }
    }
    orientations.foreach { case (fact, dim, fk, dk) =>
      if (qualifies(fact, dim)) {
        val factKey = fk.attr // injection lands on the BARE fact column
        val keyIdx = dim.output.indexWhere(_.exprId == dk.attr.exprId)
        // keyed by fact-key exprId + dim identity (semanticHash), so a
        // star join injecting from SEVERAL dims onto one fact key
        // lands each, and fixed-point iterations land none twice
        val injKey = (factKey.exprId.id, keyIdx, dim.semanticHash())
        if (!injected.synchronized(injected.contains(injKey))) {
          harvest(dim, dk.attr, keyIdx).flatMap(convertKeys(_, dk, fk))
            .foreach { keys =>
              val exact = keys.isEmpty || keys.length <= maxIn
              val predOpt: Option[Expression] =
                if (keys.isEmpty) Some(Literal(false)) // empty dim: exact
                else if (keys.length <= maxIn)
                  Some(In(factKey,
                    keys.map(v => Literal(v, factKey.dataType))))
                else bloomPred(factKey, keys)
              if (semiExact && exact) semiEliminate = true
              predOpt.foreach { pred =>
                injected.synchronized {
                  injected += injKey
                  while (injected.size > 4096) // bound: evict OLDEST only
                    injected -= injected.head
                }
                log.info(s"runtime filter injected: ${keys.length} dim " +
                  s"keys as ${if (keys.length <= maxIn) "IN list"
                  else "bloom"} on ${factKey.name}")
                if (fact eq j.left) leftPreds += pred else rightPreds += pred
                // the direct hand-off covers BOTH shapes ZoneMapPrune's
                // own per-literal union cannot: the bloom path (any
                // size — the probe predicate is opaque to the harvest)
                // and the 257..maxInKeys IN band (past InUnionCap the
                // rule falls back to the near-useless [min,max]
                // envelope); a ≤ InUnionCap IN stays with the rule,
                // whose per-literal union also bloom-refines per file
                if (keys.nonEmpty && (keys.length > maxIn ||
                  keys.length > ZoneMapPrune.InUnionCap))
                  zoneSkipInto(fact, factKey, keys)
              }
            }
        }
      }
    }
    val (lp, rp) = (leftPreds.result(), rightPreds.result())
    if (lp.isEmpty && rp.isEmpty) None
    else {
      def applySwaps(side: LogicalPlan): LogicalPlan =
        if (factSurv.isEmpty) side
        else side.transformUp {
          case r: org.apache.spark.sql.execution.datasources
              .LogicalRelation if factSurv.containsKey(r) =>
            val (surv, total) = factSurv.get(r)
            if (surv.size >= total) r // nothing skipped: no churn
            else if (surv.isEmpty)
              // every file provably keyless: exact empty scan, no read
              org.apache.spark.sql.catalyst.plans.logical
                .LocalRelation(r.output)
            else zmHelper.rebuildFor(r, surv.toSeq.sorted).getOrElse(r)
        }
      if (semiEliminate && rp.isEmpty && lp.length == 1) {
        log.info("semi join eliminated: the exact key-set filter IS the " +
          "join (single equi-pair, complete dim key set)")
        Some(applySwaps(withPred(j.left, lp.head)))
      } else Some(j.copy(
        left = applySwaps(lp.foldLeft(j.left)((s, p) => withPred(s, p))),
        right = applySwaps(rp.foldLeft(j.right)((s, p) => withPred(s, p)))))
    }
  }

  /** Shared zone-map helpers for the bloom-path composition — the same
    * freshness/rebuild discipline as the filter-prune rule. */
  private lazy val zmHelper = ZoneMapPrune(spark)

  /** Merge into an existing top filter so the predicate sits DIRECTLY
    * above the scan (what both [[ZoneMapPrune]] and the parquet filter
    * translation match) — the optimizer's own CombineFilters has
    * already run by the time injected rules fire. */
  private def withPred(side: LogicalPlan, pred: Expression): LogicalPlan =
    side match {
      case Filter(c, child) => Filter(And(pred, c), child)
      case other => Filter(pred, other)
    }

  private def keyOf(side: LogicalPlan, a: Key, b: Key): Option[Key] =
    if (side.outputSet.contains(a.attr)) Some(a)
    else if (side.outputSet.contains(b.attr)) Some(b)
    else None

  /** Some conjunct beyond the inferred IsNotNulls filters the dim. */
  private def hasRealFilter(p: LogicalPlan): Boolean = p.exists {
    case Filter(c, _) => conjuncts(c).exists {
      case _: IsNotNull => false
      case _ => true
    }
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The dim side's distinct non-null keys, collected once at plan time
    * (ONE Spark job, memoized — the same price [[ZoneMapPrune]] pays
    * for a pre-manifest freshness probe) with a `maxBloomKeys + 1`
    * limit so an unselective dim costs one bounded job, remembered,
    * and never a driver OOM. None = over the cap (also memoized).
    */
  private def harvest(dim: LogicalPlan, key: AttributeReference,
                      keyIdx: Int): Option[Seq[Any]] = {
    val maxBloom = spark.conf.get(MaxBloomKeysKey, "262144").toInt
    val memo = harvested.synchronized {
      harvested.collectFirst {
        // a Some is the complete distinct key set — valid under any
        // cap; a None refusal only stands while the cap has not been
        // RAISED past the one it was made under (else re-harvest)
        case (p, i, cap, r) if i == keyIdx &&
            (r.isDefined || cap >= maxBloom) && p.sameResult(dim) => r
      }
    }
    val r = memo.getOrElse {
      RuntimeFilterJoin.harvestRuns.incrementAndGet()
      val plan = Limit(Literal(maxBloom + 1),
        Aggregate(Seq(key), Seq(key),
          Project(Seq(key), Filter(IsNotNull(key), dim))))
      val rows = spark.sessionState.executePlan(plan)
        .executedPlan.executeCollect()
      val res: Option[Seq[Any]] =
        if (rows.length > maxBloom) {
          log.info(s"runtime filter skipped: dim has > $maxBloom " +
            s"distinct keys on ${key.name} — an unselective filter is " +
            "pure overhead")
          None
        } else Some(rows.toSeq.map(_.get(0, key.dataType) match {
          case u: UTF8String => u.clone() // detach from the row buffer
          case v => v
        }))
      harvested.synchronized {
        harvested += ((dim, keyIdx, maxBloom, res))
        if (harvested.size > 256) // bound the memo: evict OLDEST only
          harvested.remove(0, harvested.size - 256)
      }
      res
    }
    // the CURRENT cap gates injection size even on a memo hit (a
    // lowered cap must not inject a now-oversize key set)
    r.filter(_.length <= maxBloom)
  }

  /** The bloom predicate over `factKey`: a `StaticInvoke` of
    * [[BloomKm.probe]] — Kirsch–Mitzenmacher double hashing, ONE md5 +
    * k bit tests per fact row over the already-folded broadcast word
    * literal. The words fold driver-side through [[BloomKm.setBits]],
    * the SAME `hashes`/`posOf` code path the probe runs, so build and
    * probe agree by construction (the r18 shape instead reproduced
    * [[Bloom.mightContain]] with five full md5 calls per row — its
    * portability bought nothing here, because the equality law is
    * proved against the PLAIN join, and `FilterExec`'s predicate split
    * makes any built-in single-md5 rewrite cost MORE, not less — see
    * [[BloomKm]]). `propagateNull` drops null fact keys exactly as the
    * old expression's null propagation did, and exactly as the join
    * would. None when any key fails to render (dropping a key would
    * wrongly drop its fact rows) — integral/string always render;
    * date/ts only in range and (ts) under UTC.
    */
  private def bloomPred(factKey: AttributeReference,
                        keys: Seq[Any]): Option[Expression] = {
    val utc = spark.sessionState.conf.sessionLocalTimeZone == "UTC"
    val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
    def render(v: Any): Option[String] = (v, factKey.dataType) match {
      case (i: Int, DateType) => ZoneMapRender.date(i)
      case (l: Long, TimestampType) =>
        if (utc) ZoneMapRender.timestampUtc(l) else None
      case (u: UTF8String, _) => Some(u.toString)
      case (b: Byte, _) => Some(b.toString)
      case (s: Short, _) => Some(s.toString)
      case (i: Int, _) => Some(i.toString)
      case (l: Long, _) => Some(l.toString)
      case _ => None
    }
    val rendered = keys.map(render)
    if (rendered.exists(_.isEmpty)) return None
    val k = 5
    var m = 1024
    while (m < 16 * keys.length && m < (1 << 21)) m <<= 1
    val words = new Array[Long](m / 64)
    rendered.flatten.foreach(s => BloomKm.setBits(words, s, m, k))
    // an already-FOLDED array literal, not CreateArray of literals:
    // when the rule runs where ConstantFolding will not revisit (e.g.
    // experimental.extraOptimizations), a CreateArray re-materializes
    // all m/64 words per row per probe — on exactly the 100 TB fact
    // scans the filter targets (ADVICE r18, low)
    val arr = Literal.create(words.toSeq,
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))
    Some(org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      BloomKm.getClass,
      org.apache.spark.sql.types.BooleanType,
      "probe",
      Seq(Cast(factKey, StringType, tz), arr, Literal(m), Literal(k)),
      inputTypes = Seq(StringType,
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
        IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = false))
  }
}
