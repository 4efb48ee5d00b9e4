package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, TimestampType}

import graft.operators.{ZoneMap, ZoneMapMeta}

/** PLANNER-INTEGRATED ZONE-MAP PRUNING — the q322 rewrite pattern one
  * operator down the stack: [[ZoneMap.prunedRead]] skips files, but
  * only when called explicitly; a plain `spark.read.parquet(path)
  * .filter(range)` over the same data scanned everything. This rule
  * makes the engine's best scan primitive something users get FOR
  * FREE: register `(dataPath, zonePath, statCols)` once, and every
  * `Filter(range-conjunction, scan)` over that path rewrites to a scan
  * of only the files whose min/max stats intersect the range — the
  * file-skipping every lakehouse planner does from its table format's
  * stats (Delta/Iceberg data skipping), expressed over the engine's own
  * zone-map table.
  *
  * CONSERVATIVE, like the MV rewrites — a rewrite must never change
  * semantics:
  *  - only bounds derivable from top-level CONJUNCTS of the filter are
  *    used for pruning (`>=`, `>`, `<=`, `<`, `=` against integral
  *    literals, either operand order, with at most a widening cast on
  *    the column); every OTHER conjunct is simply not a pruning bound —
  *    dropping conjuncts only WIDENS the surviving file set, so
  *    partial extraction stays sound;
  *  - the ORIGINAL filter is kept above the pruned scan as the
  *    residual (file stats admit false positives, never false
  *    negatives — the [[ZoneMap]] law, so pruned + residual ≡ full
  *    scan + filter, which is exactly what the q329 oracle hash-proves);
  *  - FRESHNESS: every file the relation would scan must be DESCRIBED
  *    by the zone map ([[ZoneMap.appendWithStats]] keeps it so); a
  *    landed file the map has never seen refuses the rewrite (logged) —
  *    skipping an undescribed file would be a wrong answer, the same
  *    reachable-stale window the MV rewrites guard with [[graft
  *    .operators.BaseFiles]];
  *  - output attribute ids are PRESERVED via aliases, so parents (the
  *    residual filter included) resolve unchanged.
  *
  * Cost at plan time: ONE cached metadata read — the [[graft.operators
  * .ZoneMapMeta]] `_ZMMETA` manifest, validated by directory signature
  * and held in a process-wide cache, answers freshness AND pruning with
  * zero Spark jobs (pre-manifest maps fall back to the zone-table scan,
  * authoritative either way). At 100 TB the win is the scan itself: a
  * 2-D range over a z-ordered layout opens ~the answer's worth of files
  * instead of the corpus's.
  */
object ZoneMapCatalog {

  case class ZmEntry(dataPaths: Set[String], zonePath: String,
                     statCols: Seq[String])

  private val reg = scala.collection.mutable.ArrayBuffer.empty[ZmEntry]

  /** Register the zone map at `zonePath` (built by
    * [[ZoneMap.buildZoneMap]] / [[ZoneMap.writeZOrdered]] over
    * `dataPath` with `statCols`) for automatic filter-time pruning.
    * Loud when `dataPath` is not a readable parquet relation.
    */
  def register(spark: SparkSession, dataPath: String, zonePath: String,
               statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "register needs at least one stat column")
    val paths = AggStoreRewrite.relationPaths(
      spark.read.parquet(dataPath).queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        s"not a readable parquet relation: $dataPath"))
    synchronized { reg += ZmEntry(paths, zonePath, statCols) }
  }

  def clear(): Unit = synchronized { reg.clear() }

  def entries: Seq[ZmEntry] = synchronized { reg.toList }

  /** A planner registration doubles as the SWEEP registry: every entry
    * with at least two stat columns becomes a [[graft.operators
    * .Maintenance.ZoneMapT]] recluster target (the drift statistic is
    * 2-D — the first two stat columns are the cluster pair, matching
    * [[graft.operators.ZoneMap.writeZOrdered]]'s signature).
    * Single-column registrations are pruning-only and are skipped, as
    * are multi-root ones (a recluster overwrites ONE directory) —
    * register those with the sweep explicitly if they need a cadence.
    */
  def zoneTargetsFromCatalog: Seq[graft.operators.Maintenance.ZoneMapT] =
    entries.collect {
      case e if e.statCols.length >= 2 && e.dataPaths.size == 1 =>
        graft.operators.Maintenance.ZoneMapT(PathNorm.norm(e.dataPaths.head),
          e.zonePath, e.statCols(0), e.statCols(1))
    }.distinct
}

case class ZoneMapPrune(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ZoneMapCatalog.entries.isEmpty) return plan
    plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        prune(cond, rel).getOrElse(f)
    }
  }

  /** The rewritten Filter (residual kept, scan pruned), or None when the
    * shape, freshness, or skipping potential says leave it alone.
    * Candidate resolution iterates ALL path-matching registrations and
    * takes the first FRESH one (the [[JoinViewRewrite]] house gotcha:
    * a rebuilt zone map registered without clearing must not let the
    * stale registration pin a refusal forever). Freshness is answered
    * from the [[ZoneMapMeta]] manifest when one validates — the whole
    * decision is then driver-side metadata, ZERO zone-table scans per
    * planned query — with the zone TABLE as the authoritative fallback
    * for pre-manifest maps.
    */
  private def prune(cond: Expression,
                    rel: LogicalRelation): Option[LogicalPlan] = {
    val relPaths = AggStoreRewrite.pathsOf(rel)
    val candidates = ZoneMapCatalog.entries.distinct.filter(e =>
      PathNorm.pathsEqual(relPaths, e.dataPaths))
    if (candidates.isEmpty) return None
    val relFiles = rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.inputFiles.toSeq
      case _ => Seq.empty
    }
    // freshness: an undescribed file would be silently skipped
    def isFresh(e: ZoneMapCatalog.ZmEntry): Boolean = {
      val described = ZoneMapMeta.load(spark, e.zonePath) match {
        case Some(meta) => meta.files.map(f => PathNorm.norm(f.file)).toSet
        case None => spark.read.parquet(e.zonePath)
          .select(org.apache.spark.sql.functions.col("file"))
          .collect().map(r => PathNorm.norm(r.getString(0))).toSet
      }
      relFiles.nonEmpty &&
        relFiles.forall(f => described.contains(PathNorm.norm(f)))
    }
    val entry = candidates.find(isFresh).getOrElse {
      log.warn(
        s"zone-map prune refused: ${relPaths.mkString(",")} has landed " +
          s"files not described by any of ${candidates.map(_.zonePath)
            .mkString(",")} — scanning all; appendWithStats the new " +
          "files (or register the rebuilt map) to restore skipping")
      return None
    }
    val bounds = extractBounds(cond, rel, entry.statCols)
    if (bounds.isEmpty) return None
    val preds = bounds.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
    val (survivors, total) = ZoneMap.pruneFiles(spark, entry.zonePath, preds)
    if (survivors.size >= total) None // nothing skipped: no churn
    else if (survivors.isEmpty)
      Some(LocalRelation(rel.output)) // provably empty, zero data read
    else rebuild(rel, survivors).map(Filter(cond, _)) // residual kept
  }

  /** Per stat column: the tightest `[lo, hi]` derivable from the
    * filter's conjuncts, in the STAT unit ([[ZoneMap.statExpr]]: epoch
    * days for dates, epoch micros for timestamps, the long image else).
    * Integer semantics make strict bounds exact (`c > v` ⟺ `c ≥ v+1`
    * in the literal's unit), with overflow guarded by dropping the
    * bound (sound: fewer bounds = wider file set).
    *
    * DATE/TIMESTAMP literals carry the SAME integers Catalyst stores —
    * `Literal(days: Int, DateType)` / `Literal(micros: Long,
    * TimestampType)` — so they feed the integer-exact machinery
    * unchanged. TWO cross-unit cast shapes are accepted, both only
    * under a UTC session (any other timezone skips the conjunct —
    * sound, it stays in the residual):
    *  - `Cast(dateCol, TimestampType) ⋈ Literal(micros)` (a date
    *    column compared against a timestamp — the cast is exactly
    *    `days * MICROS_PER_DAY`): the micros bound converts to an
    *    inclusive DAY bound by ceil/floor division. An equality on a
    *    non-midnight micros value yields `ceil > floor`, an empty day
    *    range — correctly pruning everything, since no date cast to
    *    timestamp can hit it.
    *  - `Cast(tsCol, DateType) ⋈ Literal(days)` (the
    *    `to_date(ts) BETWEEN …` warehouse filter — the cast is exactly
    *    `floorDiv(micros, MICROS_PER_DAY)`): day `d` covers micros
    *    `[d·U, (d+1)·U − 1]`, so a lower day bound becomes `d·U` and
    *    an upper one `(d+1)·U − 1`; a multiplication that would
    *    overflow Long drops the bound (sound — fewer bounds only
    *    widen the file set).
    */
  private def extractBounds(cond: Expression, rel: LogicalRelation,
                            statCols: Seq[String])
      : Map[String, (Long, Long)] = {
    val relIds = rel.output.map(a => a.exprId -> a.name).toMap
    val utc = spark.sessionState.conf.sessionLocalTimeZone == "UTC"
    val MicrosPerDay = 86400000000L
    def isStat(a: AttributeReference): Boolean =
      relIds.get(a.exprId).exists(statCols.contains)
    // how an inclusive bound in the LITERAL's unit converts to an
    // inclusive bound in the STAT unit — identity except for the two
    // cross-unit cast shapes (finer literal: ceil/floor division;
    // coarser literal: day-start/day-end multiplication)
    sealed trait Conv
    case object Same extends Conv
    case object MicrosOverDays extends Conv // micros literal, day stats
    case object DaysOverMicros extends Conv // day literal, micros stats
    def statName(e: Expression): Option[(String, Conv)] = e match {
      case a: AttributeReference if isStat(a) => Some((a.name, Same))
      case Cast(a: AttributeReference, LongType, _, _) if isStat(a) =>
        Some((a.name, Same))
      case Cast(a: AttributeReference, TimestampType, _, _)
          if a.dataType == DateType && isStat(a) && utc =>
        Some((a.name, MicrosOverDays))
      case Cast(a: AttributeReference, DateType, _, _)
          if a.dataType == TimestampType && isStat(a) && utc =>
        Some((a.name, DaysOverMicros))
      case _ => None
    }
    def litVal(e: Expression): Option[Long] = e match {
      case Literal(v: Byte, ByteType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, DateType) => Some(v.toLong) // epoch days
      case Literal(v: Long, TimestampType) => Some(v) // epoch micros
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val lows = scala.collection.mutable.Map.empty[String, Long]
    val highs = scala.collection.mutable.Map.empty[String, Long]
    // inclusive literal-unit bound → inclusive stat-unit bound:
    //  - MicrosOverDays: day·U ≥ v ⟺ day ≥ ceil(v/U); day·U ≤ v ⟺
    //    day ≤ floor(v/U) (Math.floorDiv is exact floor, no overflow)
    //  - DaysOverMicros: floorDiv(m,U) ≥ d ⟺ m ≥ d·U; floorDiv(m,U) ≤ d
    //    ⟺ m ≤ (d+1)·U − 1 (exact-arithmetic overflow drops the bound —
    //    sound, the conjunct stays in the residual)
    def conv(cc: Conv, v: Long, isLo: Boolean): Option[Long] = cc match {
      case Same => Some(v)
      case MicrosOverDays =>
        Some(if (isLo) Math.floorDiv(v, MicrosPerDay) +
          (if (Math.floorMod(v, MicrosPerDay) == 0) 0 else 1)
        else Math.floorDiv(v, MicrosPerDay))
      case DaysOverMicros =>
        try Some(
          if (isLo) Math.multiplyExact(v, MicrosPerDay)
          else Math.subtractExact(
            Math.multiplyExact(Math.addExact(v, 1L), MicrosPerDay), 1L))
        catch { case _: ArithmeticException => None } // overflow: drop
    }
    def lo(cd: (String, Conv), v: Long): Unit =
      conv(cd._2, v, isLo = true).foreach(b =>
        lows(cd._1) = math.max(lows.getOrElse(cd._1, Long.MinValue), b))
    def hi(cd: (String, Conv), v: Long): Unit =
      conv(cd._2, v, isLo = false).foreach(b =>
        highs(cd._1) = math.min(highs.getOrElse(cd._1, Long.MaxValue), b))
    // guard each attr-first case on the ATTR side actually resolving,
    // or it would swallow the literal-first shape before its mirrored
    // case can run (a completeness miss, never a correctness one —
    // missing bounds only widen the file set)
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a, l) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l)) lo(c, v)
      case LessThanOrEqual(a, l) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l)) hi(c, v)
      case GreaterThan(a, l) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l) if v < Long.MaxValue)
          lo(c, v + 1)
      case LessThan(a, l) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l) if v > Long.MinValue)
          hi(c, v - 1)
      case EqualTo(a, l) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l)) { lo(c, v); hi(c, v) }
      // mirrored literal-first forms
      case GreaterThanOrEqual(l, a) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l)) hi(c, v)
      case LessThanOrEqual(l, a) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l)) lo(c, v)
      case GreaterThan(l, a) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l) if v > Long.MinValue)
          hi(c, v - 1)
      case LessThan(l, a) if statName(a).isDefined =>
        for (c <- statName(a); v <- litVal(l) if v < Long.MaxValue)
          lo(c, v + 1)
      case EqualTo(l, a) if statName(a).isDefined && litVal(l).isDefined =>
        for (c <- statName(a); v <- litVal(l)) { lo(c, v); hi(c, v) }
      case _ => () // not a pruning bound — stays in the residual
    }
    (lows.keySet ++ highs.keySet).map { c =>
      c -> (lows.getOrElse(c, Long.MinValue), highs.getOrElse(c, Long.MaxValue))
    }.toMap
  }

  /** The survivor-file relation, projected back to the original
    * attribute names AND ids so the residual filter and everything
    * above resolve unchanged; None if the survivor schema ever fails to
    * line up (never expected — same parquet files).
    */
  private def rebuild(rel: LogicalRelation,
                      survivors: Seq[String]): Option[LogicalPlan] = {
    val fresh = spark.read.parquet(survivors: _*).queryExecution.analyzed
    val byName = fresh.output.map(a => a.name -> a).toMap
    val aliases = rel.output.map { old =>
      byName.get(old.name).filter(_.dataType == old.dataType)
        .map(na => Alias(na, old.name)(exprId = old.exprId))
    }
    if (aliases.exists(_.isEmpty)) None
    else Some(Project(aliases.flatten, fresh))
  }
}
