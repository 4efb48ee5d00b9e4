package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

import graft.operators.AggStore

/** MATERIALIZED-VIEW REWRITE — the optimizer-side payoff of the
  * incremental aggregate store ([[AggStore]]): a query that re-derives
  * `SELECT k, count(*), sum(v) FROM base GROUP BY k` should not scan
  * 100 TB of base when a maintained store already holds exactly that
  * state. This `Rule[LogicalPlan]` rewrites a MATCHING aggregate into a
  * scan of the registered store — store-size I/O instead of
  * corpus-size, with the rest of the query plan (joins above, filters
  * above, ordering) untouched; it is the classic single-table MV
  * rewrite (Hive/Calcite `ALTER MV REBUILD` serving, Spark's own
  * `CacheManager.useCachedData` shape) expressed over the engine's own
  * snapshot store.
  *
  * The match is deliberately CONSERVATIVE — a rewrite must never change
  * semantics, so anything unrecognized is left alone:
  *  - the aggregate's child is the registered parquet relation (same
  *    `HadoopFsRelation` root paths), bare or under a column-pruning
  *    `Project` of plain attributes (what Catalyst itself produces) —
  *    no filters, no joins, no expressions;
  *  - exactly one grouping expression: the registered key column;
  *  - every aggregate output is the group key, `count(<literal>)`
  *    (what `count(*)` lowers to), or `sum(<valCol>)` with at most a
  *    widening cast to long — non-distinct, unfiltered;
  *  - output attribute ids are PRESERVED via aliases, so parent
  *    operators resolve unchanged.
  *
  * FRESHNESS is the registration contract, as in every MV system: by
  * registering, the caller asserts the store at `storePath` reflects
  * the current base table (the increment discipline keeps it so — a
  * day's load merges into the store when it lands in the base). The
  * rewrite serves the store's CURRENT manifest snapshot.
  *
  * Wire-up: session-wide via `spark.experimental.extraOptimizations`
  * (live sessions, what the spec and q322 use) or cluster-wide via
  * `graft.GraftExtensions` (`injectOptimizerRule`).
  */
object MvCatalog {

  /** One registered view: the base relation's root paths, the grouped
    * key column, the summed value column, and the store that serves it.
    */
  case class MvEntry(rootPaths: Set[String], keyCol: String,
                     valCol: String, storePath: String)

  private val reg = scala.collection.mutable.ArrayBuffer.empty[MvEntry]

  /** Register `storePath` (an [[AggStore]]) as the materialization of
    * `base.groupBy(keyCol).agg(count(*), sum(valCol))`. `base` must be
    * a bare parquet read (optionally column-pruned) — loud otherwise,
    * because a silent non-registration would just mean silent
    * non-rewrites later.
    */
  def registerAggView(base: DataFrame, keyCol: String, valCol: String,
                      storePath: String): Unit = {
    val paths = AggStoreRewrite.relationPaths(base.queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        "registerAggView needs a bare parquet relation (optionally " +
          "column-pruned) as the base"))
    require(base.columns.contains(keyCol) && base.columns.contains(valCol),
      s"base must carry $keyCol and $valCol")
    // the store's `total` is the LONG sum the build applied via
    // cast(long) — any NUMERIC value column registers (the matcher
    // serves `sum(cast(v as long))`, which truncates exactly as the
    // store's own write did), but a non-numeric one can only ever
    // mis-serve; loud here rather than silent non-rewrites later.
    require(base.schema(valCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"registerAggView: value column $valCol must be numeric " +
        s"(got ${base.schema(valCol).dataType.simpleString})")
    synchronized { reg += MvEntry(paths, keyCol, valCol, storePath) }
  }

  def clear(): Unit = synchronized { reg.clear() }

  def entries: Seq[MvEntry] = synchronized { reg.toList }
}

case class AggStoreRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvCatalog.entries.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(g), aggExprs, child, _) =>
        rewrite(g, aggExprs, child).getOrElse(agg)
    }
  }

  /** The store scan, projected to the aggregate's own output names AND
    * attribute ids — parents resolve as if nothing happened.
    */
  private def rewrite(g: Expression, aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    // several views may register the same base (different value
    // columns) — try EVERY path-matching entry, first full match wins
    val matched = relationWithOutput(child).flatMap { case (rel, visible) =>
      val relPaths = AggStoreRewrite.pathsOf(rel)
      MvCatalog.entries.iterator
        .filter(e => PathNorm.pathsEqual(relPaths, e.rootPaths))
        .flatMap { entry =>
          for {
            keyAttr <- attrNamed(visible, entry.keyCol)
            valAttr <- attrNamed(visible, entry.valCol)
            gAttr <- asAttr(g) if gAttr.exprId == keyAttr.exprId
            outs <- mapOutputs(aggExprs, keyAttr, valAttr)
            // FRESHNESS: every file this scan would read must be
            // reflected in the store, or serving it is a stale answer
            // — refuse and answer from the base (correct, just not
            // accelerated) until the landed files merge in
            _ <- Some(()).filter(_ =>
              AggStoreRewrite.freshOrLog(spark, entry.storePath, rel, log))
          } yield (entry, keyAttr, outs)
        }
        .nextOption()
    }
    matched.flatMap { case (entry, keyAttr, outs) =>
      val store = AggStore.readAggStore(spark, entry.storePath)
        .queryExecution.analyzed
      val Seq(sKey, sCnt, sTotal) = store.output.take(3)
      // only rewrite when types line up exactly — never change semantics
      if (sKey.dataType != keyAttr.dataType) None
      else Some(Project(outs.map {
        case (orig, StoreCol.Key) =>
          Alias(sKey, orig.name)(exprId = orig.exprId)
        case (orig, StoreCol.Cnt) =>
          Alias(sCnt, orig.name)(exprId = orig.exprId)
        case (orig, StoreCol.Total) =>
          Alias(sTotal, orig.name)(exprId = orig.exprId)
      }, store))
    }
  }

  private sealed trait StoreColT
  private object StoreCol {
    case object Key extends StoreColT
    case object Cnt extends StoreColT
    case object Total extends StoreColT
  }

  /** Every aggregate output must be the key, count(<lit>), or
    * sum(<val>) — else no rewrite. */
  private def mapOutputs(aggExprs: Seq[NamedExpression], keyAttr: Attribute,
                         valAttr: Attribute)
      : Option[Seq[(NamedExpression, StoreColT)]] = {
    val mapped = aggExprs.map { ne =>
      val inner = ne match {
        case Alias(c, _) => c
        case other => other
      }
      inner match {
        case a: AttributeReference if a.exprId == keyAttr.exprId =>
          Some(ne -> (StoreCol.Key: StoreColT))
        // the literal must be NON-null: count(NULL) is 0 for every
        // group, not the store's per-key row count
        case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
            if v != null =>
          Some(ne -> (StoreCol.Cnt: StoreColT))
        case AggregateExpression(s: Sum, _, false, None, _)
            if isValRef(s.child, valAttr) =>
          Some(ne -> (StoreCol.Total: StoreColT))
        case _ => None
      }
    }
    if (mapped.forall(_.isDefined)) Some(mapped.flatten) else None
  }

  /** `v` (INTEGRAL only) or `cast(v as long)` (any numeric `v`). The
    * store's `total` is `sum(cast(v as long))`: a query that applies
    * the same cast truncates exactly as the store's write did, so the
    * rewrite is value-identical for any numeric source — but a BARE
    * `sum(doubleCol)` is a true double sum, and serving the store's
    * truncated long under the original attribute id would silently
    * change both the values and the attribute's dataType mid-plan. */
  private def isValRef(e: Expression, valAttr: Attribute): Boolean = e match {
    case a: AttributeReference =>
      a.exprId == valAttr.exprId && AggStoreRewrite.integral(a.dataType)
    case Cast(a: AttributeReference, LongType, _, _) =>
      a.exprId == valAttr.exprId
    case _ => false
  }

  private def asAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case Alias(a: AttributeReference, _) => Some(a)
    case _ => None
  }

  private def attrNamed(attrs: Seq[Attribute],
                        name: String): Option[Attribute] =
    attrs.find(_.name == name)

  /** The relation under the aggregate: bare, or through a
    * column-pruning Project of plain attributes. Returns the relation
    * plus the attributes visible to the aggregate.
    */
  private def relationWithOutput(child: LogicalPlan)
      : Option[(LogicalRelation, Seq[Attribute])] = child match {
    case r: LogicalRelation => Some((r, r.output))
    case Project(projList, r: LogicalRelation)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      Some((r, projList.map(_.asInstanceOf[AttributeReference])))
    case _ => None
  }
}

object AggStoreRewrite {
  /** The exact-long-sum input types: Sum over these yields LongType ==
    * the store's `total` column, value-identical to the store's own
    * cast(long) fold. */
  private[plans] def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[plans] def pathsOf(rel: LogicalRelation): Set[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString).toSet
      case _ => Set.empty
    }

  /** The freshness gate ([[graft.operators.BaseFiles.covers]]): true
    * when the relation's landed files are all reflected in the store's
    * fingerprint (or no fingerprint exists — pre-guard stores keep the
    * registration contract); logs the refusal otherwise so staleness is
    * observable, not silent.
    */
  private[plans] def freshOrLog(spark: SparkSession, storePath: String,
                                rel: LogicalRelation,
                                log: org.slf4j.Logger): Boolean = {
    val files = rel.relation match {
      case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
      case _ => Seq.empty
    }
    val ok = graft.operators.BaseFiles.covers(spark, storePath, files)
    if (!ok) log.warn(
      s"MV rewrite refused: base ${pathsOf(rel).mkString(",")} has landed " +
        s"files not reflected in the store at $storePath — answering from " +
        "the base; merge the new files into the store to restore serving")
    ok
  }

  private[plans] def relationPaths(plan: LogicalPlan): Option[Set[String]] =
    plan.collectFirst {
      case r: LogicalRelation if pathsOf(r).nonEmpty => pathsOf(r)
    }
}

/** Path-set equality with scheme-normalization (`file:` vs `file://`),
  * so a view registered from one API surface matches a scan planned
  * from another. */
private[plans] object PathNorm {
  def norm(p: String): String =
    p.replaceFirst("^file:/+", "/")
  def pathsEqual(a: Set[String], b: Set[String]): Boolean =
    a.nonEmpty && a.map(norm) == b.map(norm)
}
