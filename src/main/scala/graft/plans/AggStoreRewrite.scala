package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Divide, EqualTo, Expression, GetStructField, In, IsNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, DoubleType, IntegerType, LongType, ShortType, StringType, StructField, StructType, TimestampType}

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
  *    no joins, no expressions, and the ONLY filter accepted is a
  *    key-literal predicate (below), which turns the rewrite into a
  *    POINT LOOKUP;
  *  - the grouping expressions are exactly the registered key columns,
  *    in order (one column, or several registered as a struct key);
  *  - every aggregate output is a group key, `count(<non-null lit>)`
  *    (what `count(*)` lowers to), `sum(<valCol>)` with at most a
  *    widening cast to long, or `avg(<valCol>)` (served as
  *    `total / cnt` from the store's own columns) — non-distinct,
  *    unfiltered;
  *  - POINT LOOKUP: a pushed-down `key = lit` / `key IN (lits)` filter
  *    (plus the optimizer's inferred `IsNotNull(key)`) over a
  *    single-column equality-joinable key (integral / string / date /
  *    timestamp / boolean), or a conjunction of per-column equalities
  *    covering a multi-column (struct-keyed) registration exactly once
  *    each, rewrites to
  *    [[AggStore.lookupAggStoreKeys]] — the manifest-pruned bucket read
  *    (q327's shape), so "these keys' aggregates" costs ≤ |keys| bucket
  *    dirs instead of even the store scan; min/max outputs route the
  *    same lookup through [[AggStore.lookupAggStoreKeysExtrema]] when
  *    the store carries extrema (q346), refusing otherwise;
  *  - output attribute ids are PRESERVED via aliases, so parent
  *    operators resolve unchanged.
  *
  * FRESHNESS is verified, not just contracted: every store build/merge
  * fingerprints its source's landed files ([[graft.operators
  * .BaseFiles]]), and the rewrite refuses — loudly, in the log — when
  * the scan's `inputFiles` have moved past the fingerprint, answering
  * from the base until the new files merge in. A store with no
  * fingerprint (non-file sources) keeps the registration contract.
  *
  * Wire-up: session-wide via `spark.experimental.extraOptimizations`
  * (live sessions, what the spec and q322 use) or cluster-wide via
  * `graft.GraftExtensions` (`injectOptimizerRule`).
  */
object MvCatalog {

  /** One registered view: the base relation's root paths, the grouped
    * key columns (several = a struct-keyed store), the summed value
    * column, and the store that serves it.
    */
  case class MvEntry(rootPaths: Set[String], keyCols: Seq[String],
                     valCol: String, storePath: String)

  private val reg = scala.collection.mutable.ArrayBuffer.empty[MvEntry]

  /** Register `storePath` (an [[AggStore]]) as the materialization of
    * `base.groupBy(keyCol).agg(count(*), sum(valCol))`. `base` must be
    * a bare parquet read (optionally column-pruned) — loud otherwise,
    * because a silent non-registration would just mean silent
    * non-rewrites later.
    */
  def registerAggView(base: DataFrame, keyCol: String, valCol: String,
                      storePath: String): Unit =
    registerAggView(base, Seq(keyCol), valCol, storePath)

  /** Multi-column registration: the store was built with
    * `struct(keyCols*)` as its key (field names = the column names);
    * a query grouping by exactly these columns, in order, serves from
    * it with each group column projected back out of the struct.
    */
  def registerAggView(base: DataFrame, keyCols: Seq[String], valCol: String,
                      storePath: String): Unit = {
    require(keyCols.nonEmpty, "registerAggView needs at least one key column")
    val paths = AggStoreRewrite.relationPaths(base.queryExecution.analyzed)
      .getOrElse(throw new IllegalArgumentException(
        "registerAggView needs a bare parquet relation (optionally " +
          "column-pruned) as the base"))
    (keyCols :+ valCol).foreach(c => require(base.columns.contains(c),
      s"base must carry $c"))
    // the store's `total` is the LONG sum the build applied via
    // cast(long) — any NUMERIC value column registers (the matcher
    // serves `sum(cast(v as long))`, which truncates exactly as the
    // store's own write did), but a non-numeric one can only ever
    // mis-serve; loud here rather than silent non-rewrites later.
    require(base.schema(valCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"registerAggView: value column $valCol must be numeric " +
        s"(got ${base.schema(valCol).dataType.simpleString})")
    synchronized { reg += MvEntry(paths, keyCols, valCol, storePath) }
  }

  def clear(): Unit = synchronized { reg.clear() }

  def entries: Seq[MvEntry] = synchronized { reg.toList }
}

case class AggStoreRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MvCatalog.entries.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(gs, aggExprs, child, _) if gs.nonEmpty =>
        rewrite(gs, aggExprs, child).getOrElse(agg)
    }
  }

  /** The store scan (or bucket-pruned lookup), projected to the
    * aggregate's own output names AND attribute ids — parents resolve
    * as if nothing happened.
    */
  private def rewrite(gs: Seq[Expression], aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    // several views may register the same base (different value
    // columns) — try EVERY path-matching entry, first full match wins
    val matched = childShape(child).flatMap { case (rel, visible, keyPred) =>
      val relPaths = AggStoreRewrite.pathsOf(rel)
      MvCatalog.entries.iterator
        .filter(e => PathNorm.pathsEqual(relPaths, e.rootPaths))
        .flatMap { entry =>
          for {
            keyAttrs <- allDefined(entry.keyCols.map(attrNamed(visible, _)))
            valAttr <- attrNamed(visible, entry.valCol)
            gAttrs <- allDefined(gs.map(asAttr))
            // the grouping is exactly the registered keys, in order
            _ <- Some(()).filter(_ => gAttrs.length == keyAttrs.length &&
              gAttrs.zip(keyAttrs).forall { case (ga, ka) =>
                ga.exprId == ka.exprId })
            // a key-literal filter is accepted only on equality-joinable
            // key columns ([[AggStoreRewrite.lookupable]]: integral /
            // string / date / timestamp / boolean), literals type-equal
            // and non-null — single-column `= / IN`, or a conjunction of
            // equalities covering a multi-column key exactly once each —
            // it becomes the point lookup below
            _ <- Some(()).filter(_ => keyPred.forall {
              case SingleKey(a, lits) =>
                keyAttrs.length == 1 && a.exprId == keyAttrs.head.exprId &&
                  AggStoreRewrite.lookupable(keyAttrs.head.dataType) &&
                  lits.forall(l => l.dataType == keyAttrs.head.dataType &&
                    l.value != null)
              case MultiKey(eqs) =>
                keyAttrs.length >= 2 && eqs.length == keyAttrs.length &&
                  keyAttrs.forall(ka =>
                    eqs.count(_._1.exprId == ka.exprId) == 1) &&
                  eqs.forall { case (a, ls) =>
                    keyAttrs.find(_.exprId == a.exprId).exists(ka =>
                      AggStoreRewrite.lookupable(ka.dataType) &&
                        ls.forall(l => l.dataType == ka.dataType &&
                          l.value != null))
                  }
            })
            outs <- mapOutputs(aggExprs, keyAttrs, valAttr)
            // min/max serve only from an EXTREMA store (insert-only
            // monoid columns the plain store does not carry) — both
            // as a full store scan and through the bucket-pruned point
            // lookup ([[AggStore.lookupAggStoreKeysExtrema]])
            _ <- Some(()).filter { _ =>
              val needsExtrema = outs.exists(o =>
                o._2 == OutCol.Lo || o._2 == OutCol.Hi)
              !needsExtrema || AggStore.hasExtrema(spark, entry.storePath)
            }
            // FRESHNESS: every file this scan would read must be
            // reflected in the store, or serving it is a stale answer
            // — refuse and answer from the base (correct, just not
            // accelerated) until the landed files merge in
            _ <- Some(()).filter(_ =>
              AggStoreRewrite.freshOrLog(spark, entry.storePath, rel, log))
          } yield (entry, keyAttrs, outs, keyPred)
        }
        .nextOption()
    }
    matched.flatMap { case (entry, keyAttrs, outs, keyPred) =>
      val needsExtrema = outs.exists(o =>
        o._2 == OutCol.Lo || o._2 == OutCol.Hi)
      def lookupOf(keysDf: DataFrame): DataFrame =
        if (needsExtrema) // the five-column lookup, extrema-folded
          AggStore.lookupAggStoreKeysExtrema(keysDf, entry.storePath)
        else AggStore.lookupAggStoreKeys(keysDf, entry.storePath)
      val storeDf = keyPred match {
        case Some(SingleKey(_, lits)) => // POINT LOOKUP: ≤ |keys| buckets
          val schema = StructType(Seq(
            StructField("key", keyAttrs.head.dataType)))
          // literals carry INTERNAL values (UTF8String, epoch days,
          // micros) — bridge them back to the DataFrame surface, where
          // createDataFrame re-converts exactly (lossless round trip
          // for every lookupable type)
          val toScala = CatalystTypeConverters
            .createToScalaConverter(keyAttrs.head.dataType)
          val rows: Seq[Row] = lits.map(l => Row(toScala(l.value))).distinct
          lookupOf(spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), schema))
        case Some(MultiKey(eqs)) =>
          // struct-key rows in registered order — the cross product of
          // the one allowed IN with the fixed equalities, ≤ |IN| bucket
          // dirs of I/O, the struct twin of the lookup above
          val ordered: Seq[Seq[Literal]] = keyAttrs.map(ka =>
            eqs.find(_._1.exprId == ka.exprId).get._2)
          val schema = StructType(Seq(StructField("key", StructType(
            entry.keyCols.zip(keyAttrs).map { case (n, ka) =>
              StructField(n, ka.dataType) }))))
          val convs = keyAttrs.map(ka =>
            CatalystTypeConverters.createToScalaConverter(ka.dataType))
          val rows: Seq[Row] = ordered
            .foldLeft(Seq(Seq.empty[Literal]))((acc, ls) =>
              for (p <- acc; l <- ls) yield p :+ l)
            .map(combo => Row(Row(combo.zip(convs).map {
              case (l, cv) => cv(l.value) }: _*)))
            .distinct
          lookupOf(spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), schema))
        case None =>
          if (needsExtrema) AggStore.readAggStoreExtrema(spark, entry.storePath)
          else AggStore.readAggStore(spark, entry.storePath)
      }
      // inject the OPTIMIZED subplan: the hint-resolution and subquery
      // batches have already run on the outer tree, so an analyzed
      // fragment (the lookup's broadcast hint in particular) would
      // reach physical planning unresolved
      val store = storeDf.queryExecution.optimizedPlan
      def sCol(n: String): Attribute = store.output.find(_.name == n).get
      val (sKey, sCnt, sTotal) = (sCol("key"), sCol("cnt"), sCol("total"))
      // only rewrite when types line up exactly — never change semantics
      val keyTypesOk =
        if (keyAttrs.length == 1) sKey.dataType == keyAttrs.head.dataType
        else sKey.dataType match {
          case st: StructType =>
            st.fields.length == keyAttrs.length &&
              st.fields.zip(keyAttrs).zip(entry.keyCols).forall {
                case ((f, ka), kc) =>
                  f.name == kc && f.dataType == ka.dataType
              }
          case _ => false
        }
      if (!keyTypesOk) None
      else Some(Project(outs.map {
        case (orig, OutCol.Key(i)) =>
          val e: Expression =
            if (keyAttrs.length == 1) sKey
            else GetStructField(sKey, i, Some(entry.keyCols(i)))
          Alias(e, orig.name)(exprId = orig.exprId)
        case (orig, OutCol.Cnt) =>
          Alias(sCnt, orig.name)(exprId = orig.exprId)
        case (orig, OutCol.Total) =>
          Alias(sTotal, orig.name)(exprId = orig.exprId)
        case (orig, OutCol.Mean) =>
          // avg(v) == total / cnt from the store's own columns.
          // EXACTNESS NOTE (a documented, deliberate deviation at the
          // extreme): Spark's native Average over an integral child
          // accumulates partial sums in a DOUBLE buffer, which rounds
          // once a partial sum passes 2^53; the store divides its
          // EXACT long total once, so beyond that magnitude the served
          // avg is the arithmetically-correct value where the native
          // plan's is the buffer-rounded one. Below 2^53 per partial
          // sum (every oracle here, and any sane unit choice short of
          // summing >9e15 in one partition) they are bit-identical;
          // past it the rewrite is deliberately MORE accurate rather
          // than bug-compatible with the rounding.
          Alias(Divide(Cast(sTotal, DoubleType), Cast(sCnt, DoubleType)),
            orig.name)(exprId = orig.exprId)
        case (orig, OutCol.Lo) =>
          Alias(sCol("vmin"), orig.name)(exprId = orig.exprId)
        case (orig, OutCol.Hi) =>
          Alias(sCol("vmax"), orig.name)(exprId = orig.exprId)
      }, store))
    }
  }

  private sealed trait OutColT
  private object OutCol {
    case class Key(i: Int) extends OutColT
    case object Cnt extends OutColT
    case object Total extends OutColT
    case object Mean extends OutColT
    case object Lo extends OutColT
    case object Hi extends OutColT
  }

  /** A parsed key-literal filter: `key = lit` / `key IN (lits)` on a
    * single-column key, or a CONJUNCTION of per-column predicates
    * covering a multi-column (struct-keyed) registration exactly once
    * each — "this (customer, month)'s aggregate", the struct-key
    * lookup q332's serving naturally composes with. AT MOST ONE of the
    * multi-key conjuncts may be an IN list ("these suppliers' flag-A
    * aggregates" — the cross product is degenerate and unambiguous);
    * two or more INs are deliberately not matched: their full cross
    * product is a shape the caller may not intend, and the lookup row
    * count would be multiplicative.
    */
  private sealed trait KeyPredT
  private case class SingleKey(a: AttributeReference,
                               lits: Seq[Literal]) extends KeyPredT
  private case class MultiKey(eqs: Seq[(AttributeReference, Seq[Literal])])
    extends KeyPredT

  /** Every aggregate output must be a group key, count(<lit>),
    * sum(<val>), or avg(<val>) — else no rewrite. */
  private def mapOutputs(aggExprs: Seq[NamedExpression],
                         keyAttrs: Seq[Attribute], valAttr: Attribute)
      : Option[Seq[(NamedExpression, OutColT)]] = {
    val mapped = aggExprs.map { ne =>
      val inner = ne match {
        case Alias(c, _) => c
        case other => other
      }
      inner match {
        case a: AttributeReference
            if keyAttrs.exists(_.exprId == a.exprId) =>
          Some(ne -> (OutCol.Key(keyAttrs.indexWhere(_.exprId == a.exprId))
            : OutColT))
        // the literal must be NON-null: count(NULL) is 0 for every
        // group, not the store's per-key row count
        case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
            if v != null =>
          Some(ne -> (OutCol.Cnt: OutColT))
        case AggregateExpression(s: Sum, _, false, None, _)
            if isValRef(s.child, valAttr) =>
          Some(ne -> (OutCol.Total: OutColT))
        case AggregateExpression(a: Average, _, false, None, _)
            if isValRef(a.child, valAttr) =>
          Some(ne -> (OutCol.Mean: OutColT))
        // min/max over the value column, LONG-typed only (the extrema
        // columns are min/max of cast(v as long); a bare int child's
        // Min is IntegerType and would flip the attribute's type)
        case AggregateExpression(m: Min, _, false, None, _)
            if isValRef(m.child, valAttr) && m.dataType == LongType =>
          Some(ne -> (OutCol.Lo: OutColT))
        case AggregateExpression(m: Max, _, false, None, _)
            if isValRef(m.child, valAttr) && m.dataType == LongType =>
          Some(ne -> (OutCol.Hi: OutColT))
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

  private def allDefined[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None

  private def attrNamed(attrs: Seq[Attribute],
                        name: String): Option[Attribute] =
    attrs.find(_.name == name)

  /** The relation under the aggregate: bare, through a column-pruning
    * Project of plain attributes, and/or above a KEY-LITERAL filter
    * (what `WHERE key IN (...)` becomes once the optimizer pushes it
    * below the aggregate). Returns the relation, the attributes visible
    * to the aggregate, and the parsed key predicate if one gates the
    * scan. Any OTHER filter shape refuses the whole match — a value
    * predicate changes the grouped rows and must never be rewritten.
    */
  private def childShape(child: LogicalPlan)
      : Option[(LogicalRelation, Seq[Attribute], Option[KeyPredT])] = {
    def attrsOf(projList: Seq[NamedExpression]): Option[Seq[Attribute]] =
      if (projList.forall(_.isInstanceOf[AttributeReference]))
        Some(projList.map(_.asInstanceOf[AttributeReference]))
      else None
    child match {
      case r: LogicalRelation => Some((r, r.output, None))
      case Project(pl, r: LogicalRelation) =>
        attrsOf(pl).map(as => (r, as, None))
      case Filter(pred, r: LogicalRelation) =>
        keyLiteralPred(pred).map(kp => (r, r.output, Some(kp)))
      case Project(pl, Filter(pred, r: LogicalRelation)) =>
        for (as <- attrsOf(pl); kp <- keyLiteralPred(pred))
          yield (r, as, Some(kp))
      case Filter(pred, Project(pl, r: LogicalRelation)) =>
        for (as <- attrsOf(pl); kp <- keyLiteralPred(pred))
          yield (r, as, Some(kp))
      case _ => None
    }
  }

  /** Key-literal conjuncts plus any number of `IsNotNull` guards on the
    * predicated attributes (the optimizer infers one per equality) —
    * nothing else. One `attr = lit` / `attr IN (lits)` conjunct parses
    * as [[SingleKey]]; two or more per-column predicates on DISTINCT
    * attributes — at most one of them an IN list — parse as
    * [[MultiKey]] (the struct-key shape). The caller validates the
    * attributes against the registered key.
    */
  private def keyLiteralPred(pred: Expression): Option[KeyPredT] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val cs = conjuncts(pred)
    val keyLits = cs.collect {
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        (a, vs.map(_.asInstanceOf[Literal]))
      case EqualTo(a: AttributeReference, l: Literal) => (a, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) => (a, Seq(l))
    }
    val notNulls = cs.collect { case IsNotNull(a: AttributeReference) => a }
    val others = cs.length - keyLits.length - notNulls.length
    keyLits match {
      case Seq((a, lits)) if others == 0 &&
          notNulls.forall(_.exprId == a.exprId) =>
        Some(SingleKey(a, lits))
      case many if many.length >= 2 && others == 0 &&
          many.count(_._2.length > 1) <= 1 &&
          many.map(_._1.exprId).distinct.length == many.length &&
          notNulls.forall(n => many.exists(_._1.exprId == n.exprId)) =>
        Some(MultiKey(many))
      case _ => None
    }
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

  /** Key types the point lookup serves: the equality-joinable atomic
    * types a warehouse keys on, each with a lossless internal↔external
    * round trip through [[CatalystTypeConverters]] (UTF8String↔String,
    * epoch days↔Date, micros↔Timestamp). Fractional keys are excluded
    * on purpose — equality filters on fractional columns are already
    * semantically fraught, and the match would invite them.
    */
  private[plans] def lookupable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType | BooleanType => true
    case _ => false
  }

  private[plans] def pathsOf(rel: LogicalRelation): Set[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString).toSet
      case _ => Set.empty
    }

  /** The freshness gate ([[graft.operators.BaseFiles.covers]]): true
    * when the relation's landed files exactly agree with the store's
    * fingerprint under this relation's roots — no files the store's
    * mutations never saw, no fingerprinted files the base has since
    * lost (or no fingerprint exists — pre-guard stores keep the
    * registration contract); logs the refusal otherwise so staleness
    * is observable, not silent.
    */
  private[plans] def freshOrLog(spark: SparkSession, storePath: String,
                                rel: LogicalRelation,
                                log: org.slf4j.Logger): Boolean = {
    val files = rel.relation match {
      case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
      case _ => Seq.empty
    }
    val ok = graft.operators.BaseFiles.covers(spark, storePath, files,
      pathsOf(rel).toSeq)
    if (!ok) log.warn(
      s"MV rewrite refused: base ${pathsOf(rel).mkString(",")} has landed " +
        s"or deleted files not reflected in the store at $storePath — " +
        "answering from the base; merge the new files (or rebuild after " +
        "a base shrink) to restore serving")
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
