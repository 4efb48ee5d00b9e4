package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Divide, EqualTo, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.LongType

import graft.operators.ViewStore

/** JOIN-VIEW REWRITE — the [[AggStoreRewrite]] idea one operator up:
  * `SELECT grp, count(*), sum(v) FROM A JOIN B ON A.k = B.k GROUP BY
  * grp` over REGISTERED base relations rewrites to a scan of the
  * maintained [[ViewStore]] — the query skips the corpus-size join
  * AND the corpus-size aggregation, paying view-size I/O. Same
  * conservative contract: inner equi-join on exactly the registered
  * keys, (column-pruning) Projects of plain attributes only, relations
  * matched by root paths in either join order, count/sum/avg shapes
  * with at most a widening cast — and anything unrecognized is left
  * untouched. The only predicates accepted are the optimizer's
  * inferred join-key null guards, plus — on the A side — ONE
  * `grp = lit` / `grp IN (lits)` conjunct (what a group point filter
  * becomes once pushed below the aggregate and the join), which turns
  * the rewrite into the bucket-pruned POINT LOOKUP
  * [[ViewStore.lookupJoinViewGroups]]: ≤ |groups| view buckets instead
  * of even the view scan. FRESHNESS is verified against the store's
  * landed-file fingerprint ([[graft.operators.BaseFiles]]), as in
  * [[AggStoreRewrite]].
  */
object JoinViewCatalog {

  case class JvEntry(aPaths: Set[String], bPaths: Set[String],
                     aKeyCol: String, aGrpCol: String,
                     bKeyCol: String, bValCol: String, storePath: String)

  private val reg = scala.collection.mutable.ArrayBuffer.empty[JvEntry]

  /** Register `storePath` (a [[ViewStore]]) as the materialization of
    * `a.join(b, a(aKeyCol) === b(bKeyCol)).groupBy(aGrpCol)
    * .agg(count(*), sum(bValCol))`. Both bases must be bare parquet
    * reads — loud otherwise.
    */
  def registerJoinView(a: DataFrame, b: DataFrame,
                       aKeyCol: String, aGrpCol: String,
                       bKeyCol: String, bValCol: String,
                       storePath: String): Unit = {
    def paths(df: DataFrame, what: String): Set[String] =
      AggStoreRewrite.relationPaths(df.queryExecution.analyzed)
        .getOrElse(throw new IllegalArgumentException(
          s"registerJoinView needs a bare parquet relation for $what"))
    val (ap, bp) = (paths(a, "A"), paths(b, "B"))
    // the view stores grp as LONG and total as the exact LONG sum —
    // a non-long group would only ever produce silent non-rewrites,
    // and a non-numeric value column can only mis-serve; loud here
    require(a.schema(aGrpCol).dataType == org.apache.spark.sql.types.LongType,
      s"registerJoinView: group column $aGrpCol must be LongType " +
        s"(got ${a.schema(aGrpCol).dataType.simpleString}) — the view " +
        "stores groups as long")
    require(b.schema(bValCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"registerJoinView: value column $bValCol must be numeric " +
        s"(got ${b.schema(bValCol).dataType.simpleString})")
    synchronized {
      reg += JvEntry(ap, bp, aKeyCol, aGrpCol, bKeyCol, bValCol, storePath)
    }
  }

  def clear(): Unit = synchronized { reg.clear() }

  def entries: Seq[JvEntry] = synchronized { reg.toList }
}

case class JoinViewRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (JoinViewCatalog.entries.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(Seq(g), aggExprs, child, _) =>
        rewrite(g, aggExprs, child).getOrElse(agg)
    }
  }

  /** A side of the join: the relation's root paths, the attributes the
    * join sees (through column-pruning Projects of attributes), the
    * attributes of optimizer-inferred `IsNotNull` guards, and at most
    * ONE `attr = lit` / `attr IN (lits)` conjunct (what a group-key
    * point filter becomes once pushed below the aggregate and the
    * join). Anything else refuses the side. The caller validates which
    * attributes the guards and the key predicate are allowed to name.
    */
  private def side(plan: LogicalPlan)
      : Option[(Set[String], Seq[Attribute], Seq[AttributeReference],
        Option[(AttributeReference, Seq[Literal])], LogicalRelation)] = {
    def bare(p: LogicalPlan)
        : Option[(Set[String], Seq[Attribute], LogicalRelation)] =
      p match {
        case r: LogicalRelation =>
          Some((AggStoreRewrite.pathsOf(r), r.output, r))
        case Project(projList, r: LogicalRelation)
            if projList.forall(_.isInstanceOf[AttributeReference]) =>
          Some((AggStoreRewrite.pathsOf(r),
            projList.map(_.asInstanceOf[AttributeReference]), r))
        case _ => None
      }
    plan match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(pred, inner) =>
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
            conjuncts(a) ++ conjuncts(b)
          case other => Seq(other)
        }
        val cs = conjuncts(pred)
        val notNulls = cs.collect {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(
            a: AttributeReference) => a
        }
        val keyLits = cs.collect {
          case org.apache.spark.sql.catalyst.expressions.In(
              a: AttributeReference, vs)
              if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
            (a, vs.map(_.asInstanceOf[Literal]))
          case EqualTo(a: AttributeReference, l: Literal) => (a, Seq(l))
          case EqualTo(l: Literal, a: AttributeReference) => (a, Seq(l))
        }
        val others = cs.length - notNulls.length - keyLits.length
        if (others > 0 || keyLits.length > 1) None
        else bare(inner).map { case (p, attrs, r) =>
          (p, attrs, notNulls, keyLits.headOption, r)
        }
      case other =>
        bare(other).map { case (p, attrs, r) =>
          (p, attrs, Seq.empty, None, r)
        }
    }
  }

  private def stripProject(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) => child
    case other => other
  }

  private def rewrite(g: Expression, aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val matched = stripProject(child) match {
      case Join(l, r, Inner,
          Some(EqualTo(x: AttributeReference, y: AttributeReference)), _) =>
        // several views may register the same base pair — try every
        // path-matching entry, first full match wins
        (for {
          (lp, lAttrs, lNulls, lKeyLit, lRel) <- side(l).iterator
          (rp, rAttrs, rNulls, rKeyLit, rRel) <- side(r).iterator
          entry <- JoinViewCatalog.entries.iterator.filter(e =>
            PathNorm.pathsEqual(lp, e.aPaths) &&
              PathNorm.pathsEqual(rp, e.bPaths))
          // FRESHNESS: both bases' landed files must be reflected in
          // the view store, else answer from the bases (correct, not
          // accelerated) until the new files merge in
          _ <- Some(()).filter(_ =>
            AggStoreRewrite.freshOrLog(spark, entry.storePath, lRel, log) &&
              AggStoreRewrite.freshOrLog(spark, entry.storePath, rRel, log))
          aKey <- lAttrs.find(_.name == entry.aKeyCol)
          aGrp <- lAttrs.find(_.name == entry.aGrpCol)
          bKey <- rAttrs.find(_.name == entry.bKeyCol)
          bVal <- rAttrs.find(_.name == entry.bValCol)
          // the equi-condition must be exactly the registered key pair
          // (either literal order)
          _ <- Some(()).filter(_ =>
            (x.exprId == aKey.exprId && y.exprId == bKey.exprId) ||
              (x.exprId == bKey.exprId && y.exprId == aKey.exprId))
          // the b side accepts only the inferred join-key null guard —
          // an inner equi-join drops null keys anyway; a key-literal
          // predicate there would change the PAIR set, never rewritable
          _ <- Some(()).filter(_ =>
            rKeyLit.isEmpty && rNulls.forall(_.exprId == bKey.exprId))
          // the a side additionally accepts ONE group-literal predicate
          // (the pushed-down point filter — it becomes the bucket-pruned
          // lookup below) plus its inferred IsNotNull(grp): the view
          // build rejects null groups loudly, so the guard is vacuous
          // exactly when the literal predicate is present
          _ <- Some(()).filter(_ => lKeyLit.forall { case (a, lits) =>
            a.exprId == aGrp.exprId &&
              lits.forall(lt => lt.dataType == LongType && lt.value != null)
          })
          _ <- Some(()).filter(_ => lNulls.forall(n =>
            n.exprId == aKey.exprId ||
              (lKeyLit.isDefined && n.exprId == aGrp.exprId)))
          gAttr <- g match {
            case a: AttributeReference => Some(a)
            case Alias(a: AttributeReference, _) => Some(a)
            case _ => None
          }
          _ <- Some(()).filter(_ => gAttr.exprId == aGrp.exprId)
          outs <- mapOutputs(aggExprs, aGrp, bVal)
        } yield (entry, aGrp, outs, lKeyLit)).nextOption()
      case _ => None
    }
    matched.flatMap { case (entry, aGrp, outs, keyLit) =>
      // min/max serve only from an EXTREMA view (insert-only monoid
      // columns the plain view does not carry)
      val needsExtrema = outs.exists(o => o._2 == 4 || o._2 == 5)
      if (needsExtrema && !ViewStore.hasExtrema(spark, entry.storePath)) None
      else {
      // optimized subplan, not analyzed — the outer tree's hint and
      // subquery batches have already run (the AggStoreRewrite argument)
      val storeDf = keyLit match {
        case Some((_, lits)) => // POINT LOOKUP: ≤ |groups| view buckets
          import spark.implicits._
          val ks = lits.map(_.value.asInstanceOf[Long]).distinct.toDF("key")
          if (needsExtrema)
            ViewStore.lookupJoinViewGroupsExtrema(ks, entry.storePath)
          else ViewStore.lookupJoinViewGroups(ks, entry.storePath)
        case None =>
          if (needsExtrema)
            ViewStore.readJoinViewExtrema(spark, entry.storePath)
          else ViewStore.readJoinView(spark, entry.storePath)
      }
      val store = storeDf.queryExecution.optimizedPlan
      def sCol(n: String): Attribute = store.output.find(_.name == n).get
      val (sKey, sCnt, sTotal) = (sCol("key"), sCol("cnt"), sCol("total"))
      // the view stores the group as LONG (ViewStore.aggA casts); only
      // rewrite when the query's group attribute is long too
      if (sKey.dataType != aGrp.dataType) None
      else Some(Project(outs.map {
        case (orig, 0) => Alias(sKey, orig.name)(exprId = orig.exprId)
        case (orig, 1) => Alias(sCnt, orig.name)(exprId = orig.exprId)
        case (orig, 2) => Alias(sTotal, orig.name)(exprId = orig.exprId)
        case (orig, 4) => Alias(sCol("vmin"), orig.name)(exprId = orig.exprId)
        case (orig, 5) => Alias(sCol("vmax"), orig.name)(exprId = orig.exprId)
        case (orig, _) => // avg == total / cnt — see AggStoreRewrite's
          // EXACTNESS NOTE: bit-identical to native Average below 2^53
          // per partial sum; past it the store's one-divide of the
          // exact long total is deliberately MORE accurate than the
          // native double-buffer rounding (documented deviation)
          Alias(Divide(
            Cast(sTotal, org.apache.spark.sql.types.DoubleType),
            Cast(sCnt, org.apache.spark.sql.types.DoubleType)),
            orig.name)(exprId = orig.exprId)
      }, store))
      }
    }
  }

  /** Each output must be the group key (0), count(<lit>) (1),
    * sum(<bVal>) with at most a widening cast (2), avg(<bVal>) (3), or
    * — extrema views only — min(<bVal>) (4) / max(<bVal>) (5),
    * LONG-typed like the stored extrema (a bare int child's Min is
    * IntegerType and would flip the attribute's type mid-plan).
    */
  private def mapOutputs(aggExprs: Seq[NamedExpression], grpAttr: Attribute,
                         valAttr: Attribute)
      : Option[Seq[(NamedExpression, Int)]] = {
    val mapped = aggExprs.map { ne =>
      val inner = ne match {
        case Alias(c, _) => c
        case other => other
      }
      inner match {
        case a: AttributeReference if a.exprId == grpAttr.exprId =>
          Some(ne -> 0)
        // non-null literal only: count(NULL) is 0 per group, not the
        // view's pair count
        case AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _)
            if v != null =>
          Some(ne -> 1)
        case AggregateExpression(s: Sum, _, false, None, _)
            if isValRef(s.child, valAttr) =>
          Some(ne -> 2)
        case AggregateExpression(a: Average, _, false, None, _)
            if isValRef(a.child, valAttr) =>
          Some(ne -> 3)
        case AggregateExpression(m: Min, _, false, None, _)
            if isValRef(m.child, valAttr) && m.dataType == LongType =>
          Some(ne -> 4)
        case AggregateExpression(m: Max, _, false, None, _)
            if isValRef(m.child, valAttr) && m.dataType == LongType =>
          Some(ne -> 5)
        case _ => None
      }
    }
    if (mapped.forall(_.isDefined)) Some(mapped.flatten) else None
  }

  /** `v` (integral only) or `cast(v as long)` (any numeric `v`, which
    * truncates exactly as the view's own write did) — the
    * [[AggStoreRewrite.isValRef]] argument verbatim: a bare fractional
    * sum must never serve the truncated long. */
  private def isValRef(e: Expression, valAttr: Attribute): Boolean = e match {
    case a: AttributeReference =>
      a.exprId == valAttr.exprId && AggStoreRewrite.integral(a.dataType)
    case Cast(a: AttributeReference, LongType, _, _) =>
      a.exprId == valAttr.exprId
    case _ => false
  }
}
