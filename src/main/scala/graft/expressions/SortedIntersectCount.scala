package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Exact |a ∩ b| for two string arrays that are BOTH sorted ascending in
  * Spark's binary string order (`array_sort`) and duplicate-free — the
  * verify kernel for set-similarity joins ([[graft.operators.SetJoin]]).
  *
  * Why not `size(array_intersect(a, b))`: the builtin builds a hash set
  * over one array, probes every element of the other, and ALLOCATES the
  * intersection array — and the union needs a second pass of the same.
  * A candidate-verify runs this per candidate pair (~310k pairs for 256
  * real ones at sf0.1), so the hashing dominated the whole query. This
  * expression is a fused merge loop inside whole-stage codegen: at most
  * |a| + |b| UTF8String compares, zero allocation, and |∪| follows free
  * by inclusion–exclusion (|a| + |b| - |∩| on duplicate-free inputs).
  *
  * Contract: elements non-null, each array sorted + distinct. Unsorted
  * input silently undercounts — callers own the `array_sort`; the
  * SetJoinSpec brute-force equivalence pins the composed contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_isect_count needs two array<string> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n1 = x.numElements(); val n2 = y.numElements()
    var cnt = 0L; var i = 0; var j = 0
    while (i < n1 && j < n2) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cnt = ctx.freshName("cnt")
      s"""
         |int $n1 = $a.numElements(); int $n2 = $b.numElements();
         |long $cnt = 0L; int $i = 0; int $j = 0;
         |while ($i < $n1 && $j < $n2) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def apply(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))
}
