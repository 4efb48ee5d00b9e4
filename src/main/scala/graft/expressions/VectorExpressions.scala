package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float/double
  * arrays, with whole-stage codegen (`doGenCode` emits a fused
  * multiply-accumulate loop over the unsafe array data).
  *
  * Why not `zip_with`/`aggregate`: Spark's higher-order functions are
  * evaluated interpreted (one closure dispatch + boxing per element). For
  * 64-dim embeddings inside an LSH bucket join that interpretation is the
  * bottleneck (measured ~5-8s/query at sf0.1); this expression is a tight
  * primitive loop inside the generated stage. Same fold order as the
  * HOF/oracle formulation (sequential, double accumulation after exact
  * float->double widening) so results are bit-identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val den = ctx.freshName("den")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = (double) $a.$lGet($i);
         |  double yv = (double) $b.$rGet($i);
         |  $dot += xv * yv; $na += xv * xv; $nb += yv * yv;
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product, same codegen strategy. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var i = 0
    while (i < n) {
      val xv: Double = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv: Double = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSimilarity(GraftShim.expression(a), GraftShim.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(GraftShim.expression(a), GraftShim.expression(b)))

  /** Register as SQL functions on an existing session (the
    * SparkSessionExtensions path for spark.sql users).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("split_tokens",
      es => SplitTokens(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("normalize_text",
      es => NormalizeText(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig.fromSql(es), "built-in")
  }
}

/** Index of the nearest centroid by squared L2 — the IVF cell-assignment
  * kernel. Centroid matrix ships as a codegen reference object; per row the
  * work is one fused cells x dims multiply-accumulate with running argmin.
  * Ties break to the lower cell index (strict <).
  */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val f = elemIsFloat
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val m = math.min(n, cen.length)
      var d = 0.0; var i = 0
      while (i < m) {
        val xv: Double = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = xv - cen(i); d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val m = ctx.freshName("m")
      val diff = ctx.freshName("diff")
      s"""
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] cen = $cRef[$c];
         |  int $m = java.lang.Math.min($v.numElements(), cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $diff = ((double) $v.$get($i)) - cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared L2 TO the nearest centroid — [[NearestCell]]'s companion
  * returning the min DISTANCE instead of the argmin index: the per-
  * subspace quantization error of PQ encoding, the measurable half of
  * the frozen-codebook drift trade (Similarity.ivfPqDriftStats). Same
  * fused loop, same strict-< scan; min over doubles is commutative, so
  * the value is engine-exact however an oracle computes it.
  */
case class NearestCellDist(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val f = elemIsFloat
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val m = math.min(n, cen.length)
      var d = 0.0; var i = 0
      while (i < m) {
        val xv: Double = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = xv - cen(i); d += diff * diff
        i += 1
      }
      if (d < bestD) bestD = d
      c += 1
    }
    bestD
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val bestD = ctx.freshName("bestD")
      val m = ctx.freshName("m"); val diff = ctx.freshName("diff")
      s"""
         |double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] cen = $cRef[$c];
         |  int $m = java.lang.Math.min($v.numElements(), cen.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $diff = ((double) $v.$get($i)) - cen[$i];
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) $bestD = $d;
         |}
         |${ev.value} = $bestD;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization asymmetric-distance table: for a query vector,
  * dt[m][c] = ||q_sub_m - codebook[m][c]||^2 over all M subspaces x K
  * sub-centroids — computed ONCE per query row (the FAISS ADC shape), so
  * each (query, code) candidate afterwards costs M array lookups instead of
  * M x subDim multiplies. Codebooks ship as a codegen reference object.
  */
case class PqDistTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(ArrayType(DoubleType, false), false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val f = elemIsFloat
    val m = codebooks.length
    val sub = if (m > 0) codebooks(0)(0).length else 0
    val rows = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val cb = codebooks(mi)
      val row = new Array[Any](cb.length)
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val idx = mi * sub + i
          val xv: Double =
            if (idx < v.numElements()) { if (f) v.getFloat(idx).toDouble else v.getDouble(idx) }
            else 0.0
          val diff = xv - cen(i); d += diff * diff
          i += 1
        }
        row(c) = d
        c += 1
      }
      rows(mi) = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(row)
      mi += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val idx = ctx.freshName("idx"); val diff = ctx.freshName("diff")
      val sub = ctx.freshName("sub"); val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      s"""
         |int $sub = $cbRef.length > 0 ? $cbRef[0][0].length : 0;
         |Object[] $rows = new Object[$cbRef.length];
         |for (int $m = 0; $m < $cbRef.length; $m++) {
         |  double[] $row = new double[$cbRef[$m].length];
         |  for (int $c = 0; $c < $cbRef[$m].length; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      int $idx = $m * $sub + $i;
         |      double $diff = ($idx < $v.numElements() ? (double) $v.$get($idx) : 0.0)
         |        - $cbRef[$m][$c][$i];
         |      $d += $diff * $diff;
         |    }
         |    $row[$c] = $d;
         |  }
         |  $rows[$m] = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($row);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($rows);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All nBits hyperplane sign-bits of the LSH bucket in ONE pass over the
  * vector (plane matrix shipped as a codegen reference object — no per-row
  * array literals, no per-bit re-reads of the vector).
  */
case class HyperplaneLsh(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val f = elemIsFloat
    var bucket = 0L
    var b = 0
    while (b < planes.length) {
      val plane = planes(b)
      val m = math.min(n, plane.length)
      var proj = 0.0
      var i = 0
      while (i < m) {
        val xv: Double = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        proj += xv * plane(i)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val proj = ctx.freshName("proj"); val bucket = ctx.freshName("bucket")
      val m = ctx.freshName("m")
      s"""
         |long $bucket = 0L;
         |for (int $b = 0; $b < $planesRef.length; $b++) {
         |  double[] plane = $planesRef[$b];
         |  int $m = java.lang.Math.min($v.numElements(), plane.length);
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $proj += ((double) $v.$get($i)) * plane[$i];
         |  }
         |  if ($proj >= 0) $bucket |= (1L << $b);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
