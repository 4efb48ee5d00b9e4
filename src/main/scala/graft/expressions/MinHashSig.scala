package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Shingle hash shared by the fused expression's portable mode and the
  * declarative/oracle formulations: the first 60 bits (15 hex chars) of
  * md5 — reproducible in any engine with md5 + integer arithmetic, and
  * small enough that the universal-hash step (a*h+b, a < 2^20) cannot
  * overflow a signed long after the mod-P reduction.
  */
object PortableHash {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes) == CAST('0x' || substr(md5(s),1,15) AS BIGINT). */
  def hash60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }
}

/** Whole MinHash signature in ONE codegen'd pass over the shingle array.
  *
  * Equivalent declarative form (graft.operators.Dedup.shingleHashes +
  * minhashSignature): `transform(shingles, x => pmod(xxhash64(x), p))`
  * followed by k x `array_min(transform(hs, h => pmod(h*a_i+b_i, p)))`.
  * Higher-order functions are always interpreted (CodegenFallback), so that
  * shape pays k+1 boxed closure passes per row; for a corpus-dedup job the
  * signature is the dominant map-side cost. This expression emits the same
  * arithmetic (xxhash64 seed 42 -> 31-bit, universal hash family
  * (a*h+b) mod (2^31-1)) as a fused primitive loop: one shingle scan,
  * k running minima, no allocation beyond the output array.
  *
  * Bounds: h < 2^31, a < 2^20 => a*h+b < 2^52 — no long overflow.
  */
case class MinHashSig(child: Expression, ab: Array[Array[Long]],
                      portableHash: Boolean = false)
    extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = ab.length
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val raw =
        if (portableHash) PortableHash.hash60(arr.getUTF8String(j))
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      val h = ((raw % P) + P) % P
      var i = 0
      while (i < k) {
        val v = (ab(i)(0) * h + ab(i)(1)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val abRef = ctx.addReferenceObj("ab", ab, "long[][]")
    val hashCall =
      if (portableHash) "graft.expressions.PortableHash.hash60"
      else "org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String"
    val hashArgs = if (portableHash) "" else ", 42L"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val mins = ctx.freshName("mins")
      val raw = ctx.freshName("raw"); val h = ctx.freshName("h")
      val slot = ctx.freshName("slot")
      s"""
         |int $n = $v.numElements();
         |long[] $mins = new long[$abRef.length];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $raw = $hashCall($v.getUTF8String($j)$hashArgs);
         |  long $h = (($raw % 2147483647L) + 2147483647L) % 2147483647L;
         |  for (int $i = 0; $i < $abRef.length; $i++) {
         |    long $slot = ($abRef[$i][0] * $h + $abRef[$i][1]) % 2147483647L;
         |    if ($slot < $mins[$i]) $mins[$i] = $slot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Deterministic universal-hash constants — same family and seed handling
    * as Dedup.minhashSignature so both formulations produce identical
    * signatures.
    */
  def constants(numHashes: Int, seed: Int = 7): Array[Array[Long]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numHashes)(Array(1L + rnd.nextInt((1 << 20) - 1).toLong,
      rnd.nextInt(1 << 20).toLong))
  }

  def apply(shingles: Column, numHashes: Int, seed: Int): Column =
    apply(shingles, numHashes, seed, portableHash = false)

  def apply(shingles: Column, numHashes: Int, seed: Int, portableHash: Boolean): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(shingles),
      constants(numHashes, seed), portableHash))

  /** SQL-registration builder: the hash-family constants are derived at plan
    * time, so numHashes/seed MUST be foldable — a bare column reference here
    * would otherwise surface as an opaque unbound-reference/NPE from eval().
    */
  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  def fromSql(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): MinHashSig = {
    if (es.length != 3)
      analysisError("minhash_sig(shingles, numHashes, seed) takes exactly 3 arguments")
    if (!es(1).foldable || !es(2).foldable)
      analysisError("minhash_sig(shingles, numHashes, seed) requires literal " +
        "numHashes/seed: the hash-family constants are derived at plan time")
    MinHashSig(es.head, constants(
      es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Number].intValue()))
  }
}
