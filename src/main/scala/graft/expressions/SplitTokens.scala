package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator expression exposing the token-window chunker to SQL
  * (SURVEY §7.3 "custom Catalyst polish": the G1 split operator as
  * `LATERAL VIEW split_tokens(text, size, overlap)`).
  *
  * Same chunk math as operators.Chunker (chunk i covers tokens
  * [i*step, i*step+size), step = size - overlap); the DataFrame-API chunker
  * remains the primary path — this makes the operator reachable from pure
  * SQL, e.g.:
  *
  *   SELECT doc_id, c.chunk_id, c.chunk_text
  *   FROM documents LATERAL VIEW split_tokens(text, 30, 5) c AS chunk_id, chunk_text
  */
case class SplitTokens(child: Expression, chunkSize: Expression, overlap: Expression)
    extends CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, chunkSize, overlap)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)
  override def inline: Boolean = false
  override def position: Boolean = false

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) return Nil
    val size = chunkSize.eval(input).asInstanceOf[Number].intValue()
    val ov = overlap.eval(input).asInstanceOf[Number].intValue()
    require(ov >= 0 && ov < size, s"need 0 <= overlap < chunkSize, got $ov/$size")
    val toks = text.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return Seq(InternalRow(0L, UTF8String.fromString("")))
    val step = size - ov
    val n = if (toks.length <= size) 1
    else math.ceil((toks.length - ov).toDouble / step).toInt
    (0 until n).map { i =>
      val chunk = toks.slice(i * step, i * step + size).mkString(" ")
      InternalRow(i.toLong, UTF8String.fromString(chunk))
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), chunkSize = newChildren(1), overlap = newChildren(2))
}
