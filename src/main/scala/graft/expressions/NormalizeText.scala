package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleanup — the canonical first
  * stage of a web-scale text pipeline, run BEFORE tokenization so that
  * visually identical strings dedup/tokenize identically:
  *
  *  1. NFC canonical composition (e + combining accent -> é), so the same
  *     word spelled with decomposed codepoints is one vocabulary entry;
  *  2. strip C0/C1-ish control characters (except TAB/LF/CR, which the
  *     next step folds anyway) that OCR and bad scrapes inject;
  *  3. collapse whitespace runs to single spaces and trim.
  *
  * Spark has no NFC builtin, so this is a native codegen expression (the
  * per-row work stays inside whole-stage codegen; the heavy lifting is the
  * JDK's java.text.Normalizer, referenced statically from the generated
  * code). DuckDB's nfc_normalize + regexp_replace replay it exactly, which
  * is what the q104 oracle does.
  */
case class NormalizeText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(NormalizeText.norm(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expressions.NormalizeText.norm($c.toString()));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** Stripped set = C0 controls minus TAB/LF/CR, plus DEL. Mirrored
    * char-for-char by the q104 DuckDB oracle regex.
    */
  def norm(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    nfc.replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
      .replaceAll("\\s+", " ").trim
  }
}
