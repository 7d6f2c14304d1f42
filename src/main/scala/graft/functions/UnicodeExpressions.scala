package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the canonical-
  * equivalence step of a crawl-cleaning pipeline. Web text mixes
  * composed ("é" U+00E9) and decomposed ("e"+U+0301) encodings of the
  * SAME character; byte-level hashes, shingles, and dedup keys treat
  * them as different documents. Spark ships no normalization function,
  * so this wraps `java.text.Normalizer` (NFC) with an ASCII fast path:
  * ASCII bytes are NFC-invariant by definition, and a UTF8String whose
  * bytes are all < 0x80 passes through untouched — on a mostly-ASCII
  * corpus the expensive String round-trip never happens. Oracle-able:
  * DuckDB's `nfc_normalize` computes the same canonical form. */
object UnicodeUtil {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: scan bytes once; high bit set => non-ASCII
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** nfc_normalize(text) — Unicode canonical composition. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    UnicodeUtil.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeFunctions {
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
