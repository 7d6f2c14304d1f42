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

object MojibakeUtil {
  /** Repair the dominant web-corpus mojibake class: UTF-8 bytes of the
    * LATIN-1 SUPPLEMENT (U+0080–U+00FF) that were decoded as Latin-1 —
    * "é" shipped as "Ã©", NBSP as "Â ". In the damaged text every such
    * character appears as a 2-char sequence (U+00C2|U+00C3 lead, then
    * a char whose code point is 0x80–0xBF); one left-to-right pass
    * re-fuses each pair into its code point (lead 0xC2 → trail
    * verbatim, lead 0xC3 → trail + 0x40, exactly UTF-8's 2-byte
    * arithmetic). A lead NOT followed by a valid trail copies through
    * (real "Ã"/"Â" text is untouched), so the repair is idempotent on
    * clean text. Twice-encoded text loses one layer per application.
    * Fast path: strings containing neither lead char pass through
    * without allocation (the NfcNormalize ASCII-fast-path discipline —
    * most of a healthy corpus never pays). */
  def fix(s: UTF8String): UTF8String = {
    val str = s.toString
    var has = false
    var i = 0
    while (!has && i < str.length) {
      val c = str.charAt(i).toInt
      if (c == 0xC2 || c == 0xC3) has = true
      i += 1
    }
    if (!has) return s
    val sb = new java.lang.StringBuilder(str.length)
    i = 0
    while (i < str.length) {
      val c = str.charAt(i).toInt
      val trail = if (i + 1 < str.length) str.charAt(i + 1).toInt else 0
      if ((c == 0xC2 || c == 0xC3) && trail >= 0x80 && trail <= 0xBF) {
        sb.append((if (c == 0xC2) trail else trail + 0x40).toChar)
        i += 2
      } else { sb.append(str.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** fix_mojibake(text) — re-fuse Latin-1-supplement UTF-8-as-Latin-1
  * double encoding (see [[MojibakeUtil.fix]]). */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake requires a string argument, got ${other.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    MojibakeUtil.fix(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeUtil.fix($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeFunctions {
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def fixMojibake(text: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(text)))
}
