package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed length as a native expression — the
  * compression-ratio quality signal of the Gopher/RefinedWeb filter
  * family: text that compresses too well is repetitive boilerplate,
  * text that barely compresses is often binary junk or high-entropy
  * spam. Ratio thresholds on deflate output are one of the cheapest
  * corpus screens that catches what token-level repetition stats miss
  * (long-range template repeats).
  *
  * Engine shape: row-local, shuffle-free; one thread-local `Deflater`
  * per executor thread, reset per row (constructing one per row costs
  * more than the compression at typical doc sizes). Output length only
  * — the compressed bytes are never materialized; the 8 KiB scratch
  * sink is reused.
  *
  * Determinism: deflate output for a fixed level is deterministic
  * within a JVM/zlib build (all executors of a cluster run the same
  * image), so the signal is stable within any given pipeline run —
  * but it is NOT a cross-engine portable value (DuckDB exposes no
  * compression primitive), so queries over it carry the weaker
  * rows-only oracle check, and thresholds should be calibrated
  * per-image (the spec pins ORDERING properties, not absolute
  * lengths).
  */
object DeflateUtil {
  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Compressed byte length of the UTF-8 bytes of `s` at `level`
    * (raw deflate, no zlib header — headers would add a constant that
    * distorts short-doc ratios). */
  def compressedLength(s: UTF8String, level: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0L // skip the 2-byte empty-stream terminator
    val d = deflaters.get()
    d.reset()
    d.setLevel(level)
    d.setInput(bytes)
    d.finish()
    val buf = sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** deflate_length(text) — compressed size of the row's UTF-8 bytes. */
case class DeflateLength(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= -1 && level <= 9, s"deflate level must be in [-1, 9], got $level")
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_length"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_length requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DeflateUtil.compressedLength(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateUtil.compressedLength($c, $level)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateFunctions {
  def deflateLength(text: Column, level: Int = -1): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(text), level))
}
