package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels as native Catalyst expressions.
  *
  * The codebook (m × ksub × dim/m doubles) rides along as a JVM
  * reference object (`ctx.addReferenceObj`), NOT as literal plan
  * nodes: a `least()`-over-literal-structs argmin at m=8/ksub=16
  * generates >64 KB into one codegen method and knocks the whole
  * stage back to interpreted mode. Here the generated code is a
  * single kernel call, so the surrounding scan stays inside
  * WholeStageCodegen and the per-row cost is the tight argmin loop.
  *
  * Assignment semantics match [[graft.ops.ProductQuantization]]'s
  * replayable convention: per-subspace euclidean distances are rounded
  * to 6 dp (Spark `round` = decimal HALF_UP — reproduced here via
  * BigDecimal) BEFORE the argmin, ties to the lower code index. */
final class PqKernel(val dim: Int, val m: Int, val ksub: Int,
    val words: Array[Array[Array[Double]]]) extends Serializable {
  val ds: Int = dim / m

  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def get(x: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)

  /** argmin code per subspace on 6dp-rounded distance, ties low.
    *
    * Fast path: the naive form calls [[round6]] (a BigDecimal
    * construction) ksub times per subspace — m·ksub = 128 BigDecimal
    * allocations per row at the standard 8×16 shape, which measured
    * as ~10 s per 200k-row scan (the whole pq_topk sf10 wall). The
    * rounding only matters for TIE RESOLUTION: round6 is monotone
    * non-decreasing (shortest-repr decimals of ordered doubles are
    * ordered), so the minimum ROUNDED distance is round6 of the
    * minimum RAW distance, and the selected code is the lowest index
    * whose rounded distance equals it. Only candidates inside the
    * rounding window [0, r + 5e-7) can tie; anything beyond
    * r + 5e-7 + 1e-9 provably rounds higher (double↔shortest-decimal
    * error is ≤ half an ulp ≈ 1e-16, absorbed by the 1e-9 margin).
    * So: one raw squared-distance pass, one round6 of the min, and
    * round6 re-checks only for the (almost always single) candidate
    * inside the window — bit-identical selection to the naive form. */
  def codes(x: ArrayData, isFloat: Boolean): Array[Int] = {
    val out = new Array[Int](m)
    val sq = new Array[Double](ksub)
    var j = 0
    while (j < m) {
      val base = j * ds
      var minS = Double.MaxValue
      var i = 0
      while (i < ksub) {
        val w = words(j)(i)
        var s = 0.0; var d = 0
        while (d < ds) {
          val diff = get(x, isFloat, base + d) - w(d); s += diff * diff; d += 1
        }
        sq(i) = s
        if (s < minS) minS = s
        i += 1
      }
      val r = round6(math.sqrt(minS))
      // margin scales with ulp(r): the fixed 1e-9 absorbs shortest-
      // decimal representation error only while distances stay below
      // ~1e7 (half-ulp grows with magnitude); beyond that a true tie
      // candidate could sit past the fixed cut and the prefilter would
      // exclude it — 4·ulp(r) keeps the window provably inclusive at
      // any magnitude
      val cut = r + 5.0e-7 + math.max(1.0e-9, 4.0 * Math.ulp(r))
      val c2 = cut * cut
      var best = -1
      i = 0
      while (best < 0 && i < ksub) {
        if (sq(i) <= c2 && round6(math.sqrt(sq(i))) == r) best = i
        i += 1
      }
      // unreachable for finite inputs (the raw argmin always
      // qualifies); NaN components would have thrown in the naive
      // form too (BigDecimal rejects NaN)
      if (best < 0) throw new IllegalArgumentException(
        s"pq_codes: non-finite distances in subspace $j")
      out(j) = best; j += 1
    }
    out
  }

  def codesAD(x: ArrayData, isFloat: Boolean): ArrayData =
    new GenericArrayData(codes(x, isFloat).map(_.asInstanceOf[Any]))

  /** x̂ = concatenation of each subspace's assigned codeword. */
  def reconstructAD(x: ArrayData, isFloat: Boolean): ArrayData = {
    val cs = codes(x, isFloat)
    val out = new Array[Any](dim)
    var j = 0
    while (j < m) {
      val w = words(j)(cs(j))
      var d = 0
      while (d < ds) { out(j * ds + d) = w(d); d += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** x̂ from STORED codes (no raw vector): the decode half of an
    * encoded index scan. `isByte` = the persisted `array<tinyint>`
    * form (code − 128, [[graft.ops.ProductQuantization.encode]]);
    * otherwise raw int codes. */
  def decodeAD(cs: ArrayData, isByte: Boolean): ArrayData = {
    val out = new Array[Any](dim)
    var j = 0
    while (j < m) {
      val code = if (isByte) cs.getByte(j) + 128 else cs.getInt(j)
      val w = words(j)(code)
      var d = 0
      while (d < ds) { out(j * ds + d) = w(d); d += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def equals(o: Any): Boolean = o match {
    case k: PqKernel => k.dim == dim && k.m == m && k.ksub == ksub &&
      java.util.Arrays.deepEquals(
        k.words.asInstanceOf[Array[AnyRef]], words.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.deepHashCode(words.asInstanceOf[Array[AnyRef]]) * 31 +
      dim * 7 + m * 3 + ksub
}

private[graft] trait PqExpr extends UnaryExpression {
  import VectorExprUtils._
  def kernel: PqKernel
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(prettyName, child)
  protected lazy val isFloat: Boolean = elementType(child) == FloatType
  protected def kernelMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $ref.$kernelMethod($x, $isFloat);")
  }
}

/** pq_codes(vec) → array<int> of the m assigned code indices. */
case class PqEncodeCodes(child: Expression, kernel: PqKernel) extends PqExpr {
  override def prettyName: String = "pq_codes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def kernelMethod: String = "codesAD"
  override def nullSafeEval(a: Any): Any =
    kernel.codesAD(a.asInstanceOf[ArrayData], isFloat)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_reconstruct(vec) → array<double> codeword reconstruction x̂. */
case class PqReconstruct(child: Expression, kernel: PqKernel) extends PqExpr {
  override def prettyName: String = "pq_reconstruct"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def kernelMethod: String = "reconstructAD"
  override def nullSafeEval(a: Any): Any =
    kernel.reconstructAD(a.asInstanceOf[ArrayData], isFloat)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_decode(codes) → array<double> x̂ from stored codes — the scan
  * side of an encoded index: no raw vector, no argmin, just the m
  * codeword copies. Accepts the persisted `array<tinyint>` (code−128)
  * or raw `array<int>` codes. */
case class PqDecodeCodes(child: Expression, kernel: PqKernel) extends UnaryExpression {
  override def prettyName: String = "pq_decode"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<tinyint> or array<int> codes, got ${t.sql}")
  }
  private lazy val isByte: Boolean = child.dataType match {
    case ArrayType(ByteType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any): Any =
    kernel.decodeAD(a.asInstanceOf[ArrayData], isByte)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $ref.decodeAD($x, $isByte);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)
  def pqCodes(x: Column, kernel: PqKernel): Column = col(PqEncodeCodes(ex(x), kernel))
  def pqReconstruct(x: Column, kernel: PqKernel): Column = col(PqReconstruct(ex(x), kernel))
  def pqDecode(codes: Column, kernel: PqKernel): Column = col(PqDecodeCodes(ex(codes), kernel))
}
