package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Deterministic mergeable quantile summary — a KLL-style compactor
  * stack (Karnin, Lang & Liberty 2016 structure) with DETERMINISTIC
  * compaction, completing the repo's mergeable-sketch family (HLL++
  * distinct counts, count-min point counts, Misra-Gries heavy hitters).
  *
  * Structure: `levels(l)` holds items of weight 2^l; `add` appends to
  * level 0; a level reaching capacity `k` is sorted and compacted —
  * every PAIR (a ≤ b) is replaced by its LARGER member at weight
  * 2^(l+1) (an odd leftover stays behind). Keeping the larger of each
  * pair makes the weighted rank estimate
  *
  *   estRank(x) = Σ { w(item) : item ≤ x }
  *
  * one-sided: one compaction at level l can only LOSE ≤ 2^l of mass
  * below any query point x (exactly when x separates a pair), never
  * gain, so after any add/merge sequence
  *
  *   estRank(x)  ≤  trueRank(x)  ≤  estRank(x) + errBound
  *
  * where `errBound` = Σ 2^l over the compactions actually performed —
  * tracked EXACTLY in the buffer, so the summary carries its own
  * worst-case guarantee and a caller can gate on it (the bound is
  * valid under any arrival order, partitioning, or merge-tree shape;
  * its numeric value varies with the compaction sequence, which is
  * why the gate query reports only exact-side values + the boolean).
  *
  * Scale shape: each task buffer holds ≤ k·log₂(n/k) doubles, the
  * exchange moves ONE buffer per partition, and the final merge is a
  * per-level concatenate + compact — the quantile analogue of the
  * Misra-Gries plan, vs. a global sort that shuffles every row.
  * Typical accuracy: errBound/n ≈ log₂(n/k)/(2k) — k=256 gives
  * ~2.5% worst-case rank error at n = 10^6, ~3.5% at 10^9.
  */
final class QSketchBuffer(val k: Int) {
  require(k >= 2, "quantile sketch capacity must be >= 2")
  // levels(l): UNSORTED items of weight 2^l (sorted transiently at
  // compaction time only)
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  var n: Long = 0L
  var errBound: Long = 0L

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).length >= k) compact(0)
  }

  /** Sort level l, promote the larger of each pair to level l+1 (odd
    * leftover — the max, after sorting — stays), add 2^l to the error
    * budget. Cascades if the promotion fills level l+1. */
  private def compact(l: Int): Unit = {
    val buf = levels(l)
    if (buf.length < 2) return
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    val pairs = arr.length / 2
    buf.clear()
    if (arr.length % 2 == 1) buf += arr(arr.length - 1) // odd max stays
    if (levels.length == l + 1) levels += ArrayBuffer.empty[Double]
    val up = levels(l + 1)
    var i = 0
    while (i < pairs) { up += arr(2 * i + 1); i += 1 }
    errBound += 1L << l
    if (up.length >= k) compact(l + 1)
  }

  def mergeFrom(o: QSketchBuffer): Unit = {
    var l = 0
    while (l < o.levels.length) {
      if (levels.length == l) levels += ArrayBuffer.empty[Double]
      levels(l) ++= o.levels(l)
      l += 1
    }
    n += o.n
    errBound += o.errBound
    l = 0
    while (l < levels.length) { // cascade handles re-overflow upward
      if (levels(l).length >= k) compact(l)
      l += 1
    }
  }

  /** Max single-item weight — the resolution term in the query bound. */
  def maxWeight: Long = 1L << (levels.length - 1)

  /** All (value, weight) items, value-ascending (weight-desc ties for
    * determinism of the walk, though any tie order satisfies the
    * bound). */
  def sortedItems: Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    out.sortBy { case (v, w) => (v, -w) }.toArray
  }

  /** Smallest summary value v with estRank(v) ≥ target rank `t`
    * (1-based, VALUE-cumulative so ties are counted whole). Compaction
    * conserves total weight, so Σw == n exactly and any t ≤ n is
    * reachable (the trailing max-fallback is defensive only). Caller
    * guarantee, from the one-sided rank bound:
    * trueRank(result) ≥ estRank(result) ≥ t and
    * trueRank(result) ≤ estRank(result) + errBound. */
  def valueAtRank(t: Long): Double =
    QSummary(n, errBound, maxWeight, sortedItems).valueAtRank(t)
}

/** quantile_sketch(value, k) — aggregate returning the summary as
  * struct<n, err_bound, max_weight, items: array<struct<v, w>>>
  * (items value-ascending). Feed [[QSketchBuffer.valueAtRank]]'s logic
  * on the driver for quantile queries, or gate directly on
  * `err_bound`. */
case class QuantileSketchAgg(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer] {

  require(k >= 2, "k must be >= 2")

  override def children: Seq[Expression] = Seq(value)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (value.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch value must be DOUBLE, got ${value.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = QuantileSketchAgg.outType

  override def createAggregationBuffer(): QSketchBuffer = new QSketchBuffer(k)

  override def update(buf: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = value.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: QSketchBuffer): Any = {
    val items = buf.sortedItems
    InternalRow(buf.n, buf.errBound, buf.maxWeight,
      new GenericArrayData(items.map { case (v, w) => InternalRow(v, w) }
        .asInstanceOf[Array[Any]]))
  }

  override def serialize(buf: QSketchBuffer): Array[Byte] = QSketchIO.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): QSketchBuffer = QSketchIO.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(value = newChildren(0))
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {
  val outType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("max_weight", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** Rebuild driver-side query state from one collected summary row. */
  def fromRow(r: org.apache.spark.sql.Row): QSummary = {
    val items = r.getSeq[org.apache.spark.sql.Row](3)
      .map(ir => (ir.getDouble(0), ir.getLong(1))).toArray
    QSummary(r.getLong(0), r.getLong(1), r.getLong(2), items)
  }
}

/** Driver-side view of an evaluated sketch: value-ascending weighted
  * items + the self-reported bound. */
final case class QSummary(n: Long, errBound: Long, maxWeight: Long,
    items: Array[(Double, Long)]) {
  /** See [[QSketchBuffer.valueAtRank]] — value-cumulative walk, so the
    * returned value's estRank (which counts ALL its ties) is ≥ t. */
  def valueAtRank(t: Long): Double = {
    require(items.nonEmpty, "empty sketch")
    var cum = 0L
    var i = 0
    while (i < items.length) {
      val v = items(i)._1
      var j = i
      while (j < items.length && items(j)._1 == v) { cum += items(j)._2; j += 1 }
      if (cum >= t) return v
      i = j
    }
    items(items.length - 1)._1
  }
  /** estRank(x) = Σ w over items ≤ x (the one-sided underestimate). */
  def estRank(x: Double): Long = {
    var cum = 0L
    var i = 0
    while (i < items.length && items(i)._1 <= x) { cum += items(i)._2; i += 1 }
    cum
  }
}

object QsFunctions {
  /** Column API: `df.agg(quantileSketch($"x", 256))`. */
  def quantileSketch(value: Column, k: Int): Column =
    ColumnBridge.column(QuantileSketchAgg(
      ColumnBridge.expression(value.cast("double")), k)
      .toAggregateExpression())
}

/** Shared byte layout for the sketch — the aggregate's shuffle
  * serializer AND the streaming summary's persisted state (same
  * dual-use discipline as [[MgSummary]]); file writes are atomic
  * tmp+move. */
object QSketchIO {
  def toBytes(buf: QSketchBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeLong(buf.n)
    out.writeLong(buf.errBound)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): QSketchBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new QSketchBuffer(in.readInt())
    buf.n = in.readLong()
    buf.errBound = in.readLong()
    val nl = in.readInt()
    var l = 0
    while (l < nl) {
      if (buf.levels.length == l) buf.levels += ArrayBuffer.empty[Double]
      val m = in.readInt()
      var i = 0
      while (i < m) { buf.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    buf
  }

  /** Rebuild a buffer from an EVALUATED summary (n, errBound, weighted
    * items): every item weight is a power of two by construction, so
    * weight 2^l returns the item to level l — the reconstruction is the
    * original buffer up to within-level order, which no operation
    * observes. */
  def fromSummary(k: Int, n: Long, errBound: Long,
      items: Iterable[(Double, Long)]): QSketchBuffer = {
    val buf = new QSketchBuffer(k)
    buf.n = n
    buf.errBound = errBound
    items.foreach { case (v, w) =>
      require(w > 0 && (w & (w - 1)) == 0, s"item weight $w is not a power of two")
      val l = java.lang.Long.numberOfTrailingZeros(w)
      while (buf.levels.length <= l) buf.levels += ArrayBuffer.empty[Double]
      buf.levels(l) += v
    }
    buf
  }

  def write(path: java.nio.file.Path, buf: QSketchBuffer): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, toBytes(buf))
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def read(path: java.nio.file.Path, k: Int): QSketchBuffer =
    if (!java.nio.file.Files.exists(path)) new QSketchBuffer(k)
    else fromBytes(java.nio.file.Files.readAllBytes(path))
}
