package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch with an EXPOSED counter table — the repo's own CMS
  * (Spark's `stat.countMinSketch` hides its table behind point
  * estimates), built for the one query the hidden form cannot answer:
  * the INNER PRODUCT of two sketches,
  *
  *   est(|A ⋈ B on k|) = min over rows d of Σ_w A[d][w] · B[d][w],
  *
  * the classic join/self-join size estimator (Cormode & Muthukrishnan
  * 2005, §4.2): never an underestimate (collisions only add positive
  * mass), and ≤ true + ε·N_A·N_B with probability 1−δ for width
  * ⌈e/ε⌉, depth ⌈ln(1/δ)⌉. At 100 TB this is how a planner sizes a
  * join BEFORE running it — two bounded (depth×width) tables that
  * merge elementwise (mergeable summary: map-side partials, one small
  * buffer per partition over the exchange), instead of a full
  * count-per-key pass on each side.
  *
  * Hashing is MurmurHash3 over (item, row-seed) — pure and
  * JVM-version-stable, so sketches built by different executors,
  * sessions, or re-runs are bit-identical and inner products are
  * deterministic. */
final class CmBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)
  var total: Long = 0L

  @inline def bucket(item: String, d: Int): Int =
    (scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + d)
      & Int.MaxValue) % width

  def add(item: String): Unit = {
    var d = 0
    while (d < depth) {
      counts(d * width + bucket(item, d)) += 1L
      d += 1
    }
    total += 1L
  }

  def mergeFrom(o: CmBuffer): Unit = {
    require(o.depth == depth && o.width == width,
      s"cannot merge ($depth x $width) with (${o.depth} x ${o.width})")
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
    total += o.total
  }

  /** Point estimate: min over rows (never an underestimate). */
  def estimate(item: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counts(d * width + bucket(item, d))
      if (c < best) best = c
      d += 1
    }
    best
  }
}

object CmBuffer {
  /** Join-size estimate from two same-shaped sketches: min over rows
    * of the row-wise dot product. true ≤ est, and est ≤ true +
    * ε·totalA·totalB w.p. 1−δ. A row whose dot product overflows Long
    * (totalA·totalB approaching 2^63, ~3B rows per side) SATURATES to
    * Long.MaxValue instead of wrapping — the saturated row value is
    * still ≥ its true value, so min-over-rows keeps the
    * never-underestimate guarantee at any scale. */
  def innerProduct(a: CmBuffer, b: CmBuffer): Long = {
    require(a.depth == b.depth && a.width == b.width,
      "inner product needs same-shaped sketches")
    var best = Long.MaxValue
    var d = 0
    while (d < a.depth) {
      var s = 0L
      var w = 0
      var saturated = false
      while (w < a.width && !saturated) {
        try {
          s = Math.addExact(s, Math.multiplyExact(
            a.counts(d * a.width + w), b.counts(d * a.width + w)))
        } catch {
          case _: ArithmeticException => saturated = true
        }
        w += 1
      }
      if (saturated) s = Long.MaxValue
      if (s < best) best = s
      d += 1
    }
    best
  }

  /** Rehydrate from the aggregate's output row
    * (struct&lt;total, counts&gt;). */
  def fromRow(row: org.apache.spark.sql.Row, depth: Int, width: Int): CmBuffer = {
    val buf = new CmBuffer(depth, width)
    buf.total = row.getLong(0)
    val arr = row.getSeq[Long](1)
    require(arr.length == depth * width, "counts length mismatch")
    var i = 0
    while (i < arr.length) { buf.counts(i) = arr(i); i += 1 }
    buf
  }
}

/** count_min(item, depth, width) — aggregate returning
  * struct&lt;total:bigint, counts:array&lt;bigint&gt;&gt; (the full
  * table, row-major), so callers can point-estimate AND inner-product
  * driver-side. */
case class CountMinAgg(
    item: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmBuffer] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (item.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min item must be STRING, got ${item.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): CmBuffer = new CmBuffer(depth, width)

  override def update(buf: CmBuffer, input: InternalRow): CmBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: CmBuffer, other: CmBuffer): CmBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CmBuffer): Any =
    InternalRow(buf.total, new GenericArrayData(buf.counts))

  override def serialize(buf: CmBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.depth); out.writeInt(buf.width); out.writeLong(buf.total)
    var i = 0
    while (i < buf.counts.length) { out.writeLong(buf.counts(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CmBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new CmBuffer(in.readInt(), in.readInt())
    buf.total = in.readLong()
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(item = newChildren(0))
  override def prettyName: String = "count_min"
}

object CmFunctions {
  /** Column API: `df.agg(countMin($"key", depth = 5, width = 2048))`. */
  def countMin(item: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CountMinAgg(
      ColumnBridge.expression(item.cast("string")), depth, width)
      .toAggregateExpression())
}
