package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** K-minimum-values sketch (Bar-Yossef et al. 2002) — the SET-OPERATION
  * member of the sketch family: where HLL answers only |A| and |A∪B|,
  * a KMV pair answers INTERSECTION and Jaccard (the k smallest hashes
  * of A∪B are a uniform sample of the union; the fraction present in
  * both sketches estimates J, and |A∩B| ≈ J·|A∪B|) — overlap auditing
  * between corpus slices, contamination rates between shards, join
  * selectivity between key sets. Hash = the repo's portable 60-bit
  * md5 prefix computed JVM-side over UTF-8 (engine-replayable, no
  * rand), so the sketch of a fixed set is a fixed artifact.
  *
  * Buffer: the k smallest DISTINCT hashes, kept sorted; insertion is
  * O(log k) search + memmove, merge is a bounded sorted union. One
  * buffer per partition crosses the exchange — the bounded-buffer
  * scale shape of the CMS/MG/KLL/HLL siblings. */
final class KmvBuffer(val k: Int) {
  var size = 0
  val hashes = new Array[Long](k)

  def addHash(h: Long): Unit = {
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hashes(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < size && hashes(lo) == h) return // distinct only
    if (size < k) {
      System.arraycopy(hashes, lo, hashes, lo + 1, size - lo)
      hashes(lo) = h
      size += 1
    } else if (lo < k) {
      System.arraycopy(hashes, lo, hashes, lo + 1, k - lo - 1)
      hashes(lo) = h
    }
  }

  def add(value: String): Unit = addHash(KmvBuffer.hash60(value))

  def mergeFrom(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.size) { addHash(o.hashes(i)); i += 1 }
  }

  /** Distinct-count estimate: exact when the set fit (size < k). */
  def estimateDistinct: Double =
    if (size < k) size.toDouble
    else (k - 1).toDouble * KmvBuffer.HashSpace / hashes(k - 1).toDouble

  def sorted: Array[Long] = hashes.take(size)
}

object KmvBuffer {
  val HashSpace: Double = math.pow(2.0, 60)

  /** Portable 60-bit hash: first 15 hex digits of md5(utf8(value)) —
    * identical to the SQL `conv(substring(md5(x), 1, 15), 16, 10)`
    * family used everywhere else in the repo. */
  def hash60(value: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 7.5 bytes = 15 hex digits = 60 bits
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  def fromSorted(hashes: Array[Long], k: Int): KmvBuffer = {
    val b = new KmvBuffer(k)
    System.arraycopy(hashes, 0, b.hashes, 0, hashes.length)
    b.size = hashes.length
    b
  }

  /** Jaccard + intersection estimate from two same-k sketches. */
  def overlap(a: KmvBuffer, b: KmvBuffer): (Double, Double) = {
    require(a.k == b.k, "kmv k mismatch")
    val union = new KmvBuffer(a.k)
    union.mergeFrom(a); union.mergeFrom(b)
    val sa = a.sorted.toSet
    val sb = b.sorted.toSet
    val u = union.sorted
    var common = 0
    var i = 0
    while (i < u.length) {
      if (sa.contains(u(i)) && sb.contains(u(i))) common += 1
      i += 1
    }
    val j = if (u.length == 0) 0.0 else common.toDouble / u.length
    (j, j * union.estimateDistinct)
  }
}

/** `kmv_sketch(s, k)` — returns the sorted k-min hash array. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 1, "k must be > 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch input must be STRING, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.sorted.map(x => x: Any))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buf.size)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hashes(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.addHash(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_sketch"
}

object KmvFunctions {
  def kmvSketch(c: Column, k: Int): Column =
    ColumnBridge.column(KmvSketch(
      ColumnBridge.expression(c.cast("string")), k).toAggregateExpression())
}
