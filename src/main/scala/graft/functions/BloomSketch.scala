package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic Bloom filter over UTF-8 strings — the per-FILE
  * point-predicate sidecar ([[graft.store.SnapshotLog]]'s complement
  * to footer min/max, which cannot prune equality on high-cardinality
  * or hash-distributed columns). Double hashing (Kirsch–Mitzenmacher):
  * two fixed-seed murmur32s combine into k indexes, so the same value
  * sets the same bits on every engine, run, and retry — a bloom built
  * once is valid forever (it is a property of the immutable file). */
final class BloomBuffer(val numBits: Int, val numHashes: Int) {
  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes > 0, "numHashes must be positive")
  var n: Long = 0L
  val words = new Array[Long](numBits / 64)

  def add(bytes: Array[Byte]): Unit = {
    var i = 0
    val (h1, h2) = BloomBuffer.hashes(bytes)
    while (i < numHashes) {
      val idx = BloomBuffer.index(h1, h2, i, numBits)
      words(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
    n += 1
  }

  def mightContain(bytes: Array[Byte]): Boolean = {
    val (h1, h2) = BloomBuffer.hashes(bytes)
    var i = 0
    while (i < numHashes) {
      val idx = BloomBuffer.index(h1, h2, i, numBits)
      if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeFrom(o: BloomBuffer): Unit = {
    require(o.numBits == numBits && o.numHashes == numHashes,
      "bloom shape mismatch in merge")
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
    n += o.n
  }
}

object BloomBuffer {
  /** Two independent 32-bit murmurs widened to nonneg longs. */
  private[functions] def hashes(bytes: Array[Byte]): (Long, Long) = {
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x5bd1e995)
    (h1.toLong & 0xffffffffL, (h2.toLong & 0xffffffffL) | 1L)
  }

  private[functions] def index(h1: Long, h2: Long, i: Int, m: Int): Int =
    (((h1 + i * h2) % m) & 0x7fffffffL).toInt

  def fromWords(words: Array[Long], numHashes: Int, n: Long): BloomBuffer = {
    val b = new BloomBuffer(words.length * 64, numHashes)
    System.arraycopy(words, 0, b.words, 0, words.length)
    b.n = n
    b
  }
}

/** `bloom_sketch(s, numBits, numHashes)` — one bounded bit array per
  * partition, OR-merge: grouped by file name it builds every file's
  * bloom in ONE column scan. Returns struct(n, words: array<long>). */
case class BloomSketch(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch input must be STRING, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("words", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numBits, numHashes)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.add(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    buf
  }

  override def merge(buf: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: BloomBuffer): Any =
    InternalRow(buf.n, new GenericArrayData(buf.words.map(x => x: Any)))

  override def serialize(buf: BloomBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 8 * buf.words.length)
    bb.putInt(buf.numBits); bb.putInt(buf.numHashes); bb.putLong(buf.n)
    buf.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BloomBuffer(bb.getInt(), bb.getInt())
    buf.n = bb.getLong()
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_sketch"
}

object BloomFunctions {
  def bloomSketch(c: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomSketch(
      ColumnBridge.expression(c.cast("string")), numBits, numHashes)
      .toAggregateExpression())
}
