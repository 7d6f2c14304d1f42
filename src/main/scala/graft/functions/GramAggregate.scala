package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Second-moment buffer in EXACT integer micro-units: component sums
  * and the upper-triangular gram matrix of `round(x·1e6)` longs. All
  * arithmetic is integer addition, so the merged result is
  * bit-identical under ANY partitioning or merge order — the property
  * that makes the PCA model built on top of it deterministic without
  * a single float snap. Overflow headroom: unit-ball components give
  * micro-products ≤ 1e12, so ~9.2e6 rows fit a signed long per cell;
  * [[GramFunctions.gramMatrix]]'s scaladoc documents the per-shard
  * bound for corpora beyond that. The envelope is ENFORCED: every
  * accumulation uses `Math.addExact`/`Math.multiplyExact`, so a
  * corpus past the documented bound fails loudly with an
  * ArithmeticException instead of silently corrupting covariances. */
final class GramBuffer(val d: Int) {
  var n: Long = 0L
  val s = new Array[Long](d)
  val g = new Array[Long](d * (d + 1) / 2)

  def update(v: ArrayData): Unit = {
    require(v.numElements() == d,
      s"gram_matrix dim mismatch: got ${v.numElements()}, expected $d")
    val m = new Array[Long](d)
    var i = 0
    while (i < d) {
      m(i) = math.round(v.getDouble(i) * 1e6)
      s(i) = Math.addExact(s(i), m(i))
      i += 1
    }
    var idx = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        g(idx) = Math.addExact(g(idx), Math.multiplyExact(m(i), m(j)))
        idx += 1; j += 1
      }
      i += 1
    }
    n += 1
  }

  def mergeFrom(o: GramBuffer): Unit = {
    require(o.d == d, s"gram_matrix dim mismatch in merge: ${o.d} vs $d")
    n = Math.addExact(n, o.n)
    var i = 0
    while (i < d) { s(i) = Math.addExact(s(i), o.s(i)); i += 1 }
    i = 0
    while (i < g.length) { g(i) = Math.addExact(g(i), o.g(i)); i += 1 }
  }
}

/** `gram_matrix(vec, d)` — one bounded buffer per partition (d +
  * d(d+1)/2 longs, ~17 KB at d=64), elementwise-add merge: the scale
  * shape of a distributed covariance pass (shuffle volume is
  * partitions·buffer, independent of row count). Returns
  * struct(n, s: array<long>, g: array<long>). */
case class GramMatrix(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  require(d > 0, "d must be positive")

  override def children: Seq[Expression] = Seq(vec)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix input must be ARRAY<DOUBLE>, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("g", ArrayType(LongType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(d)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = vec.eval(input)
    if (v != null) buf.update(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: GramBuffer): Any =
    InternalRow(buf.n, new GenericArrayData(buf.s.map(x => x: Any)),
      new GenericArrayData(buf.g.map(x => x: Any)))

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 8 * (buf.d + buf.g.length))
    bb.putInt(buf.d); bb.putLong(buf.n)
    var i = 0
    while (i < buf.d) { bb.putLong(buf.s(i)); i += 1 }
    i = 0
    while (i < buf.g.length) { bb.putLong(buf.g(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(bb.getInt())
    buf.n = bb.getLong()
    var i = 0
    while (i < buf.d) { buf.s(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < buf.g.length) { buf.g(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(vec = newChildren(0))
  override def prettyName: String = "gram_matrix"
}

object GramFunctions {
  /** Column API: `df.agg(gramMatrix($"vec", 64))`. Input casts to
    * array<double>; micro-unit longs keep the sum exact for ≤ ~9.2M
    * unit-ball rows PER AGGREGATE — use [[momentsSharded]] past that. */
  def gramMatrix(vec: Column, d: Int): Column =
    ColumnBridge.column(GramMatrix(
      ColumnBridge.expression(vec.cast("array<double>")), d)
      .toAggregateExpression())

  /** Exact second moments at ANY corpus size — the shard-and-combine
    * form of [[gramMatrix]] (its scaladoc's envelope, implemented):
    * rows shard by a deterministic CONTENT hash of the vector (shard
    * count from one count(), sized so each shard stays far inside the
    * ~9.2M-row long envelope), one exact long buffer per shard, and
    * the shard moments combine in BigInt driver-side. The combined
    * (n, Σxμ, Σxμxμᵀ) is the mathematically identical integer a
    * single wide-enough buffer would hold — same partition/merge-order
    * invariance, same downstream double math (BigInt→double rounds
    * exactly like long→double inside the long range, so results are
    * bit-identical to the unsharded path wherever both are feasible).
    * One shard short-circuits to the plain aggregate (no extra
    * shuffle).
    *
    * The shard key mixes the content hash with `spark_partition_id()`
    * (r10 ADVICE): a pure content hash cannot split DUPLICATE vectors
    * — and low-cardinality column sets (two small-domain columns at
    * sf10) put tens of millions of identical rows in one shard, the
    * overflow the sharding exists to avoid. The partition id is
    * run-dependent, but integer sums commute: every (shard → BigInt)
    * split combines to the identical exact total, so results stay
    * bit-stable across runs. A same-content group can still overflow
    * only if a SINGLE input partition holds > ~9.2M unit-ball rows
    * (far above any maxPartitionBytes-sized scan partition) — and
    * that residual pathology keeps the loud addExact failure, never a
    * silent corruption. */
  def momentsSharded(df: org.apache.spark.sql.DataFrame, vec: Column, d: Int,
      rowsPerShard: Long = 4000000L): (Long, Array[BigInt], Array[BigInt]) = {
    import org.apache.spark.sql.functions.{col, lit, pmod, spark_partition_id, xxhash64}
    require(rowsPerShard >= 1, "rowsPerShard must be positive")
    val n = df.count()
    val shards = math.max(1L, (n + rowsPerShard - 1) / rowsPerShard).toInt
    val rows =
      if (shards == 1)
        Array(df.agg(gramMatrix(vec, d).as("m")).select(col("m")).head().getStruct(0))
      else
        df.groupBy(pmod(xxhash64(vec.cast("array<double>")) +
            spark_partition_id().cast("long"), lit(shards)).as("__shard"))
          .agg(gramMatrix(vec, d).as("m"))
          .select(col("m")).collect().map(_.getStruct(0))
    var tot = 0L
    val s = Array.fill(d)(BigInt(0))
    val g = Array.fill(d * (d + 1) / 2)(BigInt(0))
    rows.foreach { r =>
      tot += r.getLong(0)
      val rs = r.getSeq[Long](1); val rg = r.getSeq[Long](2)
      var i = 0
      while (i < s.length) { s(i) += rs(i); i += 1 }
      i = 0
      while (i < g.length) { g(i) += rg(i); i += 1 }
    }
    (tot, s, g)
  }
}
