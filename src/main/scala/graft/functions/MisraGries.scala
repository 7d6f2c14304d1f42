package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer with `k` counters.
  *
  * The classic one-pass heavy-hitters summary (Misra & Gries 1982) in
  * its MERGEABLE form (Agarwal et al., "Mergeable Summaries", PODS
  * 2012): `add` keeps at most `k` counters, decrementing all of them
  * when a new item arrives with the buffer full; `mergeFrom` sums two
  * summaries and, if more than `k` counters survive, subtracts the
  * (k+1)-th largest count from every counter and drops the non-positive
  * ones. Both operations preserve the deterministic guarantee that
  * makes the summary useful:
  *
  *   true(x) − N/(k+1)  ≤  est(x)  ≤  true(x)
  *
  * for every item x over a stream of N total occurrences — so every
  * item with true count > N/(k+1) is GUARANTEED present in the summary,
  * regardless of arrival order, partitioning, or merge tree shape.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // decrement-all: removes k+1 occurrence mass (this item + one per
      // counter) — happens at most N/(k+1) times over the stream, which
      // is exactly where the error bound comes from
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** WEIGHTED add — exactly merging a singleton summary {item: w}
    * (the mergeable-summaries view: a weight-w item is a batch of w
    * occurrences), so the deterministic deficit bound extends to
    * weighted streams: true(x) − W/(k+1) ≤ est(x) ≤ true(x) with W =
    * total weight. This is what lets the collapse-first twins feed one
    * counter bump per DISTINCT text instead of one per replica. */
  def add(item: String, w: Long): Unit = {
    if (w <= 0L) return
    counts.put(item, counts.get(item) + w)
    if (counts.size > k) trimToK()
  }

  def mergeFrom(o: MgBuffer): Unit = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) trimToK()
  }

  // subtract the (k+1)-th largest count from everything: at most k
  // counters can be strictly larger, so ≤ k survive; the subtracted
  // mass per item is ≤ what the contributing streams' bounds allow
  private def trimToK(): Unit = {
    val values = new Array[Long](counts.size)
    var i = 0
    val vit = counts.values().iterator()
    while (vit.hasNext) { values(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(values)
    val cut = values(values.length - (k + 1)) // (k+1)-th largest
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) {
      val e = eit.next()
      if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
    }
  }
}

/** misra_gries(item, k) — aggregate returning the surviving counters as
  * array<struct<item:string, est:bigint>> in (est desc, item asc)
  * order.
  *
  * Scale shape: this is the heavy-hitters plan for a corpus whose
  * distinct-key space does NOT fit anywhere — each task keeps ≤ k
  * counters (map-side partial aggregation), the exchange moves one
  * ≤ k-entry buffer per partition, and the final merge is O(k log k)
  * per buffer. Contrast with exact `groupBy(key).count()`, which
  * shuffles every distinct key. The price is the deterministic
  * underestimate bound above — which the caller can verify per item,
  * since est ≤ true always and the deficit is capped by N/(k+1). */
case class MisraGries(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (item.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries item must be STRING, got ${item.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.asInstanceOf[Array[Any]])
  }

  // length-prefixed UTF-8, NOT writeUTF: DataOutput's modified-UTF has
  // a 64 KB-per-string ceiling, and a heavy-hitter ITEM is arbitrary
  // corpus content — one pathological long token must not crash the
  // shuffle serializer
  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counts.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(item = newChildren(0))
  override def prettyName: String = "misra_gries"
}

/** misra_gries_weighted(item, weight, k) — [[MisraGries]] over a
  * weighted stream: each row bumps its item's counter by `weight`
  * (a batch of `weight` occurrences; null/non-positive weights are
  * no-ops, matching the unweighted form's null-item skip). Same
  * buffer, same guarantee with W = Σ weights — the summary a
  * collapse-first pass builds from (distinct text, class size) rows
  * is a valid MG summary of the EXPANDED stream. */
case class MisraGriesWeighted(
    item: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(item, weight)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (item.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries_weighted item must be STRING, got ${item.dataType.sql}")
    else if (weight.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries_weighted weight must be BIGINT, got ${weight.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null)
      buf.add(v.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (w, c) => (-c, w) }
    new GenericArrayData(sorted.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = MgCodec.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer = MgCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesWeighted =
    copy(item = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "misra_gries_weighted"
}

/** Shared MG shuffle byte layout (length-prefixed UTF-8 — see the
  * serializer note on [[MisraGries]]). */
private[functions] object MgCodec {
  def toBytes(buf: MgBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
  def fromBytes(bytes: Array[Byte]): MgBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counts.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }
}

object MgFunctions {
  /** Column API: `df.agg(misraGries($"word", 64))`. */
  def misraGries(item: Column, k: Int): Column =
    ColumnBridge.column(MisraGries(
      ColumnBridge.expression(item.cast("string")), k)
      .toAggregateExpression())

  /** Column API: `df.agg(misraGriesWeighted($"word", $"n", 64))`. */
  def misraGriesWeighted(item: Column, weight: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesWeighted(
      ColumnBridge.expression(item.cast("string")),
      ColumnBridge.expression(weight.cast("long")), k)
      .toAggregateExpression())
}

/** Driver-side persistence for a running MG summary (the streaming
  * twin's state between triggers): ≤ k (item, est) entries, written
  * atomically (tmp + move). Same byte layout as the aggregate's
  * shuffle serialization. */
object MgSummary {
  def write(path: java.nio.file.Path, buf: MgBuffer): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed UTF-8 (same no-64KB-ceiling rationale as the
      // aggregate's shuffle serializer)
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, bos.toByteArray)
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def read(path: java.nio.file.Path, k: Int): MgBuffer = {
    if (!java.nio.file.Files.exists(path)) return new MgBuffer(k)
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(java.nio.file.Files.readAllBytes(path)))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counts.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }
}
