package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k (score desc, id asc)-best entries seen,
  * kept as parallel arrays in ascending "worst first" insertion order.
  * k is small (search contexts, ≤ ~100): O(k) sorted insertion beats
  * heap constant factors and serializes trivially. */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true if (s, id) ranks strictly better than (s2, id2):
    * higher score, or equal score and lower id. Scores compare under
    * Spark's total order for doubles ([[java.lang.Double.compare]]:
    * NaN largest, -0.0 < 0.0) so a rewrite from a window sort — which
    * uses that same total order — stays row-for-row exact even when
    * groups contain NaN scores (IEEE `>`/`==` would silently rank NaN
    * worse-than-everything instead). The `+ 0.0` canonicalizes -0.0
    * to 0.0 first, matching Spark's NormalizeFloatingNumbers treatment
    * of sort keys (-0.0 and 0.0 tie, the id breaks it) while stored
    * scores keep their original bits. */
  @inline private def better(s: Double, id: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s + 0.0, s2 + 0.0)
    c > 0 || (c == 0 && id < id2)
  }

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      // find insertion point from the back (arrays are best-first)
      var i = size
      while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      scores(i) = s; ids(i) = id; size += 1
    } else if (better(s, id, scores(size - 1), ids(size - 1))) {
      var i = size - 1
      while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      scores(i) = s; ids(i) = id
    }
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** top_k_hits(score, id, k) — aggregate returning the k best
  * (score desc, id asc) pairs as array<struct<score:double,id:bigint>>
  * in rank order.
  *
  * This is the scale shape of batched exact KNN: with a window-rank
  * plan the shuffle carries EVERY scored (query, vector) row — N·M for
  * M queries — and sorts each query's group; with this aggregate the
  * map-side partial pass prunes each partition to k rows per query, so
  * the exchange moves k · partitions · M rows and the final merge is
  * O(k) per partial buffer. Same results, bounded shuffle. */
case class TopKHits(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)

  /** update() reads the children as primitive Double/Long — reject
    * anything else at ANALYSIS time (the builders insert implicit
    * casts, but a hand-built expression could otherwise pass analysis
    * and throw ClassCastException mid-job). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_hits score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_hits id must be BIGINT, got ${id.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.scores(i), buf.ids(i)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // entries arrive best-first (already in rank order) — insert keeps order
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKHits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKHits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKHits =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_hits"
}

/** [[TopKBuffer]] carrying an opaque per-entry payload row alongside
  * each (score, id) pair — the buffer behind [[TopKRows]]. Payloads
  * ride as UnsafeRows (bounded: k per group), moved in lockstep with
  * the score/id arrays by the same strict (score desc, id asc)
  * insertion. */
final class TopKRowsBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val payloads = new Array[org.apache.spark.sql.catalyst.expressions.UnsafeRow](k)

  @inline private def better(s: Double, id: Long, s2: Double, id2: Long): Boolean = {
    // Spark's sort-key total order (NaN largest, -0.0 == 0.0) — see
    // TopKBuffer.better for the rationale.
    val c = java.lang.Double.compare(s + 0.0, s2 + 0.0)
    c > 0 || (c == 0 && id < id2)
  }

  /** Would (s, id) enter the buffer? Callers use this to skip the
    * payload row copy for the (overwhelmingly common at scale)
    * rejected rows. */
  def wouldAccept(s: Double, id: Long): Boolean =
    size < k || better(s, id, scores(size - 1), ids(size - 1))

  def insert(s: Double, id: Long,
      p: org.apache.spark.sql.catalyst.expressions.UnsafeRow): Unit = {
    if (size < k) {
      var i = size
      while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1)
        payloads(i) = payloads(i - 1); i -= 1
      }
      scores(i) = s; ids(i) = id; payloads(i) = p; size += 1
    } else if (better(s, id, scores(size - 1), ids(size - 1))) {
      var i = size - 1
      while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1)
        payloads(i) = payloads(i - 1); i -= 1
      }
      scores(i) = s; ids(i) = id; payloads(i) = p
    }
  }
}

/** top_k_rows(score, id, payload…, k) — [[TopKHits]] generalized to
  * carry arbitrary payload columns through the bounded heap: returns
  * the k best (score desc, id asc) entries as
  * array<struct<score, id, p0…pn>> in rank order.
  *
  * This is what lets [[graft.plans.TopKWindowRewrite]] fire on the
  * REAL-WORLD form of the grouped-top-k idiom — a projection that
  * keeps payload columns next to the ranked (group, score, id) — with
  * no join-back: a join-back on (group, id) is only exact when that
  * pair is unique, which a rule can't prove, while carrying the
  * payload in the heap entry is exact row-for-row (each input row is
  * one candidate entry; ties behave exactly as the window's). Shuffle
  * volume stays k · partitions · groups rows, now payload-width
  * each — still independent of group size. */
case class TopKRows(
    score: Expression,
    id: Expression,
    payload: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k > 0, "k must be positive")
  require(payload.nonEmpty, "use top_k_hits when there is no payload")

  override def children: Seq[Expression] = score +: id +: payload

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_rows score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_rows id must be BIGINT, got ${id.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(
      StructField("score", DoubleType, nullable = false) +:
      StructField("id", LongType, nullable = false) +:
      payload.zipWithIndex.map { case (p, i) =>
        StructField(s"p$i", p.dataType, p.nullable)
      }), containsNull = false)

  @transient private lazy val payloadProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(payload)

  override def createAggregationBuffer(): TopKRowsBuffer = new TopKRowsBuffer(k)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      val iv = i.asInstanceOf[Long]
      if (buf.wouldAccept(sv, iv))
        buf.insert(sv, iv, payloadProj(input).copy())
    }
    buf
  }

  override def merge(buf: TopKRowsBuffer, other: TopKRowsBuffer): TopKRowsBuffer = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i), other.payloads(i)); i += 1
    }
    buf
  }

  override def eval(buf: TopKRowsBuffer): Any = {
    val nf = payload.length
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      val vals = new Array[Any](2 + nf)
      vals(0) = buf.scores(i)
      vals(1) = buf.ids(i)
      var j = 0
      while (j < nf) {
        vals(2 + j) = buf.payloads(i).get(j, payload(j).dataType); j += 1
      }
      rows(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.size) { bytes += buf.payloads(i).getSizeInBytes; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 20 + bytes)
    bb.putInt(buf.k); bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i))
      val p = buf.payloads(i)
      bb.putInt(p.getSizeInBytes)
      p.writeTo(bb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKRowsBuffer(bb.getInt())
    val n = bb.getInt()
    val nf = payload.length
    var i = 0
    // entries arrive best-first (already in rank order) — insert keeps order
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(nf)
      row.pointTo(arr, len)
      buf.insert(s, id, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(score = newChildren(0), id = newChildren(1),
      payload = newChildren.drop(2).toSeq)
  override def prettyName: String = "top_k_rows"
}

object TopKFunctions {
  /** Column API: `groupBy(qid).agg(topKHits($"score", $"id", k))`.
    * Inserts implicit casts so integer ids / float scores work (the
    * aggregate itself requires exactly DOUBLE/BIGINT). */
  def topKHits(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKHits(
      ColumnBridge.expression(score.cast("double")),
      ColumnBridge.expression(id.cast("long")), k)
      .toAggregateExpression())
}
