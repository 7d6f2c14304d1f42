package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-key event buffer for the funnel aggregate: parallel (ts, step)
  * arrays, append-only, sorted once at eval. Growth doubles; the hard
  * cap fail-fasts a pathological key (a bot with millions of funnel
  * events) instead of silently dropping events or OOMing an executor. */
final class FunnelBuffer(val numSteps: Int, val maxEvents: Int) {
  var size = 0
  var ts = new Array[Long](math.min(16, maxEvents))
  var step = new Array[Byte](math.min(16, maxEvents))

  def append(t: Long, s: Int): Unit = {
    if (size == ts.length) {
      require(size < maxEvents,
        s"funnel_times key exceeded maxEvents=$maxEvents funnel-step events; " +
          "raise the cap explicitly if such keys are expected")
      val n = math.min(math.max(ts.length * 2, 16), maxEvents)
      ts = java.util.Arrays.copyOf(ts, n)
      step = java.util.Arrays.copyOf(step, n)
    }
    ts(size) = t; step(size) = s.toByte; size += 1
  }

  /** Completion time per step (Long.MinValue = not completed): sort by
    * ts, then one pass of the strict-order DP — step i completes at the
    * FIRST step-i event with ts strictly after step i-1's completion.
    * Within-tie processing order is irrelevant: a step-i event at
    * exactly comp(i-1) never qualifies (strict >). */
  def completions(): Array[Long] = {
    // indirect sort via index permutation (primitive sort on packed
    // keys would need ts<2^56; events carry full 63-bit nano ts)
    val idx = Array.range(0, size).sortBy(ts(_))
    val comp = Array.fill(numSteps)(Long.MinValue)
    var i = 0
    while (i < size) {
      val j = idx(i)
      val s = step(j).toInt
      if (comp(s) == Long.MinValue &&
          (s == 0 || (comp(s - 1) != Long.MinValue && ts(j) > comp(s - 1))))
        comp(s) = ts(j)
      i += 1
    }
    comp
  }
}

/** funnel_times(step_idx, ts) — aggregate returning
  * array<bigint> of length `numSteps`: element i is the key's step-i
  * completion timestamp under strict ordering (null if the step was
  * never reached). Identical semantics to the k-join
  * [[graft.ops.EventAnalytics.funnel]], in ONE aggregation.
  *
  * This is the scale shape of a LONG funnel: the k-join plan chains one
  * shuffle per step and its final assembly re-joins every step frame,
  * so the executed plan grows O(k²) in step count (measured: 3 steps
  * 4.1 s, 8 steps 25.5 s on 10M events — BASELINE.md round-6 probe).
  * This aggregate filters to funnel-type events, shuffles each exactly
  * once on the key, and runs the per-key DP at eval — O(k) total work,
  * independent of step count beyond the filter width (measured: 8 steps
  * 2.6 s on the same events). The per-key buffer is the standard
  * windowFunnel trade (events of the step types only, capped, fail-fast)
  * and is what bounds executor memory. */
case class FunnelTimes(
    stepIdx: Expression,
    ts: Expression,
    numSteps: Int,
    maxEvents: Int = 1 << 20,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelBuffer] {

  require(numSteps > 0 && numSteps <= 127, s"numSteps must be in [1,127], got $numSteps")
  require(maxEvents > 0, "maxEvents must be positive")

  override def children: Seq[Expression] = Seq(stepIdx, ts)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (stepIdx.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"funnel_times step_idx must be INT, got ${stepIdx.dataType.sql}")
    else if (ts.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"funnel_times ts must be BIGINT, got ${ts.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def createAggregationBuffer(): FunnelBuffer =
    new FunnelBuffer(numSteps, maxEvents)

  override def update(buf: FunnelBuffer, input: InternalRow): FunnelBuffer = {
    val s = stepIdx.eval(input)
    val t = ts.eval(input)
    if (s != null && t != null) {
      val si = s.asInstanceOf[Int]
      if (si >= 0 && si < numSteps) buf.append(t.asInstanceOf[Long], si)
    }
    buf
  }

  override def merge(buf: FunnelBuffer, other: FunnelBuffer): FunnelBuffer = {
    var i = 0
    while (i < other.size) { buf.append(other.ts(i), other.step(i).toInt); i += 1 }
    buf
  }

  override def eval(buf: FunnelBuffer): Any = {
    val comp = buf.completions()
    val out = new Array[Any](numSteps)
    var i = 0
    while (i < numSteps) {
      out(i) = if (comp(i) == Long.MinValue) null else comp(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: FunnelBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 9)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ts(i)); bb.put(buf.step(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FunnelBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new FunnelBuffer(numSteps, maxEvents)
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.append(bb.getLong(), bb.get().toInt); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelTimes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelTimes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FunnelTimes =
    copy(stepIdx = newChildren(0), ts = newChildren(1))
  override def prettyName: String = "funnel_times"
}

object FunnelFunctions {
  /** Column API: `groupBy(user).agg(funnelTimes($"step_idx", $"ts", k))`.
    * Inserts implicit casts (the aggregate requires exactly INT/BIGINT). */
  def funnelTimes(stepIdx: Column, ts: Column, numSteps: Int,
      maxEvents: Int = 1 << 20): Column =
    ColumnBridge.column(FunnelTimes(
      ColumnBridge.expression(stepIdx.cast("int")),
      ColumnBridge.expression(ts.cast("long")), numSteps, maxEvents)
      .toAggregateExpression())
}
