package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching via Aho–Corasick (Aho & Corasick
  * 1975) as native Catalyst expressions.
  *
  * The scale problem: lexical screens in a crawl-cleaning pipeline
  * (profanity/boilerplate/spam blocklists, benchmark-contamination
  * canaries) carry 10³–10⁵ terms. The per-term approach
  * ([[graft.ops.TextAnalytics.blocklistScore]] builds one codegen'd
  * `filter(words, ...)` per term) is O(len·P) per row and its generated
  * method grows linearly in P — past a few hundred terms Janino bails to
  * interpreted mode and the plan is quietly 10–100× slower. Aho–Corasick
  * is O(len + matches) per row, INDEPENDENT of P: one automaton walk
  * finds every occurrence of every pattern.
  *
  * Engine shape: the automaton is built once per executor JVM from the
  * pattern list (keyed cache below — expressions serialize only the
  * pattern strings, never the automaton) and the per-row walk is a
  * single virtual call from inside whole-stage codegen via
  * `ctx.addReferenceObj` — the surrounding operators stay fused, no UDF
  * boxing, no per-row automaton construction.
  *
  * Matching is over UTF-8 BYTES, not decoded chars: UTF-8 is
  * self-synchronizing, so a byte-level occurrence of an encoded pattern
  * is exactly a char-level occurrence — and the row's `UTF8String`
  * needs no decode (zero-copy when the backing array is exact).
  *
  * Count semantics: per pattern, LEFTMOST NON-OVERLAPPING occurrences —
  * the same count as repeatedly applying `replace(text, term, '')`,
  * i.e. `(length(text) - length(replace(text, term, ''))) /
  * length(term)`, which is how the DuckDB oracle replays it exactly.
  * Distinct patterns count independently ("he" still counts inside
  * "she"); only self-overlap is suppressed ("aa" counts twice in
  * "aaaa", not three times).
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "AhoCorasick patterns must be non-empty")

  // --- trie build (driver or executor, once per JVM via the cache) ---
  // Goto function as per-state SORTED byte keys + targets: dense
  // int[256] rows would be 1 KiB/state (100 MiB at 10⁵ states); sorted
  // arrays are ~2·fanout entries with ≤8-step binary search.
  private val (childKeys, childVals, fail, patEnd, patLen, dictLink) = {
    val pats = patterns.map(_.getBytes("UTF-8"))
    // growable trie in maps first
    val kids = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Byte, Int])
    val endAt = scala.collection.mutable.ArrayBuffer(-1) // pattern idx ending at state
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        s = kids(s).getOrElseUpdate(b, {
          kids += scala.collection.mutable.TreeMap.empty[Byte, Int]
          endAt += -1
          kids.size - 1
        })
      }
      // duplicate pattern strings share an end state; keep the first
      // index (counts are reported per UNIQUE state, callers that pass
      // duplicates get the count on the first copy and 0 on the rest)
      if (endAt(s) < 0) endAt(s) = pi
    }
    val n = kids.size
    val ck = new Array[Array[Byte]](n); val cv = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      ck(i) = kids(i).keysIterator.toArray; cv(i) = kids(i).valuesIterator.toArray
      i += 1
    }
    // BFS failure links + dictionary (output) suffix links
    val fl = new Array[Int](n); val dl = new Array[Int](n)
    java.util.Arrays.fill(dl, -1)
    val queue = new java.util.ArrayDeque[Int]()
    var j = 0
    while (j < ck(0).length) { queue.add(cv(0)(j)); j += 1 }
    while (!queue.isEmpty) {
      val s = queue.poll()
      var c = 0
      while (c < ck(s).length) {
        val b = ck(s)(c); val t = cv(s)(c)
        // walk fail chain of s for a state with a b-child
        var f = fl(s)
        var hop = if (s == 0) 0 else {
          var r = -1
          while (r < 0) {
            val idx = java.util.Arrays.binarySearch(ck(f), b)
            if (idx >= 0) r = cv(f)(idx)
            else if (f == 0) r = 0
            else f = fl(f)
          }
          r
        }
        if (hop == t) hop = 0 // can only happen from root
        fl(t) = hop
        dl(t) = if (endAt(hop) >= 0) hop else dl(hop)
        queue.add(t)
        c += 1
      }
    }
    val pe = endAt.toArray
    val pl = patterns.map(_.getBytes("UTF-8").length)
    (ck, cv, fl, pe, pl, dl)
  }

  val numPatterns: Int = patterns.length

  @inline private def step(state: Int, b: Byte): Int = {
    var s = state
    while (true) {
      val idx = java.util.Arrays.binarySearch(childKeys(s), b)
      if (idx >= 0) return childVals(s)(idx)
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  // Per-thread scratch (tasks are single-threaded per partition):
  // stamped lazy reset — no O(P) clear per row. @transient because the
  // automaton rides in the codegen references array, which is
  // java-serialized into the (broadcast-once) task binary; ThreadLocal
  // is not serializable and rebuilds trivially on first use.
  @transient private lazy val scratch =
    new ThreadLocal[(Array[Long], Array[Int], Array[Int])] {
      override def initialValue(): (Array[Long], Array[Int], Array[Int]) =
        (new Array[Long](numPatterns), new Array[Int](numPatterns),
          new Array[Int](numPatterns))
    }
  @transient private lazy val rowStamp = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = Array(0)
  }

  /** One automaton walk; returns the scratch counts array (VALID ONLY
    * until the next call on this thread) and leaves per-pattern
    * leftmost-non-overlapping counts in it. */
  private def walk(s8: UTF8String): Array[Long] = {
    val bytes = s8.getBytes
    val (counts, nextStart, stamp) = scratch.get()
    val st = rowStamp.get(); st(0) += 1; val cur = st(0)
    var state = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      state = step(state, bytes(i))
      // report all patterns ending here via the dictionary-link chain
      var out = if (patEnd(state) >= 0) state else dictLink(state)
      while (out >= 0) {
        val pi = patEnd(out)
        if (stamp(pi) != cur) { stamp(pi) = cur; counts(pi) = 0L; nextStart(pi) = 0 }
        val start = i - patLen(pi) + 1
        if (start >= nextStart(pi)) { counts(pi) += 1; nextStart(pi) = i + 1 }
        out = dictLink(out)
      }
      i += 1
    }
    // ensure untouched patterns read as 0 for this row
    var p = 0
    while (p < numPatterns) {
      if (stamp(p) != cur) { stamp(p) = cur; counts(p) = 0L; nextStart(p) = 0 }
      p += 1
    }
    counts
  }

  /** Total leftmost-non-overlapping occurrences across all patterns. */
  def countTotal(s8: UTF8String): Long = {
    val counts = walk(s8)
    var t = 0L; var p = 0
    while (p < numPatterns) { t += counts(p); p += 1 }
    t
  }

  /** Per-pattern counts, in `patterns` order (fresh array). */
  def countPerPattern(s8: UTF8String): Array[Long] = {
    val counts = walk(s8)
    java.util.Arrays.copyOf(counts, numPatterns)
  }
}

object AhoCorasick {
  // Executor-JVM cache: expressions ship only the pattern list; the
  // automaton builds once per JVM per distinct list (same discipline as
  // the embedder session cache). Keyed by content, not identity, so
  // every task of every stage sharing a pattern list shares one build.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], AhoCorasick]()
  def forPatterns(patterns: Seq[String]): AhoCorasick =
    cache.computeIfAbsent(patterns, p => new AhoCorasick(p.toArray))
}

private[graft] trait MultiMatchBase extends UnaryExpression {
  def patterns: Seq[String]
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  @transient protected lazy val ac: AhoCorasick = AhoCorasick.forPatterns(patterns)
}

/** multi_match_total(text) — Σ over patterns of leftmost
  * non-overlapping occurrence counts. One automaton walk per row. */
case class MultiMatchTotal(child: Expression, patterns: Seq[String])
    extends MultiMatchBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "multi_match_total"

  override def nullSafeEval(input: Any): Any =
    ac.countTotal(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val acRef = ctx.addReferenceObj("acAutomaton", ac, classOf[AhoCorasick].getName)
      s"$acRef.countTotal($c)"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** multi_match_counts(text) — per-pattern counts as array<bigint> in
  * pattern-list order. */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends MultiMatchBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match_counts"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.countPerPattern(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val acRef = ctx.addReferenceObj("acAutomaton", ac, classOf[AhoCorasick].getName)
      val gad = classOf[GenericArrayData].getName
      s"new $gad($acRef.countPerPattern($c))"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiMatchFunctions {
  def multiMatchTotal(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiMatchTotal(ColumnBridge.expression(text), patterns))
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiMatchCounts(ColumnBridge.expression(text), patterns))
}
