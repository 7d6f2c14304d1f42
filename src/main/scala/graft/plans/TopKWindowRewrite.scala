package graft.plans

import graft.functions.{TopKHits, TopKRows}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: the grouped-top-k WINDOW idiom
  *
  * {{{
  *   SELECT grp, id, score, payload… , rn FROM (
  *     SELECT ..., row_number() OVER
  *       (PARTITION BY grp ORDER BY score DESC, id ASC) AS rn ...)
  *   WHERE rn <= k
  * }}}
  *
  * rewrites to a bounded heap aggregate ([[graft.functions.TopKHits]],
  * or [[graft.functions.TopKRows]] when payload columns ride along) +
  * posexplode. The window plan shuffles EVERY row of every group and
  * sorts each partition (twice under Spark's own WindowGroupLimit:
  * partial-limit sort before the exchange, full sort after); the heap
  * plan's map-side partial prunes each partition to k rows per group
  * before the exchange, so shuffle volume is k·partitions·groups —
  * independent of group size — and nothing ever sorts. This is the
  * repo's leaderboard discipline promoted from a hand-written idiom to
  * a Catalyst rule: ANY SQL user writing the standard window form gets
  * the bounded plan.
  *
  * Fires only on the provably-equivalent pattern:
  *  - exactly one window expression, `row_number()` over
  *    (PARTITION BY …, ORDER BY score DESC NULLS LAST, id ASC) — the
  *    (score desc, id asc) total order is the heap's insertion order,
  *    and the integral id tie-break makes row_number deterministic;
  *  - score is a non-nullable DOUBLE attribute and id a non-nullable
  *    integral attribute (null scores never reach the heap — require
  *    they cannot exist);
  *  - the rank filter is `rn <= lit` / `rn < lit` with 0 < k ≤ 1000
  *    (the O(k) sorted-insert buffer is for search-context k, not
  *    arbitrary LIMIT pushdown), possibly through a WIDENING integral
  *    cast of rn — `withColumn("rn", row_number().over(w).cast("long"))
  *    .filter($"rn" <= 3)` plans the cast in a Project UNDER the
  *    filter, and that shape must fire too;
  *  - projections are deterministic. PAYLOAD columns (child attributes
  *    beyond group/score/id) are carried INSIDE the heap entry
  *    ([[TopKRows]]) rather than re-joined: a join-back on (grp, id)
  *    is only exact when that pair is unique, which a rule cannot
  *    prove, while a carried payload is exact row-for-row — each input
  *    row is one candidate entry, ties behaving exactly as the
  *    window's.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Strip WIDENING integral casts (the row_number is always INT, so
    * int→long / int→int are the only injective, order-preserving
    * forms that reach a rank comparison). */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if (c.dataType == LongType || c.dataType == IntegerType) &&
        c.child.dataType == IntegerType =>
      stripCast(c.child)
    case other => other
  }

  /** rn <= k / rn < k+1 bound (possibly through a widening cast of
    * rn), if the condition is exactly that. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] = {
    def isRn(e: Expression): Boolean = stripCast(e) match {
      case a: Attribute => a.semanticEquals(rn)
      case _ => false
    }
    cond match {
      case LessThanOrEqual(a, l) if isRn(a) => intLit(l)
      case LessThan(a, l) if isRn(a) => intLit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a) if isRn(a) => intLit(l)
      case GreaterThan(l, a) if isRn(a) => intLit(l).map(_ - 1)
      case _ => None
    }
  }

  /** Non-nullness, either by schema or by plan constraints: parquet
    * attributes arrive nullable even when the data has no nulls, so
    * the standard `WHERE score IS NOT NULL` guard below the window
    * must enable the rewrite — the constraint propagation framework
    * proves the window never sees a null, which is exactly what the
    * heap needs (it drops null scores; the window would rank them). */
  private def notNull(child: LogicalPlan, a: AttributeReference): Boolean =
    !a.nullable || child.constraints.exists {
      case IsNotNull(ar: AttributeReference) => ar.semanticEquals(a)
      case _ => false
    }

  /** The bare Window(row_number over (part, score desc, id asc)) core. */
  private object WindowCore {
    def unapply(plan: LogicalPlan): Option[(Seq[Expression],
        AttributeReference, AttributeReference, Alias, LogicalPlan)] =
      plan match {
        case Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(partSpec, Seq(
              SortOrder(score: AttributeReference, Descending, NullsLast, _),
              SortOrder(id: AttributeReference, Ascending, _, _)), _)), _)),
            _, _, child, _) =>
          Some((partSpec, score, id, alias, child))
        case _ => None
      }
  }

  /** Substitute `amap` aliases into a named expression, keeping its
    * name and exprId (an attribute that becomes a non-named expression
    * is re-wrapped). */
  private def substNamed(ne: NamedExpression,
      amap: AttributeMap[Expression]): NamedExpression =
    ne.transformUp {
      case a: AttributeReference => amap.getOrElse(a, a)
    } match {
      case stillNamed: NamedExpression => stillNamed
      case other => Alias(other, ne.name)(exprId = ne.exprId)
    }

  private def aliasMap(plist: Seq[NamedExpression]): AttributeMap[Expression] =
    AttributeMap(plist.collect {
      case a: Alias => (a.toAttribute, a.child)
    })

  /** The Filter(rank ≤ k, Window(row_number…)) core in its three
    * planned shapes: bare, Project above the filter, and Project BELOW
    * the filter (the `withColumn(rn, …cast).filter` form — the cast
    * lands in a Project under the Filter). Nested projections compose:
    * every returned projectList is expressed over the window child's
    * output plus the rank alias. */
  private object TopKShape {
    def unapply(plan: LogicalPlan): Option[(Seq[NamedExpression], Expression,
        Seq[Expression], AttributeReference, AttributeReference, Alias,
        LogicalPlan)] = plan match {
      case Project(outer, TopKShape(
          (inner, cond, partSpec, score, id, alias, child))) =>
        val amap = aliasMap(inner)
        Some((outer.map(substNamed(_, amap)), cond, partSpec, score, id,
          alias, child))
      case f @ Filter(cond,
          WindowCore((partSpec, score, id, alias, child))) =>
        Some((f.output, cond, partSpec, score, id, alias, child))
      case Filter(cond, Project(plist,
          WindowCore((partSpec, score, id, alias, child)))) =>
        // inline the projection's aliases into the filter condition so
        // the rank bound is recognizable on the window's own rn
        // attribute; the projection itself becomes the output list
        val amap = aliasMap(plist)
        val inlined = cond.transformUp {
          case a: AttributeReference => amap.getOrElse(a, a)
        }
        Some((plist, inlined, partSpec, score, id, alias, child))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKShape((projectList, cond, partSpec, score, id, alias, child0))
      if score.dataType == DoubleType && notNull(child0, score) &&
        isIntegral(id.dataType) && notNull(child0, id) &&
        partSpec.forall(_.isInstanceOf[AttributeReference]) &&
        rankBound(cond, alias.toAttribute).exists(k => k > 0 && k <= 1000) &&
        projectList.forall(_.deterministic) &&
        projectList.forall(_.references.subsetOf(
          AttributeSet(child0.output ++ Seq(alias.toAttribute)))) =>
      val k = rankBound(cond, alias.toAttribute).get
      val partAttrs = partSpec.map(_.asInstanceOf[AttributeReference])

      // Spark's InferWindowGroupLimit may already have slid a
      // WindowGroupLimit under the window (a per-partition sort+limit
      // pass). The heap aggregate subsumes it — peel it off, but only
      // when it provably keeps at least the top k OF THIS WINDOW'S
      // order: same partition spec, same (score desc nulls-last,
      // id asc) sort, row_number semantics, limit ≥ k. A WGL with any
      // other spec (however it got there) prunes rows the heap still
      // needs, so it must stay.
      def sameOrder(os: Seq[SortOrder]): Boolean = os match {
        case Seq(SortOrder(s, Descending, NullsLast, _),
                 SortOrder(i, Ascending, _, _)) =>
          s.semanticEquals(score) && i.semanticEquals(id)
        case _ => false
      }
      def samePart(ps: Seq[Expression]): Boolean =
        ps.length == partSpec.length &&
          ps.zip(partSpec).forall { case (a, b) => a.semanticEquals(b) }
      val child = child0 match {
        case WindowGroupLimit(ps, os, RowNumber(), limit, c)
            if limit >= k && samePart(ps) && sameOrder(os) => c
        case other => other
      }

      // child attributes the projection needs beyond (grp, score, id)
      // ride INSIDE the heap entries (TopKRows); without payload the
      // narrower TopKHits buffer serves
      val direct = AttributeSet(partAttrs ++ Seq(score, id))
      val payloadAttrs = projectList
        .flatMap(_.references.filterNot(a =>
          direct.contains(a) || a.semanticEquals(alias.toAttribute)))
        .distinct

      val idAsLong =
        if (id.dataType == LongType) id else Cast(id, LongType)
      val hits = Alias(
        (if (payloadAttrs.isEmpty) TopKHits(score, idAsLong, k)
         else TopKRows(score, idAsLong, payloadAttrs, k))
          .toAggregateExpression(), "__hits")()
      val agg = Aggregate(partAttrs, partAttrs :+ hits, child)

      // → posexplode(__hits) = (pos int, col struct<score, id, p…>)
      val gen = PosExplode(hits.toAttribute)
      val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
      val colAttr = AttributeReference("__hit",
        gen.elementSchema("col").dataType, nullable = false)()
      val generate = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(posAttr, colAttr), agg)

      // rebuild the original projection on (grp…, hit.score, hit.id,
      // hit.p…, pos+1) — every original attribute maps 1:1
      val scoreBack = GetStructField(colAttr, 0, Some("score"))
      val idBack: Expression = {
        val asLong = GetStructField(colAttr, 1, Some("id"))
        if (id.dataType == LongType) asLong else Cast(asLong, id.dataType)
      }
      val rnBack = Cast(Add(posAttr, Literal(1)), alias.dataType)
      val payloadBack: Map[ExprId, Expression] =
        payloadAttrs.zipWithIndex.map { case (a, j) =>
          a.exprId -> (GetStructField(colAttr, 2 + j, Some(s"p$j")): Expression)
        }.toMap
      val rebuilt = projectList.map { ne =>
        ne.transform {
          case a: AttributeReference if a.semanticEquals(score) => scoreBack
          case a: AttributeReference if a.semanticEquals(id) => idBack
          case a: AttributeReference if a.semanticEquals(alias.toAttribute) =>
            rnBack
          case a: AttributeReference if payloadBack.contains(a.exprId) =>
            payloadBack(a.exprId)
        } match {
          case stillNamed: NamedExpression => stillNamed
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      Project(rebuilt, generate)
  }
}
