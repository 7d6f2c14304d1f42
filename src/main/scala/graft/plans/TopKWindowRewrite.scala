package graft.plans

import graft.functions.TopKHits
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: the grouped-top-k WINDOW idiom
  *
  * {{{
  *   SELECT grp, id, score, rn FROM (
  *     SELECT ..., row_number() OVER
  *       (PARTITION BY grp ORDER BY score DESC, id ASC) AS rn ...)
  *   WHERE rn <= k
  * }}}
  *
  * rewrites to the bounded heap aggregate
  * ([[graft.functions.TopKHits]]) + posexplode. The window plan
  * shuffles EVERY row of every group and sorts each partition; the
  * heap plan's map-side partial prunes each partition to k rows per
  * group before the exchange, so shuffle volume is k·partitions·groups
  * — independent of group size. This is the repo's leaderboard
  * discipline ([[graft.ops.TextAnalytics.weightedReservoir]],
  * `grouped_topk`) promoted from a hand-written idiom to a Catalyst
  * rule: ANY SQL user writing the standard window form gets the
  * bounded plan.
  *
  * Fires only on the provably-equivalent narrow pattern:
  *  - exactly one window expression, `row_number()` over
  *    (PARTITION BY …, ORDER BY score DESC NULLS LAST, id ASC) — the
  *    (score desc, id asc) total order is [[TopKHits]]'s insertion
  *    order, and the integral id tie-break makes row_number
  *    deterministic (without it the window itself is nondeterministic
  *    and rewriting would be legal anyway, but stay conservative);
  *  - score is a non-nullable DOUBLE attribute and id a non-nullable
  *    integral attribute (null scores never reach the heap — require
  *    they cannot exist);
  *  - the filter is `rn <= lit` / `rn < lit` with 0 < k ≤ 1000 (the
  *    O(k) sorted-insert buffer is for search-context k, not arbitrary
  *    LIMIT pushdown);
  *  - the projection above uses ONLY grouping columns, score, id, rn —
  *    reconstructing any other column would need a join-back on
  *    (grp, id), which is only safe when that pair is unique; the
  *    rule cannot know that, so it declines.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  /** rn <= k / rn < k+1 bound, if the condition is exactly that. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) =>
        intLit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) =>
        intLit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) =>
        intLit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) =>
        intLit(l).map(_ - 1)
      case _ => None
    }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The Filter(rank ≤ k, Window(row_number…)) core, with or without a
    * Project on top (an identity Project collapses away in earlier
    * batches, so both shapes reach the optimizer). */
  private object TopKShape {
    def unapply(plan: LogicalPlan): Option[(Seq[NamedExpression], Expression,
        Seq[Expression], AttributeReference, AttributeReference, Alias,
        LogicalPlan)] = plan match {
      case Project(projectList, TopKShape(
          (_, cond, partSpec, score, id, alias, child))) =>
        Some((projectList, cond, partSpec, score, id, alias, child))
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(partSpec, Seq(
              SortOrder(score: AttributeReference, Descending, NullsLast, _),
              SortOrder(id: AttributeReference, Ascending, _, _)), _)), _)),
            _, _, child, _)) =>
        Some((f.output, cond, partSpec, score, id, alias, child))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKShape((projectList, cond, partSpec, score, id, alias, child))
      if score.dataType == DoubleType && !score.nullable &&
        isIntegral(id.dataType) && !id.nullable &&
        partSpec.forall(_.isInstanceOf[AttributeReference]) &&
        rankBound(cond, alias.toAttribute).exists(k => k > 0 && k <= 1000) &&
        projectList.forall(_.references.subsetOf(AttributeSet(
          partSpec.flatMap(_.references) ++ Seq(score, id, alias.toAttribute)))) =>
      val k = rankBound(cond, alias.toAttribute).get
      val partAttrs = partSpec.map(_.asInstanceOf[AttributeReference])

      // child → Aggregate(grp, [grp..., top_k_hits(score, id, k)])
      val idAsLong =
        if (id.dataType == LongType) id else Cast(id, LongType)
      val hits = Alias(
        TopKHits(score, idAsLong, k).toAggregateExpression(), "__hits")()
      val agg = Aggregate(partAttrs, partAttrs :+ hits, child)

      // → posexplode(__hits) = (pos int, col struct<score, id>)
      val gen = PosExplode(hits.toAttribute)
      val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
      val colAttr = AttributeReference("__hit",
        gen.elementSchema("col").dataType, nullable = false)()
      val generate = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(posAttr, colAttr), agg)

      // rebuild the original projection on (grp..., hit.score, hit.id,
      // pos+1) — every original attribute maps 1:1
      val scoreBack = GetStructField(colAttr, 0, Some("score"))
      val idBack: Expression = {
        val asLong = GetStructField(colAttr, 1, Some("id"))
        if (id.dataType == LongType) asLong else Cast(asLong, id.dataType)
      }
      val rnBack = Cast(Add(posAttr, Literal(1)), alias.dataType)
      val rebuilt = projectList.map { ne =>
        ne.transform {
          case a: AttributeReference if a.semanticEquals(score) => scoreBack
          case a: AttributeReference if a.semanticEquals(id) => idBack
          case a: AttributeReference if a.semanticEquals(alias.toAttribute) =>
            rnBack
        } match {
          case stillNamed: NamedExpression => stillNamed
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      Project(rebuilt, generate)
  }
}
