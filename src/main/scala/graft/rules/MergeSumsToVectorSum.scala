package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.functions.VectorSumNullableAgg

/** Fuse N parallel `sum(x_i)` aggregates over the same input into ONE
  * vector_sum of a packed array (reference: MAIN/sql/planner/iterative/
  * rule/MergeSumsToVectorSum.java:53-132 — "Aggregation(sum(col1), ...,
  * sum(colN)) → Project(arr <- array(col1..colN)) → Aggregation
  * (vector_sum(arr)) → unpack").
  *
  * Why this matters at scale: a wide-feature aggregation (hundreds of
  * per-dimension sums, the shape of every embedding/metrics rollup)
  * otherwise carries N aggregation buffers through partial aggregation,
  * the shuffle, and the merge tree — N slot updates and N merge-loop
  * dispatches per row/group. Fused, it is one primitive-array state with
  * one tight loop, the same bytes on the wire, and far less per-aggregate
  * bookkeeping.
  *
  * Safety conditions (mirroring the reference's eligibility checks):
  *  - plain `Sum` only — no DISTINCT, no FILTER clause
  *  - float/double inputs (integral sums keep exact long arithmetic)
  *  - deterministic children
  *  - at least [[Threshold]] sums, at most [[ArraySizeLimit]]
  * Null semantics are preserved exactly: the fused aggregate counts
  * non-null inputs per position and yields NULL where `sum(x_i)` would
  * (VectorSumNullableAgg).
  */
object MergeSumsToVectorSum extends Rule[LogicalPlan] {
  val Threshold = 3
  val ArraySizeLimit = 2000 // reference ARRAY_SIZE_LIMIT guard

  private def eligible(e: NamedExpression): Option[(Alias, AggregateExpression, Expression)] =
    e match {
      case a @ Alias(ae @ AggregateExpression(Sum(c, _), _, false, None, _), _)
        if (c.dataType == DoubleType || c.dataType == FloatType) && c.deterministic =>
        Some((a, ae, c))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, hint) =>
      val fused = aggExprs.flatMap(e => eligible(e))
      if (fused.size < Threshold || fused.size > ArraySizeLimit) agg
      else {
        val arr = CreateArray(fused.map {
          case (_, _, c) if c.dataType == FloatType => Cast(c, DoubleType)
          case (_, _, c) => c
        })
        // reuse the matched aggregates' mode; one fused buffer replaces N
        val vsAlias = Alias(
          fused.head._2.copy(
            aggregateFunction = VectorSumNullableAgg(arr), isDistinct = false,
            filter = None),
          "vector_sum")()
        val keep = aggExprs.filter(e => eligible(e).isEmpty)
        val newAgg = Aggregate(groupingExprs, keep :+ vsAlias, child, hint)
        val vs = vsAlias.toAttribute
        val projList: Seq[NamedExpression] = aggExprs.map { e =>
          val pos = fused.indexWhere { case (a, _, _) => a eq e }
          if (pos < 0) e.toAttribute
          else {
            val a = fused(pos)._1
            Alias(ElementAt(vs, Literal(pos + 1)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata))
          }
        }
        Project(projList, newAgg)
      }
  }
}
