package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Alias, CreateArray, Expression, GetArrayItem, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Fuses N `approx_percentile(x, p_i)` calls over the same input and
  * accuracy into ONE `approx_percentile(x, array(p_1..p_N))` digest, with
  * each original output rewritten to an array subscript of the shared
  * result (reference: MAIN/sql/planner/iterative/rule/
  * CombineApproxPercentileFunctions.java — same rewrite, same
  * preconditions). One t-digest/QuantileSummaries accumulation instead of N
  * is the difference between 1× and N× aggregation state and merge traffic
  * on a wide percentile dashboard query at 100 TB.
  *
  * Preconditions per group: identical (canonicalized) input expression and
  * accuracy, scalar foldable percentage, non-DISTINCT, no FILTER clause.
  * The fused result is value-identical, not merely approximate-equivalent:
  * the digest is deterministic in its input, so querying one digest at N
  * percentiles equals N identical digests at one percentile each.
  */
object CombineApproxPercentiles extends Rule[LogicalPlan] {

  private def candidate(ae: AggregateExpression): Option[ApproximatePercentile] =
    ae.aggregateFunction match {
      case ap: ApproximatePercentile
        if !ae.isDistinct && ae.filter.isEmpty &&
          ap.percentageExpression.foldable &&
          !ap.percentageExpression.dataType.isInstanceOf[ArrayType] =>
        Some(ap)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val cands: Seq[(AggregateExpression, ApproximatePercentile)] =
        agg.aggregateExpressions.flatMap(_.collect {
          case ae: AggregateExpression if candidate(ae).isDefined =>
            ae -> candidate(ae).get
        })
      val groups = cands
        .groupBy { case (_, ap) =>
          (ap.child.canonicalized, ap.accuracyExpression.canonicalized)
        }
        .filter { case (_, g) => g.map(_._1.canonicalized).distinct.size >= 2 }
      if (groups.isEmpty) agg
      else {
        val replacements: Map[Expression, Expression] = groups.values.flatMap { g =>
          val distinctAes = g.map(_._1).distinctBy(_.canonicalized)
          val ap0 = g.head._2
          val pcts = distinctAes.map { ae =>
            candidate(ae).get.percentageExpression.eval() match {
              case d: java.lang.Double => d.doubleValue()
              case n: Number => n.doubleValue()
            }
          }
          val fused = g.head._1.copy(aggregateFunction = ap0.copy(
            percentageExpression = CreateArray(pcts.map(Literal(_)))))
          distinctAes.zipWithIndex.flatMap { case (ae, i) =>
            // map every original occurrence (canonical-equal) to fused[i]
            g.collect { case (orig, _) if orig.canonicalized == ae.canonicalized =>
              (orig: Expression) -> GetArrayItem(fused, Literal(i))
            }
          }
        }.toMap
        agg.copy(aggregateExpressions = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case e: AggregateExpression if replacements.contains(e) => replacements(e)
          } match {
            case n: NamedExpression => n
            case other => Alias(other, ne.name)()
          }
        })
      }
  }
}
