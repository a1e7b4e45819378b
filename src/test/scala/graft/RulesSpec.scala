package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape + value tests for graft's extra optimizer rules (the
  * reference's plan-assertion pattern, presto-main-base/src/test/.../sql/
  * planner/TestWindowFilterPushDown.java style). */
class RulesSpec extends AnyFunSuite {
  import TestSpark._

  private def distinctAggFns(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      .flatMap(_.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae.canonicalized
      }))
      .distinct

  test("approx-percentile fusion: N calls collapse to one digest") {
    spark.experimental.extraOptimizations =
      Seq(graft.rules.CombineApproxPercentiles)
    val l = Tables(spark, sf, "lineitem")
    val fused = l.groupBy("l_returnflag").agg(
      expr("approx_percentile(l_quantity, 0.25)").as("q25"),
      expr("approx_percentile(l_quantity, 0.5)").as("q50"),
      expr("approx_percentile(l_quantity, 0.75)").as("q75"))
    val aggs = distinctAggFns(fused)
    assert(aggs.size == 1, s"expected 1 fused aggregate, got:\n${aggs.mkString("\n")}")
    assert(aggs.head.collectFirst {
      case ap: ApproximatePercentile => ap
    }.get.percentageExpression.dataType.typeName.startsWith("array"))

    // value-identical to the unfused plan (digest is deterministic in input)
    spark.experimental.extraOptimizations = Nil
    val plain = l.groupBy("l_returnflag").agg(
      expr("approx_percentile(l_quantity, 0.25)").as("q25"),
      expr("approx_percentile(l_quantity, 0.5)").as("q50"),
      expr("approx_percentile(l_quantity, 0.75)").as("q75"))
    assert(fused.orderBy("l_returnflag").collect().toSeq ==
      plain.orderBy("l_returnflag").collect().toSeq)
  }

  test("fusion leaves mixed inputs, DISTINCT, and FILTER untouched") {
    spark.experimental.extraOptimizations =
      Seq(graft.rules.CombineApproxPercentiles)
    val l = Tables(spark, sf, "lineitem")
    // different children → no fusion group
    val mixed = l.groupBy("l_returnflag").agg(
      expr("approx_percentile(l_quantity, 0.5)").as("a"),
      expr("approx_percentile(l_extendedprice, 0.5)").as("b"))
    assert(distinctAggFns(mixed).size == 2)
    // FILTER clause disqualifies
    val filtered = l.groupBy("l_returnflag").agg(
      expr("approx_percentile(l_quantity, 0.25) FILTER (WHERE l_quantity > 10)").as("a"),
      expr("approx_percentile(l_quantity, 0.75)").as("b"))
    assert(distinctAggFns(filtered).size == 2)
    spark.experimental.extraOptimizations = Nil
  }
}
