package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Materialized-view rewrite (reference SPI/plan/MaterializedViewScanNode
  * + presto-main-base MaterializedViewOptimizer / *Utils: queries over a
  * base table are answered from a precomputed rollup when derivable).
  *
  * An MV here is a stored ROLLUP: `SELECT g1..gk, agg1..aggn FROM base
  * GROUP BY g1..gk` written to parquet and registered with its
  * derivation metadata. A query aggregate matches when
  *   - its child is the registered base relation (canonical-plan
  *     equality), optionally under a Filter over MV group columns only;
  *   - every GROUP BY expression is a plain base column contained in the
  *     MV's grouping set;
  *   - every aggregate is derivable from the stored partials:
  *     sum→sum, min→min, max→max, count→sum(cnt), avg→sum(sum)/sum(cnt).
  * The rewrite replaces the base scan with the MV scan and re-aggregates
  * the partials at the coarser grain — the standard rollup-algebra
  * argument for why this is exact (sums/mins/maxes/counts re-aggregate;
  * avg re-derives from sum and count, never from averaged averages).
  *
  * At 100 TB this is the difference between scanning the fact table and
  * scanning a table 4-6 orders of magnitude smaller; the rewritten plan
  * also inherits the MV's partitioning, so the re-aggregation often
  * broadcasts.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  /** (func, base column name) → MV output column; count(*) keys "*". */
  final case class MvDef(
    name: String,
    basePaths: Set[String],
    groupCols: Set[String],
    aggMap: Map[(String, String), String],
    mvPlan: LogicalPlan) {
    def mvAttr(n: String): Attribute = mvPlan.output.find(_.name == n).get
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  /** Root file paths of a file-source scan, if the plan is exactly one.
    * Matching by storage location (not plan-instance equality) makes the
    * rewrite robust across independent `spark.read.parquet(path)` calls —
    * the way the reference resolves a base-table reference by connector
    * table handle, not by plan identity. */
  private def scanPaths(plan: LogicalPlan): Option[Set[String]] = plan match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          Some(fs.location.rootPaths.map(_.toString).toSet)
        case _ => None
      }
    case _ => None
  }

  /** Register an MV: `mv` must be the stored rollup DataFrame (reading
    * the materialized parquet), `base` the base-table DataFrame it was
    * derived from. */
  def register(name: String, mv: DataFrame, base: DataFrame,
      groupCols: Seq[String], aggSpecs: Seq[(String, String, String)]): Unit = {
    val paths = scanPaths(base.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view $name: base must be a single file-source scan"))
    registry.put(name, MvDef(name, paths, groupCols.toSet,
      aggSpecs.map { case (f, c, out) => (f, c) -> out }.toMap,
      mv.queryExecution.analyzed))
  }

  def clear(): Unit = registry.clear()

  private def colName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Rewrite one aggregate expression to the MV partials, or None. */
  private def derive(mv: MvDef, ae: AggregateExpression): Option[Expression] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    def sumOf(out: String): Expression =
      AggregateExpression(Sum(mv.mvAttr(out)), Complete, isDistinct = false)
    ae.aggregateFunction match {
      case Sum(c, _) => colName(c).flatMap(n =>
        mv.aggMap.get(("sum", n)).map(sumOf))
      case Min(c) => colName(c).flatMap(n => mv.aggMap.get(("min", n)).map(o =>
        AggregateExpression(Min(mv.mvAttr(o)), Complete, isDistinct = false)))
      case Max(c) => colName(c).flatMap(n => mv.aggMap.get(("max", n)).map(o =>
        AggregateExpression(Max(mv.mvAttr(o)), Complete, isDistinct = false)))
      case Count(Seq(Literal(1, _))) =>
        mv.aggMap.get(("count", "*")).map(sumOf)
      case Count(Seq(c)) => colName(c).flatMap(n =>
        mv.aggMap.get(("count", n)).map(sumOf))
      case Average(c, _) => colName(c).flatMap { n =>
        for {
          s <- mv.aggMap.get(("sum", n))
          cnt <- mv.aggMap.get(("count", n)).orElse(mv.aggMap.get(("count", "*")))
        } yield org.apache.spark.sql.catalyst.expressions.Divide(
          Cast(sumOf(s), DoubleType), Cast(sumOf(cnt), DoubleType))
      }
      case _ => None
    }
  }

  /** Strip attr-only Projects and collect Filters down to the core scan
    * (after pruning/pushdown the optimized child is usually
    * Project → Filter → Relation). */
  private def unwrap(p: LogicalPlan,
      conds: Seq[Expression]): (Seq[Expression], LogicalPlan) = p match {
    case proj: org.apache.spark.sql.catalyst.plans.logical.Project
        if proj.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(proj.child, conds)
    case Filter(cond, c) => unwrap(c, conds :+ cond)
    case other => (conds, other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(gExprs, aExprs, child, _) =>
        val (conds, base) = unwrap(child, Nil)
        val filterCond: Option[Expression] =
          conds.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
        val basePathsOpt = scanPaths(base)
        val hit = registry.values().stream().filter(
          mv => basePathsOpt.contains(mv.basePaths)).findFirst()
        if (!hit.isPresent) agg
        else {
          val mv = hit.get()
          val gNames = gExprs.map(colName)
          val filterCols = filterCond.toSeq.flatMap(_.references.map(_.name))
          val groupable = gNames.forall(_.exists(mv.groupCols.contains)) &&
            filterCols.forall(mv.groupCols.contains)
          if (!groupable) agg
          else {
            // every output: group attr → MV attr; agg → derived partial
            val rewritten: Option[Seq[NamedExpression]] =
              traverseOutputs(mv, aExprs)
            rewritten match {
              case None => agg
              case Some(newOut) =>
                val newGroup = gExprs.map(e => mv.mvAttr(colName(e).get))
                val newChild = filterCond match {
                  case Some(cond) => Filter(cond.transform {
                    case a: AttributeReference => mv.mvAttr(a.name)
                  }, mv.mvPlan)
                  case None => mv.mvPlan
                }
                Aggregate(newGroup, newOut, newChild, None)
            }
          }
        }
    }
  }

  private def traverseOutputs(mv: MvDef,
      outs: Seq[NamedExpression]): Option[Seq[NamedExpression]] = {
    var ok = true
    val res = outs.map {
      case al @ Alias(expr, name) =>
        val newE = expr.transformUp {
          case ae: AggregateExpression =>
            derive(mv, ae) match {
              case Some(d) => d
              case None => ok = false; ae
            }
        }
        Alias(newE, name)(exprId = al.exprId, qualifier = al.qualifier)
      case a: AttributeReference if mv.groupCols.contains(a.name) =>
        Alias(mv.mvAttr(a.name), a.name)(exprId = a.exprId)
      case other => ok = false; other
    }
    if (ok) Some(res) else None
  }
}
