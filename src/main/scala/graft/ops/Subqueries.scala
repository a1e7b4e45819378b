package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Subquery and lateral-join coverage (SURVEY.md §2.1: ApplyNode /
  * LateralJoinNode — MAIN/sql/planner/plan/ApplyNode.java:34 — plus the
  * decorrelation rules TransformCorrelatedScalarAggregationToJoin.java,
  * TransformCorrelatedInPredicateToJoin.java). Catalyst performs the same
  * decorrelation (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery)
  * — these queries go through `spark.sql` so the subquery planning paths are
  * exercised end-to-end, not pre-lowered by hand.
  *
  * Decorrelation is exactly what makes these scale: every correlated
  * predicate below becomes a distributed join + aggregation, never a
  * per-row re-execution. */
object Subqueries {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(text)
  }

  /** Uncorrelated scalar subquery (EnforceSingleRowOperator.java:27). */
  private val scalarSql =
    """SELECT o_orderpriority, count(*) AS n_above_avg
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Correlated scalar subquery → decorrelated join + agg. */
  private val corrScalarSql =
    """SELECT c_custkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT 2 * avg(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  /** IN subquery (HashSemiJoinOperator / SemiJoinNode). */
  private val inSql =
    """SELECT c_mktsegment, count(*) AS n
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** NOT IN over a null-free subquery (anti join with null semantics). */
  private val notInSql =
    """SELECT s_nationkey, count(*) AS n
      |FROM supplier
      |WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
      |                        WHERE l_quantity = 50 AND l_discount > 0.09
      |                          AND l_suppkey IS NOT NULL)
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Correlated EXISTS with an extra predicate. */
  private val existsSql =
    """SELECT p_brand, count(*) AS n
      |FROM part p
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** LATERAL correlated derived table (LateralJoinNode.java:40; Spark 3.2+
    * LATERAL). Top order per customer — per-row top-k via lateral. */
  private val lateralSql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      | LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |          WHERE o.o_custkey = c.c_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      |WHERE c.c_custkey <= 200
      |ORDER BY c.c_custkey""".stripMargin

  /** Correlated quantified comparison (SqlBase.g4 comparisonQuantifier;
    * TransformQuantifiedComparisonApplyToLateralJoin.java): goes through
    * the DIALECT (Spark's parser has no ALL/ANY subqueries) — the
    * count/min/max CASE lowering decorrelates into one join + agg. */
  private val quantAllSql =
    """SELECT s_suppkey, s_name
      |FROM supplier s
      |WHERE (s_acctbal * 2) > ALL (SELECT c_acctbal FROM customer c
      |                       WHERE c.c_nationkey = s.s_nationkey)
      |ORDER BY s_suppkey""".stripMargin

  /** Three quantifiers in one projection, incl. the empty-subquery and
    * min=max-collapse branches of the 3VL lowering. */
  private val quantMixedSql =
    """SELECT n_nationkey,
      |  n_nationkey >= ALL (SELECT r_regionkey FROM region) AS ge_all,
      |  n_nationkey > ANY (SELECT r_regionkey FROM region) AS gt_any,
      |  n_nationkey = ALL (SELECT r_regionkey FROM region
      |                     WHERE r_regionkey = n_nationkey) AS eq_all_self
      |FROM nation ORDER BY n_nationkey""".stripMargin

  private def dsql(s: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.api.SqlSession.wrap(s).sql(text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sub_scalar" -> ((s, d) => sql(s, d, scalarSql)),
    "sub_corr_scalar" -> ((s, d) => sql(s, d, corrScalarSql)),
    "sub_in" -> ((s, d) => sql(s, d, inSql)),
    "sub_not_in" -> ((s, d) => sql(s, d, notInSql)),
    "sub_exists" -> ((s, d) => sql(s, d, existsSql)),
    "sub_lateral" -> ((s, d) => sql(s, d, lateralSql)),
    "sub_quant_all" -> ((s, d) => dsql(s, d, quantAllSql)),
    "sub_quant_mixed" -> ((s, d) => dsql(s, d, quantMixedSql)))

  // The oracle runs the IDENTICAL ANSI SQL — both planners must agree.
  val oracle: Map[String, String] = Map(
    "sub_scalar" -> scalarSql,
    "sub_corr_scalar" -> corrScalarSql,
    "sub_in" -> inSql,
    "sub_not_in" -> notInSql,
    "sub_exists" -> existsSql,
    "sub_lateral" -> lateralSql,
    "sub_quant_all" -> quantAllSql,
    "sub_quant_mixed" -> quantMixedSql)
}
