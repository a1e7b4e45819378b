package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Dialect, SqlSession}

/** Quantified comparison subqueries through the dialect
  * (api/SqlSession.scala rewriteQuantified — the reference's
  * TransformQuantifiedComparisonApplyToLateralJoin lowering): ANSI 3VL
  * on every branch — empty set, NULL elements, NULL left operand,
  * min=max collapse, IN/NOT IN delegation, SOME alias. */
class QuantifiedSpec extends AnyFunSuite {
  import TestSpark._

  private def one(expr: String): Any = {
    val r = SqlSession.wrap(spark).sql(s"SELECT $expr AS v").collect().head
    if (r.isNullAt(0)) null else r.getBoolean(0)
  }

  private val nums = "(SELECT x FROM VALUES (1), (2), (3) AS t(x))"
  private val withNull = "(SELECT x FROM VALUES (1), (NULL) AS t(x))"
  private val empty = "(SELECT x FROM VALUES (1) AS t(x) WHERE false)"
  private val ones = "(SELECT x FROM VALUES (1), (1) AS t(x))"

  test("> ALL / >= ALL: strict bound, NULL poisoning, empty set") {
    assert(one(s"5 > ALL $nums") == true)
    assert(one(s"3 > ALL $nums") == false)   // 3 > 3 fails
    assert(one(s"3 >= ALL $nums") == true)
    assert(one(s"5 > ALL $empty") == true)   // vacuous truth
    assert(one(s"5 > ALL $withNull") == null) // can't confirm vs NULL
    assert(one(s"0 > ALL $withNull") == false) // witness 1 decides
    assert(one(s"CAST(NULL AS INT) > ALL $nums") == null)
    assert(one(s"CAST(NULL AS INT) > ALL $empty") == true) // empty wins
  }

  test("< ANY / <= ANY / SOME: existential, empty set is false") {
    assert(one(s"2 < ANY $nums") == true)
    assert(one(s"3 < ANY $nums") == false)
    assert(one(s"3 <= SOME $nums") == true)
    assert(one(s"5 < ANY $empty") == false)
    assert(one(s"5 < ANY $withNull") == null)  // no witness, NULL present
    assert(one(s"0 < ANY $withNull") == true)  // witness 1 decides
  }

  test("= ALL and <> ANY use the min=max collapse") {
    assert(one(s"1 = ALL $ones") == true)
    assert(one(s"1 = ALL $nums") == false)
    assert(one(s"1 = ALL $empty") == true)
    assert(one(s"1 = ALL $withNull") == null)  // 1 matches, NULL unknown
    assert(one(s"2 = ALL $withNull") == false) // 1 refutes
    assert(one(s"1 <> ANY $ones") == false)
    assert(one(s"1 <> ANY $nums") == true)
    assert(one(s"1 <> ANY $empty") == false)
  }

  test("= ANY is IN; <> ALL is NOT IN") {
    assert(one(s"2 = ANY $nums") == true)
    assert(one(s"9 = ANY $nums") == false)
    assert(one(s"9 <> ALL $nums") == true)
    assert(one(s"2 <> ALL $nums") == false)
  }

  test("parenthesized and function left operands") {
    assert(one(s"(2 + 4) > ALL $nums") == true)
    assert(one(s"abs(-9) > ALL $nums") == true)
  }

  test("correlated quantified subquery decorrelates") {
    Tables.registerAll(spark, sf)
    val rows = SqlSession.wrap(spark).sql(
      """SELECT n_nationkey FROM nation n
        |WHERE n_nationkey >= ALL (SELECT r_regionkey FROM region r
        |                          WHERE r.r_regionkey = n.n_nationkey)
        |ORDER BY n_nationkey""".stripMargin).collect()
    // every nation qualifies: key 0..4 equal their region key (>=), the
    // rest see an empty subquery (vacuous true)
    assert(rows.length == spark.table("nation").count())
  }

  test("any(...) the aggregate is NOT rewritten (no subquery after paren)") {
    val t = Dialect.translate("SELECT flag = any(flag) FROM t GROUP BY g")
    assert(t.contains("= any(flag)"))
  }
}
