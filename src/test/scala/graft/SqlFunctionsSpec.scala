package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.SqlSession

/** CREATE FUNCTION — SQL-invoked function DDL (api/SqlFunctions.scala):
  * definition grammar incl. routine characteristics, translate-time
  * inlining (the reference's InlineSqlFunctions.java strategy), nested
  * functions, parameter hygiene (no rewrites inside string literals or
  * longer identifiers), return-type casts, lifecycle errors, SHOW
  * FUNCTIONS listing, and the recursion bound. */
class SqlFunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val session = SqlSession.wrap(spark).loadTables(sf)

  private def drop(names: String*): Unit =
    names.foreach(n => session.sql(s"DROP FUNCTION IF EXISTS $n"))

  test("define and call a scalar SQL function") {
    drop("sqf_double_it")
    session.sql(
      "CREATE FUNCTION sqf_double_it(x DOUBLE) RETURNS DOUBLE RETURN x * 2")
    val r = session.sql("SELECT sqf_double_it(21) AS v").collect()
    assert(r.head.getDouble(0) == 42.0)
  }

  test("full routine characteristics parse (comment, language, null input)") {
    drop("sqf_tan")
    session.sql("""CREATE FUNCTION sqf_tan(x DOUBLE)
      |RETURNS DOUBLE
      |COMMENT 'tangent via sin/cos'
      |LANGUAGE SQL
      |DETERMINISTIC
      |RETURNS NULL ON NULL INPUT
      |RETURN sin(x) / cos(x)""".stripMargin)
    val r = session.sql("SELECT round(sqf_tan(0.5), 9) AS v").collect()
    assert(r.head.getDouble(0) == math.rint(math.tan(0.5) * 1e9) / 1e9)
  }

  test("declared return type is enforced by cast") {
    drop("sqf_as_int")
    session.sql(
      "CREATE FUNCTION sqf_as_int(x DOUBLE) RETURNS BIGINT RETURN x + 0.25")
    val df = session.sql("SELECT sqf_as_int(41.5) AS v")
    assert(df.schema.head.dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.collect().head.getLong(0) == 41L)
  }

  test("nested functions inline to a fixpoint") {
    drop("sqf_disc", "sqf_charge")
    session.sql("CREATE FUNCTION sqf_disc(p DOUBLE, d DOUBLE) " +
      "RETURNS DOUBLE RETURN p * (1 - d)")
    session.sql("CREATE FUNCTION sqf_charge(p DOUBLE, d DOUBLE, t DOUBLE) " +
      "RETURNS DOUBLE RETURN sqf_disc(p, d) * (1 + t)")
    val r = session.sql("SELECT sqf_charge(100, 0.1, 0.05) AS v").collect()
    assert(math.abs(r.head.getDouble(0) - 94.5) < 1e-9)
  }

  test("parameter substitution is word-bounded and literal-safe") {
    drop("sqf_hygiene")
    // param `p` must not rewrite `upper(`'s p, the literal 'p', or `pp`
    session.sql("CREATE FUNCTION sqf_hygiene(p VARCHAR) RETURNS VARCHAR " +
      "RETURN upper(p) || ' p ' || 'p'")
    val r = session.sql("SELECT sqf_hygiene('ab') AS v").collect()
    assert(r.head.getString(0) == "AB p p")
  }

  test("arguments with commas and nested calls parse at top level") {
    drop("sqf_add")
    session.sql("CREATE FUNCTION sqf_add(a DOUBLE, b DOUBLE) " +
      "RETURNS DOUBLE RETURN a + b")
    val r = session.sql(
      "SELECT sqf_add(greatest(1, 2), sqf_add(3, 4)) AS v").collect()
    assert(r.head.getDouble(0) == 9.0)
  }

  test("function names never rewrite inside string literals") {
    drop("sqf_lit")
    session.sql("CREATE FUNCTION sqf_lit(x BIGINT) RETURNS BIGINT RETURN x")
    val r = session.sql("SELECT 'call sqf_lit(1)' AS s, sqf_lit(7) AS v")
      .collect()
    assert(r.head.getString(0) == "call sqf_lit(1)")
    assert(r.head.getLong(1) == 7L)
  }

  test("lifecycle errors: duplicate create, missing drop, wrong arity") {
    drop("sqf_life")
    session.sql("CREATE FUNCTION sqf_life(x BIGINT) RETURNS BIGINT RETURN x")
    val dup = intercept[IllegalArgumentException] {
      session.sql("CREATE FUNCTION sqf_life(x BIGINT) RETURNS BIGINT RETURN x")
    }
    assert(dup.getMessage.contains("already exists"))
    session.sql("CREATE OR REPLACE FUNCTION sqf_life(x BIGINT) " +
      "RETURNS BIGINT RETURN x + 1")
    assert(session.sql("SELECT sqf_life(1) AS v").collect().head.getLong(0) == 2L)
    val arity = intercept[IllegalArgumentException] {
      session.sql("SELECT sqf_life(1, 2)").collect()
    }
    assert(arity.getMessage.contains("expects 1 arguments"))
    session.sql("DROP FUNCTION sqf_life")
    val gone = intercept[IllegalArgumentException] {
      session.sql("DROP FUNCTION sqf_life")
    }
    assert(gone.getMessage.contains("not found"))
  }

  test("SHOW FUNCTIONS lists SQL-invoked functions") {
    drop("sqf_shown")
    session.sql("CREATE FUNCTION sqf_shown(x BIGINT) RETURNS BIGINT RETURN x")
    val names = session.sql("SHOW FUNCTIONS LIKE 'sqf%'").collect()
      .map(_.getString(0))
    assert(names.contains("sqf_shown"))
  }

  test("recursive definitions hit the inline depth bound") {
    drop("sqf_rec")
    session.sql("CREATE FUNCTION sqf_rec(x BIGINT) RETURNS BIGINT " +
      "RETURN sqf_rec(x)")
    val e = intercept[IllegalArgumentException] {
      session.sql("SELECT sqf_rec(1)").collect()
    }
    assert(e.getMessage.contains("recursive"))
    drop("sqf_rec")
  }

  test("qualified call sites and decimal parameter types") {
    drop("sqf_dec")
    session.sql("CREATE FUNCTION graft.default.sqf_dec(x DECIMAL(10,2)) " +
      "RETURNS DECIMAL(10,2) RETURN x * 2")
    val r = session.sql(
      "SELECT graft.default.sqf_dec(CAST(1.25 AS DECIMAL(10,2))) AS v")
      .collect()
    assert(r.head.getDecimal(0).doubleValue == 2.5)
  }
}
