package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.SqlSession

/** Enum + distinct types (reference CreateTypeTask.java, EnumCasts.java,
  * LongEnumOperators/VarcharEnumOperators, TypeSignature.parseEnumMap):
  * CREATE TYPE registration, membership-validated casts (named and
  * inline-signature spellings), enum_key, distinct-type aliasing, and the
  * reference's error messages. */
class EnumTypesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ses = SqlSession.wrap(spark)

  private def msg(e: Throwable): String = {
    var m = ""
    var c: Throwable = e
    while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
    m
  }

  test("bigint enum: create, cast validates membership, enum_key reverses") {
    ses.sql("""CREATE TYPE mood AS BigintEnum(mood{"HAPPY":0, "SAD":1, "CURIOUS":-2})""")
    val ok = ses.sql(
      "SELECT CAST(0 AS mood) AS v, enum_key('mood', 1) AS k, " +
        "enum_key('mood', -2) AS kc").collect()(0)
    assert(ok.getLong(0) == 0L && ok.getString(1) == "SAD" &&
      ok.getString(2) == "CURIOUS")
    val e = intercept[Exception] { ses.sql("SELECT CAST(7 AS mood)").collect() }
    assert(msg(e).contains("No value '7' in enum 'mood'"), msg(e))
    val e2 = intercept[Exception] {
      ses.sql("SELECT enum_key('mood', 9)").collect()
    }
    assert(msg(e2).contains("No value '9' in enum type mood"), msg(e2))
  }

  test("varchar enum: values validate, keys reverse, quotes escape") {
    ses.sql("""CREATE TYPE country AS VarcharEnum(country{"US":"united states", "FR":"france", "QQ":"sa""id"})""")
    val r = ses.sql(
      "SELECT CAST('france' AS country) AS v, " +
        "enum_key('country', 'united states') AS k, " +
        "enum_key('country', 'sa\"id') AS kq").collect()(0)
    assert(r.getString(0) == "france" && r.getString(1) == "US" &&
      r.getString(2) == "QQ")
    val e = intercept[Exception] {
      ses.sql("SELECT CAST('germany' AS country)").collect()
    }
    assert(msg(e).contains("No value 'germany' in enum 'country'"), msg(e))
  }

  test("inline signature cast works without CREATE TYPE") {
    val r = ses.sql(
      """SELECT CAST(2 AS BigintEnum(prio{"LOW":1, "HIGH":2})) AS v""")
      .collect()(0)
    assert(r.getLong(0) == 2L)
    val e = intercept[Exception] {
      ses.sql("""SELECT CAST(3 AS BigintEnum(prio{"LOW":1, "HIGH":2}))""")
        .collect()
    }
    assert(msg(e).contains("No value '3' in enum 'prio'"), msg(e))
  }

  test("enum casts flow through table scans and predicates") {
    ses.sql("""CREATE TYPE lstat AS VarcharEnum(lstat{"OPEN":"O", "FULL":"F", "PART":"P"})""")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders_et")
    // every o_orderstatus is in the enum → cast passes for all rows
    val n = ses.sql(
      "SELECT count(*) AS n FROM orders_et " +
        "WHERE enum_key('lstat', CAST(o_orderstatus AS lstat)) IN ('OPEN','FULL','PART')")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("distinct type aliases to its base type") {
    ses.sql("CREATE TYPE ssn AS VARCHAR")
    val r = ses.sql("SELECT CAST(123 AS ssn) AS s").collect()(0)
    assert(r.getString(0) == "123")
  }

  test("DROP TYPE removes; IF EXISTS tolerates absence; unknown raises") {
    ses.sql("""CREATE TYPE tmp_e AS BigintEnum(tmp_e{"A":1})""")
    ses.sql("DROP TYPE tmp_e")
    // name no longer rewrites: cast now fails analysis (unknown type)
    intercept[Exception] { ses.sql("SELECT CAST(1 AS tmp_e)").collect() }
    ses.sql("DROP TYPE IF EXISTS tmp_e") // no-op, no raise
    val e = intercept[Exception] { ses.sql("DROP TYPE tmp_e").collect() }
    assert(msg(e).contains("Type not found"), msg(e))
    val e2 = intercept[Exception] {
      ses.sql("SELECT enum_key('tmp_e', 1)").collect()
    }
    assert(msg(e2).contains("unknown enum type"), msg(e2))
  }

  test("type errors: wrong base type into an enum cast") {
    ses.sql("""CREATE TYPE m2 AS BigintEnum(m2{"A":1})""")
    val e = intercept[Exception] {
      ses.sql("SELECT CAST('x' AS m2)").collect()
    }
    assert(msg(e).toLowerCase.contains("cannot cast"), msg(e))
  }

  test("enum_key inside a string literal or comment is left alone (r13)") {
    ses.sql("""CREATE TYPE m3 AS BigintEnum(m3{"A":1})""")
    // the literal text must come back verbatim — no rewrite, no
    // 'unknown enum type' from the unregistered name inside the string
    val r = ses.sql(
      "SELECT 'call enum_key(''nosuch'', 1) here' AS s, " +
        "enum_key('m3', 1) AS k -- enum_key('alsonosuch', 2)").collect()(0)
    assert(r.getString(0) == "call enum_key('nosuch', 1) here")
    assert(r.getString(1) == "A")
  }

  test("more than 32 enum casts raises instead of silently stopping (r13)") {
    ses.sql("""CREATE TYPE m33 AS BigintEnum(m33{"A":1})""")
    val exprs = (1 to 33).map(_ => "CAST(1 AS m33)").mkString(" + ")
    val e = intercept[Exception] { ses.sql(s"SELECT $exprs").collect() }
    assert(msg(e).contains("more than 32"), msg(e))
    // 32 exactly still rewrites fine
    val ok = (1 to 32).map(_ => "CAST(1 AS m33)").mkString(" + ")
    assert(ses.sql(s"SELECT $ok AS v").collect()(0).getLong(0) == 32L)
  }
}
