package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{AccessControl, SqlSession}

/** DCL statement family + opt-in SELECT enforcement
  * (api/AccessControl.scala). */
class DclSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(): SqlSession = {
    AccessControl.reset(spark)
    Tables(spark, sf, "nation").createOrReplaceTempView("nation")
    Tables(spark, sf, "region").createOrReplaceTempView("region")
    SqlSession.wrap(spark)
  }

  test("roles: create/grant/set/show, transitive enablement") {
    val q = fresh()
    q.sql("CREATE ROLE outer_r")
    q.sql("CREATE ROLE inner_r")
    q.sql("GRANT inner_r TO ROLE outer_r")
    q.sql("GRANT outer_r TO USER graft")
    assert(q.sql("SHOW ROLES").collect().map(_.getString(0)).toSet ==
      Set("admin", "public", "inner_r", "outer_r"))
    // ALL (default): closure includes the nested role
    assert(q.sql("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSet ==
      Set("public", "inner_r", "outer_r"))
    q.sql("SET ROLE NONE")
    assert(q.sql("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSet ==
      Set("public"))
    q.sql("SET ROLE outer_r")
    assert(q.sql("SHOW CURRENT ROLES").collect().map(_.getString(0)).toSet ==
      Set("public", "outer_r"))
    assert(q.sql("SHOW ROLE GRANTS").collect().map(_.getString(0)).toSet ==
      Set("public", "outer_r"))
    AccessControl.reset(spark)
  }

  test("missing role raises the reference message") {
    val q = fresh()
    val e = intercept[IllegalArgumentException] {
      q.sql("GRANT no_such_role TO USER graft")
    }
    assert(e.getMessage == "Role 'no_such_role' does not exist")
    val e2 = intercept[IllegalArgumentException] { q.sql("DROP ROLE ghost") }
    assert(e2.getMessage == "Role 'ghost' does not exist")
    AccessControl.reset(spark)
  }

  test("enforcement: deny without grant, allow via role, revoke re-denies") {
    val q = fresh()
    AccessControl.enable(spark)
    try {
      val e = intercept[SecurityException] {
        q.sql("SELECT count(*) FROM nation").collect()
      }
      assert(e.getMessage == "Access Denied: Cannot select from table nation")
      q.sql("CREATE ROLE geo")
      q.sql("GRANT geo TO USER graft")
      q.sql("GRANT SELECT ON nation TO ROLE geo")
      assert(q.sql("SELECT count(*) FROM nation").head.getLong(0) == 25L)
      // join still checks EVERY referenced table
      intercept[SecurityException] {
        q.sql("SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey").collect()
      }
      q.sql("GRANT ALL PRIVILEGES ON region TO USER graft")
      assert(q.sql(
        "SELECT count(*) FROM nation JOIN region ON n_regionkey = r_regionkey")
        .head.getLong(0) == 25L)
      q.sql("REVOKE SELECT ON nation FROM ROLE geo")
      intercept[SecurityException] {
        q.sql("SELECT count(*) FROM nation").collect()
      }
      // SET ROLE NONE disables role-carried privileges
      q.sql("GRANT SELECT ON nation TO ROLE geo")
      q.sql("SET ROLE NONE")
      intercept[SecurityException] {
        q.sql("SELECT count(*) FROM nation").collect()
      }
      // admin bypasses
      q.sql("SET ROLE ALL")
      q.sql("GRANT admin TO USER graft")
      assert(q.sql("SELECT count(*) FROM region").head.getLong(0) == 5L)
    } finally {
      AccessControl.disable(spark)
      AccessControl.reset(spark)
    }
  }
}
