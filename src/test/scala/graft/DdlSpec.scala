package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.SqlSession

/** DDL / catalog statement surface (api/DdlStatements.scala) — lifecycle,
  * error contracts matching the reference tasks (CreateViewTask "View
  * already exists", DropTableTask "Table … does not exist", insert into
  * view rejected), and the SHOW family shapes. */
class DdlSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val session = SqlSession.wrap(spark).loadTables(sf)

  private def cleanup(): Unit = {
    session.sql("DROP TABLE IF EXISTS ddlspec_t")
    session.sql("DROP TABLE IF EXISTS ddlspec_t2")
    session.sql("DROP VIEW IF EXISTS ddlspec_v")
    session.sql("DROP VIEW IF EXISTS ddlspec_v2")
  }

  test("view lifecycle: create, query, replace, rename, drop") {
    cleanup()
    session.sql("CREATE VIEW ddlspec_v AS SELECT r_regionkey AS k FROM region")
    assert(session.sql("SELECT count(*) AS n FROM ddlspec_v")
      .collect()(0).getLong(0) == 5)
    // duplicate without OR REPLACE raises (CreateViewTask.java contract)
    val e = intercept[IllegalArgumentException] {
      session.sql("CREATE VIEW ddlspec_v AS SELECT 1 AS x")
    }
    assert(e.getMessage.contains("already exists"))
    session.sql("CREATE OR REPLACE VIEW ddlspec_v AS " +
      "SELECT r_regionkey AS k FROM region WHERE r_regionkey < 2")
    assert(session.sql("SELECT count(*) AS n FROM ddlspec_v")
      .collect()(0).getLong(0) == 2)
    session.sql("ALTER VIEW ddlspec_v RENAME TO ddlspec_v2")
    assert(session.sql("SELECT count(*) AS n FROM ddlspec_v2")
      .collect()(0).getLong(0) == 2)
    session.sql("DROP VIEW ddlspec_v2")
    val e2 = intercept[IllegalArgumentException] {
      session.sql("DROP VIEW ddlspec_v2")
    }
    assert(e2.getMessage.contains("not found"))
  }

  test("CTAS returns the row count and materializes real parquet") {
    cleanup()
    val n = session.sql(
      "CREATE TABLE ddlspec_t AS SELECT n_nationkey, n_name FROM nation")
      .collect()(0).getLong(0)
    assert(n == 25)
    // IF NOT EXISTS on an existing table: no-op, rows = 0
    assert(session.sql(
      "CREATE TABLE IF NOT EXISTS ddlspec_t AS SELECT 1 AS x")
      .collect()(0).getLong(0) == 0L)
    // the registered view scans parquet — column-pruned distributed scan
    val plan = session.sql("SELECT n_name FROM ddlspec_t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Parquet"), s"expected parquet scan, got: $plan")
    session.sql("DROP TABLE ddlspec_t")
  }

  test("INSERT INTO appends with positional coercion; views reject inserts") {
    cleanup()
    session.sql("CREATE TABLE ddlspec_t AS " +
      "SELECT n_nationkey AS k, n_name AS v FROM nation WHERE n_nationkey < 5")
    // integer literal coerces to the table's column type positionally
    val inserted = session.sql(
      "INSERT INTO ddlspec_t SELECT 100, 'EXTRA'").collect()(0).getLong(0)
    assert(inserted == 1)
    assert(session.sql("SELECT count(*) AS n FROM ddlspec_t")
      .collect()(0).getLong(0) == 6)
    session.sql("CREATE VIEW ddlspec_v AS SELECT 1 AS x")
    val e = intercept[IllegalArgumentException] {
      session.sql("INSERT INTO ddlspec_v SELECT 2")
    }
    assert(e.getMessage.contains("views"))
    // arity mismatch raises before any write
    val e2 = intercept[IllegalArgumentException] {
      session.sql("INSERT INTO ddlspec_t SELECT 1")
    }
    assert(e2.getMessage.toLowerCase.contains("column count"))
    cleanup()
  }

  test("TRUNCATE TABLE empties but keeps the table and its schema") {
    cleanup()
    session.sql("CREATE TABLE ddlspec_t AS SELECT r_regionkey AS k FROM region")
    session.sql("TRUNCATE TABLE ddlspec_t")
    val df = session.sql("SELECT * FROM ddlspec_t")
    assert(df.count() == 0 && df.schema.fieldNames.sameElements(Array("k")))
    session.sql("INSERT INTO ddlspec_t SELECT 9")
    assert(session.sql("SELECT k FROM ddlspec_t")
      .collect()(0).getAs[Number](0).longValue == 9)
    cleanup()
  }

  test("ALTER TABLE RENAME moves the catalog entry, data intact") {
    cleanup()
    session.sql("CREATE TABLE ddlspec_t AS SELECT r_regionkey AS k FROM region")
    session.sql("ALTER TABLE ddlspec_t RENAME TO ddlspec_t2")
    assert(session.sql("SELECT count(*) AS n FROM ddlspec_t2")
      .collect()(0).getLong(0) == 5)
    val e = intercept[Exception] { session.sql("SELECT * FROM ddlspec_t") }
    assert(e.getMessage.toLowerCase.contains("ddlspec_t"))
    cleanup()
  }

  test("SHOW TABLES / SHOW COLUMNS / DESCRIBE shapes") {
    cleanup()
    val tables = session.sql("SHOW TABLES").collect().map(_.getString(0))
    assert(tables.contains("nation") && tables.sameElements(tables.sorted))
    val cols = session.sql("SHOW COLUMNS FROM region").collect()
    assert(cols.map(_.getString(0)).toSeq == Seq("r_regionkey", "r_name"))
    // presto type spellings
    val byName = cols.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byName("r_name") == "varchar" && byName("r_regionkey") == "integer")
    // DESCRIBE t is the reference alias for SHOW COLUMNS FROM t
    assert(session.sql("DESCRIBE region").collect().length == cols.length)
  }

  test("SHOW FUNCTIONS LIKE filters the session registry") {
    val fns = session.sql("SHOW FUNCTIONS LIKE 'classification_%'")
      .collect().map(_.getString(0))
    assert(fns.length == 5 && fns.forall(_.startsWith("classification_")))
    val all = session.sql("SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(all.length > 300 && all.contains("vector_sum"))
  }

  test("SHOW CATALOGS / SHOW SCHEMAS / SHOW CREATE VIEW") {
    cleanup()
    assert(session.sql("SHOW CATALOGS").collect().map(_.getString(0)).toSeq
      == Seq("graft"))
    assert(session.sql("SHOW SCHEMAS").collect().map(_.getString(0))
      .contains("default"))
    session.sql("CREATE VIEW ddlspec_v AS SELECT r_regionkey AS k FROM region")
    val ddl = session.sql("SHOW CREATE VIEW ddlspec_v").collect()(0).getString(0)
    assert(ddl.startsWith("CREATE VIEW ddlspec_v AS") &&
      ddl.contains("SELECT r_regionkey AS k FROM region"))
    // definition follows a rename
    session.sql("ALTER VIEW ddlspec_v RENAME TO ddlspec_v2")
    assert(session.sql("SHOW CREATE VIEW ddlspec_v2").collect()(0)
      .getString(0).contains("SELECT r_regionkey"))
    intercept[IllegalArgumentException] {
      session.sql("SHOW CREATE VIEW ddlspec_nope")
    }
    cleanup()
  }

  test("EXPLAIN family: plan text, logical, validate, IO, analyze") {
    val q = "SELECT r_name, count(*) AS n FROM region GROUP BY r_name"
    val plan = session.sql(s"EXPLAIN $q").collect()(0).getString(0)
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"))
    val logical = session.sql(s"EXPLAIN (TYPE LOGICAL) $q").collect()(0).getString(0)
    assert(logical.contains("Aggregate") && !logical.contains("Exchange"))
    assert(session.sql(s"EXPLAIN (TYPE VALIDATE) $q").collect()(0).getBoolean(0))
    intercept[Exception] {
      session.sql("EXPLAIN (TYPE VALIDATE) SELECT no_such_col FROM region")
    }
    val io = session.sql("EXPLAIN (TYPE IO) SELECT r_name FROM region").collect()
    assert(io.length == 1 && io(0).getString(0).contains("region") &&
      io(0).getString(1) == "r_name", "pruned read schema surfaces")
    val analyzed = session.sql(s"EXPLAIN ANALYZE $q").collect()(0).getString(0)
    assert(analyzed.contains("rows: 5"))
    // per-operator actuals (reference ExplainAnalyzeOperator): at least
    // one operator line carries its executed numOutputRows metric
    assert(analyzed.contains("numOutputRows="),
      s"per-operator actual metrics expected in:\n$analyzed")
    // FORMAT JSON emits the JsonRenderedNode shape, and the reference's
    // plan-introspection functions consume it end-to-end
    val pj = session.sql(s"EXPLAIN (FORMAT JSON) $q").collect()(0).getString(0)
    assert(pj.startsWith("""{"0":{"plan":{"id":"0""""), pj.take(60))
    // round-trip through the introspection kernels (the SQL names are
    // oracle-gated in fn_plan_json; quoting-free here)
    import graft.functions.PlanJson
    assert(PlanJson.planIds(pj).get.size >= 3, "several plan nodes")
    assert(PlanJson.nodeChildren(pj, "0").get.nonEmpty, "root has children")
    val scrubbed = PlanJson.scrub(pj).get
    assert(scrubbed.contains("\"id\":\"PLANID\"") &&
      scrubbed.contains("\"details\":\"DETAILS\""))
    // logical JSON renders the logical plan names
    val lj = session.sql(s"EXPLAIN (TYPE LOGICAL, FORMAT JSON) $q")
      .collect()(0).getString(0)
    assert(lj.contains("Aggregate"))
  }

  test("information_schema.tables and .columns list the catalog") {
    val tables = session.sql(
      """SELECT table_type FROM information_schema.tables
        |WHERE table_name = 'region'""".stripMargin).collect()
    assert(tables.length == 1 && tables.head.getString(0) == "VIEW")
    val cols = session.sql(
      """SELECT column_name, data_type FROM information_schema.columns
        |WHERE table_name = 'region' ORDER BY ordinal_position""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(cols.head == ("r_regionkey", "integer"))
    assert(cols.map(_._1).contains("r_name"))
    // a freshly created table appears, then disappears on drop
    cleanup()
    session.sql("CREATE TABLE ddlspec_t AS SELECT 1 AS a")
    val t2 = session.sql(
      """SELECT count(*) FROM information_schema.columns
        |WHERE table_name = 'ddlspec_t'""".stripMargin).collect()
    assert(t2.head.getLong(0) == 1L)
    session.sql("DROP TABLE ddlspec_t")
    val t3 = session.sql(
      """SELECT count(*) FROM information_schema.tables
        |WHERE table_name = 'ddlspec_t'""".stripMargin).collect()
    assert(t3.head.getLong(0) == 0L)
  }

  test("SHOW STATS FOR computes exact column stats plus the summary row") {
    val rows = session.sql("SHOW STATS FOR region").collect()
    assert(rows.length == 3) // 2 columns + summary
    val summary = rows.find(_.isNullAt(0)).get
    assert(summary.getDouble(4) == 5.0) // row_count
    val key = rows.find(r => !r.isNullAt(0) && r.getString(0) == "r_regionkey").get
    assert(key.getDouble(2) == 5.0 && key.getString(5) == "0" && key.getString(6) == "4")
  }
}
