package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ops.JdbcDialects._

/** Pins the per-dialect SQL generation against the reference's
  * QueryBuilder/BaseJdbcClient semantics (presto-base-jdbc) and the
  * per-engine client overrides (presto-mysql / presto-postgresql /
  * presto-clickhouse). The Derby dialect additionally executes end-to-end
  * in the src_jdbc_pushdown / src_jdbc_dialect_ddl oracle gates. */
class JdbcDialectsSpec extends AnyFunSuite {

  // ------------------------------------------------------------- predicates

  test("range + singleton mix renders OR'd range conjuncts then equality " +
    "(QueryBuilder.toPredicate ordering)") {
    val sel = DerbyDialect.buildSelect(
      None, "T", Seq("a"),
      Seq(JdbcDomain("a", IntegerType,
        Seq(JdbcRange(Some(15), true, Some(40), false), JdbcRange.equalTo(45)))))
    assert(sel.sql ===
      """SELECT "a" FROM "T" WHERE (("a" >= ? AND "a" < ?) OR "a" = ?)""")
    assert(sel.params === Seq((15, IntegerType), (40, IntegerType), (45, IntegerType)))
    assert(sel.inlineSql ===
      """SELECT "a" FROM "T" WHERE (("a" >= 15 AND "a" < 40) OR "a" = 45)""")
  }

  test("multiple singletons collapse to IN; one stays equality") {
    val in = DerbyDialect.buildSelect(None, "T", Seq("c"),
      Seq(JdbcDomain("c", StringType,
        Seq(JdbcRange.equalTo("x"), JdbcRange.equalTo("y")))))
    assert(in.inlineSql === """SELECT "c" FROM "T" WHERE ("c" IN ('x','y'))""")
    assert(in.params === Seq(("x", StringType), ("y", StringType)))
    val eq = DerbyDialect.buildSelect(None, "T", Seq("c"),
      Seq(JdbcDomain("c", StringType, Seq(JdbcRange.equalTo("x")))))
    assert(eq.inlineSql === """SELECT "c" FROM "T" WHERE ("c" = 'x')""")
  }

  test("NONE and ALL domains render the reference's short-circuits " +
    "(1=0 / IS NULL, 1=1 / IS NOT NULL)") {
    def where(d: JdbcDomain): String =
      DerbyDialect.buildSelect(None, "T", Seq("a"), Seq(d))
        .inlineSql.split(" WHERE ")(1)
    assert(where(JdbcDomain("a", IntegerType, Nil, isNone = true)) === "1=0")
    assert(where(JdbcDomain("a", IntegerType, Nil, nullAllowed = true,
      isNone = true)) === "\"a\" IS NULL")
    assert(where(JdbcDomain("a", IntegerType, Nil, isAll = true)) ===
      "\"a\" IS NOT NULL")
    assert(where(JdbcDomain("a", IntegerType, Nil, nullAllowed = true,
      isAll = true)) === "1=1")
  }

  test("nullAllowed appends an IS NULL disjunct; multi-domain conjunction; " +
    "additional predicate and empty projection (count(*) shape)") {
    val sel = MySqlDialect.buildSelect(
      Some("tpch"), "lineitem", Nil,
      Seq(
        JdbcDomain("l_quantity", DoubleType,
          Seq(JdbcRange.atMost(24.0)), nullAllowed = true),
        JdbcDomain("l_returnflag", StringType, Seq(JdbcRange.equalTo("R")))),
      additionalPredicate = Some("`l_partkey` % 2 = 0"))
    assert(sel.inlineSql ===
      "SELECT null FROM `tpch`.`lineitem` WHERE " +
        "((`l_quantity` <= 24.0) OR `l_quantity` IS NULL) AND " +
        "(`l_returnflag` = 'R') AND `l_partkey` % 2 = 0")
  }

  test("column expression substitutes and aliases back to the column name " +
    "(the ST_AsBinary geometry path, QueryBuilder.addColumns)") {
    val sel = PostgresDialect.buildSelect(
      None, "geo", Seq("id", "shape"),
      Nil, columnExpressions = Map("shape" -> "ST_AsBinary(\"shape\")"))
    assert(sel.inlineSql ===
      """SELECT "id", ST_AsBinary("shape") AS "shape" FROM "geo"""")
  }

  test("identifier quoting doubles embedded quote chars per dialect") {
    assert(DerbyDialect.quote("we\"ird") === "\"we\"\"ird\"")
    assert(MySqlDialect.quote("we`ird") === "`we``ird`")
    assert(PostgresDialect.quote("plain") === "\"plain\"")
  }

  test("string literals escape embedded single quotes; temporal literals " +
    "use typed spellings") {
    assert(DerbyDialect.literal("O'Brien", StringType) === "'O''Brien'")
    assert(DerbyDialect.literal(
      java.sql.Date.valueOf("2020-03-01"), DateType) === "DATE '2020-03-01'")
    assert(DerbyDialect.literal(
      java.sql.Timestamp.valueOf("2020-03-01 10:30:00"), TimestampType)
      === "TIMESTAMP '2020-03-01 10:30:00.0'")
  }

  test("limit spelling: LIMIT vs Derby FETCH FIRST") {
    val my = MySqlDialect.buildSelect(None, "t", Seq("a"), Nil, limit = Some(10))
    assert(my.inlineSql === "SELECT `a` FROM `t` LIMIT 10")
    val db = DerbyDialect.buildSelect(None, "t", Seq("a"), Nil, limit = Some(10))
    assert(db.inlineSql === "SELECT \"a\" FROM \"t\" FETCH FIRST 10 ROWS ONLY")
  }

  // ----------------------------------------------------------- type mapping

  test("MySQL type overrides: datetime(6), mediumblob, varchar tiers, float " +
    "(MySqlClient.java:176-205)") {
    assert(MySqlDialect.toSqlType(TimestampType) === "datetime(6)")
    assert(MySqlDialect.toSqlType(BinaryType) === "mediumblob")
    assert(MySqlDialect.toSqlType(FloatType) === "float")
    assert(MySqlDialect.toSqlType(StringType) === "longtext")
    assert(MySqlDialect.toSqlType(VarcharType(100)) === "tinytext")
    assert(MySqlDialect.toSqlType(VarcharType(60000)) === "text")
    assert(MySqlDialect.toSqlType(VarcharType(1000000)) === "mediumtext")
    assert(MySqlDialect.toSqlType(VarcharType(50000000)) === "longtext")
  }

  test("Postgres overrides bytea; base mappings otherwise " +
    "(PostgreSqlClient.java:120-127, BaseJdbcClient SQL_TYPES)") {
    assert(PostgresDialect.toSqlType(BinaryType) === "bytea")
    assert(PostgresDialect.toSqlType(LongType) === "bigint")
    assert(PostgresDialect.toSqlType(DoubleType) === "double precision")
    assert(PostgresDialect.toSqlType(DecimalType(12, 2)) === "decimal(12, 2)")
    assert(PostgresDialect.toSqlType(ByteType) === "tinyint")
  }

  test("ClickHouse native names + MergeTree engine clause " +
    "(ClickHouseClient.java:770-776, ClickHouseEngineType.java:21)") {
    assert(ClickHouseDialect.toSqlType(LongType) === "Int64")
    assert(ClickHouseDialect.toSqlType(DoubleType) === "Float64")
    assert(ClickHouseDialect.toSqlType(StringType) === "String")
    assert(ClickHouseDialect.toSqlType(TimestampType) === "DateTime64(6)")
    val ddl = ClickHouseDialect.createTableSql(None, "t", StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType))))
    assert(ddl ===
      "CREATE TABLE \"t\" (\"k\" Int64 NOT NULL, \"v\" String)" +
        " ENGINE = MergeTree() ORDER BY tuple()")
  }

  test("Derby DDL: smallint for tinyint, blob, sized varchar; " +
    "unsupported types raise like BaseJdbcClient.toSqlType") {
    assert(DerbyDialect.toSqlType(ByteType) === "smallint")
    assert(DerbyDialect.toSqlType(BinaryType) === "blob")
    assert(DerbyDialect.toSqlType(StringType) === "varchar(32672)")
    val e = intercept[IllegalArgumentException](
      DerbyDialect.toSqlType(ArrayType(LongType)))
    assert(e.getMessage.contains("unsupported column type"))
  }

  // ------------------------------------------------------- compute pushdown

  test("compute translator renders arithmetic/comparison/boolean trees " +
    "and refuses unsupported nodes like untranslated() " +
    "(JdbcFilterToSqlTranslator + OperatorTranslators.java:35-65)") {
    import org.apache.spark.sql.functions.{col, lit, upper}
    TestSpark.spark // Column→Expression conversion needs an active session
    val d = DerbyDialect
    assert(ComputePushdown.translate(
      (col("a") + lit(1)) * lit(2) > lit(10), d)
      === Some("""((("a" + 1) * 2) > 10)"""))
    assert(ComputePushdown.translate(
      !(col("s") === lit("F")) && col("b").isNull, d)
      === Some("""(("s" <> 'F') AND ("b" IS NULL))"""))
    assert(ComputePushdown.translate(
      col("x").isin(1, 2, 3) || col("y").isNotNull, d)
      === Some("""(("x" IN (1, 2, 3)) OR ("y" IS NOT NULL))"""))
    // refused: double-vs-integer division semantics differ across engines
    assert(ComputePushdown.translate(col("a") / lit(2) > lit(1), d).isEmpty)
    // refused: functions are not in the translated operator set
    assert(ComputePushdown.translate(upper(col("s")) === lit("A"), d).isEmpty)
    // a refusal anywhere poisons the whole conjunct, like the reference
    assert(ComputePushdown.translate(
      (col("a") > lit(1)) && upper(col("s")) === lit("A"), d).isEmpty)
  }

  test("compute pushdown executes remotely on Derby and matches the " +
    "parquet-side evaluation") {
    val s = TestSpark.spark
    val got = ops.JdbcDialects.jdbcComputePushdown(s, TestSpark.sf).collect()
    val want = Tables(s, TestSpark.sf, "orders")
      .selectExpr("o_orderkey", "o_orderstatus", "o_totalprice")
      .where("o_totalprice * 2.0 > 150000.0 AND NOT (o_orderstatus = 'F')")
      .orderBy("o_orderkey").collect()
    assert(got.nonEmpty)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  // ----------------------------------------------------- aggregate pushdown

  test("aggregate select renders GROUP BY + the ClickHouse-supported " +
    "function set; unknown functions raise " +
    "(ClickHouseQueryGenerator.java:67-71)") {
    val sel = MySqlDialect.buildAggregateSelect(
      Some("tpch"), "lineitem",
      groupBy = Seq("l_returnflag"),
      aggs = Seq(
        AggCall("count", None, "cnt"),
        AggCall("sum", Some("l_quantity"), "sq"),
        AggCall("avg", Some("l_discount"), "ad")),
      domains = Seq(JdbcDomain("l_quantity", DoubleType,
        Seq(JdbcRange.atMost(24.0)))))
    assert(sel.inlineSql ===
      "SELECT `l_returnflag`, count(*) AS `cnt`, sum(`l_quantity`) AS `sq`, " +
        "avg(`l_discount`) AS `ad` FROM `tpch`.`lineitem` " +
        "WHERE ((`l_quantity` <= 24.0)) GROUP BY `l_returnflag`")
    val e = intercept[IllegalArgumentException](
      DerbyDialect.buildAggregateSelect(None, "t", Nil,
        Seq(AggCall("approx_distinct", Some("x"), "a"))))
    assert(e.getMessage.contains("unsupported pushdown aggregation"))
    // global aggregate: no GROUP BY clause
    val g = DerbyDialect.buildAggregateSelect(None, "t", Nil,
      Seq(AggCall("count", None, "cnt")))
    assert(g.inlineSql === "SELECT count(*) AS \"cnt\" FROM \"t\"")
  }

  test("aggregate pushdown executes remotely on Derby and matches the " +
    "parquet-side aggregation") {
    val s = TestSpark.spark
    val got = ops.JdbcDialects.jdbcAggPushdown(s, TestSpark.sf).collect()
    val want = Tables(s, TestSpark.sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        Tables.dsum(org.apache.spark.sql.functions.col("l_quantity"), "sum_qty"),
        org.apache.spark.sql.functions.min("l_extendedprice").as("min_price"),
        org.apache.spark.sql.functions.max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag").collect()
    assert(got.nonEmpty)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  // ----------------------------------------------------- executable (Derby)

  test("dialect-built pushdown subquery executes on Derby and matches the " +
    "parquet-side filter") {
    val s = TestSpark.spark
    val dir = TestSpark.sf
    val got = ops.JdbcDialects.jdbcPushdown(s, dir).collect()
    val want = Tables(s, dir, "part")
      .select(org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.col("p_brand"),
        org.apache.spark.sql.functions.col("p_size"),
        org.apache.spark.sql.functions.col("p_retailprice"))
      .where("((p_size >= 15 AND p_size < 40) OR p_size = 45) AND " +
        "p_brand IN ('Brand#4','Brand#19','Brand#25')")
      .orderBy("p_partkey").collect()
    assert(got.length === want.length)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }

  test("dialect DDL + parameterized insert round-trips values on Derby") {
    val s = TestSpark.spark
    val dir = TestSpark.sf
    val got = ops.JdbcDialects.jdbcDialectDdl(s, dir).collect()
    val want = Tables(s, dir, "nation")
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect()
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }
}
