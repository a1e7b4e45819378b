package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.SqlSession

/** The benchto TPC-DS reference texts through the SQL dialect
  * (presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds/qNN.sql)
  * against the derived ds tables — the texts are read verbatim from the
  * reference tree and instantiated the way benchto does: template
  * substitution for `${database}.${schema}.`, plus per-query PARAMETER
  * substitutions (the literals dsqgen stamps into each template: years,
  * manager ids, county lists) re-aimed at the fixture calendar (1992-1998)
  * and the derived dimension domains, so every text returns rows and
  * matches the oracle-gated DataFrame implementation.
  *
  * Values compare rounded to 2 decimals: the texts aggregate raw doubles
  * while the gates aggregate decimal-exact (`dsum`/`davg`), so last-ulp
  * drift is expected and anything beyond it is a real defect. */
class TpcdsSqlSpec extends AnyFunSuite {
  import TestSpark._
  import tpcds.Tpcds

  private val dir =
    "/root/reference/presto-benchto-benchmarks/src/main/resources/sql/presto/tpcds"

  private lazy val session: SqlSession = {
    Tpcds.dateDim(spark).createOrReplaceTempView("date_dim")
    Tpcds.item(spark, sf).createOrReplaceTempView("item")
    Tpcds.storeSales(spark, sf).createOrReplaceTempView("store_sales")
    Tpcds.storeReturns(spark, sf).createOrReplaceTempView("store_returns")
    Tpcds.store(spark).createOrReplaceTempView("store")
    Tpcds.customerDim(spark, sf).createOrReplaceTempView("customer")
    Tpcds.customerAddress(spark, sf).createOrReplaceTempView("customer_address")
    Tpcds.customerDemographics(spark).createOrReplaceTempView("customer_demographics")
    Tpcds.householdDemographics(spark).createOrReplaceTempView("household_demographics")
    Tpcds.promotion(spark).createOrReplaceTempView("promotion")
    SqlSession.wrap(spark)
  }

  /** Read a reference text, substitute the benchto template refs and the
    * per-query parameters. `subs` are regex → replacement pairs. */
  private def text(q: String, subs: (String, String)*): String = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$q.sql")), "UTF-8")
    // collapse whitespace so parameter substitutions are line-break-proof
    val t0 = raw.replaceAll("\\$\\{database\\}\\.\\$\\{schema\\}\\.", "")
      .replaceAll("\\s+", " ").trim.stripSuffix(";")
    subs.foldLeft(t0) { case (t, (from, to)) => t.replaceAll(from, to) }
  }

  private val stripLimit = ("(?i)LIMIT\\s+\\d+\\s*$", "")

  /** Canonical compare: text columns renamed positionally to the gate's
    * when arities match (aliases differ, semantics don't), doubles rounded
    * to 2 dp, rows sorted. */
  private def assertSame(textDf: DataFrame, gateDf: DataFrame): Unit = {
    val aligned =
      if (textDf.columns.length == gateDf.columns.length)
        textDf.toDF(gateDf.columns.toIndexedSeq: _*)
      else textDf
    val cols = gateDf.columns.filter(aligned.columns.contains).toSeq
    assert(cols.nonEmpty, s"no common columns: ${aligned.columns.toSeq} vs " +
      s"${gateDf.columns.toSeq}")
    def canon(df: DataFrame): Array[String] =
      df.select(cols.map(col): _*).collect().map(_.toSeq.map {
        case d: java.lang.Double =>
          BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
        case d: java.math.BigDecimal =>
          BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
        case x => String.valueOf(x)
      }.mkString("|")).sorted
    val t = canon(aligned); val g = canon(gateDf)
    assert(t.length == g.length, s"rowcount ${t.length} vs ${g.length}")
    t.zip(g).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i: text[$a] vs gate[$b]")
    }
  }

  test("q01: WITH chain + correlated scalar subquery + DECIMAL literal") {
    val sql = text("q01",
      ("\"d_year\" = 2000", "\"d_year\" = 1998"),
      ("'TN'", "'S0'"))
    assertSame(session.sql(sql), Tpcds.q1(spark, sf))
  }

  test("q03: star join (manufacturer/month)") {
    val sql = text("q03", ("= 128", "= 28"), stripLimit)
    assertSame(session.sql(sql), Tpcds.q3(spark, sf))
  }

  test("q07: demographics + promotion star with four averages") {
    val sql = text("q07", ("\"d_year\" = 2000", "\"d_year\" = 1998"))
    assertSame(session.sql(sql), Tpcds.q7(spark, sf))
  }

  test("q19: brand revenue, customer zip != store zip") {
    val sql = text("q19",
      ("\"i_manager_id\" = 8", "\"i_manager_id\" = 7"),
      ("\"d_year\" = 1998", "\"d_year\" = 1999"),
      (", 1, 5\\)", ", 1, 3)"), // fixture zips differ in the 3-prefix
      stripLimit)
    val t = session.sql(sql).drop("i_manufact")
    assertSame(t, Tpcds.q19(spark, sf))
  }

  test("q27: ROLLUP + GROUPING over a demographic slice") {
    val sql = text("q27",
      ("\"cd_gender\" = 'M'", "\"cd_gender\" = 'F'"),
      ("\"cd_marital_status\" = 'S'", "\"cd_marital_status\" = 'M'"),
      ("'College'", "'Secondary'"),
      ("\"d_year\" = 2002", "\"d_year\" = 1998"),
      ("IN \\( 'TN'[^)]*\\)", "IN ('S0', 'S1', 'S2', 'S3')"),
      stripLimit)
    val t = session.sql(sql)
      .na.fill("ALL", Seq("i_item_id", "s_state")).drop("g_state")
    assertSame(t, Tpcds.q27(spark, sf).drop("cnt"))
  }

  test("q34: ticket line-count band (dom/demographic slice)") {
    val sql = text("q34",
      ("BETWEEN 25 AND 28", "BETWEEN 1 AND 3"), // fixture dom window
      // neutralize the dep/vehicle ratio parameter (gate's slice keys on
      // buy potential + vehicles only; 'Unknown' is outside the derived
      // hd_buy_potential domain so that OR branch is empty)
      ("> DECIMAL '1.2'", "> DECIMAL '-1.0'"),
      ("\\(1999 , \\(1999 \\+ 1\\) , \\(1999 \\+ 2\\)\\)",
        "(1998, (1998 + 1), (1998 + 2))"),
      ("IN \\('Williamson County'[^)]*\\)", "IN ('County_0', 'County_1')"),
      ("BETWEEN 15 AND 20", "BETWEEN 2 AND 7"))
    val t = session.sql(sql).drop("c_salutation", "c_preferred_cust_flag")
    assertSame(t, Tpcds.q34(spark, sf))
  }

  test("q42: category revenue for one manager-month") {
    val sql = text("q42",
      ("\"i_manager_id\" = 1", "\"i_manager_id\" = 8"),
      ("\"d_moy\" = 11", "\"d_moy\" = 12"),
      ("\"d_year\" = 2000", "\"d_year\" = 1998"),
      stripLimit)
    assertSame(session.sql(sql), Tpcds.q42(spark, sf))
  }

  test("q52: brand revenue for one manager-month, year kept") {
    val sql = text("q52",
      ("\"i_manager_id\" = 1", "\"i_manager_id\" = 13"), stripLimit)
    assertSame(session.sql(sql), Tpcds.q52(spark, sf))
  }

  test("q55: brand revenue for one manager-month") {
    val sql = text("q55",
      ("\"i_manager_id\" = 28", "\"i_manager_id\" = 33"),
      ("\"d_moy\" = 11", "\"d_moy\" = 12"), stripLimit)
    assertSame(session.sql(sql), Tpcds.q55(spark, sf))
  }

  test("q73: nested aggregate subquery + CASE/DECIMAL cast (dialect vs DataFrame)") {
    // the gate's demographic slice differs structurally (dep-count filter),
    // so the text compares against a DataFrame replica of ITSELF — the
    // assertion is that the dialect path and the DataFrame path agree on a
    // nested-subquery + CASE + decimal-division plan.
    val sql = text("q73",
      ("\\(1999 , \\(1999 \\+ 1\\) , \\(1999 \\+ 2\\)\\)",
        "(1998, (1998 + 1), (1998 + 2))"),
      ("IN \\('Williamson County'[^)]*\\)", "IN ('County_0', 'County_2')"))
    val dj = spark.table("store_sales")
      .join(spark.table("date_dim"), col("ss_sold_date_sk") === col("d_date_sk"))
      .join(spark.table("store"), col("ss_store_sk") === col("s_store_sk"))
      .join(spark.table("household_demographics"),
        col("ss_hdemo_sk") === col("hd_demo_sk"))
      .filter(col("d_dom").between(1, 2) &&
        (col("hd_buy_potential") === ">10000" ||
          col("hd_buy_potential") === "Unknown") &&
        col("hd_vehicle_count") > 0 &&
        when(col("hd_vehicle_count") > 0,
          col("hd_dep_count").cast(org.apache.spark.sql.types.DecimalType(7, 2)) /
            col("hd_vehicle_count")).otherwise(lit(null)) > 1 &&
        col("d_year").isin(1998, 1999, 2000) &&
        col("s_county").isin("County_0", "County_2"))
      .groupBy("ss_ticket_number", "ss_customer_sk")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(1, 5))
      .join(spark.table("customer"), col("ss_customer_sk") === col("c_customer_sk"))
      .select("c_last_name", "c_first_name", "c_salutation",
        "c_preferred_cust_flag", "ss_ticket_number", "cnt")
    val viaText = session.sql(sql)
    assert(viaText.count() > 0, "substituted q73 text returns rows")
    assertSame(viaText, dj)
  }

  test("q98: window-over-aggregate revenue ratio") {
    val sql = text("q98",
      ("IN \\('Sports', 'Books', 'Home'\\)", "IN ('SMALL', 'LARGE', 'MEDIUM')"),
      ("'1999-02-22'", "'1999-02-01'"),
      ("INTERVAL '30' DAY", "INTERVAL '28' DAY"))
    val t = session.sql(sql).drop("i_item_desc")
    assertSame(t, Tpcds.q98(spark, sf))
  }
}
