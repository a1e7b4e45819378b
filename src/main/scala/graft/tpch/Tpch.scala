package graft.tpch

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.{dsum, davg, d}

/** TPC-H q01–q22, adapted to the fixture star schema (FIXTURES.md): no
  * partsupp table, no commit/receipt dates, no ship modes — each query keeps
  * its canonical operator shape (the thing the reference benchmarks:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q01..q22.sql)
  * with predicates rewritten onto existing columns and the 1995–2001 date
  * range of the generated data.
  *
  * Scale notes (100 TB discipline):
  *  - region/nation are O(1)-size dimensions → always `broadcast()`.
  *  - every semi/anti (EXISTS / IN) is a left_semi / left_anti join, never a
  *    collected list — shuffles on the join key and scales linearly.
  *  - aggregates use exact decimal accumulation (Tables.dsum) so results are
  *    partition-order independent → reproducible on any cluster layout.
  */
object Tpch {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  // revenue expression used throughout
  private def revExpr: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= d("2001-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), "sum_qty"),
        dsum(col("l_extendedprice"), "sum_base_price"),
        dsum(revExpr, "sum_disc_price"),
        dsum(revExpr * (lit(1) + col("l_tax")), "sum_charge"),
        davg(col("l_quantity"), "avg_qty"),
        davg(col("l_extendedprice"), "avg_price"),
        davg(col("l_discount"), "avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q02 adapted: correlated scalar subquery (max acctbal per nation) kept;
    * partsupp min-cost lookup replaced by supplier-per-nation max. */
  def q02(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val best = sup.groupBy(col("s_nationkey").as("bn_key"))
      .agg(max("s_acctbal").as("best_bal"))
    sup
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .join(best, col("s_nationkey") === col("bn_key") && col("s_acctbal") === col("best_bal"))
      .select(col("s_name"), col("s_acctbal"), col("n_name"))
      .orderBy(desc("s_acctbal"), asc("s_name"))
  }

  def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders").filter(col("o_orderdate") < d("1998-07-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem").filter(col("l_shipdate") > d("1998-07-01")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(dsum(revExpr, "revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(10)

  /** q04 adapted: EXISTS kept; commit<receipt replaced by ship>order+60d. */
  def q04(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= d("1997-01-01") && col("o_orderdate") < d("1997-04-01"))
    // the existence probe against 600k lineitem rows: a shuffled hash join
    // builds 32 partition-local tables in parallel instead of one 600k-entry
    // broadcast map on the driver (the broadcast build is single-threaded
    // and was the whole critical path of this query)
    val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      .hint("shuffle_hash")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= d("1996-01-01") && col("o_orderdate") < d("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name").agg(dsum(revExpr, "revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= d("1996-01-01") && col("l_shipdate") < d("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), "revenue"))

  def q07(s: SparkSession, dir: String): DataFrame = {
    // The nation-pair disjunction implies supp_nation IN (N1, N2) AND
    // cust_nation IN (N1, N2). Applying the implied IN-filters by joining
    // supplier/customer against the pre-filtered nation dims BEFORE the
    // fact joins shrinks both ~12.5x (2 of 25 nations), so the lineitem
    // and orders shuffles carry only qualifying rows; the pair filter
    // after the joins then only removes same-nation pairs.
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = broadcast(t(s, dir, "nation")
      .filter(col("n_name").isin(pair: _*))).select(
      col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = broadcast(t(s, dir, "nation")
      .filter(col("n_name").isin(pair: _*))).select(
      col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    t(s, dir, "supplier")
      .join(n1, col("s_nationkey") === col("n1_key"))
      .join(t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(d("1996-01-01"), d("1997-12-31"))),
        col("s_suppkey") === col("l_suppkey"))
      .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer")
        .join(n2, col("c_nationkey") === col("n2_key")),
        col("c_custkey") === col("o_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(dsum(revExpr, "revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  def q08(s: SparkSession, dir: String): DataFrame = {
    val supN = broadcast(t(s, dir, "nation")).select(
      col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_type") === "ECONOMY"),
        col("p_partkey") === col("l_partkey"))
      .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate").between(d("1996-01-01"), d("1997-12-31"))),
        col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .join(supN, col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg((dsum(when(col("nation") === "NATION_3", revExpr).otherwise(0.0)) /
            dsum(revExpr)).as("mkt_share"))
      .orderBy("o_year")
  }

  /** q09 adapted: supplycost replaced by 10% of part retail price. */
  def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_name").contains("red")),
        col("p_partkey") === col("l_partkey"))
      .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(dsum(revExpr - col("p_retailprice") * col("l_quantity") * lit(0.1), "sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))

  def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= d("1997-01-01") && col("o_orderdate") < d("1997-04-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(dsum(revExpr, "revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  /** q11 adapted: HAVING-against-global-scalar kept; partsupp value replaced
    * by supplier account balances per nation. */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val perNation = sup
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(dsum(col("s_acctbal"), "value"))
    val total = sup.agg((dsum(col("s_acctbal")) * lit(0.03)).as("threshold"))
    perNation.join(broadcast(total)).filter(col("value") > col("threshold"))
      .select("n_name", "value")
      .orderBy(desc("value"), asc("n_name"))
  }

  /** q12 adapted: ship modes replaced by line status; CASE-sum shape kept. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= d("1997-01-01") && col("l_shipdate") < d("1998-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= d("1997-09-01") && col("l_shipdate") < d("1997-10-01"))
      .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO", revExpr).otherwise(0.0)) /
            dsum(revExpr)).as("promo_revenue"))

  def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= d("1997-01-01") && col("l_shipdate") < d("1997-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(revExpr, "total_revenue"))
    val best = rev.agg(max("total_revenue").as("best_rev"))
    t(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(best), col("total_revenue") === col("best_rev"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** q16 adapted: NOT IN subquery kept (negative-balance suppliers). */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val excluded = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("x_suppkey"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
      .join(excluded, col("l_suppkey") === col("x_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
  }

  /** q17: correlated per-part average kept (quantities are integral doubles →
    * the average is exact in both engines). The brand filter is pushed BELOW
    * the per-part average — the correlated subquery only ever evaluates for
    * Brand#3 parts, so averaging all other parts' lines is wasted work (at
    * 100 TB that's a full lineitem aggregation for a 1/25 slice). One window
    * pass over the filtered lines replaces the aggregate + re-join. */
  def q17(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lf = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter(col("p_brand") === "Brand#3")
        .select("p_partkey")), col("p_partkey") === col("l_partkey"))
    lf.withColumn("avg_qty", avg("l_quantity").over(Window.partitionBy("l_partkey")))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** q18: the HAVING-subquery's per-order sum IS the output's sum_qty (the
    * output group keys are functionally determined by o_orderkey), so one
    * lineitem aggregate serves both — the original shape's second lineitem
    * join (a full extra shuffle at 100 TB) is eliminated. */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val qty = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("bo_key"))
      .agg(sum("l_quantity").as("bo_qty"), dsum(col("l_quantity"), "sum_qty"))
      .filter(col("bo_qty") > 150)
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(qty, col("o_orderkey") === col("bo_key"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"),
        col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
      .limit(100)
  }

  def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(dsum(revExpr, "revenue"))

  /** q20 adapted: nested IN + correlated HAVING kept; availqty replaced by
    * per-(supplier,part) shipped quantity threshold. */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val active = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= d("1996-01-01") && col("l_shipdate") < d("1997-01-01"))
      .join(t(s, dir, "part").filter(col("p_name").startsWith("red")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum("l_quantity").as("qty")).filter(col("qty") > 50)
      .select(col("l_suppkey").as("a_suppkey"))
    // the qualified-supplier set aggregates down to at most |supplier| keys
    // — broadcast the semi-join instead of shuffling the supplier table
    t(s, dir, "supplier")
      .join(broadcast(active), col("s_suppkey") === col("a_suppkey"), "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  /** q21 adapted: EXISTS + NOT-EXISTS kept (as semantics); "late" := shipped
    * >45d after order date. Implementation is the single-pass rewrite: the
    * EXISTS(other supplier) / NOT-EXISTS(other LATE supplier) pair is a
    * per-order predicate — distinct suppliers ≥ 2 AND exactly one distinct
    * late supplier — and when it holds, every late line belongs to that one
    * supplier, so numwait = Σ late lines. One lineitem⋈orders join, then two
    * stacked aggregates that reuse the join's hash partitioning on
    * l_orderkey (zero extra shuffles), instead of two lineitem self-joins:
    * 1 lineitem shuffle instead of 3 at 100 TB. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val lo = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAY"))
    // one shuffle on l_orderkey serves BOTH aggregations: hash-partitioning
    // by orderkey satisfies the (orderkey, suppkey) clustering of the first
    // agg and the orderkey clustering of the second, so EnsureRequirements
    // inserts no further exchange between them
    val perSupp = lo.repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("n_late") > 0, 1L).otherwise(0L)).as("n_late_supp"),
        max(when(col("n_late") > 0, col("l_suppkey"))).as("late_supp"),
        sum("n_late").as("n_late_lines"))
    // suppliers of one nation are a few dozen rows at any SF — broadcast
    // them rather than sort-merge-shuffling the aggregated order rows
    perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")).filter(col("n_name") === "NATION_5"),
          col("s_nationkey") === col("n_nationkey"))),
        col("late_supp") === col("s_suppkey"))
      .groupBy("s_name").agg(sum("n_late_lines").as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(100)
  }

  /** q22 adapted: country code := c_custkey % 7; shape (scalar-subquery
    * threshold + NOT EXISTS) kept. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val thr = c.filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal")) / count(col("c_acctbal"))).as("avg_bal"))
    c.withColumn("cntrycode", col("c_custkey") % 7)
      .join(broadcast(thr)).filter(col("c_acctbal") > col("avg_bal"))
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), "totacctbal"))
      .orderBy("cntrycode")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01" -> q01, "q02" -> q02, "q03" -> q03, "q04" -> q04, "q05" -> q05,
    "q06" -> q06, "q07" -> q07, "q08" -> q08, "q09" -> q09, "q10" -> q10,
    "q11" -> q11, "q12" -> q12, "q13" -> q13, "q14" -> q14, "q15" -> q15,
    "q16" -> q16, "q17" -> q17, "q18" -> q18, "q19" -> q19, "q20" -> q20,
    "q21" -> q21, "q22" -> q22)

  // DuckDB-runnable oracles. Convention: CAST(SUM(CAST(x AS DECIMAL(18,6)))
  // AS DOUBLE) mirrors Tables.dsum exactly; timestamps cast to DATE in
  // output; every query fully ordered with unique tie-breaks.
  val oracle: Map[String, String] = Map(
    "q01" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/COUNT(l_extendedprice) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02" ->
      """SELECT s_name, s_acctbal, n_name
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'EUROPE'
        | AND s.s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
        |                    WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s_acctbal DESC, s_name""".stripMargin,
    "q03" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate < DATE '1998-07-01' AND l_shipdate > DATE '1998-07-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q04" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |             WHERE l_orderkey = o_orderkey
        |               AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        | AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        | AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        | AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q06" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q07" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        | AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        | AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        | AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q08" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
        |                    THEN l_extendedprice*(1-l_discount) ELSE 0.0 END
        |               AS DECIMAL(18,6))) AS DOUBLE)
        | / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        |   AS mkt_share
        |FROM lineitem
        | JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON c_custkey = o_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) - p_retailprice*l_quantity*0.1
        |               AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        | JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin,
    "q10" ->
      """SELECT c_custkey, c_name,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
        | AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11" ->
      """SELECT n_name, value FROM (
        | SELECT n_name, CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS value
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name)
        |WHERE value > (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) * 0.03
        |               FROM supplier)
        |ORDER BY value DESC, n_name""".stripMargin,
    "q12" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        | AND l_shipdate > o_orderdate
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT JOIN orders
        |   ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14" ->
      """SELECT 100.0 *
        | CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount)
        |                    ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
        | / CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE)
        |   AS promo_revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""".stripMargin,
    "q15" ->
      """WITH revenue AS (
        | SELECT l_suppkey AS supplier_no,
        |  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        | FROM lineitem
        | WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
        | AND p_size IN (1,14,23,45,19,3,36,9)
        | AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)/7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        | AND l_quantity < (SELECT 0.5*avg(l2.l_quantity) FROM lineitem l2
        |                   WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q18" ->
      """SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        | o_totalprice, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        | AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20" ->
      """SELECT s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        | SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        | WHERE p_name LIKE 'red%'
        |  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        | GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50)
        |ORDER BY s_name""".stripMargin,
    "q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        | AND o_orderstatus = 'F'
        | AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
        | AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey
        |             AND l2.l_suppkey <> l1.l_suppkey)
        | AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
        |                 AND l3.l_suppkey <> l1.l_suppkey
        |                 AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
        | AND s_nationkey = n_nationkey AND n_name = 'NATION_5'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q22" ->
      """SELECT cntrycode, count(*) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
        |FROM (SELECT c_custkey % 7 AS cntrycode, c_acctbal FROM customer
        |      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
        |                                / COUNT(c_acctbal)
        |                         FROM customer WHERE c_acctbal > 0)
        |       AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                       AND o_orderpriority = '1-URGENT'))
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
  )
}
