package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables
import graft.Tables.dsum

/** Aggregate-function coverage (SURVEY.md §2.3 — the reference registers 92
  * aggregation functions, MAIN/metadata/BuiltInTypeAndFunctionNamespaceManager
  * .java:689; representatives per group: VarianceAggregation.java,
  * DoubleCorrelationAggregation.java, DoubleRegressionAggregation.java,
  * CentralMomentsAggregation.java, GeometricMeanAggregations.java,
  * EntropyAggregation.java, minmaxby/, CountIfAggregation, BooleanAndAggregation
  * .java, BitwiseAndAggregation.java, arrayagg/ArrayAggregationFunction.java:50,
  * histogram/Histogram.java:48, ApproximateCountDistinctAggregation.java,
  * QuantileDigestAggregationFunction.java, ChecksumAggregationFunction.java).
  *
  * All are Catalyst built-ins or short compositions — every aggregate here is
  * partial/final combinable (map-side partials at 100 TB come free from
  * HashAggregateExec; nothing below collects to the driver).
  *
  * Determinism: statistical doubles are ROUND(x, 4) on both sides (merge
  * order perturbs the last ulps); skewness/kurtosis oracles compute the
  * population-moment formula over CENTERED values (group mean subtracted in
  * a CTE before raising to powers) because DuckDB's builtins use the
  * sample-corrected definition while Spark (like the reference,
  * CentralMomentsAggregation.java) uses one-pass central population moments —
  * a raw-moment oracle is numerically unstable at ROUND(...,4).
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** variance/stddev, population + sample. */
  def stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(
        round(var_pop(col("s_acctbal")), 4).as("vpop"),
        round(var_samp(col("s_acctbal")), 4).as("vsamp"),
        round(stddev_pop(col("s_acctbal")), 4).as("sdpop"),
        round(stddev_samp(col("s_acctbal")), 4).as("sdsamp"))
      .orderBy("s_nationkey")

  /** corr + covar over a genuinely correlated pair. */
  def corrCovar(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qp_corr"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("qp_covp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qp_covs"))
      .orderBy("l_returnflag")

  /** linear regression aggregates (reference DoubleRegressionAggregation +
    * extended r2 variants). */
  def regression(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("round(regr_slope(l_extendedprice, l_quantity), 4)").as("slope"),
        expr("round(regr_intercept(l_extendedprice, l_quantity), 4)").as("intercept"),
        expr("round(regr_r2(l_extendedprice, l_quantity), 4)").as("r2"),
        expr("regr_count(l_extendedprice, l_quantity)").as("n"))
      .orderBy("l_returnflag")

  /** skewness/kurtosis — population-moment definition (reference
    * CentralMomentsAggregation.java). */
  def skewKurt(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(
        round(skewness(col("s_acctbal")), 4).as("skew"),
        round(kurtosis(col("s_acctbal")), 4).as("kurt"))
      .orderBy("s_nationkey")

  /** min_by/max_by with a unique ordering key (deterministic arg-extremum). */
  def minMaxBy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("max_by(o_totalprice, o_orderkey)").as("latest_price"),
        expr("min_by(o_totalprice, o_orderkey)").as("earliest_price"),
        max("o_orderdate").cast("date").as("last_date"),
        min("o_orderpriority").as("min_priority"))
      .orderBy("o_orderstatus")

  /** count_if + bool_and/bool_or (reference CountIfAggregation,
    * BooleanAndAggregation). */
  def countIfBool(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("count_if(o_totalprice > 200000)").as("n_big"),
        expr("bool_and(o_totalprice > 0)").as("all_positive"),
        expr("bool_or(o_totalprice > 400000)").as("any_huge"))
      .orderBy("o_orderpriority")

  /** bitwise aggregates (reference BitwiseAndAggregation etc.). */
  def bitwise(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        expr("CAST(bit_and(c_nationkey) AS BIGINT)").as("band"),
        expr("CAST(bit_or(c_nationkey) AS BIGINT)").as("bor"),
        expr("CAST(bit_xor(c_nationkey) AS BIGINT)").as("bxor"))
      .orderBy("c_mktsegment")

  /** array_agg ordered + set_agg (reference arrayagg/, SetOfValues.java) —
    * collected lists sorted, then joined to one string cell per group so the
    * gate's row comparator (which cannot sort list cells) can hash them. */
  def collect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), "|").as("nations"),
        array_join(sort_array(collect_set(col("n_regionkey").cast("string"))), "|")
          .as("region_keys"),
        count(lit(1)).as("n"))
      .orderBy("r_name")

  /** DISTINCT-qualified aggregates (reference MarkDistinctNode path). */
  def distinctAggs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum_distinct(col("l_quantity").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_dist_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"))
      .orderBy("l_returnflag")

  /** any_value/arbitrary over a functionally-determined column (constant per
    * group → deterministic; reference ArbitraryAggregationFunction). */
  def anyValue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_nationkey")
      .agg(expr("any_value(r_name)").as("region_name"),
        expr("any_value(n_name)").as("nation_name"))
      .orderBy("n_nationkey")

  /** exact continuous percentile (reference approx_percentile's exact sibling;
    * integral quantities → interpolation is exact in both engines). */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        expr("round(percentile(l_quantity, 0.25), 4)").as("q25"),
        expr("round(percentile(l_quantity, 0.5), 4)").as("median"),
        expr("round(percentile(l_quantity, 0.75), 4)").as("q75"))
      .orderBy("l_linestatus")

  /** approximate aggregates — engine-specific sketches (HLL++/KLL here,
    * airlift HLL/qdigest in the reference) so values can't cross-check against
    * DuckDB: rows-only gate + ScalaTest bounds vs exact counterparts. */
  def approx(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_suppkey")).as("approx_supp"),
        expr("approx_percentile(l_quantity, 0.5)").as("approx_median"))
      .orderBy("l_returnflag")

  /** histogram: value→count distribution (reference histogram/Histogram.java:48
    * returns map<K,bigint>; emitted here as sorted (value, count) rows — the
    * map entries — so the gate can hash it). */
  def histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("value")

  /** order-independent content checksum: bit_xor of per-row xxhash64
    * (reference ChecksumAggregationFunction.java — same shape: commutative
    * combine of row hashes; no oracle, DuckDB lacks xxhash64). */
  def checksum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("bit_xor(xxhash64(l_orderkey, l_linenumber, l_quantity))")
        .as("checksum"))
      .orderBy("l_returnflag")

  /** geometric mean (reference GeometricMeanAggregations.java): exp∘avg∘ln. */
  def geoMean(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy("p_brand")
      .agg(round(exp(avg(log(col("p_retailprice")))), 4).as("geo_price"))
      .orderBy("p_brand")

  /** Shannon entropy of the event-type distribution (reference
    * EntropyAggregation.java): H = log2(N) − Σ c·log2(c) / N over counts. */
  def entropy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("c"))
      .agg(round(
        log2(sum(col("c"))) - sum(col("c") * log2(col("c"))) / sum(col("c")),
        4).as("event_entropy"))

  /** approx_most_frequent via the custom space-saving aggregate
    * (functions/MostFrequent.scala). Capacity 64 > the 5 true distinct
    * clerk-priority values, so the sketch is exact here and oracle-checkable;
    * at real cardinalities the same operator degrades gracefully to the
    * Misra-Gries guarantee. Map output exploded to sorted rows for the gate. */
  def mostFrequent(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(graft.functions.GraftFunctions
        .approxMostFrequent(3, col("o_orderpriority"), 64).as("mf"))
      .select(col("o_orderstatus"), explode(col("mf")).as(Seq("value", "cnt")))
      .orderBy("o_orderstatus", "value")

  /** max_by(x, y, N) — the N-variant arg-extrema (reference
    * AbstractMinMaxNAggregationFunction.java): per-group top-N collected as
    * sorted structs, then exploded. At scale the collect_list is bounded by
    * a pre-filter window (WindowGroupLimit) in real pipelines. */
  def maxByN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(slice(reverse(sort_array(collect_list(
        struct(col("o_totalprice"), col("o_orderkey"))))), 1, 3).as("top3"))
      .select(col("o_orderpriority"),
        posexplode(col("top3")).as(Seq("pos", "entry")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
        col("entry.o_orderkey").as("o_orderkey"),
        col("entry.o_totalprice").as("o_totalprice"))
      .orderBy("o_orderpriority", "rk")

  /** map_agg / histogram-as-map (reference MapAggregationFunction.java:51,
    * histogram/Histogram.java:48): build the map value, then emit its
    * entries as sorted rows so the gate can hash it. */
  def mapAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("c"))
      .groupBy("l_returnflag")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("l_linestatus"), col("c")))))
        .as("hist"))
      .select(col("l_returnflag"), explode(col("hist")).as(Seq("status", "cnt")))
      .orderBy("l_returnflag", "status")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_most_frequent" -> mostFrequent,
    "agg_max_by_n" -> maxByN,
    "agg_map_agg" -> mapAgg,
    "agg_stats" -> stats,
    "agg_corr_covar" -> corrCovar,
    "agg_regression" -> regression,
    "agg_skew_kurt" -> skewKurt,
    "agg_minmax_by" -> minMaxBy,
    "agg_count_if_bool" -> countIfBool,
    "agg_bitwise" -> bitwise,
    "agg_collect" -> collect,
    "agg_distinct" -> distinctAggs,
    "agg_any_value" -> anyValue,
    "agg_percentiles" -> percentiles,
    "agg_approx" -> approx,
    "agg_histogram" -> histogram,
    "agg_checksum" -> checksum,
    "agg_geomean" -> geoMean,
    "agg_entropy" -> entropy)

  val oracle: Map[String, String] = Map(
    "agg_most_frequent" ->
      """SELECT o_orderstatus, o_orderpriority AS value, cnt FROM (
        | SELECT o_orderstatus, o_orderpriority, count(*) cnt,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY count(*) DESC, o_orderpriority) rk
        | FROM orders GROUP BY 1, 2)
        |WHERE rk <= 3 ORDER BY o_orderstatus, value""".stripMargin,
    "agg_max_by_n" ->
      """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |       row_number() OVER (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey DESC) rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "agg_map_agg" ->
      """SELECT l_returnflag, l_linestatus AS status, count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, status""".stripMargin,
    "agg_stats" ->
      """SELECT s_nationkey,
        | ROUND(var_pop(s_acctbal), 4) AS vpop,
        | ROUND(var_samp(s_acctbal), 4) AS vsamp,
        | ROUND(stddev_pop(s_acctbal), 4) AS sdpop,
        | ROUND(stddev_samp(s_acctbal), 4) AS sdsamp
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "agg_corr_covar" ->
      """SELECT l_returnflag,
        | ROUND(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
        | ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS qp_covp,
        | ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS qp_covs
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_regression" ->
      """SELECT l_returnflag,
        | ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        | ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_skew_kurt" ->
      """WITH mu AS (
        | SELECT s_nationkey, avg(CAST(s_acctbal AS DOUBLE)) AS m
        | FROM supplier GROUP BY s_nationkey),
        |d AS (
        | SELECT s.s_nationkey, CAST(s.s_acctbal AS DOUBLE) - mu.m AS x
        | FROM supplier s JOIN mu ON s.s_nationkey = mu.s_nationkey)
        |SELECT s_nationkey,
        | ROUND(avg(x*x*x) / power(avg(x*x), 1.5), 4) AS skew,
        | ROUND(avg(x*x*x*x) / power(avg(x*x), 2) - 3, 4) AS kurt
        |FROM d GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "agg_minmax_by" ->
      """SELECT o_orderstatus,
        | max_by(o_totalprice, o_orderkey) AS latest_price,
        | min_by(o_totalprice, o_orderkey) AS earliest_price,
        | CAST(max(o_orderdate) AS DATE) AS last_date,
        | min(o_orderpriority) AS min_priority
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_count_if_bool" ->
      """SELECT o_orderpriority,
        | CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        | bool_and(o_totalprice > 0) AS all_positive,
        | bool_or(o_totalprice > 400000) AS any_huge
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_bitwise" ->
      """SELECT c_mktsegment,
        | CAST(bit_and(c_nationkey) AS BIGINT) AS band,
        | CAST(bit_or(c_nationkey) AS BIGINT) AS bor,
        | CAST(bit_xor(c_nationkey) AS BIGINT) AS bxor
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_collect" ->
      """SELECT r_name,
        | string_agg(n_name, '|' ORDER BY n_name) AS nations,
        | string_agg(DISTINCT CAST(n_regionkey AS VARCHAR), '|'
        |            ORDER BY CAST(n_regionkey AS VARCHAR)) AS region_keys,
        | count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        | CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_dist_qty,
        | count(DISTINCT l_suppkey) AS n_supp,
        | count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_any_value" ->
      """SELECT n_nationkey,
        | any_value(r_name) AS region_name,
        | any_value(n_name) AS nation_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_linestatus,
        | ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
        | ROUND(quantile_cont(l_quantity, 0.5), 4) AS median,
        | ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_histogram" ->
      """SELECT o_orderpriority AS value, count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY value""".stripMargin,
    "agg_geomean" ->
      """SELECT p_brand, ROUND(exp(avg(ln(p_retailprice))), 4) AS geo_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "agg_entropy" ->
      """SELECT ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS event_entropy
        |FROM (SELECT count(*) AS c FROM events GROUP BY event_type)""".stripMargin
    // agg_approx / agg_checksum: engine-specific sketch/hash values → rows-only
  )
}
