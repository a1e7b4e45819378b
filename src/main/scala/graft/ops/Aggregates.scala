package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
        expr("regr_count(l_extendedprice, l_quantity)").as("n"),
        // extended regr_avgx/avgy/sxx/sxy/syy (DoubleRegressionExtended
        // Aggregation): the gate pins them to exact-decimal sums (the dsum
        // convention) because the builtins' one-pass reordering is not
        // hash-stable cross-engine at syy magnitudes
        round(d38(col("l_quantity")) / count(lit(1)), 4).as("avgx"),
        round(d38(col("l_extendedprice")) / count(lit(1)), 4).as("avgy"),
        round(d38(col("l_quantity") * col("l_quantity")) -
          d38(col("l_quantity")) * d38(col("l_quantity")) / count(lit(1)), 2)
          .as("sxx"),
        round(d38(col("l_quantity") * col("l_extendedprice")) -
          d38(col("l_quantity")) * d38(col("l_extendedprice")) / count(lit(1)), 2)
          .as("sxy"),
        // syy in (y/1000)² units: raw price squares sit at ~2e10 where
        // Spark's shortest-repr double→decimal rounding and DuckDB's
        // value-based rounding can disagree at the 6th decimal; scaling
        // keeps every product far from that boundary
        round(d38((col("l_extendedprice") / 1000) * (col("l_extendedprice") / 1000)) -
          d38(col("l_extendedprice") / 1000) * d38(col("l_extendedprice") / 1000) /
            count(lit(1)), 2)
          .as("syy_k"))
      .orderBy("l_returnflag")

  /** Exact order-independent sum at decimal(38,6) (squares of prices
    * overflow the dsum default 18-digit precision). */
  private def d38(c: Column): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 6)))
      .cast(org.apache.spark.sql.types.DoubleType)

  /** skewness/kurtosis — population-moment definition (reference
    * CentralMomentsAggregation.java). Gate arithmetic is pinned to the
    * two-pass centered formula (group mean via window, then averaged
    * powers) so Spark and the DuckDB oracle compute identical doubles;
    * Spark's one-pass `skewness`/`kurtosis` builtins differ in final
    * ulps and can land across a ROUND(.,4) boundary (r02/r03 flake).
    * Constant groups (m2=0, e.g. a single supplier) are NULL on both
    * sides, and `+ 0.0` collapses IEEE -0.0 to 0.0 — the two engines
    * disagree on the sign of a rounded-to-zero skew and the driver
    * hashes raw value bits. FunctionsSpec asserts the builtins agree
    * with this formulation to 1e-9. */
  def skewKurt(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("s_nationkey")
    val x = col("x")
    val m2 = avg(x * x)
    t(s, dir, "supplier")
      .withColumn("x",
        col("s_acctbal").cast("double") -
          avg(col("s_acctbal").cast("double")).over(w))
      .groupBy("s_nationkey")
      .agg(
        (round(when(m2 === 0d, lit(null))
          .otherwise(avg(x * x * x) / pow(m2, 1.5)), 4) + 0d).as("skew"),
        (round(when(m2 === 0d, lit(null))
          .otherwise(avg(x * x * x * x) / pow(m2, 2) - 3), 4) + 0d).as("kurt"))
      .orderBy("s_nationkey")
  }

  /** numeric_histogram(buckets, value) (reference NumericHistogram.java via
    * DoubleHistogramAggregation.java): streaming min-penalty bin merging.
    * Gate pins the exact regime — distinct inputs (10) ≤ buckets (16) — so
    * the result is bins = (value, count) independent of partitioning; the
    * approximate regime is covered in NumericHistogramSpec. Map output is
    * stringified sorted for the hash comparator. */
  def numericHist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(graft.functions.NumericHistogramAgg.column(
        (col("s_suppkey") % 10).cast("double"), 16).as("h"))
      .select(col("s_nationkey"),
        array_join(transform(array_sort(map_entries(col("h"))),
          e => concat(e.getField("key").cast("long").cast("string"), lit(":"),
            e.getField("value").cast("long").cast("string"))), ",").as("hist"))
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
  /** approx_distinct + approx_percentile (reference HLL/qdigest
    * aggregates). Estimates are engine-specific, so the gate emits the
    * bounds the oracle CAN replay: the HLL estimate within its published
    * 5% envelope of exact NDV, and the approximate median bracketed by the
    * exact 40th/60th percentiles — plus the exact values themselves. */
  def approx(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("exact_supp"),
        (abs(approx_count_distinct(col("l_suppkey")).cast("double") /
          countDistinct(col("l_suppkey")) - 1) <= 0.05).as("ndv_ok"),
        (expr("approx_percentile(l_quantity, 0.5)")
          .between(expr("percentile(l_quantity, 0.4)"),
            expr("percentile(l_quantity, 0.6)"))).as("median_ok"))
      .orderBy("l_returnflag")

  /** Weighted percentiles (the reference's weighted approx_percentile /
    * qdigest_agg(x, w) overloads — QuantileDigestAggregationFunction).
    * Exact side: Spark's percentile(x, p, frequency) — identical to the
    * percentile over each row repeated `frequency` times, which DuckDB
    * replays by physical row expansion. Sketch side: the weighted qdigest
    * median must land between the exact weighted 40th/60th percentiles. */
  def percentilesWeighted(s: SparkSession, dir: String): DataFrame = {
    val g = graft.functions.GraftFunctions
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        expr("round(percentile(l_quantity, 0.25, l_linenumber), 4)").as("q25_w"),
        expr("round(percentile(l_quantity, 0.5, l_linenumber), 4)").as("median_w"),
        expr("round(percentile(l_quantity, 0.75, l_linenumber), 4)").as("q75_w"),
        g.approxPercentileW(col("l_quantity"), col("l_linenumber"), 0.5)
          .between(expr("percentile(l_quantity, 0.4, l_linenumber)"),
            expr("percentile(l_quantity, 0.6, l_linenumber)")).as("wmedian_ok"),
        g.valueAtQuantile(g.qdigestAggW(col("l_quantity"), col("l_linenumber")),
          lit(0.5))
          .between(expr("percentile(l_quantity, 0.4, l_linenumber)"),
            expr("percentile(l_quantity, 0.6, l_linenumber)")).as("wqdigest_ok"))
      .orderBy("l_linestatus")
  }

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
  /** checksum (reference ChecksumAggregationFunction: order-independent
    * XOR of row hashes). Two variants: the engine-native xxhash64 xor
    * (fastest, engine-specific bits) and a cross-engine md5-derived xor
    * that the DuckDB oracle replays bit-for-bit — same algebra, portable
    * hash. */
  def checksum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("""bit_xor(CAST(conv(substring(md5(concat_ws('|',
            l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT))), 1, 15),
            16, 10) AS BIGINT))""")
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

  /** Per-aggregate FILTER (WHERE …) masks (reference AggregationNode's
    * per-agg `filter` field — SPI/plan/AggregationNode.java:44). */
  def filterClause(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("count(*) FILTER (WHERE o_orderstatus = 'F')").as("n_f"),
        expr("""CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_totalprice > 200000) AS DOUBLE)""").as("big_total"),
        expr("max(o_orderdate) FILTER (WHERE o_orderstatus = 'O')")
          .cast("date").as("last_open"))
      .orderBy("o_orderpriority")

  /** array_agg(x ORDER BY y) — ORDER BY inside an aggregate (reference
    * AggregationNode orderBy flag; unsupported in distributed agg there,
    * SPI/plan/AggregationNode.java:102). Spark rewrite per SURVEY §2.3:
    * sort_array(collect_list(struct(y, x))) then project — fully
    * partial/final combinable, sorted once per group at output. */
  def orderedArrayAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      .groupBy("o_orderpriority")
      .agg(array_join(
        transform(
          sort_array(collect_list(struct(col("o_orderkey"), col("o_orderstatus")))),
          e => concat(e.getField("o_orderkey").cast("string"), lit(":"),
            e.getField("o_orderstatus"))), "|").as("by_key"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** reduce_agg(input, init, fold) (reference ReduceAggregationFunction):
    * deterministic fold = ordered collect + Catalyst `aggregate` HOF; the
    * fold here (sum of squares) is independently verifiable in plain SQL. */
  def reduceAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
      .groupBy("l_returnflag")
      .agg(aggregate(collect_list(col("l_quantity").cast("long")), lit(0L),
        (acc, x) => acc + x * x).as("sum_sq"))
      .orderBy("l_returnflag")

  /** map_union_sum (reference MapUnionSumAggregation): per-priority partial
    * maps (status → count) merged across groups by summing per key; emitted
    * as exploded (key, total) rows — the distributed merge pattern for
    * map-valued partial aggregates. */
  def mapUnion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("c"))
      .groupBy("o_orderpriority")
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("o_orderstatus"), col("c"))))).as("m"))
      .select(explode(col("m")).as(Seq("status", "c")))
      .groupBy("status").agg(sum("c").as("total"))
      .orderBy("status")

  /** multimap_agg(key, value) (reference multimapagg/): key → all values,
    * values sorted + joined so the gate can hash the group. */
  def multimapAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(array_join(sort_array(collect_list(col("s_name"))), "|").as("suppliers"),
        count(lit(1)).as("n"))
      .orderBy("n_name")

  /** set_agg/set_union (reference SetOfValues.java): distinct union of
    * array-valued input across a group (explode → collect_set). */
  def setUnion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_brand"), explode(split(col("p_type"), " ")).as("w"))
      .groupBy("p_brand")
      .agg(array_join(sort_array(collect_set(col("w"))), "|").as("type_words"),
        countDistinct(col("w")).as("n_distinct"))
      .orderBy("p_brand")

  /** reservoir_sample (reference reservoirsample/) — fixed-size per-group
    * uniform sample. Deterministic variant: rank by md5 of the row key (a
    * uniform hash both engines compute identically), so the "random" picks
    * are reproducible and oracle-checkable; the nondeterministic seeded
    * variant is sample_bernoulli. */
  def reservoir(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderstatus").orderBy(asc("h"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("h", md5(encode(col("o_orderkey").cast("string"), "UTF-8")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("o_orderstatus"), col("rn").cast("long").as("rn"), col("o_orderkey"))
      .orderBy("o_orderstatus", "rn")
  }

  /** RESUMABLE reservoir_sample — the reference's 4-arg signature
    * (reservoirsample/ReservoirSampleFunction.java: initial sample +
    * initial processed count resume a previous run's reservoir; merges are
    * proportional to processed counts). Phase 1 samples the even
    * orderkeys per status; phase 2 resumes from phase 1's
    * row(processed_count, sample) over the odd keys. Randomness can't be
    * replayed cross-engine, so the gate emits the DETERMINISTIC contract:
    * processed_count carries across the resume (= total group rows),
    * |sample| = least(k, n), every sampled key belongs to its group, no
    * duplicates (the phases partition the keys). ReservoirSpec pins the
    * seeded/statistical behavior. */
  def reservoirResume(s: SparkSession, dir: String): DataFrame = {
    val g = graft.functions.GraftFunctions
    val k = 20
    val orders = t(s, dir, "orders")
    val p1 = orders.filter(col("o_orderkey") % 2 === 0)
      .groupBy("o_orderstatus")
      .agg(g.reservoirSample(lit(null).cast("array<bigint>"), lit(0L),
        col("o_orderkey"), k, Some(7L)).as("r1"))
    val p2 = orders.filter(col("o_orderkey") % 2 === 1)
      .join(p1, "o_orderstatus")
      .groupBy("o_orderstatus")
      .agg(g.reservoirSample(col("r1.sample"), col("r1.processed_count"),
        col("o_orderkey"), k, Some(11L)).as("r2"))
    val checks = p2.select(
      col("o_orderstatus").as("g"),
      col("r2.processed_count").as("total"),
      size(col("r2.sample")).cast("long").as("n_sample"),
      (size(array_distinct(col("r2.sample"))) === size(col("r2.sample")))
        .as("distinct_ok"),
      col("r2.sample").as("sample"))
    val membership = checks
      .select(col("g"), explode(col("sample")).as("key"))
      .join(orders.select(col("o_orderstatus").as("g"),
        col("o_orderkey").as("key")), Seq("g", "key"))
      .groupBy("g").agg(count(lit(1)).as("n_member"))
    checks.join(membership, "g")
      .select(col("g"), col("total"), col("n_sample"),
        (col("n_member") === col("n_sample") && col("distinct_ok")).as("ok"))
      .orderBy("g")
  }

  /** Classification metrics (reference ClassificationPrecisionAggregation /
    * ClassificationRecallAggregation …): precision/recall/F1 at a threshold
    * sweep over a deterministic score column — the standard one-shuffle
    * confusion-matrix aggregation. */
  def classification(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(((col("o_orderkey") % 100) / 100.0).as("score"),
        (col("o_totalprice") > 200000).as("label"))
      .crossJoin(broadcast(
        s.range(1, 4).select((col("id") * 0.25).as("threshold"))))
      .groupBy("threshold")
      .agg(
        expr("count(*) FILTER (WHERE score >= threshold AND label)").as("tp"),
        expr("count(*) FILTER (WHERE score >= threshold AND NOT label)").as("fp"),
        expr("count(*) FILTER (WHERE score < threshold AND label)").as("fn"),
        expr("count(*) FILTER (WHERE score < threshold AND NOT label)").as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp") / (col("tp") + col("fp")), 4).as("precision"),
        round(col("tp") / (col("tp") + col("fn")), 4).as("recall"),
        // classification_fall_out = FP/(FP+TN); _miss_rate = FN/(TP+FN)
        // (ClassificationFallOutAggregation / ClassificationMissRateAggregation)
        round(col("fp") / (col("fp") + col("tn")), 4).as("fall_out"),
        round(col("fn") / (col("tp") + col("fn")), 4).as("miss_rate"))
      .orderBy("threshold")

  /** vector_sum(embedding) — ONE aggregation state of dimension d instead of
    * d scalar sums (reference fusion target: MAIN/sql/planner/iterative/rule/
    * MergeSumsToVectorSum.java:52). Gate uses the decimal-exact mode (same
    * cross-engine convention as Tables.dsum) and explodes the result vector
    * to (g, pos, s) scalar rows so the driver's comparator sees plain
    * doubles. */
  def vectorSum(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .groupBy((col("vec_id") % 4).as("g"))
      .agg(graft.functions.GraftFunctions
        .vectorSumExact(col("embedding"), 6).as("vs"))
      .select(col("g"), posexplode(col("vs")).as(Seq("pos", "s")))
      .select(col("g"), (col("pos") + 1).cast("long").as("pos"), col("s"))
      .orderBy("g", "pos")

  /** Noisy (differential-privacy) aggregates at noiseScale=0 — the exact
    * degradation the reference tests pin (NoisyCountAggregationUtils:
    * noise = N(0, scale²), applied at finalization). The gate keeps inputs
    * integer-valued so the double sums are exact and order-independent;
    * seeded-noise determinism is FunctionsSpec territory (DuckDB cannot
    * replay java.util.Random). */
  def noisy(s: SparkSession, dir: String): DataFrame = {
    val g = graft.functions.GraftFunctions
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        g.noisyCountGaussian(col("o_orderkey"), 0.0).as("n_cnt"),
        g.noisyCountIfGaussian(col("o_orderstatus") === "F", 0.0).as("n_cnt_if"),
        g.noisySumGaussian(col("o_custkey").cast("double"), 0.0).as("n_sum"),
        g.noisySumGaussian(col("o_custkey").cast("double"), 0.0,
          Some((100.0, 5000.0))).as("n_sum_clip"),
        round(g.noisyAvgGaussian(col("o_custkey").cast("double"), 0.0), 4)
          .as("n_avg"))
      .orderBy("o_orderpriority")
  }

  /** differential_entropy Vasicek path: reservoir capacity 10000 exceeds
    * every per-segment group (3045 at sf0.1), so the estimator runs over
    * the full sample set and is deterministic — the regime the DuckDB
    * oracle can replay with window functions. */
  def entropyVasicek(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(round(graft.functions.GraftFunctions
        .differentialEntropy(10000, col("c_acctbal").cast("double")), 4)
        .as("vasicek_bits"))
      .orderBy("c_mktsegment")

  /** differential_entropy fixed_histogram_mle path: 10 equi-width buckets
    * over l_quantity ∈ [1, 51). Bounded state (10 doubles) regardless of
    * group size — the histogram strategy IS the 100 TB path. */
  def entropyMle(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(round(graft.functions.GraftFunctions
        .differentialEntropyHistogram(10, col("l_quantity").cast("double"),
          lit(1.0), "fixed_histogram_mle", 1.0, 51.0), 4)
        .as("mle_bits"))
      .orderBy("l_linestatus")

  /** The reference's SQL classification aggregates
    * (PrecisionRecallAggregation.java subclasses): fixed-histogram
    * threshold sweeps returned as arrays — precision, recall, miss rate,
    * fall-out, thresholds, plus the 4-arg weighted precision. The oracle
    * replays the prefix-scan over the same 4-bin histogram; scores sit on
    * dyadic bucket boundaries only at exactly-representable points so the
    * binning is cross-engine stable. The parallel arrays are zipped and
    * exploded to one scalar row per threshold — the aggregates' array shape
    * is an engine detail, and scalar rows are the hash-comparable surface
    * (array cells aren't sortable by the comparison harness). */
  def classification2(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "orders")
      .select(((col("o_orderkey") % 100) / 100.0).as("score"),
        (col("o_totalprice") > 200000).as("label"),
        (lit(1.0) + col("o_orderkey") % 3).as("w"))
      .agg(
        expr("classification_thresholds(4, label, score)").as("ths"),
        expr("transform(classification_precision(4, label, score), x -> round(x, 6))").as("prec"),
        expr("transform(classification_recall(4, label, score), x -> round(x, 6))").as("rec"),
        expr("transform(classification_miss_rate(4, label, score), x -> round(x, 6))").as("miss"),
        expr("transform(classification_fall_out(4, label, score), x -> round(x, 6))").as("fo"),
        expr("transform(classification_precision(4, label, score, w), x -> round(x, 6))").as("prec_w"))
      .select(posexplode(arrays_zip(col("ths"), col("prec"), col("rec"),
        col("miss"), col("fo"), col("prec_w"))).as(Seq("i", "z")))
      .select(col("i"), col("z.ths").as("threshold"),
        col("z.prec").as("prec"), col("z.rec").as("rec"),
        col("z.miss").as("miss"), col("z.fo").as("fo"),
        col("z.prec_w").as("prec_w"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_classification2" -> classification2,
    "agg_entropy_vasicek" -> entropyVasicek,
    "agg_entropy_mle" -> entropyMle,
    "agg_noisy" -> noisy,
    "agg_vector_sum" -> vectorSum,
    "agg_classification" -> classification,
    "agg_filter_clause" -> filterClause,
    "agg_ordered_array" -> orderedArrayAgg,
    "agg_reduce" -> reduceAgg,
    "agg_numeric_hist" -> numericHist,
    "agg_map_union" -> mapUnion,
    "agg_multimap" -> multimapAgg,
    "agg_set_union" -> setUnion,
    "agg_reservoir" -> reservoir,
    "agg_reservoir_resume" -> reservoirResume,
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
    "agg_percentiles_w" -> percentilesWeighted,
    "agg_approx" -> approx,
    "agg_histogram" -> histogram,
    "agg_checksum" -> checksum,
    "agg_geomean" -> geoMean,
    "agg_entropy" -> entropy,
    "agg_numeric_histogram" -> numericHistogram)

  /** numeric_histogram(buckets, x) (reference NumericHistogram.java) as the
    * composable equi-width variant: width_bucket + count per bucket — a
    * single hash aggregation, the shape that scales (the reference's
    * adaptive-bin variant is a per-group state machine; equi-width keeps
    * whole-stage codegen and map-side partials). */
  def numericHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_linestatus"),
        width_bucket(col("l_quantity"), lit(1.0), lit(51.0), lit(10)).as("bucket"))
      .groupBy("l_linestatus", "bucket")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("l_linestatus", "bucket")

  val oracle: Map[String, String] = Map(
    "agg_classification2" ->
      """WITH base AS (SELECT (o_orderkey % 100) / 100.0 AS score,
        |    o_totalprice > 200000 AS label, 1.0 + o_orderkey % 3 AS w
        |  FROM orders),
        |b AS (SELECT LEAST(CAST(FLOOR(score * 4) AS INT), 3) AS i, label, w
        |  FROM base),
        |r AS (SELECT CAST(range AS INT) AS i FROM range(4)),
        |h0 AS (SELECT i,
        |    SUM(CASE WHEN label THEN 1.0 ELSE 0 END) tw,
        |    SUM(CASE WHEN label THEN 0 ELSE 1.0 END) fw,
        |    SUM(CASE WHEN label THEN w ELSE 0 END) tww,
        |    SUM(CASE WHEN label THEN 0 ELSE w END) fww
        |  FROM b GROUP BY i),
        |h AS (SELECT r.i AS i, COALESCE(tw, 0) tw, COALESCE(fw, 0) fw,
        |    COALESCE(tww, 0) tww, COALESCE(fww, 0) fww
        |  FROM r LEFT JOIN h0 ON h0.i = r.i),
        |s AS (SELECT i, tw, fw, tww, fww,
        |    COALESCE(SUM(tw) OVER (ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) runT,
        |    COALESCE(SUM(fw) OVER (ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) runF,
        |    COALESCE(SUM(tww) OVER (ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) runTW,
        |    COALESCE(SUM(fww) OVER (ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) runFW,
        |    SUM(tw) OVER () totT, SUM(fw) OVER () totF,
        |    SUM(tww) OVER () totTW, SUM(fww) OVER () totFW
        |  FROM h),
        |e AS (SELECT * FROM s WHERE totT > runT)
        |SELECT CAST(i AS INT) AS i, i / 4.0 AS threshold,
        | round((totT - runT) / ((totT - runT) + (totF - runF)), 6) AS prec,
        | round((totT - runT) / totT, 6) AS rec,
        | round(runT / totT, 6) AS miss,
        | round((totF - runF) / totF, 6) AS fo,
        | round((totTW - runTW) / ((totTW - runTW) + (totFW - runFW)), 6) AS prec_w
        |FROM e ORDER BY i""".stripMargin,
    "agg_entropy_vasicek" ->
      """WITH s AS (SELECT c_mktsegment g, CAST(c_acctbal AS DOUBLE) x FROM customer),
        |o AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) - 1 AS i,
        |       count(*) OVER (PARTITION BY g) AS n FROM s),
        |t AS (SELECT g, x, i, n,
        |       GREATEST(CAST(round(sqrt(CAST(n AS DOUBLE))) AS BIGINT), 2) AS m
        |      FROM o),
        |j AS (SELECT a.g, a.n, a.m, b.x AS xp, c.x AS xm,
        |       CASE WHEN a.i + a.m < a.n AND a.i - a.m > 0
        |            THEN 2.0 ELSE 1.0 END AS ai
        |      FROM t a
        |      JOIN t b ON b.g = a.g AND b.i = LEAST(a.i + a.m, a.n - 1)
        |      JOIN t c ON c.g = a.g
        |       AND c.i = CASE WHEN a.i - a.m > 0 THEN a.i - a.m ELSE 0 END)
        |SELECT g AS c_mktsegment,
        | ROUND(SUM(ln(CAST(n AS DOUBLE) / (ai * m) * (xp - xm))) / n / ln(2), 4)
        |  AS vasicek_bits
        |FROM j GROUP BY g, n ORDER BY 1""".stripMargin,
    "agg_entropy_mle" ->
      """WITH b AS (SELECT l_linestatus g,
        |        LEAST(CAST(floor(10.0 * (CAST(l_quantity AS DOUBLE) - 1.0) / 50.0)
        |          AS BIGINT), 9) idx,
        |        count(*) c
        |       FROM lineitem GROUP BY 1, 2),
        |a AS (SELECT g, SUM(c) n FROM b GROUP BY g),
        |r AS (SELECT b.g,
        |       -SUM((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS raw
        |      FROM b JOIN a USING (g) GROUP BY b.g)
        |SELECT g AS l_linestatus,
        | ROUND((raw + ln(5.0)) / ln(2), 4) AS mle_bits
        |FROM r ORDER BY 1""".stripMargin,
    "agg_noisy" ->
      """SELECT o_orderpriority,
        | count(o_orderkey) AS n_cnt,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_cnt_if,
        | CAST(SUM(CAST(o_custkey AS DOUBLE)) AS DOUBLE) AS n_sum,
        | CAST(SUM(LEAST(GREATEST(CAST(o_custkey AS DOUBLE), 100.0), 5000.0))
        |   AS DOUBLE) AS n_sum_clip,
        | ROUND(SUM(CAST(o_custkey AS DOUBLE)) / count(*), 4) AS n_avg
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_vector_sum" ->
      """SELECT vec_id % 4 AS g, CAST(j AS BIGINT) AS pos,
        | CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) AS s
        |FROM (SELECT vec_id, unnest(embedding) AS x,
        |       generate_subscripts(embedding, 1) AS j FROM embeddings)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_numeric_histogram" ->
      """SELECT l_linestatus,
        | CASE WHEN l_quantity < 1 THEN 0
        |      WHEN l_quantity >= 51 THEN 11
        |      ELSE CAST(floor((l_quantity - 1.0) / 5.0) AS BIGINT) + 1 END AS bucket,
        | count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_classification" ->
      """WITH scored AS (
        | SELECT (o_orderkey % 100) / 100.0 AS score,
        |        o_totalprice > 200000 AS label
        | FROM orders),
        |m AS (SELECT threshold,
        |       count(*) FILTER (WHERE score >= threshold AND label) AS tp,
        |       count(*) FILTER (WHERE score >= threshold AND NOT label) AS fp,
        |       count(*) FILTER (WHERE score < threshold AND label) AS fn,
        |       count(*) FILTER (WHERE score < threshold AND NOT label) AS tn
        |      FROM scored CROSS JOIN
        |       (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) threshold)
        |      GROUP BY threshold)
        |SELECT threshold, tp, fp, fn, tn,
        | ROUND(tp * 1.0 / (tp + fp), 4) AS precision,
        | ROUND(tp * 1.0 / (tp + fn), 4) AS recall,
        | ROUND(fp * 1.0 / (fp + tn), 4) AS fall_out,
        | ROUND(fn * 1.0 / (tp + fn), 4) AS miss_rate
        |FROM m ORDER BY threshold""".stripMargin,
    "agg_filter_clause" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |      FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_total,
        | CAST(max(o_orderdate) FILTER (WHERE o_orderstatus = 'O') AS DATE) AS last_open
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_ordered_array" ->
      """SELECT o_orderpriority,
        | string_agg(CAST(o_orderkey AS VARCHAR) || ':' || o_orderstatus, '|'
        |            ORDER BY o_orderkey) AS by_key,
        | count(*) AS n
        |FROM orders WHERE o_orderkey <= 2000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_reduce" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT)
        |   AS sum_sq
        |FROM lineitem WHERE l_orderkey <= 1000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_map_union" ->
      """SELECT o_orderstatus AS status, count(*) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    "agg_numeric_hist" ->
      """WITH v AS (SELECT s_nationkey, s_suppkey % 10 AS val, count(*) AS c
        |           FROM supplier GROUP BY 1, 2)
        |SELECT s_nationkey,
        | string_agg(CAST(val AS VARCHAR) || ':' || CAST(c AS VARCHAR),
        |            ',' ORDER BY val) AS hist
        |FROM v GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "agg_multimap" ->
      """SELECT n_name,
        | string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        | count(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_set_union" ->
      """SELECT p_brand,
        | string_agg(DISTINCT w, '|' ORDER BY w) AS type_words,
        | count(DISTINCT w) AS n_distinct
        |FROM (SELECT p_brand, unnest(string_split(p_type, ' ')) AS w FROM part)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "agg_reservoir" ->
      """SELECT o_orderstatus, CAST(rn AS BIGINT) AS rn, o_orderkey FROM (
        | SELECT o_orderstatus, o_orderkey,
        |  row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 5 ORDER BY o_orderstatus, rn""".stripMargin,
    "agg_reservoir_resume" ->
      """SELECT o_orderstatus AS g, count(*) AS total,
        | least(20, count(*)) AS n_sample, true AS ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
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
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |   / count(*), 4) AS avgx,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |   / count(*), 4) AS avgy,
        | ROUND(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |     * CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 2)
        |  AS sxx,
        | ROUND(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |     * CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 2)
        |  AS sxy,
        | ROUND(CAST(SUM(CAST((l_extendedprice / 1000) * (l_extendedprice / 1000)
        |     AS DECIMAL(38,6))) AS DOUBLE)
        |   - CAST(SUM(CAST(l_extendedprice / 1000 AS DECIMAL(38,6))) AS DOUBLE)
        |     * CAST(SUM(CAST(l_extendedprice / 1000 AS DECIMAL(38,6))) AS DOUBLE)
        |     / count(*), 2)
        |  AS syy_k
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_skew_kurt" ->
      """WITH mu AS (
        | SELECT s_nationkey, avg(CAST(s_acctbal AS DOUBLE)) AS m
        | FROM supplier GROUP BY s_nationkey),
        |d AS (
        | SELECT s.s_nationkey, CAST(s.s_acctbal AS DOUBLE) - mu.m AS x
        | FROM supplier s JOIN mu ON s.s_nationkey = mu.s_nationkey)
        |SELECT s_nationkey,
        | CASE WHEN avg(x*x) = 0 THEN NULL
        |      ELSE ROUND(avg(x*x*x) / power(avg(x*x), 1.5), 4) + 0.0 END AS skew,
        | CASE WHEN avg(x*x) = 0 THEN NULL
        |      ELSE ROUND(avg(x*x*x*x) / power(avg(x*x), 2) - 3, 4) + 0.0 END AS kurt
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
    "agg_percentiles_w" ->
      """WITH e AS (
        |  SELECT l_linestatus, l_quantity, unnest(range(l_linenumber)) AS rep
        |  FROM lineitem)
        |SELECT l_linestatus,
        | ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25_w,
        | ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_w,
        | ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75_w,
        | true AS wmedian_ok,
        | true AS wqdigest_ok
        |FROM e GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_histogram" ->
      """SELECT o_orderpriority AS value, count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY value""".stripMargin,
    "agg_geomean" ->
      """SELECT p_brand, ROUND(exp(avg(ln(p_retailprice))), 4) AS geo_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "agg_entropy" ->
      """SELECT ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS event_entropy
        |FROM (SELECT count(*) AS c FROM events GROUP BY event_type)""".stripMargin,
    "agg_checksum" ->
      """SELECT l_returnflag,
        | bit_xor(CAST('0x' || substr(md5(concat_ws('|',
        |   CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |   CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))), 1, 15) AS BIGINT))
        |  AS checksum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_approx" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_suppkey) AS exact_supp,
        | true AS ndv_ok,
        | true AS median_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
