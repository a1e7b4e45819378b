package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import graft.Tables
import graft.functions.GraftFunctions

/** Scalar-function coverage (SURVEY.md §2.5: ~650 @ScalarFunction in
  * MAIN/operator/scalar/ — math MathFunctions.java, string
  * StringFunctions.java, datetime DateTimeFunctions.java, array Array*.java
  * + higher-order ArrayTransformFunction.java, map Map*.java, JSON
  * JsonFunctions.java, binary VarbinaryFunctions.java, bitwise
  * BitwiseFunctions.java, URL UrlFunctions.java, conditional TryFunction
  * .java, regex JoniRegexpFunctions.java).
  *
  * Each query exercises a function family end-to-end against the DuckDB
  * oracle. Everything is a codegen'd per-row projection — scan-speed at any
  * scale. Custom graft expressions (jaro_winkler_similarity,
  * hamming_distance, cosine/dot/l2) are oracle-verified against DuckDB's
  * independent implementations — the strongest correctness check available
  * for custom Catalyst code.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  def math(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey").as("k"),
        abs(col("p_retailprice") * -1).as("abs_x"),
        ceil(col("p_retailprice")).cast("double").as("ceil_x"),
        floor(col("p_retailprice")).cast("double").as("floor_x"),
        round(col("p_retailprice"), 1).as("round_x"),
        round(sqrt(col("p_retailprice")), 4).as("sqrt_x"),
        round(cbrt(col("p_retailprice")), 4).as("cbrt_x"),
        round(log(col("p_retailprice")), 4).as("ln_x"),
        round(log10(col("p_retailprice")), 4).as("log10_x"),
        round(pow(col("p_retailprice"), 2), 4).as("pow_x"),
        (col("p_partkey") % 7).as("mod_k"),
        signum(col("p_retailprice") - 1000).as("sign_x"),
        greatest(col("p_retailprice"), lit(500.0)).as("greatest_x"),
        least(col("p_retailprice"), lit(500.0)).as("least_x"))
      .orderBy("k")

  /** Trigonometric/hyperbolic functions + width_bucket (reference
    * MathFunctions.java trig family + WidthBucketFunction; arguments scaled
    * into well-conditioned ranges so ROUND(...,4) is stable across libm
    * implementations). */
  def trig(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .withColumn("xs", col("p_size") / 100.0)
      .withColumn("xp", col("p_retailprice") / 1000.0)
      .select(
        col("p_partkey").as("k"),
        round(sin(col("xs")), 4).as("sin_x"),
        round(cos(col("xs")), 4).as("cos_x"),
        round(tan(col("xs")), 4).as("tan_x"),
        round(asin(col("xs")), 4).as("asin_x"),
        round(acos(col("xs")), 4).as("acos_x"),
        round(atan(col("xp")), 4).as("atan_x"),
        round(atan2(col("xs"), lit(2.0)), 4).as("atan2_x"),
        round(degrees(col("xs")), 4).as("deg_x"),
        round(radians(col("p_size")), 4).as("rad_sz"),
        round(sinh(col("xs")), 4).as("sinh_x"),
        round(cosh(col("xs")), 4).as("cosh_x"),
        round(tanh(col("xs")), 4).as("tanh_x"),
        expr("CAST(width_bucket(p_retailprice, 0, 2000, 10) AS BIGINT)").as("wb"))
      .orderBy("k")

  def string(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .withColumn("phrase", concat(col("n_name"), lit(" alpha beta gamma")))
      .select(
        col("n_nationkey").as("k"),
        length(col("n_name")).cast("long").as("len"),
        lower(col("n_name")).as("lo"),
        upper(col("phrase")).as("up"),
        substring(col("n_name"), 2, 3).as("sub"),
        lpad(col("n_name"), 12, "*").as("lp"),
        rpad(col("n_name"), 12, "-").as("rp"),
        regexp_replace(col("n_name"), "A", "@").as("rep"),
        reverse(col("n_name")).as("rev"),
        repeat(substring(col("n_name"), 1, 2), 3).as("rep3"),
        concat_ws("|", col("n_name"), col("n_nationkey").cast("string")).as("cw"),
        instr(col("n_name"), "AN").cast("long").as("pos"),
        element_at(split(col("phrase"), " "), 2).as("word2"),
        ascii(col("n_name")).cast("long").as("asc"),
        translate(col("n_name"), "AEI", "aei").as("tr"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy("k")

  /** Custom string-similarity expressions verified against DuckDB's own
    * jaro_winkler_similarity / hamming / levenshtein. */
  def stringSim(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    n.as("a").join(n.as("b"), col("a.n_nationkey") < col("b.n_nationkey"))
      .select(
        col("a.n_nationkey").as("ka"), col("b.n_nationkey").as("kb"),
        round(GraftFunctions.jaroWinkler(col("a.n_name"), col("b.n_name")), 4)
          .as("jw"),
        levenshtein(col("a.n_name"), col("b.n_name")).cast("long").as("lev"),
        GraftFunctions.hammingDistance(
          substring(md5(col("a.n_name")), 1, 8),
          substring(md5(col("b.n_name")), 1, 8)).as("ham"))
      .orderBy("ka", "kb")
  }

  def datetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey").as("k"),
        col("o_orderdate").cast("date").as("d"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sun0"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_end"),
        last_day(col("o_orderdate")).as("eom"),
        make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"))
      .orderBy("k")

  /** Miscellaneous reference functions: format() printf-style
    * (FormatFunction.java), uuid shaping (COMMON/type/UuidType — here a
    * deterministic md5-derived v4-shaped uuid so the oracle can replay it),
    * parse_data_size (DataSizeFunctions.java). */
  def misc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .withColumn("h", md5(encode(col("n_name"), "UTF-8")))
      .withColumn("sz", concat((col("n_nationkey") % 9 + 1).cast("string"),
        element_at(typedLit(Seq("B", "kB", "MB", "GB")),
          (col("n_nationkey") % 4 + 1).cast("int"))))
      .select(
        col("n_nationkey").as("k"),
        format_string("%s has key %d", col("n_name"), col("n_nationkey"))
          .as("fmt_sd"),
        format_string("%.2f", col("n_nationkey") / 7.0).as("fmt_f"),
        concat_ws("-", substring(col("h"), 1, 8), substring(col("h"), 9, 4),
          substring(col("h"), 13, 4), substring(col("h"), 17, 4),
          substring(col("h"), 21, 12)).as("uuid"),
        col("sz"),
        (regexp_extract(col("sz"), "^([0-9.]+)", 1).cast("double") *
          element_at(F.map(
            lit("B"), lit(1L), lit("kB"), lit(1024L),
            lit("MB"), lit(1048576L), lit("GB"), lit(1073741824L)),
            regexp_extract(col("sz"), "([a-zA-Z]+)$", 1))).cast("long")
          .as("bytes"))
      .orderBy("k")

  /** Reference-dialect date_format: MySQL %-patterns translated to Java
    * patterns at plan time (functions/MySqlDateFormat.scala; the reference's
    * DateTimeFunctions.java date_format). Oracle = DuckDB strftime with the
    * equivalent C specifiers. */
  def mysqlDateFmt(s: SparkSession, dir: String): DataFrame = {
    import GraftFunctions.mysqlDateFormat
    GraftFunctions.register(s)
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey").as("k"),
        mysqlDateFormat(col("o_orderdate"), "%Y-%m-%d").as("iso"),
        mysqlDateFormat(col("o_orderdate"), "%d/%m/%Y").as("euro"),
        mysqlDateFormat(col("o_orderdate"), "%Y%j").as("ordinal"),
        mysqlDateFormat(col("o_orderdate"), "%H:%i:%s").as("hms"),
        mysqlDateFormat(col("o_orderdate"), "%b").as("mon"),
        mysqlDateFormat(col("o_orderdate"), "%W").as("weekday"),
        mysqlDateFormat(col("o_orderdate"), "y=%Y 100%%").as("mixed"),
        // format from a COLUMN, not a literal — the per-row
        // MySqlPatternToJava path (reference MysqlDateFormat-style
        // functions accept any varchar expression)
        expr("mysql_date_format(o_orderdate, CASE WHEN o_orderkey % 2 = 0 " +
          "THEN '%Y-%m-%d' ELSE '%d/%m/%Y' END)").as("dyn"))
      .orderBy("k")
  }

  /** Datetime arithmetic beyond fn_datetime: month math, ISO week,
    * day-of-year, quarter truncation, epoch seconds. */
  def datetime2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey").as("k"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2mo"),
        date_sub(col("o_orderdate").cast("date"), 15).as("minus15d"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        trunc(col("o_orderdate").cast("date"), "quarter").as("q_start"),
        unix_timestamp(col("o_orderdate")).cast("long").as("epoch_s"))
      .orderBy("k")

  /** Array functions + higher-order transform/filter/exists (Catalyst
    * LambdaFunction — the reference's ArrayTransformFunction.java family).
    * Every array-typed result is joined to a single string cell: the gate's
    * row comparator cannot sort list cells, so arrays never leave the query. */
  def array(s: SparkSession, dir: String): DataFrame = {
    def j(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array_join(transform(c, x => x.cast("string")), ",")
    t(s, dir, "part").filter(col("p_partkey") <= 100)
      .withColumn("arr", sequence(lit(1L), (col("p_size") % 5 + 2).cast("long")))
      .select(
        col("p_partkey").as("k"),
        j(col("arr")).as("arr"),
        size(col("arr")).cast("long").as("card"),
        array_contains(col("arr"), 3).as("has3"),
        element_at(col("arr"), 2).as("second"),
        j(slice(col("arr"), 2, 2)).as("sl"),
        j(reverse(col("arr"))).as("rev"),
        array_max(col("arr")).as("mx"),
        array_min(col("arr")).as("mn"),
        array_join(transform(col("arr"), x => x.cast("string")), ",").as("joined"),
        j(transform(col("arr"), x => x * 2)).as("doubled"),
        j(filter(col("arr"), x => x % 2 === 0)).as("evens"),
        (size(filter(col("arr"), x => x > 4)) > 0).as("any_gt4"),
        aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("sum_arr"),
        j(flatten(F.array(col("arr"), col("arr")))).as("flat"),
        j(sort_array(array_distinct(F.array(
          col("p_size") % 3, col("p_size") % 5, col("p_size") % 3)))).as("dist"))
      .orderBy("k")
  }

  def map(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
      .withColumn("m", F.map(
        lit("bal"), col("s_acctbal"),
        lit("key"), col("s_suppkey").cast("double"),
        lit("nat"), col("s_nationkey").cast("double")))
      .select(
        col("s_suppkey").as("k"),
        size(col("m")).cast("long").as("card"),
        element_at(col("m"), "bal").as("bal"),
        element_at(col("m"), "nat").as("nat"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys"),
        map_contains_key(col("m"), "key").as("has_key"),
        element_at(map_values(
          map_filter(col("m"), (k, v) => k === "bal")), 1).as("only_bal"))
      .orderBy("k")

  def json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_id") <= 1000)
      .select(
        col("event_id").as("k"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        get_json_object(col("props"), "$.missing").as("miss"),
        json_array_length(lit("[1,2,3,4]")).cast("long").as("alen"),
        get_json_object(lit("""{"a":{"b":7}}"""), "$.a.b").cast("long").as("nested"),
        get_json_object(lit("[10,20,30]"), "$[1]").cast("long").as("idx1"))
      .orderBy("k")

  /** Presto JSON function dialect (reference JsonFunctions.java:132-520,
    * JsonExtract.java): json_parse canonicalization (sorted keys, compact),
    * json_format identity, json_extract returning JSON text (quoted
    * strings), json_size, json_array_length/contains/get, is_json_scalar.
    * The JSON value is synthesized per row with deliberately UNSORTED keys
    * so the canonicalization is observable; the oracle rebuilds the sorted
    * compact form by string concat + replays the rest with DuckDB's JSON
    * extension. */
  def json2(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "events").filter(col("event_id") <= 500)
      .withColumn("j", concat(
        lit("""{"b": [1, 2, """), (col("event_id") % 5).cast("string"),
        lit("""], "a": {"x": "v"""), (col("event_id") % 7).cast("string"),
        lit(""""}, "n": """), (col("event_id") % 100).cast("string"),
        lit(""", "f": 2.5, "s": "str"}""")))
      .select(
        col("event_id").as("k"),
        expr("json_parse(j)").as("canonical"),
        expr("json_format(j)").as("formatted"),
        expr("json_extract(j, '$.a.x')").as("ext_quoted"),
        expr("""json_extract(j, '$["b"][1]')""").as("ext_idx"),
        expr("json_extract(j, '$.missing')").as("ext_miss"),
        expr("CAST(json_size(j, '$.a') AS BIGINT)").as("size_obj"),
        expr("CAST(json_size(j, '$.b') AS BIGINT)").as("size_arr"),
        expr("CAST(json_size(j, '$.n') AS BIGINT)").as("size_scalar"),
        expr("json_array_length(json_extract(j, '$.b'))").as("alen"),
        expr("json_array_contains(json_extract(j, '$.b'), event_id % 5)")
          .as("has_mod"),
        expr("json_array_contains('[1.5,2.5]', 2.5)").as("has_f"),
        expr("""json_array_contains('["a","b"]', 'b')""").as("has_s"),
        expr("json_array_contains(json_extract(j, '$.b'), 99)").as("has_miss"),
        expr("json_array_get(json_extract(j, '$.b'), -1)").as("last_el"),
        expr("""json_array_get('["x","y"]', 0)""").as("first_s"),
        expr("is_json_scalar(json_extract(j, '$.n'))").as("scalar_n"),
        expr("is_json_scalar(j)").as("scalar_obj"))
      .orderBy("k")
  }

  def binary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region")
      .select(
        col("r_regionkey").as("k"),
        md5(col("r_name")).as("md5_s"),
        sha2(col("r_name").cast("binary"), 256).as("sha256_s"),
        base64(encode(col("r_name"), "UTF-8")).as("b64"),
        lower(hex(encode(col("r_name"), "UTF-8"))).as("hx"),
        length(encode(repeat(col("r_name"), 2), "UTF-8")).cast("long").as("nbytes"))
      .orderBy("k")

  def bitwise(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(
        col("c_custkey").as("k"),
        (col("c_custkey").bitwiseAND(lit(255L))).as("band"),
        (col("c_custkey").bitwiseOR(lit(16L))).as("bor"),
        (col("c_custkey").bitwiseXOR(lit(85L))).as("bxor"),
        expr("shiftleft(c_custkey, 3)").as("shl"),
        expr("shiftright(c_custkey, 2)").as("shr"),
        expr("CAST(bit_count(c_custkey) AS BIGINT)").as("bits"),
        expr("~c_custkey").as("bnot"))
      .orderBy("k")

  def url(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_custkey") <= 100)
      .withColumn("u", concat(
        lit("https://shop.example.com:8443/api/v"),
        (col("c_custkey") % 3).cast("string"),
        lit("/items?id="), col("c_custkey").cast("string"),
        lit("&lang=en")))
      .select(
        col("c_custkey").as("k"),
        parse_url(col("u"), lit("PROTOCOL")).as("proto"),
        parse_url(col("u"), lit("HOST")).as("host"),
        parse_url(col("u"), lit("PATH")).as("path"),
        parse_url(col("u"), lit("QUERY")).as("query"),
        parse_url(col("u"), lit("QUERY"), lit("id")).as("id_param"),
        parse_url(col("u"), lit("QUERY"), lit("lang")).as("lang_param"))
      .orderBy("k")

  /** url_encode/url_decode (reference UrlFunctions.java:149-175):
    * form-parameter escaping (space → '+', uppercase %XX otherwise) and its
    * inverse; the decode column proves the round trip on every row. */
  def urlCodec(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(col("n_name"), lit(" a/b:c&d=e,f+g~h"))
    t(s, dir, "nation")
      .select(col("n_nationkey").as("k"),
        GraftFunctions.urlEncode(raw).as("enc"),
        GraftFunctions.urlDecode(GraftFunctions.urlEncode(raw)).as("dec"))
      .orderBy("k")
  }

  /** parse_duration('<decimal> <unit>') → milliseconds (reference
    * DateTimeFunctions.java:1442-1467: value × msPerUnit + 0.5, floor).
    * Composed from builtins; unknown units raise like the reference. */
  def parseDurationMs(c: Column): Column = {
    val pat = "^\\s*(\\d+(?:\\.\\d+)?)\\s*([a-zA-Z]+)\\s*$"
    val v = regexp_extract(c, pat, 1).cast("double")
    val u = lower(regexp_extract(c, pat, 2))
    val msPer = when(u === "ns", 1e-6).when(u === "us", 1e-3)
      .when(u === "ms", 1.0).when(u === "s", 1000.0).when(u === "m", 60000.0)
      .when(u === "h", 3600000.0).when(u === "d", 86400000.0)
      .otherwise(raise_error(concat(
        lit("duration is not a valid data duration string: "), c)))
    floor(v * msPer + 0.5).cast("long")
  }

  /** ISO-8601 conversions + parse_duration (reference DateTimeFunctions
    * .java:272-336, :1442): to_iso8601 over a synthesized
    * millisecond-precision timestamp, both from_iso8601 parses proven by
    * round trip, duration strings in three units. */
  def isoDuration(s: SparkSession, dir: String): DataFrame = {
    val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSS"
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .withColumn("ts2", timestamp_millis(
        unix_millis(col("o_orderdate").cast("timestamp")) +
          (col("o_orderkey") % 86400) * 1000 + col("o_orderkey") % 1000))
      .select(
        col("o_orderkey").as("k"),
        date_format(col("ts2"), IsoFmt).as("iso_ts"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_d"),
        (to_timestamp(date_format(col("ts2"), IsoFmt), IsoFmt) === col("ts2"))
          .as("rt_ts"),
        (to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
          === col("o_orderdate").cast("date")).as("rt_d"),
        (parseDurationMs(concat((col("o_orderkey") % 100).cast("string"),
          lit(".25 m"))).cast("double") / 1000.0).as("dur_m_secs"),
        (parseDurationMs(concat((col("o_orderkey") % 10).cast("string"),
          lit(" h"))).cast("double") / 1000.0).as("dur_h_secs"),
        (parseDurationMs(concat((col("o_orderkey") % 1000).cast("string"),
          lit(" ms"))).cast("double") / 1000.0).as("dur_ms_secs"))
      .orderBy("k")
  }

  /** to_base / from_base (reference MathFunctions.java:1599-1618) — signed
    * Java Long radix semantics (Spark's conv is unsigned and error-silent);
    * oracle replays bases 2/16 via bin()/to_hex() and the base-36 round
    * trip by identity. */
  def baseConv(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(col("p_partkey").as("k"),
        expr("to_base(p_partkey, 16)").as("hex16"),
        expr("to_base(p_partkey, 2)").as("bin2"),
        expr("to_base(-p_partkey, 16)").as("neg16"),
        expr("from_base(to_base(p_partkey, 36), 36)").as("rt36"),
        expr("from_base('ff', 16)").as("const_ff"))
      .orderBy("k")
  }

  /** AT TIME ZONE family (reference at_timezone/with_timezone +
    * DesugarAtTimeZoneRewriter): from_utc_timestamp / to_utc_timestamp
    * over fixed-offset zones — the oracle replays them as pure interval
    * arithmetic, so the gate is independent of any tz database; IANA-zone
    * DST behavior is JDK-backed and exercised in FunctionsSpec. */
  def timezone(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .withColumn("ts2", timestamp_millis(
        unix_millis(col("o_orderdate").cast("timestamp")) +
          (col("o_orderkey") % 86400) * 1000))
      .select(
        col("o_orderkey").as("k"),
        date_format(from_utc_timestamp(col("ts2"), "+05:30"),
          "yyyy-MM-dd HH:mm:ss").as("kolkata_wall"),
        date_format(from_utc_timestamp(col("ts2"), "-05:00"),
          "yyyy-MM-dd HH:mm:ss").as("ny_fixed_wall"),
        hour(from_utc_timestamp(col("ts2"), "+05:30")).cast("long")
          .as("kolkata_hour"),
        (to_utc_timestamp(from_utc_timestamp(col("ts2"), "+05:30"), "+05:30")
          === col("ts2")).as("rt_ok"))
      .orderBy("k")

  /** to_utf8 / from_utf8 / crc32 / xxhash64 (reference VarbinaryFunctions):
    * binary↔string conversions round-tripped on real text; crc32/xxhash64
    * are engine-checkable constants (known-answer spec in FunctionsSpec),
    * here proven stable across the encode/decode trip. */
  def conv(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey").as("k"),
        upper(hex(encode(col("p_name"), "UTF-8"))).as("hex_utf8"),
        decode(encode(col("p_name"), "UTF-8"), "UTF-8").as("roundtrip"),
        length(encode(col("p_name"), "UTF-8")).cast("long").as("n_bytes"),
        (crc32(encode(col("p_name"), "UTF-8")) ===
          crc32(encode(decode(encode(col("p_name"), "UTF-8"), "UTF-8"), "UTF-8")))
          .as("crc_stable"),
        (xxhash64(col("p_name")) === xxhash64(col("p_name"))).as("xx_stable"))
      .orderBy("k")

  /** split_to_map / split_to_multimap (reference SplitToMapFunction.java /
    * SplitToMultimapFunction.java) — str_to_map with Spark's EXCEPTION
    * dedup policy matches the reference's duplicate-key error; the
    * multimap variant groups duplicate keys in encounter order. Output is
    * exploded to scalar rows for the oracle. */
  /** split_to_multimap(text, entryDelim, kvDelim) → map<string,
    * array<string>>: duplicate keys collect their values in encounter
    * order (reference MapToMapCast-free SplitToMultimapFunction). Pure
    * per-row HOF composition — no shuffle, fully codegen. */
  def splitToMultimap(text: Column, entryDelim: String, kvDelim: String): Column = {
    val entries = split(text, java.util.regex.Pattern.quote(entryDelim))
    val kvs = transform(entries, e =>
      struct(split(e, java.util.regex.Pattern.quote(kvDelim)).getItem(0).as("k"),
        split(e, java.util.regex.Pattern.quote(kvDelim)).getItem(1).as("v")))
    val keys = array_distinct(transform(kvs, _.getField("k")))
    map_from_arrays(keys,
      transform(keys, k =>
        transform(filter(kvs, kv => kv.getField("k") === k), _.getField("v"))))
  }

  def splitMap(s: SparkSession, dir: String): DataFrame = {
    val text = concat(
      lit("brand="), col("p_brand"), lit(";type="), col("p_type"),
      lit(";size="), col("p_size").cast("string"),
      lit(";grp="), (col("p_partkey") % 3).cast("string"))
    // duplicate 'w' keys: every word of p_type, in order
    val mmText = concat(
      lit("w="), concat_ws(";w=", split(col("p_type"), " ")),
      lit(";size="), col("p_size").cast("string"))
    t(s, dir, "part").filter(col("p_partkey") <= 100)
      .select(col("p_partkey").as("k"),
        str_to_map(text, lit(";"), lit("=")).as("m"),
        splitToMultimap(mmText, ";", "=").as("mm"))
      .select(col("k"), explode(col("m")).as(Seq("key", "value")),
        array_join(map_values(col("mm")).getItem(0), "|").as("w_vals"),
        size(map_values(col("mm")).getItem(0)).cast("long").as("n_w"))
      .orderBy("k", "key")
  }

  /** Polygon slice of the geospatial surface (reference GeoFunctions.java
    * ST_Polygon:226, ST_Contains, ST_Area, ST_Centroid, ST_NumPoints):
    * convex k-gons (k = 3..7) are synthesized from customer keys using a
    * fixed CCW vertex table of dyadic rationals (halves/eighths), so every
    * coordinate, shoelace product and centroid quotient is EXACT in binary
    * floating point — the oracle recomputing the identical arithmetic in
    * SQL lands on bit-identical doubles regardless of libm or summation
    * order (r4 fix: the previous cos/sin vertices differed by 1 ulp
    * between JVM and DuckDB libm, flipping ROUND(,4) digits). The WKT
    * parse path keeps its own coverage in PolygonSpec. The inside probe
    * (cx + 5/16·r, cy + 35/64·r) is the convex combination
    * 3/8·v0 + 1/4·v1 + 3/8·v2, strictly interior for every n ≥ 3. */
  def geoPoly(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (lit(3) + col("c_custkey") % 5).cast("int").as("n"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"),
        (lit(1.0) + col("c_custkey") % 3).as("r"))
    val dxs = org.apache.spark.sql.functions.array(
      Seq(1.0, 0.5, -0.5, -1.0, -0.75, 0.0, 0.75).map(lit): _*)
    val dys = org.apache.spark.sql.functions.array(
      Seq(0.0, 0.875, 0.875, 0.0, -0.625, -1.0, -0.625).map(lit): _*)
    val ring = transform(sequence(lit(0), col("n") - 1), i =>
      struct(
        (col("cx") + col("r") * element_at(dxs, i + 1)).as("x"),
        (col("cy") + col("r") * element_at(dys, i + 1)).as("y")))
    val pIn = stPoint(col("cx") + lit(0.3125) * col("r"),
      col("cy") + lit(0.546875) * col("r"))
    val pOut = stPoint(col("cx") + col("r") + 1.5, col("cy"))
    g.select(col("k"),
      stNumPoints(ring).as("n_points"),
      round(stArea(ring), 4).as("area"),
      round(stPerimeter(ring), 4).as("perimeter"),
      round(stX(stCentroid(ring)), 4).as("cent_x"),
      round(stY(stCentroid(ring)), 4).as("cent_y"),
      stContainsPoint(ring, pIn).as("inside"),
      stContainsPoint(ring, pOut).as("outside"))
      .orderBy("k")
  }

  /** Linestring slice of the geospatial surface (reference GeoFunctions.java
    * ST_LineFromText/ST_Length/ST_StartPoint/ST_EndPoint/ST_PointN/
    * ST_Envelope/ST_Intersects): paths are synthesized from dyadic offsets
    * with 3-4-5-scaled diagonals, so every segment length, envelope bound
    * and intersection orientation test is exact in binary floating point —
    * the oracle replays the closed forms. The vertical probe line lands on
    * a crossing (k%4=0), an exact endpoint touch (k%4=1, exercising the
    * collinear d=0 path), or a miss (k%4 in 2,3). */
  def geoLine(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"),
        (lit(0.5) + (col("c_custkey") % 3) * 0.5).as("m"),
        (lit(0.5) + col("c_custkey") % 4).as("xoff"))
    val lineA = org.apache.spark.sql.functions.array(
      stPoint(col("cx"), col("cy")),
      stPoint(col("cx") + 1.5, col("cy")),
      stPoint(col("cx") + 2.25, col("cy") + 1.0),
      stPoint(col("cx") + 2.25, col("cy") + 1.0 + col("m")))
    val lineB = org.apache.spark.sql.functions.array(
      stPoint(col("cx") + col("xoff"), col("cy") - 3.0),
      stPoint(col("cx") + col("xoff"), col("cy") + 3.0))
    val wkt = concat(lit("LINESTRING("),
      array_join(transform(lineA, p =>
        concat(p.getField("x").cast("string"), lit(" "),
          p.getField("y").cast("string"))), ", "),
      lit(")"))
    val env = stEnvelope(lineA)
    val uenv = stEnvelopeUnion(lineA, lineB)
    g.select(col("k"),
      stNumPoints(lineA).as("n_points"),
      round(stLineLength(lineA), 4).as("len"),
      stX(stStartPoint(lineA)).as("sx"),
      stY(stEndPoint(lineA)).as("ey"),
      stX(stPointN(lineA, lit(2))).as("p2x"),
      env.getField("xmax").as("xmax"),
      env.getField("ymax").as("ymax"),
      uenv.getField("ymin").as("u_ymin"),
      uenv.getField("xmax").as("u_xmax"),
      stLineIntersects(lineA, lineB).as("crosses"),
      (stLineWkt(wkt) === lineA).as("wkt_rt"))
      .orderBy("k")
  }

  def conditional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(
        col("o_orderkey").as("k"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        expr("TRY_CAST(o_orderpriority AS INT)").as("bad_cast"),
        try_divide(col("o_totalprice"), col("o_orderkey") % 2).as("try_div"),
        (col("o_orderkey") % 2 === 0).as("is_even"),
        coalesce(nullif(col("o_orderkey") % 3, lit(0)), lit(-1L)).as("nvl3"))
      .orderBy("k")

  def regex(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey").as("k"),
        col("p_type").rlike("^STANDARD").as("is_std"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        expr("CAST(regexp_count(p_name, 'a') AS BIGINT)").as("n_a"),
        expr("CAST(size(regexp_extract_all(p_name, '[a-z]+', 0)) AS BIGINT)")
          .as("n_words"),
        array_join(split(col("p_type"), " "), ",").as("type_words"))
      .orderBy("k")

  /** Custom vector expressions (codegen'd primitive loops) verified against
    * the oracle's double-precision arithmetic. */
  def vector(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(GraftFunctions.dotProduct(col("a.embedding"), col("b.embedding")), 4)
          .as("dot"),
        round(GraftFunctions.l2Squared(col("a.embedding"), col("b.embedding")), 4)
          .as("l2sq"),
        round(GraftFunctions.cosineSimilarity(col("a.embedding"), col("b.embedding")), 4)
          .as("cos"))
      .orderBy("va", "vb")
  }

  /** Advanced array operators the reference defines beyond Spark's built-ins
    * (SURVEY §2.5: array_cum_sum, array_normalize, array_sort_by custom;
    * ngrams ArrayNgramsFunction.java) — all composed from higher-order
    * functions, arrays emitted as joined strings for the gate. */
  def arrayAdv(s: SparkSession, dir: String): DataFrame = {
    def j(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      array_join(transform(c, x => x.cast("string")), ",")
    t(s, dir, "part").filter(col("p_partkey") <= 100)
      .withColumn("arr", sequence(lit(1L), (col("p_size") % 4 + 2).cast("long")))
      .withColumn("words", split(col("p_type"), " "))
      .select(
        col("p_partkey").as("k"),
        // array_cum_sum: prefix sums via slice+aggregate per position
        j(transform(col("arr"), (_, i) =>
          aggregate(slice(col("arr"), lit(1), i + 1), lit(0L), (a, x) => a + x)))
          .as("cum_sum"),
        // array_normalize(x, 1): divide by the L1 norm
        j(transform(col("arr"), x =>
          round(x / aggregate(col("arr"), lit(0L), (a, v) => a + v), 4)))
          .as("normalized"),
        // array_sort_by(x, f): sort by a derived key (here: descending value)
        j(transform(sort_array(transform(col("arr"), x => struct((-x).as("key"),
          x.as("v"))) ), e => e.getField("v"))).as("sorted_desc"),
        // ngrams(words, 2): joined bigrams
        array_join(transform(
          sequence(lit(1), greatest(size(col("words")) - 1, lit(1))),
          i => concat_ws(" ", try_element_at(col("words"), i),
            try_element_at(col("words"), i + 1))), "|").as("bigrams"),
        // array_position / element_at family over derived data
        array_position(col("arr"), 3L).cast("long").as("pos3"),
        j(array_remove(col("arr"), 2L)).as("without2"),
        j(array_repeat(element_at(col("arr"), 1), 3)).as("rep3"),
        j(zip_with(col("arr"), reverse(col("arr")), (a, b) => a + b)).as("zip_sum"))
      .orderBy("k")
  }

  /** SQL-invoked array helpers (ArraySqlFunctions.java,
    * ArrayCombinationsFunction.java via ArrayMapExtras): average, chunks,
    * frequency, duplicates, least-frequent, max/min_by, sort_desc,
    * remove_nulls, top_n, transpose, combinations. Arrays are stringified
    * null-safely so the row comparator can hash them. */
  def arrayAdv2(s: SparkSession, dir: String): DataFrame = {
    val X = graft.functions.ArrayMapExtras
    def el(c: org.apache.spark.sql.Column) =
      coalesce(c.cast("string"), lit("null"))
    def j(c: org.apache.spark.sql.Column) =
      array_join(transform(c, x => el(x)), ",")
    def j2(c: org.apache.spark.sql.Column) = array_join(
      transform(c, inner => concat(lit("["), j(inner), lit("]"))), ";")
    t(s, dir, "part").filter(col("p_partkey") <= 100)
      .withColumn("arr", F.array(
        (col("p_size") % 5).cast("long"), (col("p_size") % 3).cast("long"),
        (col("p_size") % 5).cast("long"), lit(7L),
        when(col("p_size") % 4 === 0, lit(null).cast("long"))
          .otherwise((col("p_size") % 7).cast("long"))))
      .withColumn("mat", F.array(
        F.array(lit(1L), (col("p_size") % 3).cast("long")),
        F.array((col("p_size") % 5).cast("long"), lit(4L))))
      .select(
        col("p_partkey").as("k"),
        round(X.arrayAverage(col("arr")), 6).as("avg_a"),
        j2(X.arraySplitIntoChunks(col("arr"), 2)).as("chunks"),
        array_join(array_sort(transform(map_entries(X.arrayFrequency(col("arr"))),
          e => concat(e.getField("key").cast("string"), lit(":"),
            e.getField("value").cast("string")))), ",").as("freq"),
        array_join(array_sort(transform(X.arrayDuplicates(col("arr")), x => el(x))), ",")
          .as("dups"),
        X.arrayHasDuplicates(col("arr")).as("has_dups"),
        j(X.arrayLeastFrequent(col("arr"), 2)).as("least2"),
        X.arrayMaxBy(col("arr"), x => -x).as("maxby_neg"),
        X.arrayMinBy(col("arr"), x => -x).as("minby_neg"),
        j(X.arraySortDesc(col("arr"))).as("sort_desc"),
        j(X.removeNulls(col("arr"))).as("nonulls"),
        j(X.arrayTopN(col("arr"), 3)).as("top3"),
        j2(X.arrayTranspose(col("mat"))).as("transp"),
        j2(X.combinations(col("arr"), 2)).as("comb2"))
      .orderBy("k")
  }

  /** SQL-invoked map helpers (MapSqlFunctions.java, MapNormalizeFunction
    * .java, MapSubsetFunction.java via ArrayMapExtras). Map outputs are
    * stringified as key-sorted entry lists; normalized values emitted as
    * numeric columns to avoid double-formatting drift. */
  def mapAdv(s: SparkSession, dir: String): DataFrame = {
    val X = graft.functions.ArrayMapExtras
    def entStr(m: org.apache.spark.sql.Column) =
      array_join(transform(array_sort(map_entries(m)),
        e => concat(e.getField("key"), lit(":"),
          coalesce(e.getField("value").cast("long").cast("string"), lit("null")))),
        ",")
    t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
      .withColumn("m", map_from_arrays(
        F.array(lit("p"), lit("q"), lit("r"), lit("s")),
        F.array((col("s_suppkey") % 100).cast("double"),
          (col("s_suppkey") % 7).cast("double"),
          when(col("s_suppkey") % 3 === 0, lit(null).cast("double"))
            .otherwise(col("s_nationkey").cast("double")),
          lit(5.0))))
      .select(
        col("s_suppkey").as("k"),
        entStr(X.mapTopN(col("m"), 2)).as("topn2"),
        array_join(X.mapTopNKeys(col("m"), 2), ",").as("topk2"),
        array_join(transform(X.mapTopNValues(col("m"), 2),
          v => coalesce(v.cast("long").cast("string"), lit("null"))), ",")
          .as("topv2"),
        array_join(array_sort(X.mapKeysByTopNValues(col("m"), 2)), ",")
          .as("keysbyv"),
        X.mapKeyExists(col("m"), lit("q")).as("kexists"),
        entStr(X.mapRemoveNullValues(col("m"))).as("nonull"),
        round(element_at(X.mapNormalize(col("m")), "p"), 6).as("norm_p"),
        round(element_at(X.mapNormalize(col("m")), "q"), 6).as("norm_q"),
        round(element_at(X.mapNormalize(col("m")), "s"), 6).as("norm_s"),
        entStr(X.mapSubset(col("m"), F.array(lit("p"), lit("r")))).as("subset"),
        X.allKeysMatch(col("m"), k => length(k) === 1).as("allk"),
        X.anyKeysMatch(col("m"), k => k === "q").as("anyk"),
        X.noKeysMatch(col("m"), k => k === "z").as("nok"),
        X.anyValuesMatch(col("m"), v => v >= 0.0).as("anyv"))
      .orderBy("k")
  }

  /** Int-key map↔array converters + key_sampling_percent (reference
    * presto-sql-helpers MapSqlFunctions.java:171,186 +
    * SimpleSamplingPercent.java:25). Array/map round-trips are closed
    * forms per key class; the sampling percent is oracle-checked by its
    * contract (stable, in [0, 1)) since DuckDB has no xxhash64. */
  def mapAdv2(s: SparkSession, dir: String): DataFrame = {
    val X = graft.functions.ArrayMapExtras
    val g = t(s, dir, "supplier").filter(col("s_suppkey") <= 100)
      .select(col("s_suppkey").as("k"), (col("s_suppkey") % 3).as("m3"),
        concat(lit("v"), (col("s_suppkey") % 5).cast("string")).as("v"))
    val intMap = map_from_arrays(
      F.array(lit(1), (col("m3") + 2).cast("int")),
      F.array(col("v"), lit("w")))
    val arr = F.array(lit("x"), lit(null).cast("string"), lit("y"))
    val a2m = X.arrayToMapIntKeys(arr)
    val ksp = X.keySamplingPercent(col("v"))
    g.select(col("k"),
      array_join(X.mapIntKeysToArray(intMap), ",", "null").as("intarr"),
      array_join(transform(array_sort(map_entries(a2m)),
        e => concat(e.getField("key").cast("string"), lit(":"),
          e.getField("value"))), ",").as("a2m"),
      (ksp >= 0.0 && ksp < 1.0).as("ksp_range"),
      (ksp === X.keySamplingPercent(col("v"))).as("ksp_stable"),
      // same key class → same bucket everywhere (the sampling contract)
      (abs(ksp * 100 - floor(ksp * 100)) < 1e-9).as("ksp_centile"))
      .orderBy("k")
  }

  /** Color/presentation functions (ColorFunctions.java): named + #rgb
    * shorthand colors, packed rgb, single-color bars and renders — the
    * oracle rebuilds the exact ANSI escape strings from the documented
    * 6×6×6-cube mapping. HSB interpolation is covered in ColorSpec. */
  def colorFns(s: SparkSession, dir: String): DataFrame = {
    val C = graft.functions.Colors
    val names = F.array(Seq("red", "green", "blue", "cyan", "black").map(lit): _*)
    val hexes = F.array(Seq("#f00", "#0f0", "#00f", "#fff", "#123").map(lit): _*)
    t(s, dir, "region").select(col("r_regionkey").cast("int").as("k"))
      .select(
        col("k"),
        C.color(element_at(names, col("k") + 1)).as("named"),
        C.color(element_at(hexes, col("k") + 1)).as("hexv"),
        C.rgb(col("k") * 50, col("k") * 30, col("k") * 20).as("rgbv"),
        C.bar(col("k") / 4.0, lit(8L), C.rgb(lit(255), lit(0), lit(0)),
          C.rgb(lit(255), lit(0), lit(0))).as("bars"),
        C.render(concat(lit("v"), col("k").cast("string")),
          C.rgb(lit(0), lit(255), lit(0))).as("rendered"),
        C.renderBool(col("k") % 2 === 0).as("rendered_b"))
      .orderBy("k")
  }

  /** SQL-invoked string helpers (StringSqlFunctions.java): replace_first,
    * trail, split_part_reverse. */
  def stringSql(s: SparkSession, dir: String): DataFrame = {
    val X = graft.functions.StringExtras
    t(s, dir, "part").filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey").as("k"),
        X.replaceFirst(col("p_name"), lit("a"), lit("XY")).as("rf"),
        X.trail(col("p_name"), lit(5)).as("tr5"),
        X.splitPartReverse(col("p_type"), " ", lit(-1)).as("sp_last"),
        X.splitPartReverse(col("p_type"), " ", lit(1)).as("sp_first"))
      .orderBy("k")
  }

  /** SQL-NAME registration of the remaining presto-sql-helpers
    * (ArraySqlFunctions.java array_max_by/array_min_by,
    * ArrayIntersectFunction.java n-ary array_intersect,
    * StringSqlFunctions.java replace_first/trail/split_part_reverse):
    * the kernels were already Column-API-gated (fn_string_sql,
    * fn_map_adv); this gate drives the NAMES through SQL text, user
    * lambdas included. */
  def helpersSql(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_hlp")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT p_partkey AS k, p_name, p_type,
        |    array(p_partkey, p_partkey % 7, p_partkey % 13) AS arr
        |  FROM part_hlp WHERE p_partkey <= 200)
        |SELECT k,
        |  array_max_by(arr, x -> -x) AS maxby,
        |  array_min_by(arr, x -> x % 5) AS minby,
        |  array_join(array_intersect(array(arr, array(k, k % 7))), ',')
        |    AS nary,
        |  array_join(array_intersect(arr, array(k % 7)), ',') AS pairwise,
        |  replace_first(p_name, 'a', 'XY') AS rf,
        |  trail(p_name, 4) AS tr,
        |  split_part_reverse(p_type, ' ', -1) AS sp
        |FROM b ORDER BY k""".stripMargin)
  }

  /** Parity batch 3 — the r9 full-name sweep against the reference's
    * @ScalarFunction registry, every remaining unregistered name through
    * SQL text (BitwiseFunctions.java 3-arg shift family, StringFunctions
    * levenshtein_distance/normalize, VarbinaryFunctions sha256/sha512/
    * spooky_hash_v2_*, ArrayCumSum.java null-poisoned prefix sums,
    * ArrayNormalizeFunction.java, UrlFunctions url_extract_* incl. port,
    * MySQL date_parse, HyperLogLogFunctions empty_approx_set,
    * MathFunctions infinity/is_finite/is_infinite/inverse_binomial_cdf,
    * WilsonInterval names). Constants pin the vectors DuckDB can't
    * recompute (spooky, sha512, the binomial inversion). */
  def parity3(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_p3")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(o_orderkey % 1000 AS BIGINT) AS x,
        |    CAST(o_orderkey % 37 AS BIGINT) AS y,
        |    CAST(o_orderkey % 5 + 1 AS INT) AS s
        |  FROM orders_p3 WHERE o_orderkey <= 400)
        |SELECT k,
        |  bitwise_and(x, y) AS band, bitwise_or(x, y) AS bor,
        |  bitwise_xor(x, y) AS bxor, bitwise_not(x) AS bnot,
        |  bitwise_shift_left(x, s, 64) AS bsl,
        |  bitwise_shift_left(x, 2, 8) AS bsl8,
        |  bitwise_logical_shift_right(x, 1, 8) AS blsr,
        |  bitwise_arithmetic_shift_right(0 - x, 2) AS basr,
        |  CAST(bitwise_left_shift(CAST(x % 200 - 100 AS TINYINT), s)
        |    AS BIGINT) AS tshl,
        |  CAST(bitwise_left_shift(CAST(x AS INT), 33) AS BIGINT) AS ishl33,
        |  bitwise_left_shift(x, 64) AS bshl64,
        |  CAST(bitwise_right_shift(CAST(x % 100 - 100 AS TINYINT), 1)
        |    AS BIGINT) AS trsl,
        |  CAST(bitwise_right_shift_arithmetic(CAST(0 - x - 1 AS SMALLINT),
        |    70) AS BIGINT) AS srsa70,
        |  levenshtein_distance(CAST(x AS STRING), CAST(y AS STRING)) AS lev,
        |  lower(hex(sha256(to_utf8(CAST(k AS STRING))))) AS h256,
        |  lower(hex(sha512(to_utf8('abc')))) AS h512,
        |  lower(hex(spooky_hash_v2_32(to_utf8('hello')))) AS sp32,
        |  lower(hex(spooky_hash_v2_64(to_utf8('hello')))) AS sp64,
        |  array_join(array_cum_sum(array(x, y, x + 1)), ',') AS cs,
        |  array_join(array_cum_sum(array(x,
        |    CASE WHEN k % 4 = 0 THEN NULL ELSE y END, x)), ',', 'null')
        |    AS csn,
        |  round(element_at(array_normalize(array(CAST(x AS DOUBLE),
        |    CAST(y AS DOUBLE), CAST(2 AS DOUBLE)), CAST(2 AS DOUBLE)), 1),
        |    4) AS nrm1,
        |  round(element_at(array_normalize(array(CAST(x AS DOUBLE),
        |    CAST(y AS DOUBLE), CAST(2 AS DOUBLE)), CAST(2 AS DOUBLE)), 2),
        |    4) AS nrm2,
        |  round(element_at(array_normalize(array(CAST(x AS DOUBLE),
        |    CAST(y AS DOUBLE), CAST(2 AS DOUBLE)), CAST(2 AS DOUBLE)), 3),
        |    4) AS nrm3,
        |  normalize(decode(unhex('65CC81'), 'UTF-8')) AS nfc,
        |  CAST(length(normalize('é', 'NFD')) AS BIGINT) AS nfd_len,
        |  round(wilson_interval_lower(x % 51, 50 + x % 25, 1.96), 4) AS wl,
        |  round(wilson_interval_upper(x % 51, 50 + x % 25, 1.96), 4) AS wu,
        |  url_extract_host(concat('http://example.com:8080/p/',
        |    CAST(k AS STRING), '?q=', CAST(x AS STRING), '#f')) AS uhost,
        |  url_extract_port(concat('http://example.com:8080/p/',
        |    CAST(k AS STRING), '?q=', CAST(x AS STRING), '#f')) AS uport,
        |  url_extract_path(concat('http://example.com:8080/p/',
        |    CAST(k AS STRING), '?q=', CAST(x AS STRING), '#f')) AS upath,
        |  url_extract_parameter(concat('http://example.com:8080/p/',
        |    CAST(k AS STRING), '?q=', CAST(x AS STRING), '#f'), 'q') AS uparam,
        |  url_extract_fragment(concat('http://example.com:8080/p/',
        |    CAST(k AS STRING), '?q=', CAST(x AS STRING), '#f')) AS ufrag,
        |  CAST(date_parse('2021-06-15 12:30:45',
        |    '%Y-%m-%d %H:%i:%s') AS DATE) AS dp,
        |  hll_cardinality(empty_approx_set()) AS hll0,
        |  is_finite(CAST(x AS DOUBLE)) AS fin,
        |  is_infinite(CAST('-Infinity' AS DOUBLE)) AS inf1,
        |  infinity() > CAST(1e308 AS DOUBLE) AS inf_big,
        |  inverse_binomial_cdf(10, CAST(0.5 AS DOUBLE),
        |    CAST(0.25 AS DOUBLE)) AS ib1,
        |  inverse_binomial_cdf(10, CAST(0.5 AS DOUBLE),
        |    CAST(0.5 AS DOUBLE)) AS ib2,
        |  inverse_binomial_cdf(10, CAST(0.5 AS DOUBLE),
        |    CAST(0.9 AS DOUBLE)) AS ib3
        |FROM b ORDER BY k""".stripMargin)
  }

  /** json_presto_query_plan_* (reference
    * JsonPrestoQueryPlanFunctions.java) over a fixed JsonRenderedNode
    * document: ids walk, per-node children (missing id → NULL), the
    * structure-preserving scrub (id→PLANID, identifier→tableName=<c> or
    * IDENTIFIER, details→DETAILS, Aggregate names collapsed), malformed
    * input → NULL. EXPLAIN (FORMAT JSON) emits this shape (DdlSpec
    * round-trips a real plan). */
  def planJsonFns(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_pj")
    val doc = """{"0":{"plan":{"id":"7","name":"Output","identifier":""" +
      """"[col]","details":"d","children":[{"id":"12","name":""" +
      """"Aggregate(FINAL)[group]","identifier":"[x]","details":"dd",""" +
      """"children":[{"id":"33","name":"TableScan","identifier":""" +
      """"[table = tpch:tableName=lineitem]","details":"ddd",""" +
      """"children":[]}]}]}}}"""
    graft.api.SqlSession.wrap(s).sql(
      s"""WITH b AS (SELECT o_orderkey AS k FROM orders_pj
         |           WHERE o_orderkey <= 100),
         |p AS (SELECT k, '$doc' AS pj FROM b)
         |SELECT k,
         |  array_join(array_sort(json_presto_query_plan_ids(pj)), '|')
         |    AS ids,
         |  array_join(json_presto_query_plan_node_children(pj, '12'), '|')
         |    AS ch12,
         |  array_join(json_presto_query_plan_node_children(pj, '33'), '|')
         |    AS ch33,
         |  json_presto_query_plan_node_children(pj, 'nope') IS NULL
         |    AS ch_missing,
         |  json_presto_query_plan_scrub(pj) AS scrubbed,
         |  json_presto_query_plan_ids('not json') IS NULL AS bad_null
         |FROM p ORDER BY k""".stripMargin)
  }

  /** Wilson score interval (reference WilsonInterval.java:
    * wilson_interval_lower/upper) — closed-form, oracle-checkable. */
  def wilson(s: SparkSession, dir: String): DataFrame = {
    val z = lit(1.96)
    t(s, dir, "customer").filter(col("c_custkey") <= 300)
      .withColumn("successes", (col("c_custkey") % 51).cast("double"))
      .withColumn("trials", lit(50.0) + (col("c_custkey") % 25).cast("double"))
      .withColumn("p", col("successes") / col("trials"))
      .withColumn("center", (col("p") + z * z / (lit(2) * col("trials"))) /
        (lit(1) + z * z / col("trials")))
      .withColumn("margin", z * sqrt(col("p") * (lit(1) - col("p")) / col("trials") +
        z * z / (lit(4) * col("trials") * col("trials"))) /
        (lit(1) + z * z / col("trials")))
      .select(
        col("c_custkey").as("k"),
        col("successes"), col("trials"),
        round(col("center") - col("margin"), 4).as("wilson_lower"),
        round(col("center") + col("margin"), 4).as("wilson_upper"))
      .orderBy("k")
  }

  /** IP address functions (reference ipaddress/ipprefix types,
    * IpPrefixFunctions.java — phase-1 slice over dotted-quad strings:
    * to/from numeric form, prefix extraction, CIDR containment; the
    * dedicated type is a documented phase-2 UDT like geometry). */
  def ip(s: SparkSession, dir: String): DataFrame = {
    def oct(c: org.apache.spark.sql.Column, i: Int) =
      element_at(split(c, "\\."), i).cast("long")
    t(s, dir, "customer").filter(col("c_custkey") <= 300)
      .withColumn("ip", concat_ws(".",
        lit(10), (col("c_custkey") % 256).cast("int"),
        ((col("c_custkey") * 7) % 256).cast("int"),
        (col("c_nationkey") % 256).cast("int")))
      .withColumn("ip_num",
        oct(col("ip"), 1) * 16777216L + oct(col("ip"), 2) * 65536L +
          oct(col("ip"), 3) * 256L + oct(col("ip"), 4))
      .select(
        col("c_custkey").as("k"),
        col("ip"),
        col("ip_num"),
        concat_ws(".", oct(col("ip"), 1), oct(col("ip"), 2), oct(col("ip"), 3),
          lit(0)).as("slash24"),
        (shiftright(col("ip_num"), 16) === (10L * 256 + 64)).as("in_10_64_16"),
        (shiftright(col("ip_num"), 13) ===
          ((10L * 16777216 + 64L * 65536) >> 13)).as("in_10_64_13"),
        pmod(col("ip_num"), lit(97)).as("shard"))
      .orderBy("k")
  }

  /** Geometry casts (GeoFunctions.java ST_GeometryFromText / ST_AsText /
    * ST_GeometryType): WKT round trip through the tagged geometry struct
    * for points, linestrings and polygons. Dyadic coordinates make the
    * double↔string formatting identical across engines; the oracle
    * constructs the expected WKT textually. */
  def geoCast(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val x = (col("c_custkey") % 80).cast("double") + 0.5
    val y = (col("c_custkey") * 7 % 80).cast("double") + 0.25
    def ts(c: org.apache.spark.sql.Column) = c.cast("string")
    val base = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .withColumn("pt_wkt", concat(lit("POINT ("), ts(x), lit(" "), ts(y), lit(")")))
      .withColumn("ln_wkt", concat(lit("LINESTRING ("), ts(x), lit(" "), ts(y),
        lit(", "), ts(x + 4.0), lit(" "), ts(y + 2.0), lit(")")))
      .withColumn("pg_wkt", concat(lit("POLYGON (("),
        ts(x + 1.0), lit(" "), ts(y), lit(", "), ts(x), lit(" "), ts(y + 1.0),
        lit(", "), ts(x - 1.0), lit(" "), ts(y), lit(", "), ts(x), lit(" "),
        ts(y - 1.0), lit(", "), ts(x + 1.0), lit(" "), ts(y), lit("))")))
    base.select(
      col("c_custkey").as("k"),
      stAsText(stGeometryFromText(col("pt_wkt"))).as("pt_rt"),
      stGeometryType(stGeometryFromText(col("pt_wkt"))).as("pt_t"),
      stAsText(stGeometryFromText(col("ln_wkt"))).as("ln_rt"),
      stGeometryType(stGeometryFromText(col("ln_wkt"))).as("ln_t"),
      stAsText(stGeometryFromText(col("pg_wkt"))).as("pg_rt"),
      stGeometryType(stGeometryFromText(col("pg_wkt"))).as("pg_t"))
      .orderBy("k")
  }

  /** Reference datetime surface phase-3 (DateTimeFunctions.java:
    * date_add(unit, n, ts) / date_diff(unit, a, b) interval arithmetic,
    * ISO day_of_week/day_of_year, from_iso8601_date, parse_datetime /
    * format_datetime Joda-style patterns, millisecond, printf-style
    * format). Exercised as SQL text; DuckDB replays with its own interval
    * arithmetic, isodow, strftime and printf. */
  def datetime3(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_dt3")
    graft.api.SqlSession.wrap(s).sql(
      """SELECT o_orderkey AS k,
        | cast(date_add('day', cast(o_orderkey % 20 AS INT), o_orderdate) AS DATE)
        |   AS plus_days,
        | cast(date_add('month', 2, o_orderdate) AS DATE) AS plus_months,
        | date_diff('day', o_orderdate, DATE '1998-01-01') AS days_to98,
        | day_of_week(o_orderdate) AS dow_iso,
        | cast(day_of_year(o_orderdate) AS BIGINT) AS doy,
        | from_iso8601_date('1995-06-15') AS iso_d,
        | cast(parse_datetime('1995/06/15 10:30', 'yyyy/MM/dd HH:mm') AS STRING)
        |   AS parsed,
        | format_datetime(cast(o_orderdate AS TIMESTAMP), 'yyyy-MM-dd HH:mm:ss')
        |   AS fmted,
        | millisecond(timestamp_millis(o_orderkey * 1234567)) AS ms,
        | format('%d|%s', o_orderkey, o_orderpriority) AS fmt
        |FROM orders_dt3 WHERE o_orderkey <= 2000 ORDER BY k""".stripMargin)
  }

  /** IP prefix functions phase-2 (IpPrefixFunctions.java:55): subnet
    * min/max/range, containment, RFC-range privacy, prefix collapse and
    * subnet expansion, all over key-derived IPv4 strings. The oracle
    * replays the bit arithmetic with integer math; collapse/subnets are
    * exercised on fixed prefixes so DuckDB can enumerate the expected
    * CIDR lists literally. */
  def ip2(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("cust_ip2")
    graft.api.SqlSession.wrap(s).sql(
      """SELECT c_custkey AS k,
        | concat_ws('.', '10', cast(c_custkey % 200 AS STRING),
        |   cast((c_custkey * 7) % 256 AS STRING),
        |   cast(c_nationkey % 256 AS STRING)) AS ip,
        | ip_prefix(concat_ws('.', '10', cast(c_custkey % 200 AS STRING),
        |   cast((c_custkey * 7) % 256 AS STRING),
        |   cast(c_nationkey % 256 AS STRING)), 20) AS pfx20,
        | ip_subnet_min(concat_ws('.', '10', cast(c_custkey % 200 AS STRING),
        |   '0.0/16')) AS smin,
        | ip_subnet_max(concat_ws('.', '10', cast(c_custkey % 200 AS STRING),
        |   '0.0/16')) AS smax,
        | concat_ws('|', ip_subnet_range(concat_ws('.', '10',
        |   cast(c_custkey % 200 AS STRING), '0.0/24'))) AS srange,
        | is_subnet_of('10.0.0.0/9', concat_ws('.', '10',
        |   cast(c_custkey % 200 AS STRING),
        |   cast((c_custkey * 7) % 256 AS STRING),
        |   cast(c_nationkey % 256 AS STRING))) AS in_10_9,
        | is_subnet_of('10.64.0.0/10', concat_ws('.', '10',
        |   cast(c_custkey % 200 AS STRING), '0.0/16')) AS pfx_in_pfx,
        | is_private_ip(concat_ws('.', cast(100 + c_custkey % 100 AS STRING),
        |   cast(c_custkey % 128 AS STRING), '1.1')) AS priv,
        | concat_ws('|', ip_prefix_collapse(array(
        |   '192.168.0.0/24', '192.168.1.0/24', '10.0.0.0/8'))) AS collapsed,
        | concat_ws('|', ip_prefix_subnets('192.168.0.0/22', 24)) AS split24
        |FROM cust_ip2 WHERE c_custkey <= 300 ORDER BY k""".stripMargin)
  }

  /** Geospatial slice (reference GeoFunctions.java ST_* — phase-1 subset
    * over point structs; see functions/GeoFunctions.scala). Coordinates are
    * synthesized deterministically from customer keys. */
  def geo(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    t(s, dir, "customer").filter(col("c_custkey") <= 300)
      .withColumn("p", stPoint((col("c_custkey") % 360) - 180 + 0.5,
        (col("c_nationkey") * 7 % 180) - 90 + 0.5))
      .withColumn("q", stPoint(lit(10.0), lit(20.0)))
      .select(
        col("c_custkey").as("k"),
        stX(col("p")).as("x"),
        stY(col("p")).as("y"),
        round(stDistance(col("p"), col("q")), 4).as("dist"),
        round(stHaversineKm(col("p"), col("q")), 4).as("hav_km"),
        stWithinBBox(col("p"), -50, -45, 50, 45).as("in_bbox"),
        round(stArea(F.array(stPoint(lit(0.0), lit(0.0)),
          stPoint(stX(col("p")), lit(0.0)), col("p"))), 4).as("tri_area"),
        round(stBearing(col("q"), col("p")), 4).as("bearing"))
      .orderBy("k")
  }

  /** Mergeable HLL sketches — the store-a-sketch / merge-later lifecycle
    * on a single query, oracle-bounded (estimates within the published 5%
    * envelope per group and after the cross-group merge); HllSpec bounds
    * the error tighter and proves merge associativity. */
  def hllSketch(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
    val perLang = words
      .groupBy("lang")
      .agg(GraftFunctions.approxSet(col("w")).as("sketch"),
        countDistinct(col("w")).as("exact"))
    val perRows = perLang.select(
      col("lang"), col("exact"),
      (abs(GraftFunctions.hllCardinality(col("sketch")).cast("double") /
        col("exact") - 1) <= 0.05).as("ok"))
    // store→merge path: sketches re-aggregated across groups stay in bounds
    val mergedRow = perLang
      .agg(GraftFunctions.hllCardinality(
        GraftFunctions.mergeHll(col("sketch"))).as("mc"))
      .crossJoin(words.agg(countDistinct(col("w")).as("gexact")))
      .select(lit("__merged__").as("lang"), col("gexact").as("exact"),
        (abs(col("mc").cast("double") / col("gexact") - 1) <= 0.05).as("ok"))
    perRows.unionAll(mergedRow).orderBy("lang")
  }

  /** Mergeable quantile digests (reference qdigest lifecycle: build per
    * group → store → merge across groups → query quantiles). Sketch bytes
    * are engine-specific, so the gate asserts the bracket the oracle CAN
    * replay — the digest median sits inside the exact 40th..60th
    * percentile band, per group and after the cross-group merge; exact
    * medians ride along as hash anchors. QDigestSpec bounds the rank
    * error tighter. */
  def qdigestSketch(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val per = li
      .groupBy("l_linestatus")
      .agg(GraftFunctions.qdigestAgg(col("l_quantity")).as("sketch"),
        expr("round(percentile(l_quantity, 0.5), 4)").as("exact_median"),
        expr("percentile(l_quantity, 0.4)").as("p40"),
        expr("percentile(l_quantity, 0.6)").as("p60"))
    val perRows = per.select(col("l_linestatus"), col("exact_median"),
      GraftFunctions.valueAtQuantile(col("sketch"), lit(0.5))
        .between(col("p40"), col("p60")).as("ok"))
    val mergedRow = per
      .agg(GraftFunctions.valueAtQuantile(
        GraftFunctions.mergeQdigest(col("sketch")), lit(0.5)).as("m"))
      .crossJoin(li.agg(
        expr("round(percentile(l_quantity, 0.5), 4)").as("gmed"),
        expr("percentile(l_quantity, 0.4)").as("gp40"),
        expr("percentile(l_quantity, 0.6)").as("gp60")))
      .select(lit("__merged__").as("l_linestatus"),
        col("gmed").as("exact_median"),
        col("m").between(col("gp40"), col("gp60")).as("ok"))
    perRows.unionAll(mergedRow).orderBy("l_linestatus")
  }

  /** t-digest lifecycle (reference TDigestAggregationFunction.java:29 +
    * TDigestFunctions.java value_at_quantile / quantile_at_value /
    * trimmed_mean / merge_tdigest). Sketch bytes are engine-specific, so
    * the gate emits spec-bound booleans the oracle asserts: quantiles
    * within 2% relative error (k1 scale δ=100 gives ~0.5% rank error —
    * generous margin), rank roundtrip within 0.02 absolute, trimmed mean
    * inside the exact interquartile band, and group sketches merged into a
    * global one staying in bounds (the 1000-executor merge-tree path). */
  def tdigestSketch(s: SparkSession, dir: String): DataFrame = {
    val g = GraftFunctions
    val per = t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(g.tdigestAgg(col("l_extendedprice")).as("sk"),
        expr("percentile(l_extendedprice, 0.5)").as("ex50"),
        expr("percentile(l_extendedprice, 0.99)").as("ex99"),
        expr("percentile(l_extendedprice, 0.25)").as("ex25"),
        expr("percentile(l_extendedprice, 0.75)").as("ex75"))
    val checks = per.select(col("l_returnflag").as("k"),
      (abs(g.tdigestValueAtQuantile(col("sk"), lit(0.5)) - col("ex50"))
        / col("ex50") <= 0.02).as("median"),
      (abs(g.tdigestValueAtQuantile(col("sk"), lit(0.99)) - col("ex99"))
        / col("ex99") <= 0.02).as("p99"),
      (abs(g.quantileAtValue(col("sk"), col("ex50")) - 0.5) <= 0.02).as("rank"),
      g.trimmedMean(col("sk"), lit(0.25), lit(0.75))
        .between(col("ex25") * 0.98, col("ex75") * 1.02).as("tmean"))
      .selectExpr("k",
        "stack(4, 'median', median, 'p99', p99, 'rank', rank, 'tmean', tmean)" +
          " AS (metric, ok)")
    val merged = per
      .agg(g.mergeTdigest(col("sk")).as("sk"))
      .crossJoin(t(s, dir, "lineitem")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("gex50")))
      .select(lit("__merged__").as("k"), lit("median").as("metric"),
        (abs(g.tdigestValueAtQuantile(col("sk"), lit(0.5)) - col("gex50"))
          / col("gex50") <= 0.02).as("ok"))
    checks.unionAll(merged).orderBy("k", "metric")
  }

  /** KLL sketch lifecycle (reference KllSketchAggregationFunction /
    * KllSketchFunctions.java: kll_quantile returns RETAINED INPUT VALUES,
    * so below k=200 items the sketch is exactly percentile_disc — the
    * oracle checks those quantiles VALUE-FOR-VALUE (strongest possible
    * sketch verification), then bounds the compacted + merged regimes. */
  def kllSketch(s: SparkSession, dir: String): DataFrame = {
    val g = GraftFunctions
    // exact regime: per-nation supplier balances (few rows << k)
    val exact = t(s, dir, "supplier")
      .groupBy("s_nationkey")
      .agg(g.kllSketchAgg(col("s_acctbal")).as("sk"))
      .select(col("s_nationkey").cast("long").as("k"),
        explode(F.map(
          lit("q25"), g.kllQuantile(col("sk"), lit(0.25)),
          lit("q50"), g.kllQuantile(col("sk"), lit(0.5)),
          lit("q75"), g.kllQuantile(col("sk"), lit(0.75)))).as(Seq("metric", "v")))
    // compacted regime: lineitem prices (60k rows >> k) — rank error <= 5%
    val per = t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(g.kllSketchAgg(col("l_extendedprice")).as("sk"),
        expr("percentile(l_extendedprice, 0.5)").as("ex50"))
    // single row: 1.0 iff the 5% rank bound holds for EVERY returnflag group
    // (oracle emits one rank_bound row, not one per group — r03 row-count fix)
    val approx = per
      .select(when(abs(g.kllRank(col("sk"), col("ex50")) - 0.5) <= 0.05, 1.0d)
        .otherwise(0.0d).as("ok"))
      .agg(min(col("ok")).as("v"))
      .select(lit(-1L).as("k"), lit("rank_bound").as("metric"), col("v"))
    val mergedBound = per
      .agg(g.mergeKll(col("sk")).as("sk"))
      .crossJoin(t(s, dir, "lineitem")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("gex50")))
      .select(lit(-2L).as("k"), lit("merged_bound").as("metric"),
        when(abs(g.kllRank(col("sk"), col("gex50")) - 0.5) <= 0.05, 1.0d)
          .otherwise(0.0d).as("v"))
    exact.unionAll(approx).unionAll(mergedBound).orderBy("k", "metric")
  }

  /** Theta sketches: distinct-count sketches closed under set algebra
    * (reference ThetaSketchFunctions.java) — union/intersect/difference of
    * SKETCHES. Below k=4096 distinct values θ saturates and estimates are
    * EXACT, so the oracle verifies per-nation counts and the full
    * A∪B / A∩B / B\A algebra against real COUNT(DISTINCT) — value-level
    * verification of the whole sketch pipeline. One bound row covers the
    * estimated regime (lineitem orderkeys >> k, ±5%). */
  def thetaSketch(s: SparkSession, dir: String): DataFrame = {
    val g = GraftFunctions
    val perNation = t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(g.thetaSketchAgg(col("c_custkey")).as("sk"))
      .select(col("c_nationkey").cast("long").as("k"),
        lit("nation_distinct").as("metric"),
        round(g.thetaEstimate(col("sk"))).cast("long").as("v"))
    val custSk = t(s, dir, "customer").agg(g.thetaSketchAgg(col("c_custkey")).as("b"))
    val ordSk = t(s, dir, "orders").agg(g.thetaSketchAgg(col("o_custkey")).as("a"))
    val algebra = custSk.crossJoin(ordSk).select(
      explode(F.map(
        lit("union"), g.thetaEstimate(g.thetaUnion(col("a"), col("b"))),
        lit("intersect"), g.thetaEstimate(g.thetaIntersect(col("a"), col("b"))),
        lit("b_not_a"), g.thetaEstimate(g.thetaANotB(col("b"), col("a")))))
        .as(Seq("metric", "est")))
      .select(lit(-1L).as("k"), col("metric"), round(col("est")).cast("long").as("v"))
    val bound = t(s, dir, "lineitem")
      .agg(g.thetaSketchAgg(col("l_orderkey")).as("sk"),
        countDistinct(col("l_orderkey")).as("exact"))
      .select(lit(-2L).as("k"), lit("est_bound").as("metric"),
        when(abs(g.thetaEstimate(col("sk")) - col("exact"))
          / col("exact") <= 0.05, 1L).otherwise(0L).as("v"))
    perNation.unionAll(algebra).unionAll(bound).orderBy("k", "metric")
  }

  /** UNTYPED `merge(sketch)` / `cardinality(sketch)` SQL dispatch — the
    * reference's single `merge` name covers every mergeable sketch type
    * (one registration per type in MAIN/metadata/
    * BuiltInTypeAndFunctionNamespaceManager.java); Spark has one BinaryType,
    * so the type travels as a versioned 1-byte tag on the varbinary
    * ([[graft.functions.SketchTag]]) and `merge`/`cardinality` dispatch on
    * it. Re-runs the fn_hll / fn_qdigest / fn_theta / set-digest
    * store→merge lifecycles through the untyped spellings; the typed
    * merge_* names stay as aliases. Supplier keys keep theta (k=4096) and
    * the KMV digest in their exact regimes up to sf0.1. */
  def sketchDispatch(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "documents").createOrReplaceTempView("docs_sd")
    t(s, dir, "lineitem").createOrReplaceTempView("li_sd")
    t(s, dir, "supplier").createOrReplaceTempView("supp_sd")
    s.sql(
      """WITH words AS (
        |  SELECT lang, explode(split(text, ' ')) AS w FROM docs_sd),
        |hll AS (
        |  SELECT lang, approx_set(w) AS sk, count(DISTINCT w) AS exact
        |  FROM words GROUP BY lang),
        |hll_rows AS (
        |  SELECT lang AS k, 'hll' AS metric, CAST(exact AS DOUBLE) AS exact,
        |    abs(CAST(cardinality(sk) AS DOUBLE) / exact - 1) <= 0.05 AS ok
        |  FROM hll),
        |gw AS (SELECT count(DISTINCT w) AS g FROM words),
        |hll_merged AS (
        |  SELECT '__merged_hll' AS k, 'hll' AS metric,
        |    CAST(g AS DOUBLE) AS exact,
        |    abs(CAST(cardinality(merge(sk)) AS DOUBLE) / g - 1) <= 0.05 AS ok
        |  FROM hll CROSS JOIN gw GROUP BY g),
        |qd AS (
        |  SELECT l_linestatus, qdigest_agg(l_quantity) AS sk
        |  FROM li_sd GROUP BY l_linestatus),
        |qb AS (
        |  SELECT round(percentile(l_quantity, 0.5), 4) AS med,
        |    percentile(l_quantity, 0.4) AS p40,
        |    percentile(l_quantity, 0.6) AS p60
        |  FROM li_sd),
        |qd_merged AS (
        |  SELECT '__merged_qdigest' AS k, 'qdigest' AS metric, med AS exact,
        |    value_at_quantile(merge(sk), 0.5d) BETWEEN p40 AND p60 AS ok
        |  FROM qd CROSS JOIN qb GROUP BY med, p40, p60),
        |th AS (
        |  SELECT s_nationkey, theta_sketch_agg(s_suppkey) AS sk
        |  FROM supp_sd GROUP BY s_nationkey),
        |gs AS (SELECT count(DISTINCT s_suppkey) AS g FROM supp_sd),
        |th_merged AS (
        |  SELECT '__merged_theta' AS k, 'theta' AS metric,
        |    CAST(g AS DOUBLE) AS exact,
        |    CAST(round(theta_sketch_estimate(merge(sk))) AS BIGINT) = g AS ok
        |  FROM th CROSS JOIN gs GROUP BY g),
        |sd AS (
        |  SELECT s_nationkey, make_set_digest(s_suppkey) AS sk
        |  FROM supp_sd GROUP BY s_nationkey),
        |sd_merged AS (
        |  SELECT '__merged_setdigest' AS k, 'setdigest' AS metric,
        |    CAST(g AS DOUBLE) AS exact,
        |    CASE WHEN g <= 512 THEN cardinality(merge(sk)) = g
        |         ELSE abs(CAST(cardinality(merge(sk)) AS DOUBLE) / g - 1) <= 0.1
        |    END AS ok
        |  FROM sd CROSS JOIN gs GROUP BY g)
        |SELECT * FROM hll_rows
        |UNION ALL SELECT * FROM hll_merged
        |UNION ALL SELECT * FROM qd_merged
        |UNION ALL SELECT * FROM th_merged
        |UNION ALL SELECT * FROM sd_merged
        |ORDER BY k, metric""".stripMargin)
  }

  /** width_bucket explicit-bins overload + sparse-map cosine_similarity
    * (reference MathFunctions.java:1667 widthBucket(x, bins array),
    * :1712 mapCosineSimilarity over map<varchar,double>): bucket counts
    * replay as boolean sums, the uniform 4-arg form as floor arithmetic,
    * and the sparse cosine as closed-form arithmetic over the one shared
    * key — all exact in DuckDB. */
  def sparseMath(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "supplier").createOrReplaceTempView("supp_sm")
    s.sql(
      """SELECT s_suppkey AS k,
        |  width_bucket(CAST(s_acctbal AS DOUBLE),
        |    array(0D, 2000D, 4000D, 6000D, 8000D)) AS wb_bins,
        |  width_bucket(CAST(s_acctbal AS DOUBLE), 0D, 10000D, 10) AS wb_uniform,
        |  round(cosine_similarity(
        |    map('a', CAST(s_suppkey % 7 + 1 AS DOUBLE),
        |        'b', CAST(s_suppkey % 11 + 1 AS DOUBLE)),
        |    map('b', CAST(s_suppkey % 5 + 1 AS DOUBLE), 'c', 2.0D)), 4)
        |    AS cos_sparse
        |FROM supp_sm ORDER BY k""".stripMargin)
  }

  /** Multi-geometries (reference geospatial/GeoFunctions.java MULTI* WKT,
    * ST_NumGeometries, ST_GeometryN, GeometryType): two disjoint
    * axis-aligned squares per key as a MULTIPOLYGON, a two-part
    * MULTILINESTRING (horizontal run + 3-4-5 diagonal), and a
    * point+polygon GEOMETRYCOLLECTION — all coordinates dyadic, so every
    * area/perimeter/length closed form is exact and the oracle replays
    * arithmetic, not geometry. The WKT round-trip is checked Spark-side
    * (parse∘print = identity on the tagged struct). */
  def geoMulti(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (lit(1.0) + col("c_custkey") % 3).as("a"),
        (lit(0.5) + (col("c_custkey") % 2) * 0.5).as("b"),
        (lit(0.25) + (col("c_custkey") % 4) * 0.25).as("gap"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    def pt(x: Column, y: Column): Column =
      concat_ws(" ", x.cast("string"), y.cast("string"))
    def ringTxt(x: Column, y: Column, sz: Column): Column = concat_ws(", ",
      pt(x, y), pt(x + sz, y), pt(x + sz, y + sz), pt(x, y + sz), pt(x, y))
    val a = col("a"); val b = col("b"); val cx = col("cx"); val cy = col("cy")
    val x2 = cx + a + col("gap")
    val mpWkt = concat(lit("MULTIPOLYGON ((("), ringTxt(cx, cy, a),
      lit(")), (("), ringTxt(x2, cy, b), lit(")))"))
    val mlWkt = concat(lit("MULTILINESTRING (("),
      pt(cx, cy), lit(", "), pt(cx + a, cy), lit("), ("),
      pt(cx, cy + 1), lit(", "), pt(cx + b * 3, cy + 1 + b * 4), lit("))"))
    val gcWkt = concat(lit("GEOMETRYCOLLECTION (POINT ("), pt(cx, cy),
      lit("), POLYGON (("), ringTxt(cx + 1, cy + 1, b), lit(")))"))
    // Materialize each parsed geometry ONCE in a lower projection: the
    // WKT parser is a large CodegenFallback combinator tree, and inlining
    // it into every derived output column re-evaluates it per column
    // (CollapseProject keeps multi-referenced non-cheap aliases, so this
    // two-step select is a real per-row sharing boundary).
    val parsed = g.select(col("k"),
      stMultiGeometryFromText(mpWkt).as("mg"),
      stMultiGeometryFromText(mlWkt).as("ml"),
      stMultiGeometryFromText(gcWkt).as("gc"))
    val mg = col("mg"); val ml = col("ml"); val gc = col("gc")
    parsed.select(col("k"),
      stGeometryType(mg).as("mp_t"),
      stNumGeometries(mg).as("mp_n"),
      round(stAreaMulti(mg), 4).as("mp_area"),
      round(stPerimeterMulti(mg), 4).as("mp_perim"),
      round(stArea(stGeometryN(mg, lit(2)).getField("pts")), 4).as("part2_area"),
      stGeometryType(stGeometryN(mg, lit(1))).as("part1_t"),
      stNumGeometries(ml).as("ml_n"),
      round(stLengthMulti(ml), 4).as("ml_len"),
      stGeometryType(gc).as("gc_t"),
      stNumGeometries(gc).as("gc_n"),
      stGeometryType(stGeometryN(gc, lit(1))).as("gc1_t"),
      round(stArea(stGeometryN(gc, lit(2)).getField("pts")), 4).as("gc2_area"),
      stEnvelopeMulti(mg).getField("xmax").as("env_xmax"),
      (stMultiGeometryFromText(stAsTextMulti(mg)) === mg).as("wkt_rt"))
      .orderBy("k")
  }

  /** Relation predicates (reference GeoFunctions.java ST_Within,
    * ST_Touches, ST_Crosses, ST_Overlaps, ST_Disjoint): a fixed square A
    * against a second square B placed by k%5 into exactly one DE-9IM
    * class — nested (contains/within), partial overlap, shared edge
    * (touches), disjoint, corner contact (touches) — plus a line through
    * A (crosses) and one strictly inside (not crosses). The Spark side
    * computes the general orientation-arithmetic predicates; the oracle
    * replays the closed-form class membership. */
  def geoPred(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (col("c_custkey") % 5).as("m"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy"); val m = col("m")
    def sq(x: Column, y: Column, sz: Column): Column =
      org.apache.spark.sql.functions.array(
        stPoint(x, y), stPoint(x + sz, y),
        stPoint(x + sz, y + sz), stPoint(x, y + sz))
    val ringA = sq(cx, cy, lit(2.0))
    val bx = when(m === 0, cx + 0.5).when(m === 1, cx + 1.0)
      .when(m === 2, cx + 2.0).when(m === 3, cx + 3.0).otherwise(cx + 2.0)
    val by = when(m === 0, cy + 0.5).when(m === 1, cy + 1.0)
      .when(m === 2, cy + 0.5).when(m === 3, cy + 3.0).otherwise(cy + 2.0)
    val bs = when(m === 0, 1.0).when(m === 1, 2.0)
      .when(m === 2, 1.0).when(m === 3, 1.0).otherwise(1.0)
    val ringB = sq(bx, by, bs)
    val lineThru = org.apache.spark.sql.functions.array(
      stPoint(cx - 0.5, cy + 1.0), stPoint(cx + 2.5, cy + 1.0))
    val lineIn = org.apache.spark.sql.functions.array(
      stPoint(cx + 0.5, cy + 1.0), stPoint(cx + 1.5, cy + 1.0))
    g.select(col("k"),
      stPolygonContains(ringA, ringB).as("contains_ab"),
      stPolygonWithin(ringB, ringA).as("within_ba"),
      stPolygonDisjoint(ringA, ringB).as("disjoint_ab"),
      stPolygonTouches(ringA, ringB).as("touches_ab"),
      stPolygonOverlaps(ringA, ringB).as("overlaps_ab"),
      stLineCrossesPolygon(lineThru, ringA).as("crosses_thru"),
      stLineCrossesPolygon(lineIn, ringA).as("crosses_inner"))
      .orderBy("k")
  }

  /** geometry_union_agg (reference geospatial/aggregation/
    * GeometryUnionAgg.java) over per-group DISJOINT squares: the union of
    * disjoint parts is their collection, so count/area/envelope of the
    * aggregated geometry reduce to per-group closed forms the oracle can
    * replay. Squares are spaced 2× their max size apart by construction. */
  def geoUnionAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select((col("c_custkey") % 10).as("g"),
        (col("c_custkey") * 2).cast("double").as("x0"),
        ((col("c_custkey") % 10) * 5).cast("double").as("y0"),
        (lit(0.5) + (col("c_custkey") % 2) * 0.5).as("sz"))
    val ring = org.apache.spark.sql.functions.array(
      stPoint(col("x0"), col("y0")),
      stPoint(col("x0") + col("sz"), col("y0")),
      stPoint(col("x0") + col("sz"), col("y0") + col("sz")),
      stPoint(col("x0"), col("y0") + col("sz")))
    val geom = struct(lit("ST_Polygon").as("gtype"), ring.as("pts"))
    g.select(col("g"), geom.as("geom"))
      .groupBy("g").agg(geometryUnionAgg(col("geom")).as("u"))
      .select(col("g"),
        stGeometryType(col("u")).as("u_t"),
        stNumGeometries(col("u")).as("n"),
        round(stAreaMulti(col("u")), 4).as("area"),
        stEnvelopeMulti(col("u")).getField("xmin").as("xmin"),
        stEnvelopeMulti(col("u")).getField("xmax").as("xmax"))
      .orderBy("g")
  }

  /** convex_hull_agg (reference geospatial/aggregation convex-hull area):
    * each group aggregates a 5×5 lattice scaled per group, so the hull is
    * the enclosing square — 4 vertices after collinear-point elimination,
    * area (4·scale)², first vertex the lattice origin. Exercises the
    * mergeable TypedImperativeAggregate across partitions; the oracle
    * replays the closed forms. */
  def convexHullAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val base = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select((col("c_custkey") % 8).as("g"))
      .withColumn("sc", lit(1.0) + col("g") % 3)
      .withColumn("i", explode(sequence(lit(0), lit(24))))
      .select(col("g"), stPoint(
        col("g") + (col("i") % 5) * col("sc"),
        col("g") * 2 + floor(col("i") / 5) * col("sc")).as("p"))
    base.groupBy("g")
      .agg(graft.functions.ConvexHullAgg.column(col("p")).as("h"))
      .select(col("g"),
        size(col("h")).cast("long").as("nv"),
        round(stArea(col("h")), 4).as("area"),
        element_at(col("h"), 1).getField("x").as("v1x"),
        element_at(col("h"), 2).getField("x").as("v2x"),
        element_at(col("h"), 2).getField("y").as("v2y"))
      .orderBy("g")
  }

  /** Scalar geometry set ops ST_Union / ST_Intersection / ST_Difference
    * (reference geospatial/GeoFunctions.java, Esri-backed there; here the
    * convex clipping machinery in GeoFunctions.scala — Sutherland–Hodgman
    * intersection, wedge-decomposition difference, A⊎(B\A) union). Test
    * families are the geoPred parametric squares: per m-class the region
    * areas and piece counts have closed forms the oracle replays. */
  def geoSetOps(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (col("c_custkey") % 5).as("m"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy"); val m = col("m")
    def sq(x: Column, y: Column, sz: Column): Column =
      org.apache.spark.sql.functions.array(
        stPoint(x, y), stPoint(x + sz, y),
        stPoint(x + sz, y + sz), stPoint(x, y + sz))
    val ringA = sq(cx, cy, lit(2.0))
    val bx = when(m === 0, cx + 0.5).when(m === 1, cx + 1.0)
      .when(m === 2, cx + 2.0).when(m === 3, cx + 3.0).otherwise(cx + 2.0)
    val by = when(m === 0, cy + 0.5).when(m === 1, cy + 1.0)
      .when(m === 2, cy + 0.5).when(m === 3, cy + 3.0).otherwise(cy + 2.0)
    val bs = when(m === 0, 1.0).when(m === 1, 2.0)
      .when(m === 2, 1.0).when(m === 3, 1.0).otherwise(1.0)
    val ringB = sq(bx, by, bs)
    // clipping towers (intersection/union/difference) staged once per row
    // behind a projection boundary instead of inlined per output column
    val staged = g.select(col("k"),
      stIntersectionConvex(ringA, ringB).as("inter"),
      stUnionConvex(ringA, ringB).as("uni"),
      stDifferenceConvex(ringA, ringB).as("diff"),
      stUnionPoints(org.apache.spark.sql.functions.array(
        stPoint(cx, cy), stPoint(cx + (m % 2), cy))).as("mp"))
    val inter = col("inter"); val uni = col("uni"); val diff = col("diff")
    staged.select(col("k"),
      stGeometryType(inter).as("inter_t"),
      round(when(stGeometryType(inter) === "ST_Empty", 0.0)
        .otherwise(stArea(inter.getField("pts"))), 4).as("inter_area"),
      stNumGeometries(uni).as("union_n"),
      round(stAreaMulti(uni), 4).as("union_area"),
      stGeometryType(diff).as("diff_t"),
      stNumGeometries(diff).as("diff_n"),
      round(stAreaMulti(diff), 4).as("diff_area"),
      stNumGeometries(col("mp")).as("mp_n"))
      .orderBy("k")
  }

  /** GENERAL polygon overlay — concave and holed operands (reference
    * geospatial/GeoFunctions.java ST_Intersection/ST_Union/ST_Difference/
    * ST_SymDifference delegate to the Esri library's general overlay;
    * here the GeneralGeomOp decompose-to-convex kernel). Fixture classes
    * by m = k % 4, all dyadic so the oracle replays areas exactly:
    * A is always the concave L-hexagon (area 12);
    *   m=0: B convex square straddling A's notch      → ∩3  A\B 9  ∪13 Δ10
    *   m=1: B concave L fully inside A                → ∩3  A\B 9  ∪12 Δ9
    *   m=2: B convex square disjoint from A           → ∩0  A\B 12 ∪16 Δ16
    *   m=3: B holed square (outer 4×4, hole 2×2)      → ∩9  A\B 3  ∪15 Δ6
    * Also pins the region identity area(∪) = area(∩) + area(Δ). */
  def geoSetOps2(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (col("c_custkey") % 4).as("m"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy"); val m = col("m")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    def p(x: Column, y: Column): Column = stPoint(x, y)
    // concave L-hexagon: [0,4]×[0,2] ∪ [0,2]×[2,4], area 12
    val ringsA = arr(arr(
      p(cx, cy), p(cx + 4, cy), p(cx + 4, cy + 2), p(cx + 2, cy + 2),
      p(cx + 2, cy + 4), p(cx, cy + 4)))
    val ringsB = when(m === 0, arr(arr(
      p(cx + 1, cy + 1), p(cx + 3, cy + 1), p(cx + 3, cy + 3), p(cx + 1, cy + 3))))
      .when(m === 1, arr(arr(
        p(cx, cy), p(cx + 2, cy), p(cx + 2, cy + 1), p(cx + 1, cy + 1),
        p(cx + 1, cy + 2), p(cx, cy + 2))))
      .when(m === 2, arr(arr(
        p(cx + 3, cy + 3), p(cx + 5, cy + 3), p(cx + 5, cy + 5), p(cx + 3, cy + 5))))
      .otherwise(arr(
        arr(p(cx, cy), p(cx + 4, cy), p(cx + 4, cy + 4), p(cx, cy + 4)),
        arr(p(cx + 1, cy + 1), p(cx + 3, cy + 1), p(cx + 3, cy + 3), p(cx + 1, cy + 3))))
    val staged = g.select(col("k"), col("m"),
      stIntersectionGeneral(ringsA, ringsB).as("inter"),
      stDifferenceGeneral(ringsA, ringsB).as("diff"),
      stUnionGeneral(ringsA, ringsB).as("uni"),
      stSymDifferenceGeneral(ringsA, ringsB).as("sym"))
    val interA = round(stAreaMulti(col("inter")), 4)
    val unionA = round(stAreaMulti(col("uni")), 4)
    val symA = round(stAreaMulti(col("sym")), 4)
    staged.select(col("k"),
      interA.as("inter_area"),
      round(stAreaMulti(col("diff")), 4).as("diff_area"),
      unionA.as("union_area"),
      symA.as("sym_area"),
      (abs(unionA - (interA + symA)) < 1e-9).as("region_ident"))
      .orderBy("k")
  }

  /** SphericalGeography slice (reference geospatial/SphericalGeoFunctions
    * .java): to_spherical_geography re-tag + ST_Distance / ST_Length in
    * meters on the sphere (haversine, EARTH_RADIUS_M = 6371010). The
    * oracle replays the identical double formula; outputs round to 1e-4 m
    * so 1-ulp libm sin/cos differences can't flip the hash. */
  def geoSphere(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") * 7 % 140) - 70 + 0.25).cast("double").as("lat1"),
        ((col("c_custkey") * 13 % 300) - 150 + 0.25).cast("double").as("lon1"),
        ((col("c_custkey") * 11 % 140) - 70 + 0.75).cast("double").as("lat2"),
        ((col("c_custkey") * 17 % 300) - 150 + 0.75).cast("double").as("lon2"))
    val p1 = struct(lit("ST_Point").as("gtype"),
      org.apache.spark.sql.functions.array(stPoint(col("lon1"), col("lat1"))).as("pts"))
    val p2 = struct(lit("ST_Point").as("gtype"),
      org.apache.spark.sql.functions.array(stPoint(col("lon2"), col("lat2"))).as("pts"))
    val line = struct(lit("ST_LineString").as("gtype"),
      org.apache.spark.sql.functions.array(
        stPoint(col("lon1"), col("lat1")), stPoint(col("lon2"), col("lat2")),
        stPoint(col("lon1") + 1.0, col("lat1"))).as("pts"))
    val sp1 = toSphericalGeography(p1)
    val dx = lit(1.0) + (col("k") % 3) * lit(0.5)
    val sqRing = struct(lit("ST_Polygon").as("gtype"),
      org.apache.spark.sql.functions.array(
        stPoint(col("lon1"), col("lat1")),
        stPoint(col("lon1") + dx, col("lat1")),
        stPoint(col("lon1") + dx, col("lat1") + 0.75),
        stPoint(col("lon1"), col("lat1") + 0.75)).as("pts"))
    g.select(col("k"),
      stGeometryType(sp1).as("sp_t"),
      round(stSphericalDistance(sp1, toSphericalGeography(p2)), 4).as("dist_m"),
      round(stSphericalLength(toSphericalGeography(line)), 4).as("len_m"),
      round(stSphericalArea(toSphericalGeography(sqRing)) / 1e6, 6).as("area_km2"))
      .orderBy("k")
  }

  /** SphericalGeography completion (reference SphericalGeoFunctions.java
    * ST_Centroid:256 + ST_AsText): multipoint centroid via normalized
    * 3D unit-vector sum, point centroid identity, WKT text of a
    * spherical point. Trig outputs round to 1e-6 so 1-ulp libm
    * differences can't flip the hash (same convention as fn_geo_sphere). */
  def geoSphere2(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") * 7 % 140) - 70 + 0.25).cast("double").as("lat1"),
        ((col("c_custkey") * 13 % 300) - 150 + 0.25).cast("double").as("lon1"))
    val lat1 = col("lat1"); val lon1 = col("lon1")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val mp = toSphericalGeography(struct(lit("ST_MultiPoint").as("gtype"),
      arr(stPoint(lon1, lat1), stPoint(lon1 + 2, lat1 + 1),
        stPoint(lon1 - 1, lat1 + 2)).as("pts")))
    val single = toSphericalGeography(struct(lit("ST_Point").as("gtype"),
      arr(stPoint(lon1, lat1)).as("pts")))
    val cen = stSphericalCentroid(mp)
    val cenPt = element_at(cen.getField("pts"), 1)
    val cen1 = element_at(stSphericalCentroid(single).getField("pts"), 1)
    g.select(col("k"),
      stGeometryType(cen).as("cen_t"),
      round(cenPt.getField("x"), 6).as("cen_lon"),
      round(cenPt.getField("y"), 6).as("cen_lat"),
      (cen1.getField("x") === lon1 && cen1.getField("y") === lat1)
        .as("point_identity"),
      stAsTextSpherical(single).as("wkt"))
      .orderBy("k")
  }

  /** Geometry accessors + validity (reference GeoFunctions.java ST_X/ST_Y,
    * ST_XMin…ST_YMax, ST_IsEmpty/IsClosed/IsRing/IsSimple/IsValid,
    * geometry_invalid_reason, ST_Dimension/CoordDim, ST_Boundary,
    * ST_Points, ST_EnvelopeAsPts). Per key: a point, an L-shaped open
    * path (3-4 legs), its closed square variant, a bowtie self-crossing
    * path, and degenerate/self-crossing polygons — every output a dyadic
    * closed form the oracle replays. */
  def geoAccess(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val pt = struct(lit("ST_Point").as("gtype"),
      arr(stPoint(cx, cy)).as("pts"))
    val lineL = struct(lit("ST_LineString").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 3, cy), stPoint(cx + 3, cy + 4)).as("pts"))
    val sq = arr(stPoint(cx, cy), stPoint(cx + 2, cy),
      stPoint(cx + 2, cy + 2), stPoint(cx, cy + 2))
    val closedSq = struct(lit("ST_LineString").as("gtype"),
      concat(sq, slice(sq, lit(1), lit(1))).as("pts"))
    val bowtie = struct(lit("ST_LineString").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 2, cy + 2),
        stPoint(cx + 2, cy), stPoint(cx, cy + 2)).as("pts"))
    val poly = struct(lit("ST_Polygon").as("gtype"), sq.as("pts"))
    val degen = struct(lit("ST_Polygon").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 1, cy + 1), stPoint(cx + 2, cy + 2)).as("pts"))
    val selfx = struct(lit("ST_Polygon").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 4, cy),
        stPoint(cx + 1, cy + 2), stPoint(cx + 3, cy + 2)).as("pts"))
    g.select(col("k"),
      stXOf(pt).as("px"), stYOf(pt).as("py"),
      stXMin(lineL).as("xmin"), stXMax(lineL).as("xmax"),
      stYMin(lineL).as("ymin"), stYMax(lineL).as("ymax"),
      stIsEmpty(pt).as("p_empty"),
      stIsClosed(lineL).as("l_closed"),
      stIsClosed(closedSq).as("sq_closed"),
      stIsRing(closedSq).as("sq_ring"),
      stIsSimple(lineL).as("l_simple"),
      stIsSimple(bowtie).as("bow_simple"),
      stDimension(pt).as("dim_p"), stDimension(lineL).as("dim_l"),
      stDimension(poly).as("dim_pg"), stCoordDim(poly).as("cdim"),
      stGeometryType(stBoundary(lineL)).as("bnd_l_t"),
      stNumGeometries(stBoundary(lineL)).as("bnd_l_n"),
      stGeometryType(stBoundary(poly)).as("bnd_pg_t"),
      stNumGeometries(stBoundary(closedSq)).as("bnd_csq_n"),
      size(stPoints(lineL)).cast("long").as("npts"),
      stXOf(element_at(stEnvelopeAsPts(lineL), 2)).as("env_hi_x"),
      stIsValid(poly).as("pg_valid"),
      geometryInvalidReason(degen).as("degen_why"),
      geometryInvalidReason(selfx).as("selfx_why"))
      .orderBy("k")
  }

  /** Polygons with interior rings (reference GeoFunctions.java
    * ST_ExteriorRing/ST_InteriorRingN/ST_NumInteriorRing/ST_InteriorRings;
    * area and point-containment subtract holes). Outer 4×4 square, 1 or 2
    * unit holes by k parity — all closed forms dyadic. */
  def geoHoles(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"), (col("c_custkey") % 2).as("m"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy"); val m = col("m")
    def ptTxt(x: Column, y: Column): Column =
      concat_ws(" ", x.cast("string"), y.cast("string"))
    def ringTxt(x: Column, y: Column, sz: Column): Column = concat_ws(", ",
      ptTxt(x, y), ptTxt(x + sz, y), ptTxt(x + sz, y + sz),
      ptTxt(x, y + sz), ptTxt(x, y))
    val hole2 = concat(lit(", ("), ringTxt(cx + 2.5, cy + 2.5, lit(1.0)), lit(")"))
    val wkt = concat(lit("POLYGON (("), ringTxt(cx, cy, lit(4.0)),
      lit("), ("), ringTxt(cx + 1, cy + 1, lit(1.0)), lit(")"),
      when(m === 1, hole2).otherwise(lit("")), lit(")"))
    val pg = stPolygonWithHoles(wkt)
    g.select(col("k"),
      stNumInteriorRing(pg).as("n_holes"),
      round(stAreaWithHoles(pg), 4).as("area"),
      stGeometryType(stExteriorRing(pg)).as("ext_t"),
      size(stExteriorRing(pg).getField("pts")).cast("long").as("ext_npts"),
      round(stLineLength(stInteriorRingN(pg, lit(1)).getField("pts")), 4)
        .as("hole1_perim"),
      size(stInteriorRings(pg)).cast("long").as("int_rings_n"),
      stContainsPointWithHoles(pg, stPoint(cx + 0.5, cy + 0.5)).as("in_shell"),
      stContainsPointWithHoles(pg, stPoint(cx + 1.5, cy + 1.5)).as("in_hole1"),
      stContainsPointWithHoles(pg, stPoint(cx + 3.0, cy + 3.75)).as("near_edge"))
      .orderBy("k")
  }

  /** ST_ConvexHull (scalar monotone chain in HOFs), ST_Equals
    * (orientation/rotation-insensitive), ST_SymDifference for convex
    * rings — reference GeoFunctions.java ST_ConvexHull/ST_Equals/
    * ST_SymDifference. Hull inputs: square corners + interior points
    * (hull = the 4 corners, area a²); collinear degenerate keeps the
    * distinct vertex count. SymDiff replays the fn_geo_setops m-class
    * areas: (A\B) + (B\A). */
  def geoHull(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"), (col("c_custkey") % 5).as("m"),
        (lit(1.0) + col("c_custkey") % 3).as("a"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy"); val m = col("m"); val a = col("a")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val scatter = arr(
      stPoint(cx + a / 2, cy + a / 2), stPoint(cx + a, cy),
      stPoint(cx, cy), stPoint(cx + a, cy + a),
      stPoint(cx + a / 4, cy + a / 2), stPoint(cx, cy + a))
    val hull = stConvexHullRing(scatter)
    val collinear = arr(stPoint(cx, cy), stPoint(cx + 1, cy + 1),
      stPoint(cx + 2, cy + 2), stPoint(cx + 1, cy + 1))
    def sq(x: Column, y: Column, sz: Column): Column =
      arr(stPoint(x, y), stPoint(x + sz, y),
        stPoint(x + sz, y + sz), stPoint(x, y + sz))
    val ringA = sq(cx, cy, lit(2.0))
    // same m-class placement as fn_geo_setops/fn_geo_pred
    val bx = when(m === 0, cx + 0.5).when(m === 1, cx + 1.0)
      .when(m === 2, cx + 2.0).when(m === 3, cx + 3.0).otherwise(cx + 2.0)
    val by = when(m === 0, cy + 0.5).when(m === 1, cy + 1.0)
      .when(m === 2, cy + 0.5).when(m === 3, cy + 3.0).otherwise(cy + 2.0)
    val bs = when(m === 0, 1.0).when(m === 1, 2.0)
      .when(m === 2, 1.0).when(m === 3, 1.0).otherwise(1.0)
    val ringB = sq(bx, by, bs)
    val gA = struct(lit("ST_Polygon").as("gtype"), ringA.as("pts"))
    // rotated + reversed spelling of the same square ring
    val ringA2 = reverse(arr(stPoint(cx + 2, cy + 2), stPoint(cx, cy + 2),
      stPoint(cx, cy), stPoint(cx + 2, cy)))
    val gA2 = struct(lit("ST_Polygon").as("gtype"), ringA2.as("pts"))
    val gB = struct(lit("ST_Polygon").as("gtype"), ringB.as("pts"))
    // hull + symmetric-difference towers staged once per row (reused by
    // the count/area/type outputs below)
    val staged = g.select(col("k"),
      hull.as("hull"),
      stSymDifferenceConvex(ringA, ringB).as("symd"),
      stGeometryType(stConvexHull(struct(lit("ST_Polygon").as("gtype"),
        scatter.as("pts")))).as("hull_t"),
      size(stConvexHullRing(collinear)).cast("long").as("coll_n"),
      stEquals(gA, gA2).as("eq_same"),
      stEquals(gA, gB).as("eq_other"))
    staged.select(col("k"),
      size(col("hull")).cast("long").as("hull_n"),
      round(stArea(col("hull")), 4).as("hull_area"),
      col("hull_t"), col("coll_n"), col("eq_same"), col("eq_other"),
      stGeometryType(col("symd")).as("symd_t"),
      round(stAreaMulti(col("symd")), 4).as("symd_area"))
      .orderBy("k")
  }

  /** line_locate_point / line_interpolate_point (reference
    * GeoFunctions.java lineLocatePoint/lineInterpolatePoint): a 3-4
    * L-path gives exact arc closed forms; fractions sweep start/bend/
    * mid-leg/end. */
  def geoLineOps(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val line = arr(stPoint(cx, cy), stPoint(cx + 3, cy), stPoint(cx + 3, cy + 4))
    g.select(col("k"),
      round(lineLocatePoint(line, stPoint(cx + 1, cy - 1)), 6).as("loc_leg1"),
      round(lineLocatePoint(line, stPoint(cx + 4, cy + 2)), 6).as("loc_leg2"),
      round(lineLocatePoint(line, stPoint(cx, cy)), 6).as("loc_start"),
      round(lineLocatePoint(line, stPoint(cx + 3, cy + 4)), 6).as("loc_end"),
      round(stXOf(lineInterpolatePoint(line, lit(3.0 / 7.0))) - cx, 6).as("interp_bend_dx"),
      round(stYOf(lineInterpolatePoint(line, lit(5.0 / 7.0))) - cy, 6).as("interp_mid_dy"),
      round(stXOf(lineInterpolatePoint(line, lit(0.0))) - cx, 6).as("interp_0_dx"),
      round(stYOf(lineInterpolatePoint(line, lit(1.0))) - cy, 6).as("interp_1_dy"))
      .orderBy("k")
  }

  /** ST_Relate (reference GeoFunctions.java ST_Relate): DE-9IM matrix +
    * pattern match over the same m-class square pairs as fn_geo_pred —
    * nested, overlapping, edge-shared, disjoint, corner-touching — plus
    * the identity pair. Every matrix is a closed form per class. */
  def geoRelate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"), (col("c_custkey") % 5).as("m"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy"); val m = col("m")
    def sq(x: Column, y: Column, sz: Column): Column =
      org.apache.spark.sql.functions.array(
        stPoint(x, y), stPoint(x + sz, y),
        stPoint(x + sz, y + sz), stPoint(x, y + sz))
    val ringA = sq(cx, cy, lit(2.0))
    val bx = when(m === 0, cx + 0.5).when(m === 1, cx + 1.0)
      .when(m === 2, cx + 2.0).when(m === 3, cx + 3.0).otherwise(cx + 2.0)
    val by = when(m === 0, cy + 0.5).when(m === 1, cy + 1.0)
      .when(m === 2, cy + 0.5).when(m === 3, cy + 3.0).otherwise(cy + 2.0)
    val bs = when(m === 0, 1.0).when(m === 1, 2.0)
      .when(m === 2, 1.0).when(m === 3, 1.0).otherwise(1.0)
    val ringB = sq(bx, by, bs)
    // each DE-9IM matrix is an expensive orientation-arithmetic tower —
    // compute the two matrices once and run every pattern against the
    // 9-char strings (CollapseProject keeps the reused aliases staged)
    g.select(col("k"),
      stRelateMatrix(ringA, ringB).as("de9im"),
      stRelateMatrix(ringA, ringA).as("de9im_self"))
      .select(col("k"), col("de9im"), col("de9im_self"),
        stRelateOnMatrix(col("de9im_self"), lit("T*F**FFF*")).as("rel_equals"),
        stRelateOnMatrix(col("de9im"), lit("T*****FF*")).as("rel_contains"),
        stRelateOnMatrix(col("de9im"), lit("T*T***T**")).as("rel_overlaps"),
        stRelateOnMatrix(col("de9im"), lit("FF*FF****")).as("rel_disjoint"))
      .orderBy("k")
  }

  /** WKB codec + simplify_geometry + ST_Geometries (reference
    * GeoFunctions.java ST_AsBinary/ST_GeomFromBinary/simplifyGeometry/
    * ST_Geometries). The oracle replays the OGC frame sizes (21/9+16n/
    * 13+16(n+1) bytes), the byte-order/type header hex, round-trip
    * identity, and the Douglas–Peucker keep counts for a dyadic zigzag
    * (max deviation 0.25 → collapses under tol 0.5, survives tol 0.1). */
  def geoWkb(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val pt = struct(lit("ST_Point").as("gtype"), arr(stPoint(cx, cy)).as("pts"))
    val line = struct(lit("ST_LineString").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 3, cy), stPoint(cx + 3, cy + 4)).as("pts"))
    val poly = struct(lit("ST_Polygon").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 2, cy),
        stPoint(cx + 2, cy + 2), stPoint(cx, cy + 2)).as("pts"))
    val zig = struct(lit("ST_LineString").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 1, cy + 0.25), stPoint(cx + 2, cy),
        stPoint(cx + 3, cy + 0.25), stPoint(cx + 4, cy)).as("pts"))
    val ml = stMultiGeometryFromText(concat(lit("MULTIPOINT ("),
      concat_ws(" ", cx.cast("string"), cy.cast("string")), lit(", "),
      concat_ws(" ", (cx + 1).cast("string"), cy.cast("string")), lit(")")))
    val wpt = stAsBinary(pt); val wline = stAsBinary(line); val wpg = stAsBinary(poly)
    g.select(col("k"),
      length(wpt).as("pt_len"), length(wline).as("line_len"),
      length(wpg).as("pg_len"),
      hex(substring(wpt, 1, 5)).as("pt_hdr"),
      hex(substring(wpg, 1, 9)).as("pg_hdr"),
      (stGeomFromBinary(wpt) === pt).as("rt_pt"),
      (stGeomFromBinary(wline) === line).as("rt_line"),
      (stGeomFromBinary(wpg) === poly).as("rt_pg"),
      size(simplifyGeometry(zig, lit(0.5)).getField("pts")).as("n_tol_big"),
      size(simplifyGeometry(zig, lit(0.1)).getField("pts")).as("n_tol_small"),
      stGeometryType(simplifyGeometry(zig, lit(0.5))).as("simp_t"),
      size(stGeometries(ml)).cast("long").as("n_geoms"),
      stGeometries(stBoundary(pt)).isNull.as("empty_geoms_null"))
      .orderBy("k")
  }

  /** geometry_nearest_points + geometry_to_dissolved_bing_tiles +
    * to_geometry + flatten_geometry_collections (reference
    * GeoFunctions.java geometryNearestPoints/flattenGeometryCollections,
    * SphericalGeoFunctions.java toGeometry, BingTileFunctions.java
    * geometryToDissolvedBingTiles). Nearest pairs use shapes with a
    * unique minimizer (corner-corner diagonal, apex-to-edge); the
    * dissolve case insets a parent tile's envelope by a quarter tile so
    * the zoom-z cover is exactly the 4 children → dissolves to the
    * parent. */
  def geoNearest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"),
        (col("c_custkey") % 4 + 3).cast("int").as("z"),
        (col("c_custkey") % 20 + 1).cast("int").as("tx"),
        (col("c_custkey") % 12 + 1).cast("int").as("ty"))
    val cx = col("cx"); val cy = col("cy"); val z = col("z")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val sqA = arr(stPoint(cx, cy), stPoint(cx + 2, cy),
      stPoint(cx + 2, cy + 2), stPoint(cx, cy + 2))
    val sqB = arr(stPoint(cx + 5, cy + 5), stPoint(cx + 7, cy + 5),
      stPoint(cx + 7, cy + 7), stPoint(cx + 5, cy + 7))
    val tri = arr(stPoint(cx + 4, cy + 1), stPoint(cx + 6, cy),
      stPoint(cx + 6, cy + 2))
    // dissolve fixture: inset envelope of parent tile (px, py, z-1).
    // Staged through withColumn so the envelope/inset/cover trees stay
    // attribute references instead of inlining the tile-polygon expression
    // a hundred times over (CollapseProject keeps non-cheap reused
    // projections separate).
    val pz = (z - 1).cast("int")
    val half = pow(lit(2.0), pz.cast("double")).cast("int")
    val px = (col("tx") % half).cast("int"); val py = (col("ty") % half).cast("int")
    val staged = g
      .withColumn("parent_poly", bingTilePolygon(
        graft.functions.GeoFunctions.bingTile(px, py, pz)))
      .withColumn("env", stEnvelope(col("parent_poly").getField("pts")))
      .withColumn("w4",
        (col("env").getField("xmax") - col("env").getField("xmin")) / 4.0)
      .withColumn("h4",
        (col("env").getField("ymax") - col("env").getField("ymin")) / 4.0)
      .withColumn("inset", struct(lit("ST_Polygon").as("gtype"), arr(
        stPoint(col("env").getField("xmin") + col("w4"),
          col("env").getField("ymin") + col("h4")),
        stPoint(col("env").getField("xmax") - col("w4"),
          col("env").getField("ymin") + col("h4")),
        stPoint(col("env").getField("xmax") - col("w4"),
          col("env").getField("ymax") - col("h4")),
        stPoint(col("env").getField("xmin") + col("w4"),
          col("env").getField("ymax") - col("h4"))).as("pts")))
      .withColumn("cover", geometryToBingTiles(col("inset"), z))
      .withColumn("dis", geometryToDissolvedBingTiles(col("inset"), z))
      // nearest-points towers are read 4× each below — stage them too
      .withColumn("np1",
        geometryNearestPoints(sqA, sqB, closedA = true, closedB = true))
      .withColumn("np2",
        geometryNearestPoints(sqA, tri, closedA = true, closedB = true))
    val cover = col("cover")
    val dis = col("dis")
    val np1 = col("np1")
    val np2 = col("np2")
    val sph = toSphericalGeography(struct(lit("ST_Point").as("gtype"),
      arr(stPoint(cx, cy * 2 - 60)).as("pts")))
    val mlt = stMultiGeometryFromText(concat(lit("MULTIPOINT ("),
      concat_ws(" ", cx.cast("string"), cy.cast("string")), lit(", "),
      concat_ws(" ", (cx + 1).cast("string"), cy.cast("string")), lit(")")))
    staged.select(col("k"),
      round(stXOf(element_at(np1, 1)) - cx, 6).as("np1_ax"),
      round(stYOf(element_at(np1, 1)) - cy, 6).as("np1_ay"),
      round(stXOf(element_at(np1, 2)) - cx, 6).as("np1_bx"),
      round(stYOf(element_at(np1, 2)) - cy, 6).as("np1_by"),
      round(stXOf(element_at(np2, 1)) - cx, 6).as("np2_ax"),
      round(stYOf(element_at(np2, 1)) - cy, 6).as("np2_ay"),
      round(stXOf(element_at(np2, 2)) - cx, 6).as("np2_bx"),
      round(stYOf(element_at(np2, 2)) - cy, 6).as("np2_by"),
      size(cover).as("n_cover"), size(dis).as("n_dissolved"),
      element_at(dis, 1).getField("zoom").as("dis_zoom"),
      element_at(dis, 1).getField("x").as("dis_x"),
      stGeometryType(toGeometry(sph)).as("tg_type"),
      size(flattenGeometryCollections(mlt)).as("flat_n"),
      stGeometryType(element_at(flattenGeometryCollections(mlt), 1))
        .as("flat_leaf_t"))
      .orderBy("k")
  }

  /** Teradata-compatibility functions (reference presto-teradata-functions:
    * TeradataStringFunctions.java index/char2hexint,
    * TeradataDateFunctions.java to_char/to_date/to_timestamp over the
    * YYYY/MM/DD/HH24/HH/MI/SS element vocabulary). to_char round-trips
    * through to_date; char2hexint pins the UTF-16BE hex encoding. */
  def teradata(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey").as("k"),
        expr("index(o_orderpriority, 'URGENT')").as("idx"),
        expr("index(o_orderpriority, 'zz')").as("idx0"),
        expr("char2hexint('abc')").as("hex_abc"),
        expr("char2hexint(substring(o_orderpriority, 1, 1))").as("hex_first"),
        expr("to_char(cast(o_orderdate as timestamp), 'YYYY-MM-DD')").as("tc"),
        expr("to_char(cast(o_orderdate as timestamp), 'HH24:MI:SS')").as("tc_time"),
        (expr("to_date(to_char(cast(o_orderdate as timestamp), 'YYYY/MM/DD'), 'YYYY/MM/DD')")
          === col("o_orderdate").cast("date")).as("rt"),
        expr("cast(to_timestamp('1992-01-03 04:05:06', 'YYYY-MM-DD HH24:MI:SS') as string)")
          .as("tts"))
      .orderBy("k")
  }

  /** Bing tile family completions (BingTileFunctions.java bing_tile
    * constructors, coordinates/zoom accessors, parent/children): quadkey
    * round-trip, parent/child containment — all dyadic integer closed
    * forms. */
  def bingTile3(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        (col("c_custkey") % 6 + 2).cast("int").as("z"),
        (col("c_custkey") % 50 + 1).cast("int").as("tx"),
        (col("c_custkey") % 30 + 1).cast("int").as("ty"))
    val z = col("z"); val tx = col("tx"); val ty = col("ty")
    // keep coordinates inside the 2^z grid: x,y < 2^z guaranteed by % below
    val x = (tx % pow(lit(2.0), z).cast("int")).cast("int")
    val y = (ty % pow(lit(2.0), z).cast("int")).cast("int")
    val tile = graft.functions.GeoFunctions.bingTile(x, y, z)
    val qk = bingTileQuadkey(tile)
    val rt = bingTileFromQuadkey(qk)
    val parent = bingTileParent(tile)
    val kids = bingTileChildren(tile)
    g.select(col("k"),
      bingTileZoomLevel(tile).as("zoom"),
      bingTileCoordinates(tile).getField("x").as("cx_"),
      bingTileCoordinates(tile).getField("y").as("cy_"),
      (rt === tile).as("qk_roundtrip"),
      length(qk).as("qk_len"),
      parent.getField("x").as("px"),
      parent.getField("zoom").as("pz"),
      size(kids).as("n_kids"),
      (element_at(kids, 1).getField("x") === x * 2).as("kid1_x_ok"),
      forall(kids, c => bingTileParent(c) === tile).as("kids_parent_ok"))
      .orderBy("k")
  }

  /** GeoJSON codec + envelope expansion + scalar union + tz offsets +
    * to_milliseconds + polyline/murmur3/secure_random parity batch
    * (reference GeoFunctions.java geometryAsGeoJson/FromGeoJson/
    * expandEnvelope/geometryUnion, DateTimeFunctions.java timezone_hour/
    * minute + toMilliseconds, HashFunctions.java murmur3_x64_128,
    * MathFunctions.java secureRandom). Every output either a closed form
    * or an engine-checked invariant (round-trips, bounds). */
  def parityMisc(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    GraftFunctions.register(s)
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") % 100) / 8.0).as("cx"),
        ((col("c_custkey") % 77) / 4.0).as("cy"))
    val cx = col("cx"); val cy = col("cy")
    def arr(cs: Column*): Column = org.apache.spark.sql.functions.array(cs: _*)
    val pt = struct(lit("ST_Point").as("gtype"), arr(stPoint(cx, cy)).as("pts"))
    val line = struct(lit("ST_LineString").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 3, cy), stPoint(cx + 3, cy + 4)).as("pts"))
    val poly = struct(lit("ST_Polygon").as("gtype"),
      arr(stPoint(cx, cy), stPoint(cx + 2, cy),
        stPoint(cx + 2, cy + 2), stPoint(cx, cy + 2)).as("pts"))
    val gj = geometryAsGeoJson(pt)
    val exp = expandEnvelope(line, lit(1.0))
    val uni = geometryUnionScalar(arr(poly,
      struct(lit("ST_Polygon").as("gtype"),
        arr(stPoint(cx + 10, cy), stPoint(cx + 11, cy),
          stPoint(cx + 11, cy + 1), stPoint(cx + 10, cy + 1)).as("pts"))))
    val ts = to_timestamp(lit("2021-06-15 12:00:00"))
    def tzOffset(zone: Column): Column =
      from_utc_timestamp(ts, zone).cast("long") - ts.cast("long")
    val offIst = tzOffset(lit("+05:30")); val offPst = tzOffset(lit("-08:00"))
    val iv = expr("INTERVAL '1 02:03:04.567' DAY TO SECOND")
    val pl = call_function("google_polyline_encode", line.getField("pts"))
    val plDec = call_function("google_polyline_decode", pl)
    val plOk = forall(zip_with(line.getField("pts"), plDec, (a, b) =>
      abs(a.getField("x") - b.getField("x")) < 1e-5 &&
        abs(a.getField("y") - b.getField("y")) < 1e-5), x => x)
    val mm = call_function("murmur3_x64_128", call_function("to_utf8",
      concat(lit("k"), col("k").cast("string"))))
    val sr = call_function("secure_random", lit(2.0), lit(5.0))
    g.select(col("k"),
      gj.as("geojson"),
      (geometryFromGeoJson(gj) === pt).as("gj_rt_pt"),
      (geometryFromGeoJson(geometryAsGeoJson(line)) === line).as("gj_rt_line"),
      (geometryFromGeoJson(geometryAsGeoJson(poly)) === poly).as("gj_rt_pg"),
      round(stArea(exp.getField("pts")), 4).as("exp_area"),
      stNumGeometries(uni).as("uni_n"),
      round(stAreaMulti(uni), 4).as("uni_area"),
      (offIst / 3600).cast("long").as("tz_h_ist"),
      ((offIst % 3600) / 60).cast("long").as("tz_m_ist"),
      (offPst / 3600).cast("long").as("tz_h_pst"),
      ((offPst % 3600) / 60).cast("long").as("tz_m_pst"),
      call_function("to_milliseconds", iv).as("iv_ms"),
      plOk.as("polyline_rt"),
      length(mm).as("mm_len"),
      hex(call_function("murmur3_x64_128", call_function("to_utf8", lit(""))))
        .as("mm_empty"),
      (sr >= 2.0 && sr < 5.0).as("sr_in_range"))
      .orderBy("k")
  }

  /** Bing tile completions (reference geospatial/BingTileFunctions.java):
    * bing_tile_polygon (tile envelope as a geometry) and
    * geometry_to_bing_tiles (envelope tile cover at a zoom). Tile x
    * bounds are dyadic-exact; latitude bounds round to 1e-9 degrees to
    * absorb libm atan/exp ulps. */
  def bingTile2(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoFunctions._
    val g = t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey").as("k"),
        ((col("c_custkey") * 7 % 140) - 70 + 0.25).cast("double").as("lat"),
        ((col("c_custkey") * 13 % 300) - 150 + 0.25).cast("double").as("lon"),
        (col("c_custkey") % 6 + 3).cast("int").as("zoom"),
        (lit(0.5) + (col("c_custkey") % 3) * 0.5).as("dx"),
        (lit(0.25) + (col("c_custkey") % 2) * 0.25).as("dy"))
    val tile = bingTileAt(col("lat"), col("lon"), col("zoom"))
    val tp = bingTilePolygon(tile)
    def sqp(x0: Column, y0: Column, x1: Column, y1: Column): Column =
      struct(lit("ST_Polygon").as("gtype"),
        org.apache.spark.sql.functions.array(
          stPoint(x0, y0), stPoint(x1, y0),
          stPoint(x1, y1), stPoint(x0, y1)).as("pts"))
    val box = sqp(col("lon") - col("dx"), col("lat") - col("dy"),
      col("lon") + col("dx"), col("lat") + col("dy"))
    val tiles = geometryToBingTiles(box, col("zoom"))
    g.select(col("k"), col("zoom"),
      tile.getField("x").as("tile_x"), tile.getField("y").as("tile_y"),
      stNumPoints(tp.getField("pts")).as("tp_n"),
      element_at(tp.getField("pts"), 1).getField("x").as("tp_xmin"),
      element_at(tp.getField("pts"), 2).getField("x").as("tp_xmax"),
      round(element_at(tp.getField("pts"), 3).getField("y"), 9).as("tp_ymax"),
      round(element_at(tp.getField("pts"), 1).getField("y"), 9).as("tp_ymin"),
      size(tiles).cast("long").as("n_tiles"),
      element_at(tiles, 1).getField("x").cast("long").as("t1_x"),
      element_at(tiles, 1).getField("y").cast("long").as("t1_y"))
      .orderBy("k")
  }

  /** Error-contract parity (reference ArraySubscriptOperator.java,
    * MapSubscriptOperator.java, COMMON/type/CharType.java): out-of-bounds
    * and zero array subscripts RAISE (recoverable via TRY → NULL, exactly
    * the reference pairing), missing map keys RAISE, and char(n) values
    * are space-padded to their declared length so length() = n and
    * char ≠ unpadded varchar. The raise paths themselves are asserted in
    * FunctionsSpec; this gate verifies the TRY-visible surface. */
  def errContracts(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_err")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT o_orderkey AS k,
        |  array(o_orderkey, o_orderkey + 1, o_orderkey + 2) AS a,
        |  map('k1', o_orderkey, 'k2', o_orderkey * 2) AS mp
        | FROM orders_err WHERE o_orderkey <= 200)
        |SELECT k,
        |  a[2] AS a2,
        |  TRY(a[5]) AS a_oob,
        |  TRY(a[0]) AS a_zero,
        |  mp['k2'] AS m_hit,
        |  TRY(mp['nope']) AS m_miss,
        |  CAST(length(CAST('ab' AS CHAR(5))) AS BIGINT) AS char_len,
        |  CAST('ab' AS CHAR(5)) = 'ab' AS char_vs_varchar,
        |  CAST('ab' AS CHAR(5)) = CAST('ab' AS CHAR(5)) AS char_eq
        |FROM b ORDER BY k""".stripMargin)
  }

  /** `time` type through the dialect (reference StandardTypes.java:45):
    * Spark 4.1's native TIME (enabled by SqlSession) — literal, make_time
    * construction, hour/minute/second extraction, interval arithmetic and
    * the varchar cast, hash-compared against DuckDB's native TIME (the
    * TIME(6) parquet annotation reads back as TIME on the oracle side).
    * Seconds-of-day stay below 80000 so +30min never wraps midnight.
    * `time with time zone` raises the documented dialect error
    * (SqlSessionSpec). */
  def timeOps(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_time")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT o_orderkey AS k, o_orderkey % 80000 AS s
        |           FROM orders_time WHERE o_orderkey <= 500),
        |tt AS (SELECT k, make_time(CAST(FLOOR(s / 3600) AS INT),
        |                CAST(FLOOR(s / 60) AS INT) % 60,
        |                CAST(s % 60 AS DOUBLE)) AS t FROM b)
        |SELECT k, t, TIME '08:30:15' AS t_lit,
        |  CAST(hour(t) AS BIGINT) AS h, CAST(minute(t) AS BIGINT) AS m,
        |  CAST(second(t) AS BIGINT) AS sec,
        |  t + INTERVAL 30 MINUTE AS t2,
        |  CAST(t AS STRING) AS st
        |FROM tt ORDER BY k""".stripMargin)
  }

  /** `time with time zone` — per-VALUE zone offsets through the dialect
    * (reference StandardTypes.java:46, SqlTimeWithTimeZone,
    * DateTimeFunctions.java; engine kernels in
    * functions/TimeTzFunctions.scala): per-row offsets spanning the full
    * [-14:00, +14:00] range, literal + CAST construction, local-field
    * extraction, signed timezone_hour/minute, instant ordering across
    * zones, AT-TIME-ZONE instant preservation, the reference varchar
    * rendering. The DuckDB oracle states every expected value in closed
    * integer/printf form. */
  def timetzOps(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_ttz")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(o_orderkey % 80000 AS BIGINT) AS sod,
        |    CAST(CAST(o_orderkey % 169 AS INT) * 10 - 840 AS INT) AS off
        |  FROM orders_ttz WHERE o_orderkey <= 500),
        |z AS (SELECT k, sod, off,
        |    concat(CASE WHEN off < 0 THEN '-' ELSE '+' END,
        |      lpad(CAST(CAST(FLOOR(abs(off) / 60) AS INT) AS STRING), 2, '0'),
        |      ':', lpad(CAST(abs(off) % 60 AS STRING), 2, '0')) AS zone
        |  FROM b),
        |tt AS (SELECT k, sod, off, zone,
        |    graft_timetz(concat(
        |      lpad(CAST(CAST(FLOOR(sod / 3600) AS INT) AS STRING), 2, '0'),
        |      ':',
        |      lpad(CAST(CAST(FLOOR(sod / 60) AS INT) % 60 AS STRING), 2, '0'),
        |      ':', lpad(CAST(sod % 60 AS STRING), 2, '0'), ' ', zone)) AS t1
        |  FROM z)
        |SELECT k,
        |  graft_timetz_format(t1) AS s1,
        |  CAST(hour(t1) AS BIGINT) AS h,
        |  CAST(minute(t1) AS BIGINT) AS mi,
        |  CAST(second(t1) AS BIGINT) AS se,
        |  timezone_hour(t1) AS tzh,
        |  timezone_minute(t1) AS tzm,
        |  graft_timetz_format(at_timezone(t1, '+02:00')) AS s2,
        |  t1 < graft_timetz('12:00:00 +00:00') AS lt_noon,
        |  graft_timetz_format(TIME '03:04:05.321 +07:09') AS lit1,
        |  graft_timetz_format(CAST('12:00:00+05:30' AS TIME WITH TIME ZONE))
        |    AS c1
        |FROM tt ORDER BY k""".stripMargin)
  }

  /** `timestamp with time zone` — per-VALUE zones through the dialect
    * (reference StandardTypes.java:48, SqlTimestampWithTimeZone,
    * DateTimeEncoding.java packs millisUtc + TimeZoneKey; engine kernels
    * in functions/TimestampTzFunctions.scala): per-row offsets spanning
    * [-14:00, +14:00], literal + CAST construction, DST-aware local
    * field extraction (named-zone summer/winter constants), signed
    * timezone_hour/minute, instant ordering across zones, AT-TIME-ZONE
    * instant preservation with calendar carry, to_unixtime, the
    * reference varchar rendering. The DuckDB oracle replays everything
    * in closed form (naive make_timestamp + interval arithmetic). */
  def tstzOps(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_tstz")
    graft.api.SqlSession.wrap(s).sql(
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(CAST(o_orderkey % 169 AS INT) * 10 - 840 AS INT) AS off,
        |    CAST(o_orderkey % 28 + 1 AS INT) AS d,
        |    CAST(o_orderkey % 24 AS INT) AS hh,
        |    CAST(o_orderkey % 60 AS INT) AS mi,
        |    CAST((o_orderkey * 7) % 60 AS INT) AS se
        |  FROM orders_tstz WHERE o_orderkey <= 500),
        |z AS (SELECT k, off, d, hh, mi, se,
        |    concat(CASE WHEN off < 0 THEN '-' ELSE '+' END,
        |      lpad(CAST(CAST(FLOOR(abs(off) / 60) AS INT) AS STRING), 2, '0'),
        |      ':', lpad(CAST(abs(off) % 60 AS STRING), 2, '0')) AS zone
        |  FROM b),
        |tt AS (SELECT k, off, zone,
        |    graft_tstz(concat('2020-03-', lpad(CAST(d AS STRING), 2, '0'),
        |      ' ', lpad(CAST(hh AS STRING), 2, '0'),
        |      ':', lpad(CAST(mi AS STRING), 2, '0'),
        |      ':', lpad(CAST(se AS STRING), 2, '0'), ' ', zone)) AS t1
        |  FROM z)
        |SELECT k,
        |  graft_tstz_format(t1) AS s1,
        |  CAST(year(t1) AS BIGINT) AS y,
        |  CAST(month(t1) AS BIGINT) AS mo,
        |  CAST(day(t1) AS BIGINT) AS dd,
        |  CAST(hour(t1) AS BIGINT) AS h,
        |  CAST(minute(t1) AS BIGINT) AS mi2,
        |  CAST(second(t1) AS BIGINT) AS se2,
        |  timezone_hour(t1) AS tzh,
        |  timezone_minute(t1) AS tzm,
        |  graft_tstz_format(at_timezone(t1, '+02:00')) AS s2,
        |  t1 < graft_tstz('2020-03-15 00:00:30.500 +00:00') AS lt_mid,
        |  graft_tstz_unixtime(t1) AS ux,
        |  CAST(timezone_hour(at_timezone(
        |    TIMESTAMP '2021-07-01 12:00:00 UTC', 'America/Los_Angeles'))
        |    AS BIGINT) AS la_sum,
        |  CAST(timezone_hour(at_timezone(
        |    TIMESTAMP '2021-01-01 12:00:00 UTC', 'America/Los_Angeles'))
        |    AS BIGINT) AS la_win,
        |  graft_tstz_format(at_timezone(
        |    TIMESTAMP '2021-07-01 12:00:00 UTC', 'America/Los_Angeles')) AS la_s2,
        |  graft_tstz_format(CAST('2020-06-01 08:30:00+05:30'
        |    AS TIMESTAMP WITH TIME ZONE)) AS c1
        |FROM tt ORDER BY k""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_err_contracts" -> errContracts,
    "fn_time" -> timeOps,
    "fn_timetz" -> timetzOps,
    "fn_tstz" -> tstzOps,
    "fn_qdigest" -> qdigestSketch,
    "fn_sketch_dispatch" -> sketchDispatch,
    "fn_sparse_math" -> sparseMath,
    "fn_tdigest" -> tdigestSketch,
    "fn_kll" -> kllSketch,
    "fn_theta" -> thetaSketch,
    "fn_math" -> math,
    "fn_trig" -> trig,
    "fn_string" -> string,
    "fn_string_sim" -> stringSim,
    "fn_datetime" -> datetime,
    "fn_mysql_datefmt" -> mysqlDateFmt,
    "fn_datetime2" -> datetime2,
    "fn_array" -> array,
    "fn_map" -> map,
    "fn_json" -> json,
    "fn_json2" -> json2,
    "fn_binary" -> binary,
    "fn_bitwise" -> bitwise,
    "fn_url" -> url,
    "fn_url_codec" -> urlCodec,
    "fn_iso_duration" -> isoDuration,
    "fn_timezone" -> timezone,
    "fn_base" -> baseConv,
    "fn_geo_poly" -> geoPoly,
    "fn_geo_line" -> geoLine,
    "fn_geo_multi" -> geoMulti,
    "fn_geo_pred" -> geoPred,
    "fn_geo_setops" -> geoSetOps,
    "fn_geo_setops2" -> geoSetOps2,
    "fn_geo_sphere" -> geoSphere,
    "fn_geo_sphere2" -> geoSphere2,
    "fn_geo_access" -> geoAccess,
    "fn_geo_holes" -> geoHoles,
    "fn_geo_hull" -> geoHull,
    "fn_geo_lineops" -> geoLineOps,
    "fn_geo_wkb" -> geoWkb,
    "fn_geo_relate" -> geoRelate,
    "fn_bingtile2" -> bingTile2,
    "fn_bingtile3" -> bingTile3,
    "fn_parity_misc" -> parityMisc,
    "fn_geo_nearest" -> geoNearest,
    "fn_teradata" -> teradata,
    "agg_geo_union" -> geoUnionAgg,
    "agg_convex_hull" -> convexHullAgg,
    "fn_conv" -> conv,
    "fn_split_map" -> splitMap,
    "fn_conditional" -> conditional,
    "fn_regex" -> regex,
    "fn_vector" -> vector,
    "fn_geo" -> geo,
    "fn_ip" -> ip,
    "fn_array_adv" -> arrayAdv,
    "fn_wilson" -> wilson,
    "fn_parity3" -> parity3,
    "fn_plan_json" -> planJsonFns,
    "fn_misc" -> misc,
    "fn_hll" -> hllSketch,
    "fn_setdigest" -> setDigest,
    "fn_khll" -> khll,
    "fn_regex_lambda" -> regexLambda,
    "fn_breadth" -> breadth,
    "fn_ip2" -> ip2,
    "fn_datetime3" -> datetime3,
    "fn_geo_cast" -> geoCast,
    "fn_sfm" -> sfm,
    "fn_bingtile" -> bingTile,
    "fn_hmac" -> hmacKat,
    "fn_cdf" -> cdfKat,
    "fn_array_adv2" -> arrayAdv2,
    "fn_map_adv" -> mapAdv,
    "fn_map_adv2" -> mapAdv2,
    "fn_color" -> colorFns,
    "fn_string_sql" -> stringSql,
    "fn_helpers_sql" -> helpersSql)

  /** SFM differential-privacy distinct sketches (reference noisyaggregation/
    * sketch/SfmSketch.java, aggregations NoisyApproximateSetSfmAggregation /
    * NoisyApproximateDistinctCountSfmAggregation, scalar SfmSketchFunctions
    * .java). Sketch bytes are engine-specific and the ε-flip is random, so
    * the gate asserts the bounds the oracle CAN check: ε=∞ (non-private) is
    * a deterministic bitmap whose estimate sits within FM85 error of exact;
    * sketch↔scalar cardinality agree; a merge of two halves re-estimates
    * the union; and an ε=4 private estimate stays inside a generous DP
    * tolerance. */
  def sfm(s: SparkSession, dir: String): DataFrame = {
    val g = GraftFunctions
    val inf = Double.PositiveInfinity
    val li = t(s, dir, "lineitem")
    val agged = li.agg(
      g.noisyApproxDistinctSfm(col("l_orderkey"), inf).as("est"),
      countDistinct(col("l_orderkey")).as("exact"),
      g.noisyApproxSetSfm(col("l_orderkey"), inf).as("sk"),
      g.noisyApproxSetSfm(
        when(col("l_orderkey") % 2 === 0, col("l_orderkey")), inf).as("ska"),
      g.noisyApproxSetSfm(
        when(col("l_orderkey") % 2 =!= 0, col("l_orderkey")), inf).as("skb"),
      g.noisyApproxDistinctSfm(col("l_orderkey"), 4.0).as("dp_est"))
    val nonPriv = agged.select(lit(-1L).as("k"), lit("nonprivate_est").as("metric"),
      (abs(col("est").cast("double") / col("exact") - 1) <= 0.05).as("ok"))
    val scalarEq = agged.select(lit(-2L).as("k"), lit("scalar_cardinality").as("metric"),
      (g.sfmCardinality(col("sk")) === col("est")).as("ok"))
    val dpBound = agged.select(lit(-3L).as("k"), lit("dp_est_bound").as("metric"),
      (abs(col("dp_est").cast("double") / col("exact") - 1) <= 0.3).as("ok"))
    val merged = agged
      .select(col("exact"), explode(F.array(col("ska"), col("skb"))).as("h"))
      .groupBy("exact").agg(g.mergeSfm(col("h")).as("m"))
      .select(lit(-4L).as("k"), lit("merge_union").as("metric"),
        (abs(g.sfmCardinality(col("m")).cast("double") / col("exact") - 1) <= 0.05)
          .as("ok"))
    nonPriv.unionAll(scalarEq).unionAll(dpBound).unionAll(merged)
      .orderBy("k", "metric")
  }

  /** MinHash set digests (reference setdigest family: make_set_digest /
    * merge / cardinality / jaccard_index / intersection_cardinality —
    * type/setdigest/SetDigestFunctions.java:38-81). Sketch bytes are
    * engine-specific, so the gate asserts spec bounds the oracle CAN check:
    * KMV is exact below k (per-nation customer sets), and estimate /
    * jaccard / intersection errors stay inside their statistical bounds
    * (~1/sqrt(k)) on ~15k-distinct lineitem orderkeys. */
  def setDigest(s: SparkSession, dir: String): DataFrame = {
    val sd = GraftFunctions
    // exact path: per-nation distinct customer keys (n < k=512 → KMV exact)
    val exactSmall = t(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("k"))
      .agg(sd.makeSetDigest(col("c_custkey")).as("d"),
        countDistinct(col("c_custkey")).as("exact"))
      .select(col("k"), lit("exact_small").as("metric"),
        (sd.setDigestCardinality(col("d")) === col("exact")).as("ok"))
    // estimate path over ~15k distinct orderkeys; A = keys %3!=0, B = %3!=1
    val li = t(s, dir, "lineitem")
    val sk = li.agg(
      sd.makeSetDigest(col("l_orderkey")).as("du"),
      sd.makeSetDigest(when(col("l_orderkey") % 3 =!= 0, col("l_orderkey"))).as("da"),
      sd.makeSetDigest(when(col("l_orderkey") % 3 =!= 1, col("l_orderkey"))).as("db"),
      countDistinct(col("l_orderkey")).as("n_u"),
      countDistinct(when(col("l_orderkey") % 3 === 2, col("l_orderkey"))).as("n_i"))
    val est = sk.select(F.array(col("da"), col("db")).as("ds"))
      .select(explode(col("ds")).as("d"))
      .agg(sd.mergeSetDigest(col("d")).as("md"))
      .crossJoin(sk.select(col("du"), col("n_u")))
      .select(
        lit(-1L).as("k"), lit("est_bounds").as("metric"),
        // merged A∪B digest must agree with the directly-built union digest
        (sd.setDigestCardinality(col("md")) === sd.setDigestCardinality(col("du")))
          .as("ok"))
    val bound = sk.select(
      lit(-2L).as("k"), lit("kmv_estimate").as("metric"),
      (abs(sd.setDigestCardinality(col("du")).cast("double") / col("n_u") - 1.0) < 0.1)
        .as("ok"))
    val jac = sk.select(
      lit(-3L).as("k"), lit("jaccard").as("metric"),
      (abs(sd.jaccardIndex(col("da"), col("db")) -
        col("n_i").cast("double") / col("n_u")) < 0.08).as("ok"))
    val inter = sk.select(
      lit(-4L).as("k"), lit("intersection").as("metric"),
      (abs(sd.intersectionCardinality(col("da"), col("db")).cast("double") /
        col("n_i") - 1.0) < 0.25).as("ok"))
    exactSmall.unionAll(est).unionAll(bound).unionAll(jac).unionAll(inter)
      .orderBy("k", "metric")
  }

  /** Lambda-variant regexp_replace (JoniRegexpReplaceLambdaFunction.java:44):
    * the lambda sees the capture-group array per match. Exercised as SQL
    * TEXT through the session (the reference spelling); DuckDB replays
    * each transformation with its own list lambdas / CASE logic —
    * word-uppercasing, per-word capitalization via two groups, an
    * alternation where one group is always NULL, and the
    * NULL-result-nulls-everything contract. */
  def regexLambda(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_rxl")
    graft.api.SqlSession.wrap(s).sql(
      """SELECT p_partkey AS k,
        | regexp_replace(p_name, '([a-z]+)', x -> upper(x[1])) AS up_words,
        | regexp_replace(p_name, '([a-z])([a-z]*)',
        |   x -> upper(x[1]) || x[2]) AS capitalized,
        | regexp_replace(p_type, '(STANDARD)|(SMALL)',
        |   x -> coalesce(x[1], '') || coalesce(x[2], '') || '!') AS tagged,
        | regexp_replace(p_name, '(a)',
        |   x -> CASE WHEN x[1] = 'a' THEN NULL ELSE x[1] END) AS null_prop
        |FROM part_rxl WHERE p_partkey <= 200 ORDER BY k""".stripMargin)
  }

  /** Breadth batch (VarbinaryFunctions to/from_big_endian + ieee754,
    * CombineHashFunction, StringFunctions strrpos/longest_common_prefix,
    * array find_first/find_first_index/array_sum/trim_array,
    * DateTimeFunctions week/year_of_week/last_day_of_month). All per-row
    * codegen'd projections exercised as SQL text; DuckDB replays each with
    * its own primitives (to_hex/lpad, list lambdas, isoyear). */
  def breadth(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_brd")
    graft.api.SqlSession.wrap(s).sql(
      """SELECT p_partkey AS k,
        | strrpos(p_name, 'a') AS rpos_a,
        | longest_common_prefix(p_name, concat(substr(p_name, 1, 5), 'ZZZ')) AS lcp5,
        | find_first(split(p_name, ' '), w -> length(w) > 5) AS ff,
        | find_first_index(split(p_name, ' '), w -> length(w) > 5) AS ffi,
        | array_sum(transform(split(p_name, ' '), w -> cast(length(w) AS DOUBLE)))
        |   AS asum,
        | concat_ws('|', trim_array(split(p_name, ' '), 2)) AS trimmed,
        | hex(to_big_endian_64(p_partkey)) AS be64,
        | from_big_endian_64(to_big_endian_64(p_partkey * 7919)) AS be_rt,
        | hex(to_big_endian_32(p_size)) AS be32,
        | from_ieee754_64(to_ieee754_64(cast(p_retailprice AS DOUBLE))) AS ieee_rt,
        | combine_hash(p_partkey, cast(p_size AS BIGINT)) AS ch,
        | cast(week(date_add(DATE '1995-01-01', cast(p_partkey AS INT))) AS BIGINT)
        |   AS wk,
        | year_of_week(date_add(DATE '1995-01-01', cast(p_partkey AS INT))) AS yow,
        | last_day_of_month(date_add(DATE '1995-01-01', cast(p_partkey AS INT)))
        |   AS ldom
        |FROM part_brd WHERE p_partkey <= 200 ORDER BY k""".stripMargin)
  }

  /** KHyperLogLog (reference khyperloglog family: khyperloglog_agg /
    * merge_khll / cardinality / jaccard_index / intersection_cardinality /
    * uniqueness_distribution / reidentification_potential —
    * type/khyperloglog/KHyperLogLogFunctions.java:33-143). Sketch bytes are
    * engine-specific, so the gate asserts what the oracle CAN check: the
    * structure is exact below K=4096 (cardinality, intersection,
    * uniqueness histogram, reidentification on the 1:1 custkey→nation
    * fan-out), and in the estimated regime (~15k distinct lineitem
    * orderkeys) the KMV/MinHash estimates stay inside statistical bounds. */
  def khll(s: SparkSession, dir: String): DataFrame = {
    val g = GraftFunctions
    // exact regime: per-nation distinct customer keys (n << K → exact)
    val exactSmall = t(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("k"))
      .agg(g.khyperloglogAgg(col("c_custkey"), col("c_custkey")).as("d"),
        countDistinct(col("c_custkey")).as("exact"))
      .select(col("k"), lit("exact_small").as("metric"),
        (g.khllCardinality(col("d")) === col("exact")).as("ok"))
    // custkey → nationkey is exactly 1:1 per value: the uniqueness
    // histogram must put all mass on bucket 1 and every value is
    // "highly unique" under threshold 1
    val cu = t(s, dir, "customer")
      .agg(g.khyperloglogAgg(col("c_custkey"), col("c_nationkey")).as("d"),
        countDistinct(col("c_custkey")).as("n"))
    val uniq = cu.select(lit(-1L).as("k"), lit("uniqueness_exact").as("metric"),
      (abs(element_at(g.uniquenessDistribution(col("d"), lit(4L)), lit(1L)) - 1.0)
        < 1e-9 &&
        element_at(g.uniquenessDistribution(col("d"), lit(4L)), lit(2L)) === 0.0)
        .as("ok"))
    val reid = cu.select(lit(-2L).as("k"), lit("reident_exact").as("metric"),
      (g.reidentificationPotential(col("d"), lit(1L)) === 1.0).as("ok"))
    // merge path: per-nation sketches merged == directly-built global sketch
    val merged = t(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(g.khyperloglogAgg(col("c_custkey"), col("c_nationkey")).as("d"))
      .agg(g.mergeKhll(col("d")).as("m"))
      .crossJoin(cu.select(col("n")))
      .select(lit(-3L).as("k"), lit("merge_union").as("metric"),
        (g.khllCardinality(col("m")) === col("n")).as("ok"))
    // estimated regime over ~15k distinct orderkeys; A = %3!=0, B = %3!=1
    val li = t(s, dir, "lineitem")
    val sk = li.agg(
      g.khyperloglogAgg(col("l_orderkey"), col("l_suppkey")).as("du"),
      g.khyperloglogAgg(when(col("l_orderkey") % 3 =!= 0, col("l_orderkey")),
        col("l_suppkey")).as("da"),
      g.khyperloglogAgg(when(col("l_orderkey") % 3 =!= 1, col("l_orderkey")),
        col("l_suppkey")).as("db"),
      countDistinct(col("l_orderkey")).as("n_u"),
      countDistinct(when(col("l_orderkey") % 3 === 2, col("l_orderkey"))).as("n_i"))
    val bound = sk.select(lit(-4L).as("k"), lit("kmv_estimate").as("metric"),
      (abs(g.khllCardinality(col("du")).cast("double") / col("n_u") - 1.0) < 0.1)
        .as("ok"))
    val jac = sk.select(lit(-5L).as("k"), lit("jaccard").as("metric"),
      (abs(g.khllJaccardIndex(col("da"), col("db")) -
        col("n_i").cast("double") / col("n_u")) < 0.08).as("ok"))
    val inter = sk.select(lit(-6L).as("k"), lit("intersection").as("metric"),
      (abs(g.khllIntersectionCardinality(col("da"), col("db")).cast("double") /
        col("n_i") - 1.0) < 0.25).as("ok"))
    // uniqueness in the estimated-fanout regime: mean of the histogram
    // (≈ avg orders per customer, HLL-estimated per value) within 10%
    val om = t(s, dir, "orders")
      .agg(g.khyperloglogAgg(col("o_custkey"), col("o_orderkey")).as("d"),
        (count(lit(1)).cast("double") / countDistinct(col("o_custkey")))
          .as("true_avg"))
      .select(lit(-7L).as("k"), lit("uniqueness_mean").as("metric"),
        (abs(aggregate(map_entries(g.uniquenessDistribution(col("d"), lit(256L))),
          lit(0.0), (acc, e) => acc + e.getField("key") * e.getField("value")) /
          col("true_avg") - 1.0) < 0.1).as("ok"))
    exactSmall.unionAll(uniq).unionAll(reid).unionAll(merged).unionAll(bound)
      .unionAll(jac).unionAll(inter).unionAll(om)
      .orderBy("k", "metric")
  }

  /** Bing tile system (BingTileFunctions.java: bing_tile_at, quadkey —
    * Web Mercator tiles at varying zoom). Deterministic lat/lon derived
    * from customer keys; DuckDB recomputes the same projection math. */
  def bingTile(s: SparkSession, dir: String): DataFrame = {
    val geo = graft.functions.GeoFunctions
    val pts = t(s, dir, "customer").filter(col("c_custkey") <= 300).select(
      col("c_custkey").as("k"),
      ((col("c_custkey") * 7 % 160) - 80 + 0.5).cast("double").as("lat"),
      ((col("c_custkey") * 13 % 360) - 180 + 0.5).cast("double").as("lon"),
      (col("c_custkey") % 8 + 4).cast("int").as("zoom"))
    pts.select(col("k"), col("lat"), col("lon"), col("zoom"),
      geo.bingTileAt(col("lat"), col("lon"), col("zoom")).as("tile"))
      .select(col("k"), col("lat"), col("lon"), col("zoom"),
        col("tile.x").as("tile_x"), col("tile.y").as("tile_y"),
        graft.functions.GeoFunctions.bingTileQuadkey(col("tile")).as("quadkey"))
      .orderBy("k")
  }

  /** HMAC known-answer test (HmacFunctions.java). Inputs are the RFC
    * 2202 / RFC 4231 test vectors; the oracle carries the published
    * digests as literals, so the custom Mac expression is verified against
    * an external truth rather than itself. */
  def hmacKat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gf = GraftFunctions
    val rows = Seq(
      ("tc1", "0b" * 20, "4869205468657265"),
      ("tc2", "4a656665",
        "7768617420646f2079612077616e7420666f72206e6f7468696e673f"),
      ("tc3", "aa" * 20, "dd" * 50))
    def mac(algo: String) =
      lower(hex(gf.hmac(unhex(col("data_hex")), unhex(col("key_hex")), algo)))
    rows.toDF("tc", "key_hex", "data_hex")
      .select(col("tc"),
        mac("HmacMD5").as("md5"), mac("HmacSHA1").as("sha1"),
        mac("HmacSHA256").as("sha256"), mac("HmacSHA512").as("sha512"))
      .orderBy("tc")
  }

  /** Probability distribution CDFs + inverses (MathFunctions.java:233,
    * 844-1110). Forward CDFs verify against closed forms the oracle can
    * compute exactly (Erlang/chi², Cauchy/Laplace/Weibull/t₁ elementary
    * forms, integer-parameter beta/F polynomials, finite binomial/Poisson
    * sums); normal_cdf against stdlib-erf known answers. Inverses verify by
    * roundtrip through the independently-verified forward direction, so the
    * Brent-solver path is pinned to the same truth. */
  def cdfKat(s: SparkSession, dir: String): DataFrame = {
    val D = graft.functions.Distributions
    val base = t(s, dir, "nation").select(
      col("n_nationkey").cast("int").as("k"),
      (col("n_nationkey") * 0.4 + 0.3).cast("double").as("x"),
      ((col("n_nationkey") + 0.5) / 26.0).cast("double").as("u"),
      (col("n_nationkey") % 11).cast("double").as("kk"),
      (col("n_nationkey") % 8).cast("double").as("kp"))
    def l(d: Double) = lit(d)
    def r8(c: org.apache.spark.sql.Column) = round(c, 8)
    def r6(c: org.apache.spark.sql.Column) = round(c, 6)
    val ip = D.inversePoissonCdf(l(3.0), col("u")).cast("double")
    base.select(
      col("k"), round(col("x"), 8).as("x"), round(col("u"), 8).as("u"),
      r8(D.chiSquaredCdf(l(2.0), col("x"))).as("chi2_2"),
      r8(D.chiSquaredCdf(l(4.0), col("x"))).as("chi2_4"),
      r8(D.gammaCdf(l(3.0), l(1.0), col("x"))).as("gamma_31"),
      r8(D.cauchyCdf(l(1.0), l(2.0), col("x"))).as("cauchy_c"),
      r8(D.laplaceCdf(l(2.0), l(1.5), col("x"))).as("laplace_c"),
      r8(D.weibullCdf(l(1.5), l(2.0), col("x"))).as("weibull_c"),
      r8(D.betaCdf(l(2.0), l(3.0), col("u"))).as("beta_23"),
      r8(D.fCdf(l(2.0), l(4.0), col("x"))).as("f_24"),
      r8(D.tCdf(l(1.0), col("x") - 5.0)).as("t_1"),
      r8(D.binomialCdf(l(10.0), l(0.3), col("kk"))).as("binom_c"),
      r8(D.poissonCdf(l(3.0), col("kp"))).as("pois_c"),
      r8(D.normalCdf(l(1.0), l(2.0), col("x"))).as("norm_c"),
      r6(D.normalCdf(l(3.0), l(2.0),
        D.inverseNormalCdf(l(3.0), l(2.0), col("u")))).as("inv_norm_rt"),
      r6(D.betaCdf(l(2.5), l(1.5),
        D.inverseBetaCdf(l(2.5), l(1.5), col("u")))).as("inv_beta_rt"),
      r6(D.chiSquaredCdf(l(5.0),
        D.inverseChiSquaredCdf(l(5.0), col("u")))).as("inv_chi2_rt"),
      r6(D.gammaCdf(l(2.5), l(1.5),
        D.inverseGammaCdf(l(2.5), l(1.5), col("u")))).as("inv_gamma_rt"),
      r6(D.fCdf(l(3.0), l(7.0),
        D.inverseFCdf(l(3.0), l(7.0), col("u")))).as("inv_f_rt"),
      r6(D.tCdf(l(4.0), D.inverseTCdf(l(4.0), col("u")))).as("inv_t_rt"),
      r6(D.weibullCdf(l(1.5), l(2.0),
        D.inverseWeibullCdf(l(1.5), l(2.0), col("u")))).as("inv_weibull_rt"),
      r6(D.cauchyCdf(l(1.0), l(2.0),
        D.inverseCauchyCdf(l(1.0), l(2.0), col("u")))).as("inv_cauchy_rt"),
      r6(D.laplaceCdf(l(0.0), l(1.0),
        D.inverseLaplaceCdf(l(0.0), l(1.0), col("u")))).as("inv_laplace_rt"),
      (D.poissonCdf(l(3.0), ip) >= col("u") &&
        (ip === 0.0 || D.poissonCdf(l(3.0), ip - 1.0) < col("u")))
        .as("inv_pois_ok"))
      .orderBy("k")
  }

  val oracle: Map[String, String] = Map(
    "fn_tdigest" ->
      """SELECT k, metric, true AS ok FROM
        |  (SELECT DISTINCT l_returnflag AS k FROM lineitem) g,
        |  (VALUES ('median'), ('p99'), ('rank'), ('tmean')) m(metric)
        |UNION ALL SELECT '__merged__', 'median', true
        |ORDER BY k, metric""".stripMargin,
    "fn_kll" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS k, m.metric,
        |  CAST(CASE m.metric WHEN 'q25' THEN quantile_disc(s_acctbal, 0.25)
        |                     WHEN 'q50' THEN quantile_disc(s_acctbal, 0.5)
        |                     ELSE quantile_disc(s_acctbal, 0.75) END AS DOUBLE) AS v
        |FROM supplier, (VALUES ('q25'), ('q50'), ('q75')) m(metric)
        |GROUP BY 1, 2
        |UNION ALL SELECT -1, 'rank_bound', 1.0
        |UNION ALL SELECT -2, 'merged_bound', 1.0
        |ORDER BY k, metric""".stripMargin,
    "fn_theta" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS k, 'nation_distinct' AS metric,
        |  COUNT(DISTINCT c_custkey) AS v FROM customer GROUP BY 1
        |UNION ALL SELECT -1, 'union', COUNT(DISTINCT c_custkey) FROM customer
        |UNION ALL SELECT -1, 'intersect', COUNT(DISTINCT o_custkey) FROM orders
        |UNION ALL SELECT -1, 'b_not_a',
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
        |    (SELECT o_custkey FROM orders))
        |UNION ALL SELECT -2, 'est_bound', 1
        |ORDER BY k, metric""".stripMargin,
    "fn_color" ->
      """SELECT CAST(r_regionkey AS INT) AS k,
        | CAST(CASE r_regionkey WHEN 0 THEN -2 WHEN 1 THEN -3 WHEN 2 THEN -5
        |      WHEN 3 THEN -7 WHEN 4 THEN -1 END AS BIGINT) AS named,
        | CAST([16711680, 65280, 255, 16777215, 1122867][r_regionkey + 1]
        |      AS BIGINT) AS hexv,
        | CAST(r_regionkey * 50 * 65536 + r_regionkey * 30 * 256 +
        |      r_regionkey * 20 AS BIGINT) AS rgbv,
        | repeat(chr(27) || '[38;5;196m' || '█', CAST(r_regionkey * 2 AS INT))
        |   || chr(27) || '[0m'
        |   || repeat(' ', CAST(8 - r_regionkey * 2 AS INT)) AS bars,
        | chr(27) || '[38;5;46m' || 'v' || CAST(r_regionkey AS VARCHAR)
        |   || chr(27) || '[0m' AS rendered,
        | CASE WHEN r_regionkey % 2 = 0
        |      THEN chr(27) || '[38;5;2m' || chr(10003) || chr(27) || '[0m'
        |      ELSE chr(27) || '[38;5;1m' || chr(10007) || chr(27) || '[0m'
        | END AS rendered_b
        |FROM region ORDER BY k""".stripMargin,
    "fn_string_sql" ->
      """SELECT p_partkey AS k,
        | CASE WHEN strpos(p_name, 'a') = 0 THEN p_name
        |      ELSE substr(p_name, 1, strpos(p_name, 'a') - 1) || 'XY' ||
        |           substr(p_name, strpos(p_name, 'a') + 1) END AS rf,
        | right(p_name, 5) AS tr5,
        | string_split(p_type, ' ')[-1] AS sp_last,
        | string_split(p_type, ' ')[1] AS sp_first
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_helpers_sql" ->
      """WITH b AS (SELECT p_partkey AS k, p_name, p_type,
        |    p_partkey % 7 AS e2, p_partkey % 13 AS e3,
        |    p_partkey % 5 AS f1, (p_partkey % 7) % 5 AS f2,
        |    (p_partkey % 13) % 5 AS f3
        |  FROM part WHERE p_partkey <= 200)
        |SELECT k,
        |  least(k, e2, e3) AS maxby,
        |  CASE WHEN f1 <= f2 AND f1 <= f3 THEN k
        |       WHEN f2 <= f3 THEN e2 ELSE e3 END AS minby,
        |  array_to_string(CASE WHEN e2 = k THEN [k] ELSE [k, e2] END, ',')
        |    AS nary,
        |  CAST(e2 AS VARCHAR) AS pairwise,
        |  CASE WHEN strpos(p_name, 'a') = 0 THEN p_name
        |       ELSE substr(p_name, 1, strpos(p_name, 'a') - 1) || 'XY' ||
        |            substr(p_name, strpos(p_name, 'a') + 1) END AS rf,
        |  right(p_name, 4) AS tr,
        |  string_split(p_type, ' ')[-1] AS sp
        |FROM b ORDER BY k""".stripMargin,
    "fn_array_adv2" ->
      """WITH b AS (SELECT p_partkey AS k,
        |  [CAST(p_size % 5 AS BIGINT), CAST(p_size % 3 AS BIGINT),
        |   CAST(p_size % 5 AS BIGINT), CAST(7 AS BIGINT),
        |   CASE WHEN p_size % 4 = 0 THEN NULL ELSE CAST(p_size % 7 AS BIGINT) END] AS arr,
        |  [[CAST(1 AS BIGINT), CAST(p_size % 3 AS BIGINT)],
        |   [CAST(p_size % 5 AS BIGINT), CAST(4 AS BIGINT)]] AS mat
        | FROM part WHERE p_partkey <= 100),
        |c AS (SELECT k, arr, mat,
        |  list_filter(arr, x -> x IS NOT NULL) AS rn,
        |  list_sort(list_distinct(list_filter(arr, x -> x IS NOT NULL))) AS dv
        | FROM b)
        |SELECT k,
        | round(list_avg(arr), 6) AS avg_a,
        | array_to_string(list_transform(range(0, 3), i ->
        |   '[' || array_to_string(list_transform(arr[i*2+1:i*2+2],
        |     x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') || ']'), ';') AS chunks,
        | array_to_string(list_sort(list_transform(dv, x ->
        |   CAST(x AS VARCHAR) || ':' ||
        |   CAST(len(list_filter(arr, y -> y = x)) AS VARCHAR))), ',') AS freq,
        | array_to_string(list_sort(list_transform(
        |   list_filter(dv, x -> len(list_filter(arr, y -> y = x)) > 1),
        |   x -> CAST(x AS VARCHAR))), ',') AS dups,
        | len(list_filter(dv, x -> len(list_filter(arr, y -> y = x)) > 1)) > 0 AS has_dups,
        | array_to_string(list_transform(
        |   list_sort(list_transform(dv, x ->
        |     [len(list_filter(arr, y -> y = x)), x]))[1:2],
        |   p -> CAST(p[2] AS VARCHAR)), ',') AS least2,
        | list_min(rn) AS maxby_neg,
        | list_max(rn) AS minby_neg,
        | array_to_string(list_transform(list_sort(arr, 'DESC', 'NULLS LAST'),
        |   x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') AS sort_desc,
        | array_to_string(list_transform(rn, x -> CAST(x AS VARCHAR)), ',') AS nonulls,
        | array_to_string(list_transform(list_sort(arr, 'DESC', 'NULLS LAST')[1:3],
        |   x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') AS top3,
        | array_to_string(list_transform(range(1, len(mat[1]) + 1), x ->
        |   '[' || array_to_string(list_transform(mat, y -> CAST(y[x] AS VARCHAR)), ',')
        |   || ']'), ';') AS transp,
        | array_to_string(list_transform(
        |   flatten(list_transform(range(1, len(arr)), ii ->
        |     list_transform(range(ii + 1, len(arr) + 1), jj -> [arr[ii], arr[jj]]))),
        |   pair -> '[' || array_to_string(list_transform(pair,
        |     x -> coalesce(CAST(x AS VARCHAR), 'null')), ',') || ']'), ';') AS comb2
        |FROM c ORDER BY k""".stripMargin,
    "fn_map_adv2" ->
      """SELECT s_suppkey AS k,
        | CASE s_suppkey % 3
        |   WHEN 0 THEN 'v' || CAST(s_suppkey % 5 AS VARCHAR) || ',w'
        |   WHEN 1 THEN 'v' || CAST(s_suppkey % 5 AS VARCHAR) || ',null,w'
        |   ELSE 'v' || CAST(s_suppkey % 5 AS VARCHAR) || ',null,null,w'
        | END AS intarr,
        | '1:x,3:y' AS a2m,
        | TRUE AS ksp_range, TRUE AS ksp_stable, TRUE AS ksp_centile
        |FROM supplier WHERE s_suppkey <= 100 ORDER BY k""".stripMargin,
    "fn_map_adv" ->
      """WITH s0 AS (SELECT s_suppkey AS k,
        |   CAST(s_suppkey % 100 AS DOUBLE) AS v1,
        |   CAST(s_suppkey % 7 AS DOUBLE) AS v2,
        |   CASE WHEN s_suppkey % 3 = 0 THEN NULL
        |        ELSE CAST(s_nationkey AS DOUBLE) END AS v3,
        |   CAST(5.0 AS DOUBLE) AS v4
        |  FROM supplier WHERE s_suppkey <= 100),
        |e AS (SELECT k, unnest(['p','q','r','s']) AS mk,
        |       unnest([v1, v2, v3, v4]) AS mv FROM s0),
        |r AS (SELECT k, mk, mv, row_number() OVER (PARTITION BY k
        |        ORDER BY (mv IS NULL), mv DESC, mk DESC) AS rn FROM e),
        |a AS (SELECT k,
        |   string_agg(CASE WHEN rn <= 2 THEN mk || ':' ||
        |     coalesce(CAST(CAST(mv AS BIGINT) AS VARCHAR), 'null') END,
        |     ',' ORDER BY mk) AS topn2,
        |   string_agg(CASE WHEN rn <= 2 THEN
        |     coalesce(CAST(CAST(mv AS BIGINT) AS VARCHAR), 'null') END,
        |     ',' ORDER BY rn) AS topv2,
        |   string_agg(CASE WHEN rn <= 2 THEN mk END, ',' ORDER BY mk) AS keysbyv,
        |   string_agg(CASE WHEN mv IS NOT NULL THEN mk || ':' ||
        |     CAST(CAST(mv AS BIGINT) AS VARCHAR) END, ',' ORDER BY mk) AS nonull
        |  FROM r GROUP BY k)
        |SELECT s0.k, a.topn2, 's,r' AS topk2, a.topv2, a.keysbyv,
        | true AS kexists, a.nonull,
        | round(v1 / (v1 + v2 + coalesce(v3, 0) + v4), 6) AS norm_p,
        | round(v2 / (v1 + v2 + coalesce(v3, 0) + v4), 6) AS norm_q,
        | round(v4 / (v1 + v2 + coalesce(v3, 0) + v4), 6) AS norm_s,
        | 'p:' || CAST(CAST(v1 AS BIGINT) AS VARCHAR) || ',r:' ||
        |   coalesce(CAST(CAST(v3 AS BIGINT) AS VARCHAR), 'null') AS subset,
        | true AS allk, true AS anyk, true AS nok, true AS anyv
        |FROM s0 JOIN a ON s0.k = a.k ORDER BY s0.k""".stripMargin,
    "fn_cdf" ->
      """WITH nrm(k, norm_c) AS (VALUES
        | (0, 0.36316935), (1, 0.44038231), (2, 0.51993881), (3, 0.59870633),
        | (4, 0.67364478), (5, 0.74215389), (6, 0.80233746), (7, 0.85314094),
        | (8, 0.89435023), (9, 0.92647074), (10, 0.95052853), (11, 0.96784323),
        | (12, 0.97981778), (13, 0.98777553), (14, 0.99285719), (15, 0.99597541),
        | (16, 0.99781404), (17, 0.99885579), (18, 0.99942297), (19, 0.99971971),
        | (20, 0.99986888), (21, 0.99994094), (22, 0.99997439), (23, 0.99998931),
        | (24, 0.99999571)),
        |b AS (SELECT CAST(n_nationkey AS INT) AS k,
        |  CAST(n_nationkey * 0.4 + 0.3 AS DOUBLE) AS x,
        |  CAST((n_nationkey + 0.5) / 26.0 AS DOUBLE) AS u,
        |  CAST(n_nationkey % 11 AS INT) AS kk,
        |  CAST(n_nationkey % 8 AS INT) AS kp
        | FROM nation)
        |SELECT b.k, round(x, 8) AS x, round(u, 8) AS u,
        | round(1 - exp(-x/2), 8) AS chi2_2,
        | round(1 - exp(-x/2) * (1 + x/2), 8) AS chi2_4,
        | round(1 - exp(-x) * (1 + x + x*x/2), 8) AS gamma_31,
        | round(0.5 + atan((x - 1.0) / 2.0) / pi(), 8) AS cauchy_c,
        | round(CASE WHEN x < 2.0 THEN 0.5 * exp((x - 2.0) / 1.5)
        |            ELSE 1 - 0.5 * exp(-(x - 2.0) / 1.5) END, 8) AS laplace_c,
        | round(1 - exp(-pow(x / 2.0, 1.5)), 8) AS weibull_c,
        | round(6*u*u*(1-u)*(1-u) + 4*u*u*u*(1-u) + u*u*u*u, 8) AS beta_23,
        | round(1 - 4.0 / ((x + 2.0) * (x + 2.0)), 8) AS f_24,
        | round(0.5 + atan(x - 5.0) / pi(), 8) AS t_1,
        | round(list_sum(list_transform(range(0, kk + 1), i ->
        |   [1.0,10,45,120,210,252,210,120,45,10,1][i + 1]
        |     * pow(0.3, i) * pow(0.7, 10 - i))), 8) AS binom_c,
        | round(exp(-3.0) * list_sum(list_transform(range(0, kp + 1), i ->
        |   pow(3.0, i) / [1.0,1,2,6,24,120,720,5040][i + 1])), 8) AS pois_c,
        | CAST(nrm.norm_c AS DOUBLE) AS norm_c,
        | round(u, 6) AS inv_norm_rt,
        | round(u, 6) AS inv_beta_rt,
        | round(u, 6) AS inv_chi2_rt,
        | round(u, 6) AS inv_gamma_rt,
        | round(u, 6) AS inv_f_rt,
        | round(u, 6) AS inv_t_rt,
        | round(u, 6) AS inv_weibull_rt,
        | round(u, 6) AS inv_cauchy_rt,
        | round(u, 6) AS inv_laplace_rt,
        | true AS inv_pois_ok
        |FROM b JOIN nrm ON b.k = nrm.k ORDER BY b.k""".stripMargin,
    "fn_hmac" ->
      """SELECT 'tc1' AS tc,
        | '5ccec34ea9656392457fa1ac27f08fbc' AS md5,
        | 'b617318655057264e28bc0b6fb378c8ef146be00' AS sha1,
        | 'b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7' AS sha256,
        | '87aa7cdea5ef619d4ff0b4241a1d6cb02379f4e2ce4ec2787ad0b30545e17cdedaa833b7d6b8a702038b274eaea3f4e4be9d914eeb61f1702e696c203a126854' AS sha512
        |UNION ALL SELECT 'tc2',
        | '750c783e6ab0b503eaa86e310a5db738',
        | 'effcdf6ae5eb2fa2d27416d5f184df9c259a7c79',
        | '5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843',
        | '164b7a7bfcf819e2e395fbe73b56e0a387bd64222e831fd610270cd7ea2505549758bf75c05a994a6d034f65f8f0e6fdcaeab1a34d4a6b4b636e070a38bce737'
        |UNION ALL SELECT 'tc3',
        | '2ab8b9a9f7d3894d15ad8383b97044b2',
        | '125d7342b9ac11cd91a39af48aa17b4f63f175d3',
        | '773ea91e36800e46854db8ebd09181a72959098b3ef8c122d9635514ced565fe',
        | 'fa73b0089d56a284efb0f0756c890be9b1b5dbdd8ee81a3655f83e33b2279d39bf3e848279a722c806b485a47e67c807b946a337bee8942674278859e13292fb'
        |ORDER BY tc""".stripMargin,
    "fn_bingtile" ->
      """WITH p AS (SELECT c_custkey AS k,
        |  CAST(c_custkey * 7 % 160 - 80 + 0.5 AS DOUBLE) AS lat,
        |  CAST(c_custkey * 13 % 360 - 180 + 0.5 AS DOUBLE) AS lon,
        |  CAST(c_custkey % 8 + 4 AS INT) AS zoom
        | FROM customer WHERE c_custkey <= 300),
        |t AS (SELECT k, lat, lon, zoom,
        |  CAST(least(greatest(floor((lon + 180.0) / 360.0 * pow(2.0, zoom)), 0),
        |       pow(2.0, zoom) - 1) AS BIGINT) AS tile_x,
        |  CAST(least(greatest(floor((0.5 - ln((1.0 + sin(radians(lat))) /
        |       (1.0 - sin(radians(lat)))) / (4 * pi())) * pow(2.0, zoom)), 0),
        |       pow(2.0, zoom) - 1) AS BIGINT) AS tile_y
        | FROM p)
        |SELECT k, lat, lon, zoom, tile_x, tile_y,
        | array_to_string(list_transform(range(zoom, 0, -1),
        |   i -> chr(CAST(48 + ((tile_x >> (i - 1)) & 1) + 2 * ((tile_y >> (i - 1)) & 1) AS INT))),
        |   '') AS quadkey
        |FROM t ORDER BY k""".stripMargin,
    "fn_sfm" ->
      """SELECT CAST(-4 AS BIGINT) AS k, 'merge_union' AS metric, true AS ok
        |UNION ALL SELECT -3, 'dp_est_bound', true
        |UNION ALL SELECT -2, 'scalar_cardinality', true
        |UNION ALL SELECT -1, 'nonprivate_est', true
        |ORDER BY k, metric""".stripMargin,
    "fn_setdigest" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS k, 'exact_small' AS metric, true AS ok
        |FROM customer GROUP BY c_nationkey
        |UNION ALL SELECT -1, 'est_bounds', true
        |UNION ALL SELECT -2, 'kmv_estimate', true
        |UNION ALL SELECT -3, 'jaccard', true
        |UNION ALL SELECT -4, 'intersection', true
        |ORDER BY k, metric""".stripMargin,
    "fn_geo_cast" ->
      """WITH c AS (SELECT c_custkey k,
        |  CAST(CAST(c_custkey % 80 AS DOUBLE) + 0.5 AS VARCHAR) x,
        |  CAST(CAST(c_custkey % 80 AS DOUBLE) + 4.5 AS VARCHAR) x4,
        |  CAST(CAST(c_custkey % 80 AS DOUBLE) + 1.5 AS VARCHAR) xp1,
        |  CAST(CAST(c_custkey % 80 AS DOUBLE) - 0.5 AS VARCHAR) xm1,
        |  CAST(CAST(c_custkey * 7 % 80 AS DOUBLE) + 0.25 AS VARCHAR) y,
        |  CAST(CAST(c_custkey * 7 % 80 AS DOUBLE) + 2.25 AS VARCHAR) y2,
        |  CAST(CAST(c_custkey * 7 % 80 AS DOUBLE) + 1.25 AS VARCHAR) yp1,
        |  CAST(CAST(c_custkey * 7 % 80 AS DOUBLE) - 0.75 AS VARCHAR) ym1
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | 'POINT (' || x || ' ' || y || ')' AS pt_rt,
        | 'ST_Point' AS pt_t,
        | 'LINESTRING (' || x || ' ' || y || ', ' || x4 || ' ' || y2 || ')' AS ln_rt,
        | 'ST_LineString' AS ln_t,
        | 'POLYGON ((' || xp1 || ' ' || y || ', ' || x || ' ' || yp1 || ', ' ||
        |   xm1 || ' ' || y || ', ' || x || ' ' || ym1 || ', ' ||
        |   xp1 || ' ' || y || '))' AS pg_rt,
        | 'ST_Polygon' AS pg_t
        |FROM c ORDER BY k""".stripMargin,
    "fn_datetime3" ->
      """SELECT o_orderkey AS k,
        | CAST(o_orderdate + to_days(CAST(o_orderkey % 20 AS INT)) AS DATE)
        |   AS plus_days,
        | CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus_months,
        | date_diff('day', o_orderdate, DATE '1998-01-01') AS days_to98,
        | CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
        | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        | DATE '1995-06-15' AS iso_d,
        | CAST(TIMESTAMP '1995-06-15 10:30:00' AS VARCHAR) AS parsed,
        | strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS fmted,
        | (o_orderkey * 1234567) % 1000 AS ms,
        | printf('%d|%s', o_orderkey, o_orderpriority) AS fmt
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY k""".stripMargin,
    "fn_ip2" ->
      """WITH c AS (SELECT c_custkey k,
        |   CAST(c_custkey % 200 AS VARCHAR) x,
        |   c_custkey % 200 xn,
        |   (c_custkey * 7) % 256 yn,
        |   CAST((c_custkey * 7) % 256 AS VARCHAR) y,
        |   CAST(c_nationkey % 256 AS VARCHAR) z,
        |   100 + c_custkey % 100 o1,
        |   c_custkey % 128 o2
        |  FROM customer WHERE c_custkey <= 300)
        |SELECT k,
        | '10.' || x || '.' || y || '.' || z AS ip,
        | '10.' || x || '.' || CAST((yn // 16) * 16 AS VARCHAR) || '.0/20' AS pfx20,
        | '10.' || x || '.0.0' AS smin,
        | '10.' || x || '.255.255' AS smax,
        | '10.' || x || '.0.0|10.' || x || '.0.255' AS srange,
        | xn <= 127 AS in_10_9,
        | xn BETWEEN 64 AND 127 AS pfx_in_pfx,
        | CASE WHEN o1 = 100 AND o2 BETWEEN 64 AND 127 THEN true
        |      WHEN o1 = 127 THEN true
        |      WHEN o1 = 172 AND o2 BETWEEN 16 AND 31 THEN true
        |      WHEN o1 = 198 AND o2 IN (18, 19) THEN true
        |      ELSE false END AS priv,
        | '10.0.0.0/8|192.168.0.0/23' AS collapsed,
        | '192.168.0.0/24|192.168.1.0/24|192.168.2.0/24|192.168.3.0/24' AS split24
        |FROM c ORDER BY k""".stripMargin,
    "fn_breadth" ->
      """SELECT p_partkey AS k,
        | CASE WHEN strpos(p_name, 'a') = 0 THEN 0
        |      ELSE length(p_name) - strpos(reverse(p_name), 'a') + 1
        | END AS rpos_a,
        | substr(p_name, 1, 5) AS lcp5,
        | (list_filter(string_split(p_name, ' '), w -> length(w) > 5))[1] AS ff,
        | (list_filter(list_transform(string_split(p_name, ' '),
        |    (w, i) -> CASE WHEN length(w) > 5 THEN i END),
        |    x -> x IS NOT NULL))[1] AS ffi,
        | CAST(list_sum(list_transform(string_split(p_name, ' '),
        |    w -> length(w))) AS DOUBLE) AS asum,
        | coalesce(array_to_string(list_slice(string_split(p_name, ' '), 1,
        |    greatest(len(string_split(p_name, ' ')) - 2, 0)), '|'), '') AS trimmed,
        | upper(lpad(to_hex(p_partkey), 16, '0')) AS be64,
        | p_partkey * 7919 AS be_rt,
        | upper(lpad(to_hex(p_size), 8, '0')) AS be32,
        | CAST(p_retailprice AS DOUBLE) AS ieee_rt,
        | 31 * p_partkey + p_size AS ch,
        | CAST(weekofyear(DATE '1995-01-01' + CAST(p_partkey AS INT)) AS BIGINT) AS wk,
        | CAST(isoyear(DATE '1995-01-01' + CAST(p_partkey AS INT)) AS BIGINT) AS yow,
        | last_day(DATE '1995-01-01' + CAST(p_partkey AS INT)) AS ldom
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_regex_lambda" ->
      """SELECT p_partkey AS k,
        | upper(p_name) AS up_words,
        | array_to_string(list_transform(string_split(p_name, ' '),
        |   w -> upper(w[1]) || w[2:]), ' ') AS capitalized,
        | replace(replace(p_type, 'STANDARD', 'STANDARD!'),
        |   'SMALL', 'SMALL!') AS tagged,
        | CASE WHEN p_name LIKE '%a%' THEN NULL ELSE p_name END AS null_prop
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_khll" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS k, 'exact_small' AS metric, true AS ok
        |FROM customer GROUP BY c_nationkey
        |UNION ALL SELECT -1, 'uniqueness_exact', true
        |UNION ALL SELECT -2, 'reident_exact', true
        |UNION ALL SELECT -3, 'merge_union', true
        |UNION ALL SELECT -4, 'kmv_estimate', true
        |UNION ALL SELECT -5, 'jaccard', true
        |UNION ALL SELECT -6, 'intersection', true
        |UNION ALL SELECT -7, 'uniqueness_mean', true
        |ORDER BY k, metric""".stripMargin,
    "fn_math" ->
      """SELECT p_partkey AS k,
        | abs(p_retailprice * -1) AS abs_x,
        | CAST(ceil(p_retailprice) AS DOUBLE) AS ceil_x,
        | CAST(floor(p_retailprice) AS DOUBLE) AS floor_x,
        | round(p_retailprice, 1) AS round_x,
        | round(sqrt(p_retailprice), 4) AS sqrt_x,
        | round(cbrt(p_retailprice), 4) AS cbrt_x,
        | round(ln(p_retailprice), 4) AS ln_x,
        | round(log10(p_retailprice), 4) AS log10_x,
        | round(pow(p_retailprice, 2), 4) AS pow_x,
        | p_partkey % 7 AS mod_k,
        | CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sign_x,
        | greatest(p_retailprice, 500.0) AS greatest_x,
        | least(p_retailprice, 500.0) AS least_x
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_trig" ->
      """SELECT p_partkey AS k,
        | round(sin(p_size / 100.0), 4) AS sin_x,
        | round(cos(p_size / 100.0), 4) AS cos_x,
        | round(tan(p_size / 100.0), 4) AS tan_x,
        | round(asin(p_size / 100.0), 4) AS asin_x,
        | round(acos(p_size / 100.0), 4) AS acos_x,
        | round(atan(p_retailprice / 1000.0), 4) AS atan_x,
        | round(atan2(p_size / 100.0, 2.0), 4) AS atan2_x,
        | round(degrees(p_size / 100.0), 4) AS deg_x,
        | round(radians(p_size), 4) AS rad_sz,
        | round((exp(p_size / 100.0) - exp(-(p_size / 100.0))) / 2, 4) AS sinh_x,
        | round((exp(p_size / 100.0) + exp(-(p_size / 100.0))) / 2, 4) AS cosh_x,
        | round((exp(2 * p_size / 100.0) - 1) / (exp(2 * p_size / 100.0) + 1), 4) AS tanh_x,
        | CAST(CASE WHEN p_retailprice < 0 THEN 0
        |           WHEN p_retailprice >= 2000 THEN 11
        |           ELSE FLOOR(p_retailprice / 200) + 1 END AS BIGINT) AS wb
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_string" ->
      """SELECT n_nationkey AS k,
        | len(n_name) AS len,
        | lower(n_name) AS lo,
        | upper(n_name || ' alpha beta gamma') AS up,
        | substr(n_name, 2, 3) AS sub,
        | lpad(n_name, 12, '*') AS lp,
        | rpad(n_name, 12, '-') AS rp,
        | replace(n_name, 'A', '@') AS rep,
        | reverse(n_name) AS rev,
        | repeat(substr(n_name, 1, 2), 3) AS rep3,
        | concat_ws('|', n_name, n_nationkey::VARCHAR) AS cw,
        | CAST(strpos(n_name, 'AN') AS BIGINT) AS pos,
        | string_split(n_name || ' alpha beta gamma', ' ')[2] AS word2,
        | CAST(ascii(n_name) AS BIGINT) AS asc,
        | translate(n_name, 'AEI', 'aei') AS tr,
        | trim('  pad  ') AS trimmed
        |FROM nation ORDER BY k""".stripMargin,
    "fn_string_sim" ->
      """SELECT a.n_nationkey AS ka, b.n_nationkey AS kb,
        | ROUND(jaro_winkler_similarity(a.n_name, b.n_name), 4) AS jw,
        | levenshtein(a.n_name, b.n_name) AS lev,
        | hamming(substr(md5(a.n_name), 1, 8), substr(md5(b.n_name), 1, 8)) AS ham
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |ORDER BY ka, kb""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey AS k,
        | CAST(o_orderdate AS DATE) AS d,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mo,
        | CAST(day(o_orderdate) AS BIGINT) AS dom,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end,
        | last_day(CAST(o_orderdate AS DATE)) AS eom,
        | make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS year_start
        |FROM orders WHERE o_orderkey <= 500 ORDER BY k""".stripMargin,
    "fn_array" ->
      """SELECT p_partkey AS k,
        | array_to_string(arr, ',') AS arr,
        | CAST(len(arr) AS BIGINT) AS card,
        | list_contains(arr, 3) AS has3,
        | arr[2] AS second,
        | array_to_string(arr[2:3], ',') AS sl,
        | array_to_string(list_reverse(arr), ',') AS rev,
        | list_max(arr) AS mx,
        | list_min(arr) AS mn,
        | array_to_string(arr, ',') AS joined,
        | array_to_string(list_transform(arr, x -> x * 2), ',') AS doubled,
        | array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
        | len(list_filter(arr, x -> x > 4)) > 0 AS any_gt4,
        | CAST(list_sum(arr) AS BIGINT) AS sum_arr,
        | array_to_string(flatten([arr, arr]), ',') AS flat,
        | array_to_string(list_sort(list_distinct([p_size % 3, p_size % 5, p_size % 3])), ',') AS dist
        |FROM (SELECT p_partkey, p_size, range(1, p_size % 5 + 3) arr FROM part
        |      WHERE p_partkey <= 100)
        |ORDER BY k""".stripMargin,
    "fn_map" ->
      """SELECT s_suppkey AS k,
        | CAST(cardinality(m) AS BIGINT) AS card,
        | m['bal'][1] AS bal,
        | m['nat'][1] AS nat,
        | array_to_string(list_sort(map_keys(m)), ',') AS keys,
        | list_contains(map_keys(m), 'key') AS has_key,
        | m['bal'][1] AS only_bal
        |FROM (SELECT s_suppkey,
        |       MAP(['bal', 'key', 'nat'],
        |           [s_acctbal, CAST(s_suppkey AS DOUBLE), CAST(s_nationkey AS DOUBLE)]) m
        |      FROM supplier WHERE s_suppkey <= 100)
        |ORDER BY k""".stripMargin,
    "fn_json" ->
      """SELECT event_id AS k,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        | json_extract_string(props, '$.missing') AS miss,
        | CAST(json_array_length('[1,2,3,4]') AS BIGINT) AS alen,
        | CAST(json_extract_string('{"a":{"b":7}}', '$.a.b') AS BIGINT) AS nested,
        | CAST(json_extract_string('[10,20,30]', '$[1]') AS BIGINT) AS idx1
        |FROM events WHERE event_id <= 1000 ORDER BY k""".stripMargin,
    "fn_json2" ->
      """WITH b AS (SELECT event_id k,
        |  '{"b": [1, 2, ' || (event_id % 5) || '], "a": {"x": "v'
        |    || (event_id % 7) || '"}, "n": ' || (event_id % 100)
        |    || ', "f": 2.5, "s": "str"}' j
        | FROM events WHERE event_id <= 500)
        |SELECT k,
        | '{"a":{"x":"v' || (k % 7) || '"},"b":[1,2,' || (k % 5)
        |   || '],"f":2.5,"n":' || (k % 100) || ',"s":"str"}' AS canonical,
        | j AS formatted,
        | CAST(json_extract(j, '$.a.x') AS VARCHAR) AS ext_quoted,
        | CAST(json_extract(j, '$.b[1]') AS VARCHAR) AS ext_idx,
        | CAST(json_extract(j, '$.missing') AS VARCHAR) AS ext_miss,
        | CAST(len(json_keys(j, '$.a')) AS BIGINT) AS size_obj,
        | CAST(json_array_length(j, '$.b') AS BIGINT) AS size_arr,
        | CAST(0 AS BIGINT) AS size_scalar,
        | CAST(json_array_length(j, '$.b') AS BIGINT) AS alen,
        | true AS has_mod, true AS has_f, true AS has_s, false AS has_miss,
        | CAST(k % 5 AS VARCHAR) AS last_el,
        | 'x' AS first_s,
        | true AS scalar_n, false AS scalar_obj
        |FROM b ORDER BY k""".stripMargin,
    "fn_binary" ->
      """SELECT r_regionkey AS k,
        | md5(r_name) AS md5_s,
        | sha256(r_name) AS sha256_s,
        | to_base64(CAST(r_name AS BLOB)) AS b64,
        | lower(hex(CAST(r_name AS BLOB))) AS hx,
        | CAST(octet_length(CAST(repeat(r_name, 2) AS BLOB)) AS BIGINT) AS nbytes
        |FROM region ORDER BY k""".stripMargin,
    "fn_bitwise" ->
      """SELECT c_custkey AS k,
        | c_custkey & 255 AS band,
        | c_custkey | 16 AS bor,
        | xor(c_custkey, 85) AS bxor,
        | c_custkey << 3 AS shl,
        | c_custkey >> 2 AS shr,
        | CAST(bit_count(c_custkey) AS BIGINT) AS bits,
        | ~c_custkey AS bnot
        |FROM customer WHERE c_custkey <= 200 ORDER BY k""".stripMargin,
    "fn_base" ->
      """SELECT p_partkey AS k,
        | lower(to_hex(p_partkey)) AS hex16,
        | bin(p_partkey) AS bin2,
        | CASE WHEN p_partkey = 0 THEN '0'
        |      ELSE '-' || lower(to_hex(p_partkey)) END AS neg16,
        | p_partkey AS rt36,
        | CAST(255 AS BIGINT) AS const_ff
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_timezone" ->
      """WITH b AS (SELECT o_orderkey k,
        |  CAST(o_orderdate AS TIMESTAMP)
        |    + to_seconds(o_orderkey % 86400) ts2
        | FROM orders WHERE o_orderkey <= 500)
        |SELECT k,
        | strftime(ts2 + INTERVAL 5 HOUR + INTERVAL 30 MINUTE,
        |   '%Y-%m-%d %H:%M:%S') AS kolkata_wall,
        | strftime(ts2 - INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS ny_fixed_wall,
        | CAST(hour(ts2 + INTERVAL 5 HOUR + INTERVAL 30 MINUTE) AS BIGINT)
        |  AS kolkata_hour,
        | true AS rt_ok
        |FROM b ORDER BY k""".stripMargin,
    "fn_geo_poly" ->
      """WITH g AS (SELECT c_custkey k, CAST(3 + c_custkey % 5 AS INT) n,
        |            (c_custkey % 100) / 8.0 cx, (c_custkey % 77) / 4.0 cy,
        |            1.0 + c_custkey % 3 r
        |           FROM customer WHERE c_custkey <= 200),
        |v AS (SELECT k, n, cx, cy, r, unnest(range(n)) i FROM g),
        |pt AS (SELECT k, n, cx, cy, r, i,
        |        cx + r * (CASE i WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
        |                  WHEN 2 THEN -0.5 WHEN 3 THEN -1.0 WHEN 4 THEN -0.75
        |                  WHEN 5 THEN 0.0 ELSE 0.75 END) vx,
        |        cy + r * (CASE i WHEN 0 THEN 0.0 WHEN 1 THEN 0.875
        |                  WHEN 2 THEN 0.875 WHEN 3 THEN 0.0 WHEN 4 THEN -0.625
        |                  WHEN 5 THEN -1.0 ELSE -0.625 END) vy FROM v),
        |e AS (SELECT a.k, a.n, a.cx, a.cy, a.r,
        |       a.vx ax, a.vy ay, b.vx bx, b.vy by_
        |      FROM pt a JOIN pt b ON b.k = a.k AND b.i = (a.i + 1) % a.n),
        |m AS (SELECT k, n, cx, cy, r,
        |       SUM(ax * by_ - bx * ay) s2,
        |       SUM((ax + bx) * (ax * by_ - bx * ay)) sx6,
        |       SUM((ay + by_) * (ax * by_ - bx * ay)) sy6,
        |       SUM(sqrt(power(bx - ax, 2) + power(by_ - ay, 2))) per,
        |       SUM(CASE WHEN (ay > cy + 0.546875 * r) <> (by_ > cy + 0.546875 * r)
        |                 AND cx + 0.3125 * r <
        |                   (bx - ax) * (cy + 0.546875 * r - ay) / (by_ - ay) + ax
        |                THEN 1 ELSE 0 END) cr_in,
        |       SUM(CASE WHEN (ay > cy) <> (by_ > cy)
        |                 AND cx + r + 1.5 < (bx - ax) * (cy - ay) / (by_ - ay) + ax
        |                THEN 1 ELSE 0 END) cr_out
        |      FROM e GROUP BY 1, 2, 3, 4, 5)
        |SELECT k, CAST(n AS BIGINT) AS n_points,
        | ROUND(abs(s2) / 2, 4) AS area,
        | ROUND(per, 4) AS perimeter,
        | ROUND(sx6 / (s2 / 2 * 6), 4) AS cent_x,
        | ROUND(sy6 / (s2 / 2 * 6), 4) AS cent_y,
        | cr_in % 2 = 1 AS inside,
        | cr_out % 2 = 1 AS outside
        |FROM m ORDER BY k""".stripMargin,
    "fn_err_contracts" ->
      """SELECT o_orderkey AS k, o_orderkey + 1 AS a2,
        | CAST(NULL AS BIGINT) AS a_oob, CAST(NULL AS BIGINT) AS a_zero,
        | o_orderkey * 2 AS m_hit, CAST(NULL AS BIGINT) AS m_miss,
        | CAST(5 AS BIGINT) AS char_len, false AS char_vs_varchar,
        | true AS char_eq
        |FROM orders WHERE o_orderkey <= 200 ORDER BY k""".stripMargin,
    "fn_time" ->
      """WITH b AS (SELECT o_orderkey AS k, o_orderkey % 80000 AS s
        |           FROM orders WHERE o_orderkey <= 500),
        |tt AS (SELECT k, make_time(CAST(FLOOR(s / 3600) AS INT),
        |                CAST(FLOOR(s / 60) AS INT) % 60,
        |                CAST(s % 60 AS DOUBLE)) AS t FROM b)
        |SELECT k, t, TIME '08:30:15' AS t_lit,
        |  CAST(hour(t) AS BIGINT) AS h, CAST(minute(t) AS BIGINT) AS m,
        |  CAST(second(t) AS BIGINT) AS sec,
        |  t + INTERVAL 30 MINUTE AS t2,
        |  CAST(t AS VARCHAR) AS st
        |FROM tt ORDER BY k""".stripMargin,
    "fn_timetz" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(o_orderkey % 80000 AS BIGINT) AS sod,
        |    CAST(CAST(o_orderkey % 169 AS INT) * 10 - 840 AS INT) AS off
        |  FROM orders WHERE o_orderkey <= 500),
        |z AS (SELECT k, sod, off,
        |    CAST(FLOOR(sod / 3600) AS BIGINT) AS h,
        |    CAST(FLOOR(sod / 60) AS BIGINT) % 60 AS mi,
        |    CAST(sod % 60 AS BIGINT) AS se,
        |    CASE WHEN off < 0 THEN '-' ELSE '+' END ||
        |      lpad(CAST(CAST(FLOOR(abs(off) / 60) AS INT) AS VARCHAR), 2, '0')
        |      || ':' || lpad(CAST(abs(off) % 60 AS VARCHAR), 2, '0') AS zone,
        |    sod * 1000 - off * 60000 AS utc,
        |    CAST(trunc(off / 60.0) AS BIGINT) AS tzh
        |  FROM b),
        |z2 AS (SELECT z.*, ((utc + 7200000) % 86400000 + 86400000) %
        |    86400000 AS loc2 FROM z)
        |SELECT k,
        |  printf('%02d:%02d:%02d.000 ', h, mi, se) || zone AS s1,
        |  h, mi, se,
        |  tzh,
        |  off - tzh * 60 AS tzm,
        |  printf('%02d:%02d:%02d.%03d +02:00',
        |    CAST(FLOOR(loc2 / 3600000) AS BIGINT),
        |    CAST(FLOOR(loc2 / 60000) AS BIGINT) % 60,
        |    CAST(FLOOR(loc2 / 1000) AS BIGINT) % 60,
        |    loc2 % 1000) AS s2,
        |  (utc < 43200000 OR (utc = 43200000 AND off < 0)) AS lt_noon,
        |  '03:04:05.321 +07:09' AS lit1,
        |  '12:00:00.000 +05:30' AS c1
        |FROM z2 ORDER BY k""".stripMargin,
    "fn_tstz" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(CAST(o_orderkey % 169 AS INT) * 10 - 840 AS INT) AS off,
        |    o_orderkey % 28 + 1 AS d,
        |    o_orderkey % 24 AS hh,
        |    o_orderkey % 60 AS mi,
        |    (o_orderkey * 7) % 60 AS se
        |  FROM orders WHERE o_orderkey <= 500),
        |z AS (SELECT k, off, d, hh, mi, se,
        |    CASE WHEN off < 0 THEN '-' ELSE '+' END ||
        |      lpad(CAST(CAST(FLOOR(abs(off) / 60) AS INT) AS VARCHAR), 2, '0')
        |      || ':' || lpad(CAST(abs(off) % 60 AS VARCHAR), 2, '0') AS zone,
        |    make_timestamp(2020, 3, d, hh, mi, CAST(se AS DOUBLE)) AS wall,
        |    CAST(trunc(off / 60.0) AS BIGINT) AS tzh
        |  FROM b),
        |z2 AS (SELECT z.*,
        |    epoch(wall) * 1000 - off * 60000 AS utc_ms,
        |    wall + to_minutes(CAST(120 - off AS BIGINT)) AS wall2
        |  FROM z)
        |SELECT k,
        |  strftime(wall, '%Y-%m-%d %H:%M:%S') || '.000 ' || zone AS s1,
        |  CAST(2020 AS BIGINT) AS y, CAST(3 AS BIGINT) AS mo,
        |  CAST(d AS BIGINT) AS dd, CAST(hh AS BIGINT) AS h,
        |  CAST(mi AS BIGINT) AS mi2, CAST(se AS BIGINT) AS se2,
        |  tzh, off - tzh * 60 AS tzm,
        |  strftime(wall2, '%Y-%m-%d %H:%M:%S') || '.000 +02:00' AS s2,
        |  utc_ms < epoch(TIMESTAMP '2020-03-15 00:00:30') * 1000 + 500
        |    AS lt_mid,
        |  CAST(epoch(wall) - off * 60 AS DOUBLE) AS ux,
        |  CAST(-7 AS BIGINT) AS la_sum, CAST(-8 AS BIGINT) AS la_win,
        |  '2021-07-01 05:00:00.000 America/Los_Angeles' AS la_s2,
        |  '2020-06-01 08:30:00.000 +05:30' AS c1
        |FROM z2 ORDER BY k""".stripMargin,
    "fn_geo_multi" ->
      """WITH g AS (SELECT c_custkey k,
        |  CAST(1.0 + c_custkey % 3 AS DOUBLE) a,
        |  CAST(0.5 + (c_custkey % 2) * 0.5 AS DOUBLE) b,
        |  CAST(0.25 + (c_custkey % 4) * 0.25 AS DOUBLE) gap,
        |  CAST((c_custkey % 100) / 8.0 AS DOUBLE) cx
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k, 'ST_MultiPolygon' AS mp_t, CAST(2 AS BIGINT) AS mp_n,
        | ROUND(a * a + b * b, 4) AS mp_area,
        | ROUND(4 * a + 4 * b, 4) AS mp_perim,
        | ROUND(b * b, 4) AS part2_area, 'ST_Polygon' AS part1_t,
        | CAST(2 AS BIGINT) AS ml_n, ROUND(a + 5 * b, 4) AS ml_len,
        | 'ST_GeometryCollection' AS gc_t, CAST(2 AS BIGINT) AS gc_n,
        | 'ST_Point' AS gc1_t, ROUND(b * b, 4) AS gc2_area,
        | cx + a + gap + b AS env_xmax, true AS wkt_rt
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_pred" ->
      """WITH g AS (SELECT c_custkey k, c_custkey % 5 m
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k, m = 0 AS contains_ab, m = 0 AS within_ba,
        | m = 3 AS disjoint_ab, m IN (2, 4) AS touches_ab,
        | m = 1 AS overlaps_ab, true AS crosses_thru,
        | false AS crosses_inner
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_setops" ->
      """WITH g AS (SELECT c_custkey k, c_custkey % 5 m
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | CASE WHEN m IN (0, 1) THEN 'ST_Polygon' ELSE 'ST_Empty' END AS inter_t,
        | CAST(CASE WHEN m IN (0, 1) THEN 1.0 ELSE 0.0 END AS DOUBLE) AS inter_area,
        | CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 2 END AS BIGINT) AS union_n,
        | CAST(CASE m WHEN 0 THEN 4.0 WHEN 1 THEN 7.0 ELSE 5.0 END AS DOUBLE) AS union_area,
        | 'ST_GeometryCollection' AS diff_t,
        | CAST(CASE m WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 1 END AS BIGINT) AS diff_n,
        | CAST(CASE m WHEN 0 THEN 3.0 WHEN 1 THEN 3.0 ELSE 4.0 END AS DOUBLE) AS diff_area,
        | CAST(CASE WHEN m % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS mp_n
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_setops2" ->
      """WITH g AS (SELECT c_custkey k, c_custkey % 4 m
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | CAST(CASE m WHEN 0 THEN 3.0 WHEN 1 THEN 3.0 WHEN 2 THEN 0.0
        |   ELSE 9.0 END AS DOUBLE) AS inter_area,
        | CAST(CASE m WHEN 0 THEN 9.0 WHEN 1 THEN 9.0 WHEN 2 THEN 12.0
        |   ELSE 3.0 END AS DOUBLE) AS diff_area,
        | CAST(CASE m WHEN 0 THEN 13.0 WHEN 1 THEN 12.0 WHEN 2 THEN 16.0
        |   ELSE 15.0 END AS DOUBLE) AS union_area,
        | CAST(CASE m WHEN 0 THEN 10.0 WHEN 1 THEN 9.0 WHEN 2 THEN 16.0
        |   ELSE 6.0 END AS DOUBLE) AS sym_area,
        | TRUE AS region_ident
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_access" ->
      """WITH g AS (SELECT c_custkey k,
        | CAST(c_custkey % 100 AS DOUBLE) / 8.0 AS cx,
        | CAST(c_custkey % 77 AS DOUBLE) / 4.0 AS cy
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | cx AS px, cy AS py,
        | cx AS xmin, cx + 3 AS xmax, cy AS ymin, cy + 4 AS ymax,
        | FALSE AS p_empty, FALSE AS l_closed,
        | TRUE AS sq_closed, TRUE AS sq_ring,
        | TRUE AS l_simple, FALSE AS bow_simple,
        | CAST(0 AS INTEGER) AS dim_p, CAST(1 AS INTEGER) AS dim_l,
        | CAST(2 AS INTEGER) AS dim_pg, CAST(2 AS INTEGER) AS cdim,
        | 'ST_MultiPoint' AS bnd_l_t, CAST(2 AS BIGINT) AS bnd_l_n,
        | 'ST_MultiLineString' AS bnd_pg_t, CAST(0 AS BIGINT) AS bnd_csq_n,
        | CAST(3 AS BIGINT) AS npts, cx + 3 AS env_hi_x,
        | TRUE AS pg_valid,
        | 'Polygon is degenerate (zero area)' AS degen_why,
        | 'Polygon ring self-intersects' AS selfx_why
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_holes" ->
      """WITH g AS (SELECT c_custkey k, c_custkey % 2 m
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | CAST(1 + m AS BIGINT) AS n_holes,
        | CAST(16.0 - 1 - m AS DOUBLE) AS area,
        | 'ST_LineString' AS ext_t, CAST(5 AS BIGINT) AS ext_npts,
        | CAST(4.0 AS DOUBLE) AS hole1_perim,
        | CAST(1 + m AS BIGINT) AS int_rings_n,
        | TRUE AS in_shell, FALSE AS in_hole1, TRUE AS near_edge
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_hull" ->
      """WITH g AS (SELECT c_custkey k, c_custkey % 5 m,
        | CAST(1 + c_custkey % 3 AS DOUBLE) a
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | CAST(4 AS BIGINT) AS hull_n,
        | CAST(a * a AS DOUBLE) AS hull_area,
        | 'ST_Polygon' AS hull_t,
        | CAST(2 AS BIGINT) AS coll_n,
        | TRUE AS eq_same, FALSE AS eq_other,
        | 'ST_GeometryCollection' AS symd_t,
        | CAST(CASE m WHEN 0 THEN 3.0 WHEN 1 THEN 6.0 ELSE 5.0 END AS DOUBLE)
        |   AS symd_area
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_lineops" ->
      """SELECT c_custkey AS k,
        | round(1.0 / 7.0, 6) AS loc_leg1,
        | round(5.0 / 7.0, 6) AS loc_leg2,
        | CAST(0.0 AS DOUBLE) AS loc_start, CAST(1.0 AS DOUBLE) AS loc_end,
        | CAST(3.0 AS DOUBLE) AS interp_bend_dx,
        | CAST(2.0 AS DOUBLE) AS interp_mid_dy,
        | CAST(0.0 AS DOUBLE) AS interp_0_dx,
        | CAST(4.0 AS DOUBLE) AS interp_1_dy
        |FROM customer WHERE c_custkey <= 200 ORDER BY k""".stripMargin,
    "fn_teradata" ->
      """SELECT o_orderkey AS k,
        | CAST(strpos(o_orderpriority, 'URGENT') AS BIGINT) AS idx,
        | CAST(0 AS BIGINT) AS idx0,
        | '006100620063' AS hex_abc,
        | '00' || hex(substr(o_orderpriority, 1, 1)) AS hex_first,
        | strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS tc,
        | '00:00:00' AS tc_time,
        | TRUE AS rt,
        | '1992-01-03 04:05:06' AS tts
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY k""".stripMargin,
    "fn_geo_nearest" ->
      """SELECT c_custkey AS k,
        | CAST(2.0 AS DOUBLE) AS np1_ax, CAST(2.0 AS DOUBLE) AS np1_ay,
        | CAST(5.0 AS DOUBLE) AS np1_bx, CAST(5.0 AS DOUBLE) AS np1_by,
        | CAST(2.0 AS DOUBLE) AS np2_ax, CAST(1.0 AS DOUBLE) AS np2_ay,
        | CAST(4.0 AS DOUBLE) AS np2_bx, CAST(1.0 AS DOUBLE) AS np2_by,
        | CAST(4 AS INTEGER) AS n_cover, CAST(1 AS INTEGER) AS n_dissolved,
        | CAST(c_custkey % 4 + 2 AS INTEGER) AS dis_zoom,
        | CAST((c_custkey % 20 + 1) % (1 << (c_custkey % 4 + 2)) AS INTEGER)
        |   AS dis_x,
        | 'ST_Point' AS tg_type, CAST(2 AS INTEGER) AS flat_n,
        | 'ST_Point' AS flat_leaf_t
        |FROM customer WHERE c_custkey <= 200 ORDER BY k""".stripMargin,
    "fn_bingtile3" ->
      """WITH g AS (SELECT c_custkey k,
        |  CAST(c_custkey % 6 + 2 AS INTEGER) z,
        |  CAST(c_custkey % 50 + 1 AS INTEGER) tx,
        |  CAST(c_custkey % 30 + 1 AS INTEGER) ty
        | FROM customer WHERE c_custkey <= 200),
        |h AS (SELECT k, z, tx % (1 << z) AS x, ty % (1 << z) AS y FROM g)
        |SELECT k,
        | z AS zoom, CAST(x AS INTEGER) AS cx_, CAST(y AS INTEGER) AS cy_,
        | TRUE AS qk_roundtrip, z AS qk_len,
        | CAST(x // 2 AS INTEGER) AS px, CAST(z - 1 AS INTEGER) AS pz,
        | CAST(4 AS INTEGER) AS n_kids,
        | TRUE AS kid1_x_ok, TRUE AS kids_parent_ok
        |FROM h ORDER BY k""".stripMargin,
    "fn_parity_misc" ->
      """WITH g AS (SELECT c_custkey k,
        | CAST(c_custkey % 100 AS DOUBLE) / 8.0 AS cx,
        | CAST(c_custkey % 77 AS DOUBLE) / 4.0 AS cy
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | '{"type":"Point","coordinates":[' || CAST(cx AS VARCHAR) || ','
        |   || CAST(cy AS VARCHAR) || ']}' AS geojson,
        | TRUE AS gj_rt_pt, TRUE AS gj_rt_line, TRUE AS gj_rt_pg,
        | CAST(30.0 AS DOUBLE) AS exp_area,
        | CAST(2 AS BIGINT) AS uni_n, CAST(5.0 AS DOUBLE) AS uni_area,
        | CAST(5 AS BIGINT) AS tz_h_ist, CAST(30 AS BIGINT) AS tz_m_ist,
        | CAST(-8 AS BIGINT) AS tz_h_pst, CAST(0 AS BIGINT) AS tz_m_pst,
        | CAST(93784567 AS BIGINT) AS iv_ms,
        | TRUE AS polyline_rt,
        | CAST(16 AS INTEGER) AS mm_len,
        | '00000000000000000000000000000000' AS mm_empty,
        | TRUE AS sr_in_range
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_relate" ->
      """WITH g AS (SELECT c_custkey k, c_custkey % 5 m
        | FROM customer WHERE c_custkey <= 200)
        |SELECT k,
        | CASE m WHEN 0 THEN '212FF1FF2' WHEN 1 THEN '212101212'
        |        WHEN 2 THEN 'FF2F11212' WHEN 3 THEN 'FF2FF1212'
        |        ELSE 'FF2F01212' END AS de9im,
        | '2FFF1FFF2' AS de9im_self,
        | TRUE AS rel_equals,
        | m = 0 AS rel_contains,
        | m = 1 AS rel_overlaps,
        | m = 3 AS rel_disjoint
        |FROM g ORDER BY k""".stripMargin,
    "fn_geo_wkb" ->
      """SELECT c_custkey AS k,
        | CAST(21 AS INTEGER) AS pt_len,
        | CAST(9 + 16 * 3 AS INTEGER) AS line_len,
        | CAST(13 + 16 * 5 AS INTEGER) AS pg_len,
        | '0000000001' AS pt_hdr,
        | '000000000300000001' AS pg_hdr,
        | TRUE AS rt_pt, TRUE AS rt_line, TRUE AS rt_pg,
        | CAST(2 AS INTEGER) AS n_tol_big, CAST(5 AS INTEGER) AS n_tol_small,
        | 'ST_LineString' AS simp_t,
        | CAST(2 AS BIGINT) AS n_geoms,
        | TRUE AS empty_geoms_null
        |FROM customer WHERE c_custkey <= 200 ORDER BY k""".stripMargin,
    "fn_geo_sphere2" ->
      """WITH g AS (SELECT c_custkey k,
        |  CAST(c_custkey * 7 % 140 - 70 + 0.25 AS DOUBLE) lat1,
        |  CAST(c_custkey * 13 % 300 - 150 + 0.25 AS DOUBLE) lon1
        | FROM customer WHERE c_custkey <= 300),
        |v AS (SELECT k, lat1, lon1,
        |  cos(radians(lat1)) * cos(radians(lon1)) +
        |    cos(radians(lat1 + 1)) * cos(radians(lon1 + 2)) +
        |    cos(radians(lat1 + 2)) * cos(radians(lon1 - 1)) AS xs,
        |  cos(radians(lat1)) * sin(radians(lon1)) +
        |    cos(radians(lat1 + 1)) * sin(radians(lon1 + 2)) +
        |    cos(radians(lat1 + 2)) * sin(radians(lon1 - 1)) AS ys,
        |  sin(radians(lat1)) + sin(radians(lat1 + 1)) +
        |    sin(radians(lat1 + 2)) AS zs
        | FROM g)
        |SELECT k, 'Spherical:ST_Point' AS cen_t,
        |  round(degrees(atan2(ys, xs)), 6) AS cen_lon,
        |  round(degrees(asin(zs / sqrt(xs * xs + ys * ys + zs * zs))), 6)
        |    AS cen_lat,
        |  TRUE AS point_identity,
        |  'POINT (' || CAST(lon1 AS VARCHAR) || ' ' || CAST(lat1 AS VARCHAR)
        |    || ')' AS wkt
        |FROM v ORDER BY k""".stripMargin,
    "fn_geo_sphere" ->
      """WITH g AS (SELECT c_custkey k,
        |  CAST(c_custkey * 7 % 140 - 70 + 0.25 AS DOUBLE) lat1,
        |  CAST(c_custkey * 13 % 300 - 150 + 0.25 AS DOUBLE) lon1,
        |  CAST(c_custkey * 11 % 140 - 70 + 0.75 AS DOUBLE) lat2,
        |  CAST(c_custkey * 17 % 300 - 150 + 0.75 AS DOUBLE) lon2
        | FROM customer WHERE c_custkey <= 300),
        |d AS (SELECT k, lat1, lon1, lat2, lon2,
        |  2 * 6371010.0 * asin(least(1.0, sqrt(
        |    pow(sin((radians(lat2) - radians(lat1)) / 2), 2) +
        |    cos(radians(lat1)) * cos(radians(lat2)) *
        |    pow(sin((radians(lon2) - radians(lon1)) / 2), 2)))) AS d12,
        |  2 * 6371010.0 * asin(least(1.0, sqrt(
        |    pow(sin((radians(lat1) - radians(lat2)) / 2), 2) +
        |    cos(radians(lat2)) * cos(radians(lat1)) *
        |    pow(sin((radians(lon1 + 1.0) - radians(lon2)) / 2), 2)))) AS d23
        | FROM g),
        |e AS (SELECT k, lat1, lon1, d12, d23,
        |  lon1 + (1.0 + (k % 3) * 0.5) AS lonr, lat1 + 0.75 AS latt
        | FROM d),
        |x AS (SELECT k, d12, d23,
        |  2 * atan2(tan((radians(lonr) - radians(lon1)) / 2) *
        |      (tan(radians(lat1) / 2) + tan(radians(lat1) / 2)),
        |    1 + tan(radians(lat1) / 2) * tan(radians(lat1) / 2)) +
        |  2 * atan2(tan((radians(lonr) - radians(lonr)) / 2) *
        |      (tan(radians(lat1) / 2) + tan(radians(latt) / 2)),
        |    1 + tan(radians(lat1) / 2) * tan(radians(latt) / 2)) +
        |  2 * atan2(tan((radians(lon1) - radians(lonr)) / 2) *
        |      (tan(radians(latt) / 2) + tan(radians(latt) / 2)),
        |    1 + tan(radians(latt) / 2) * tan(radians(latt) / 2)) +
        |  2 * atan2(tan((radians(lon1) - radians(lon1)) / 2) *
        |      (tan(radians(latt) / 2) + tan(radians(lat1) / 2)),
        |    1 + tan(radians(latt) / 2) * tan(radians(lat1) / 2)) AS excess
        | FROM e)
        |SELECT k, 'Spherical:ST_Point' AS sp_t,
        | round(d12, 4) AS dist_m, round(d12 + d23, 4) AS len_m,
        | round(abs(excess) * (6371010.0 * 6371010.0) / 1000000.0, 6) AS area_km2
        |FROM x ORDER BY k""".stripMargin,
    "fn_bingtile2" ->
      """WITH g AS (SELECT c_custkey AS k,
        |  CAST(c_custkey * 7 % 140 - 70 + 0.25 AS DOUBLE) AS lat,
        |  CAST(c_custkey * 13 % 300 - 150 + 0.25 AS DOUBLE) AS lon,
        |  CAST(c_custkey % 6 + 3 AS INT) AS zoom,
        |  CAST(0.5 + (c_custkey % 3) * 0.5 AS DOUBLE) AS dx,
        |  CAST(0.25 + (c_custkey % 2) * 0.25 AS DOUBLE) AS dy
        | FROM customer WHERE c_custkey <= 200),
        |t AS (SELECT k, lat, lon, zoom, dx, dy,
        |  CAST(least(greatest(floor((lon + 180.0) / 360.0 * pow(2.0, zoom)), 0),
        |       pow(2.0, zoom) - 1) AS BIGINT) AS tile_x,
        |  CAST(least(greatest(floor((0.5 - ln((1.0 + sin(radians(lat))) /
        |       (1.0 - sin(radians(lat)))) / (4 * pi())) * pow(2.0, zoom)), 0),
        |       pow(2.0, zoom) - 1) AS BIGINT) AS tile_y
        | FROM g),
        |c AS (SELECT *,
        |  CAST(floor(((lon - dx) + 180.0) / 360.0 * pow(2.0, zoom)) AS BIGINT) AS x0,
        |  CAST(floor(((lon + dx) + 180.0) / 360.0 * pow(2.0, zoom)) AS BIGINT) AS x1,
        |  CAST(floor((1.0 - ln(tan(radians(lat + dy)) + 1.0 / cos(radians(lat + dy))) / pi())
        |       / 2.0 * pow(2.0, zoom)) AS BIGINT) AS y0,
        |  CAST(floor((1.0 - ln(tan(radians(lat - dy)) + 1.0 / cos(radians(lat - dy))) / pi())
        |       / 2.0 * pow(2.0, zoom)) AS BIGINT) AS y1
        | FROM t)
        |SELECT k, zoom, tile_x, tile_y, CAST(4 AS BIGINT) AS tp_n,
        | tile_x / pow(2.0, zoom) * 360.0 - 180.0 AS tp_xmin,
        | (tile_x + 1) / pow(2.0, zoom) * 360.0 - 180.0 AS tp_xmax,
        | round(degrees(atan((exp(pi() * (1.0 - 2.0 * tile_y / pow(2.0, zoom))) -
        |   exp(-(pi() * (1.0 - 2.0 * tile_y / pow(2.0, zoom))))) / 2.0)), 9) AS tp_ymax,
        | round(degrees(atan((exp(pi() * (1.0 - 2.0 * (tile_y + 1) / pow(2.0, zoom))) -
        |   exp(-(pi() * (1.0 - 2.0 * (tile_y + 1) / pow(2.0, zoom))))) / 2.0)), 9) AS tp_ymin,
        | CAST((x1 - x0 + 1) * (y1 - y0 + 1) AS BIGINT) AS n_tiles,
        | x0 AS t1_x, y0 AS t1_y
        |FROM c ORDER BY k""".stripMargin,
    "agg_geo_union" ->
      """WITH g AS (SELECT c_custkey % 10 g,
        |  CAST(c_custkey * 2 AS DOUBLE) x0,
        |  CAST(0.5 + (c_custkey % 2) * 0.5 AS DOUBLE) sz
        | FROM customer WHERE c_custkey <= 200)
        |SELECT g, 'ST_GeometryCollection' AS u_t, COUNT(*) AS n,
        | ROUND(SUM(sz * sz), 4) AS area,
        | MIN(x0) AS xmin, MAX(x0 + sz) AS xmax
        |FROM g GROUP BY g ORDER BY g""".stripMargin,
    "agg_convex_hull" ->
      """WITH g AS (SELECT DISTINCT c_custkey % 8 g
        | FROM customer WHERE c_custkey <= 200),
        |s AS (SELECT g, CAST(1.0 + g % 3 AS DOUBLE) sc FROM g)
        |SELECT g, CAST(4 AS BIGINT) AS nv, ROUND(16 * sc * sc, 4) AS area,
        | CAST(g AS DOUBLE) AS v1x, CAST(g + 4 * sc AS DOUBLE) AS v2x,
        | CAST(2 * g AS DOUBLE) AS v2y
        |FROM s ORDER BY g""".stripMargin,
    "fn_geo_line" ->
      """WITH g AS (SELECT c_custkey k,
        |            (c_custkey % 100) / 8.0 cx, (c_custkey % 77) / 4.0 cy,
        |            CAST(0.5 + (c_custkey % 3) * 0.5 AS DOUBLE) m,
        |            CAST(0.5 + c_custkey % 4 AS DOUBLE) xoff
        |           FROM customer WHERE c_custkey <= 200)
        |SELECT k, CAST(4 AS BIGINT) AS n_points,
        | ROUND(2.75 + m, 4) AS len,
        | cx AS sx, cy + 1.0 + m AS ey, cx + 1.5 AS p2x,
        | cx + 2.25 AS xmax, cy + 1.0 + m AS ymax,
        | cy - 3.0 AS u_ymin,
        | greatest(cx + 2.25, cx + xoff) AS u_xmax,
        | k % 4 IN (0, 1) AS crosses,
        | true AS wkt_rt
        |FROM g ORDER BY k""".stripMargin,
    "fn_iso_duration" ->
      """WITH b AS (SELECT o_orderkey k,
        |  make_timestamp((epoch_ms(CAST(o_orderdate AS TIMESTAMP))
        |    + (o_orderkey % 86400) * 1000 + o_orderkey % 1000) * 1000) ts2,
        |  o_orderdate
        | FROM orders WHERE o_orderkey <= 500)
        |SELECT k,
        | strftime(ts2, '%Y-%m-%dT%H:%M:%S.%g') AS iso_ts,
        | strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso_d,
        | true AS rt_ts,
        | true AS rt_d,
        | CAST((k % 100) * 60 + 15 AS DOUBLE) AS dur_m_secs,
        | CAST((k % 10) * 3600 AS DOUBLE) AS dur_h_secs,
        | CAST(k % 1000 AS DOUBLE) / 1000.0 AS dur_ms_secs
        |FROM b ORDER BY k""".stripMargin,
    "fn_conv" ->
      """SELECT p_partkey AS k,
        | upper(hex(encode(p_name))) AS hex_utf8,
        | p_name AS roundtrip,
        | CAST(octet_length(encode(p_name)) AS BIGINT) AS n_bytes,
        | true AS crc_stable,
        | true AS xx_stable
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_split_map" ->
      """SELECT k,
        | string_split(pair, '=')[1] AS key,
        | string_split(pair, '=')[2] AS value,
        | w_vals, n_w
        |FROM (SELECT p_partkey k,
        |       unnest(string_split('brand=' || p_brand
        |         || ';type=' || p_type
        |         || ';size=' || CAST(p_size AS VARCHAR)
        |         || ';grp=' || CAST(p_partkey % 3 AS VARCHAR), ';')) AS pair,
        |       array_to_string(string_split(p_type, ' '), '|') AS w_vals,
        |       CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_w
        |      FROM part WHERE p_partkey <= 100)
        |ORDER BY k, key""".stripMargin,
    "fn_url_codec" ->
      """SELECT n_nationkey AS k,
        | replace(replace(replace(replace(replace(replace(replace(replace(
        |   n_name || ' a/b:c&d=e,f+g~h',
        |   '+', '%2B'), ' ', '+'), '/', '%2F'), ':', '%3A'), '&', '%26'),
        |   '=', '%3D'), ',', '%2C'), '~', '%7E') AS enc,
        | n_name || ' a/b:c&d=e,f+g~h' AS dec
        |FROM nation ORDER BY k""".stripMargin,
    "fn_url" ->
      """SELECT c_custkey AS k,
        | 'https' AS proto,
        | 'shop.example.com' AS host,
        | '/api/v' || (c_custkey % 3)::VARCHAR || '/items' AS path,
        | 'id=' || c_custkey::VARCHAR || '&lang=en' AS query,
        | c_custkey::VARCHAR AS id_param,
        | 'en' AS lang_param
        |FROM customer WHERE c_custkey <= 100 ORDER BY k""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey AS k,
        | coalesce(nullif(o_orderstatus, 'O'), 'open') AS status,
        | CASE WHEN o_totalprice > 200000 THEN 'big'
        |      WHEN o_totalprice > 100000 THEN 'mid'
        |      ELSE 'small' END AS bucket,
        | TRY_CAST(o_orderpriority AS INT) AS bad_cast,
        | CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |      ELSE o_totalprice / (o_orderkey % 2) END AS try_div,
        | o_orderkey % 2 = 0 AS is_even,
        | coalesce(nullif(o_orderkey % 3, 0), -1) AS nvl3
        |FROM orders WHERE o_orderkey <= 500 ORDER BY k""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey AS k,
        | regexp_matches(p_type, '^STANDARD') AS is_std,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | CAST(len(regexp_extract_all(p_name, 'a')) AS BIGINT) AS n_a,
        | CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
        | array_to_string(regexp_split_to_array(p_type, ' '), ',') AS type_words
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,
    "fn_mysql_datefmt" ->
      """SELECT o_orderkey AS k,
        | strftime(o_orderdate, '%Y-%m-%d') AS iso,
        | strftime(o_orderdate, '%d/%m/%Y') AS euro,
        | strftime(o_orderdate, '%Y%j') AS ordinal,
        | strftime(o_orderdate, '%H:%M:%S') AS hms,
        | strftime(o_orderdate, '%b') AS mon,
        | strftime(o_orderdate, '%A') AS weekday,
        | 'y=' || strftime(o_orderdate, '%Y') || ' 100%' AS mixed,
        | CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |      ELSE strftime(o_orderdate, '%d/%m/%Y') END AS dyn
        |FROM orders WHERE o_orderkey <= 500 ORDER BY k""".stripMargin,
    "fn_datetime2" ->
      """SELECT o_orderkey AS k,
        | CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2mo,
        | CAST(o_orderdate - INTERVAL 15 DAY AS DATE) AS minus15d,
        | CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        | CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey <= 500 ORDER BY k""".stripMargin,
    "fn_array_adv" ->
      """WITH b AS (SELECT p_partkey AS k, range(1, p_size % 4 + 3) arr,
        |            string_split(p_type, ' ') ws
        |           FROM part WHERE p_partkey <= 100)
        |SELECT k,
        | array_to_string(list_transform(range(1, len(arr) + 1),
        |   i -> CAST(list_sum(arr[1:i]) AS BIGINT)), ',') AS cum_sum,
        | array_to_string(list_transform(arr,
        |   x -> CAST(round(x / CAST(list_sum(arr) AS BIGINT), 4) AS VARCHAR)), ',')
        |   AS normalized,
        | array_to_string(list_sort(arr, 'DESC'), ',') AS sorted_desc,
        | array_to_string(list_transform(
        |   range(1, greatest(len(ws) - 1, 1) + 1),
        |   i -> concat_ws(' ', ws[i], ws[i + 1])), '|') AS bigrams,
        | CAST(coalesce(list_position(arr, 3), 0) AS BIGINT) AS pos3,
        | array_to_string(list_filter(arr, x -> x <> 2), ',') AS without2,
        | array_to_string([arr[1], arr[1], arr[1]], ',') AS rep3,
        | array_to_string(list_transform(range(1, len(arr) + 1),
        |   i -> arr[i] + arr[len(arr) - i + 1]), ',') AS zip_sum
        |FROM b ORDER BY k""".stripMargin,
    "fn_misc" ->
      """WITH b AS (SELECT n_nationkey AS k, n_name,
        |        md5(n_name) AS h,
        |        CAST(n_nationkey % 9 + 1 AS VARCHAR) ||
        |          (['B', 'kB', 'MB', 'GB'][CAST(n_nationkey % 4 + 1 AS INT)]) AS sz
        |       FROM nation)
        |SELECT k,
        | printf('%s has key %d', n_name, k) AS fmt_sd,
        | printf('%.2f', k / 7.0) AS fmt_f,
        | substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4)
        |  || '-' || substr(h, 17, 4) || '-' || substr(h, 21, 12) AS uuid,
        | sz,
        | CAST(CAST(regexp_extract(sz, '^([0-9.]+)', 1) AS DOUBLE) *
        |   CASE regexp_extract(sz, '([a-zA-Z]+)$', 1)
        |    WHEN 'B' THEN 1 WHEN 'kB' THEN 1024
        |    WHEN 'MB' THEN 1048576 ELSE 1073741824 END AS BIGINT) AS bytes
        |FROM b ORDER BY k""".stripMargin,
    "fn_parity3" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(o_orderkey % 1000 AS BIGINT) AS x,
        |    CAST(o_orderkey % 37 AS BIGINT) AS y,
        |    CAST(o_orderkey % 5 + 1 AS INT) AS s
        |  FROM orders WHERE o_orderkey <= 400),
        |w AS (SELECT b.*,
        |    CAST(x % 51 AS DOUBLE) AS ws,
        |    50.0 + CAST(x % 25 AS DOUBLE) AS wt,
        |    sqrt(CAST(x*x + y*y + 4 AS DOUBLE)) AS n2
        |  FROM b),
        |c AS (SELECT w.*, ws / wt AS p,
        |    (ws / wt + 1.96 * 1.96 / (2 * wt)) /
        |      (1 + 1.96 * 1.96 / wt) AS center,
        |    1.96 * sqrt((ws / wt) * (1 - ws / wt) / wt
        |      + 1.96 * 1.96 / (4 * wt * wt)) /
        |      (1 + 1.96 * 1.96 / wt) AS margin
        |  FROM w)
        |SELECT k,
        |  x & y AS band, x | y AS bor, xor(x, y) AS bxor, ~x AS bnot,
        |  x << s AS bsl,
        |  (x << 2) & 255 AS bsl8,
        |  (x & 255) >> 1 AS blsr,
        |  CAST(floor((0 - x) / 4.0) AS BIGINT) AS basr,
        |  (CASE WHEN (((x % 200 - 100) * CAST(power(2, s) AS BIGINT))
        |              & 128) != 0
        |        THEN ((x % 200 - 100) * CAST(power(2, s) AS BIGINT)) | -256
        |        ELSE ((x % 200 - 100) * CAST(power(2, s) AS BIGINT)) & 255
        |   END) AS tshl,
        |  CAST(0 AS BIGINT) AS ishl33,
        |  CAST(0 AS BIGINT) AS bshl64,
        |  CAST(floor((x % 100 - 100 + 256) / 2) AS BIGINT) AS trsl,
        |  CAST(-1 AS BIGINT) AS srsa70,
        |  CAST(levenshtein(CAST(x AS VARCHAR), CAST(y AS VARCHAR))
        |    AS BIGINT) AS lev,
        |  sha256(CAST(k AS VARCHAR)) AS h256,
        |  'ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f' AS h512,
        |  'd382e6ca' AS sp32,
        |  '3768826ad382e6ca' AS sp64,
        |  array_to_string([x, x + y, 2*x + y + 1], ',') AS cs,
        |  CASE WHEN k % 4 = 0
        |       THEN CAST(x AS VARCHAR) || ',null,null'
        |       ELSE array_to_string([x, x + y, 2*x + y], ',') END AS csn,
        |  ROUND(x / n2, 4) AS nrm1,
        |  ROUND(y / n2, 4) AS nrm2,
        |  ROUND(2 / n2, 4) AS nrm3,
        |  'é' AS nfc,
        |  CAST(2 AS BIGINT) AS nfd_len,
        |  ROUND(center - margin, 4) AS wl,
        |  ROUND(center + margin, 4) AS wu,
        |  'example.com' AS uhost,
        |  CAST(8080 AS BIGINT) AS uport,
        |  '/p/' || CAST(k AS VARCHAR) AS upath,
        |  CAST(x AS VARCHAR) AS uparam,
        |  'f' AS ufrag,
        |  DATE '2021-06-15' AS dp,
        |  CAST(0 AS BIGINT) AS hll0,
        |  true AS fin, true AS inf1, true AS inf_big,
        |  CAST(4 AS BIGINT) AS ib1, CAST(5 AS BIGINT) AS ib2,
        |  CAST(7 AS BIGINT) AS ib3
        |FROM c ORDER BY k""".stripMargin,
    "fn_plan_json" ->
      ("""SELECT o_orderkey AS k,
        | '12|33|7' AS ids,
        | '33' AS ch12,
        | '' AS ch33,
        | true AS ch_missing,
        | '""" +
        """{"0":{"plan":{"id":"PLANID","name":"Output","identifier":""" +
        """"IDENTIFIER","details":"DETAILS","children":[{"id":"PLANID",""" +
        """"name":"Aggregate(FINAL)","identifier":"IDENTIFIER",""" +
        """"details":"DETAILS","children":[{"id":"PLANID","name":""" +
        """"TableScan","identifier":"tableName=l","details":"DETAILS",""" +
        """"children":[],"remoteSources":[],"estimates":[]}],""" +
        """"remoteSources":[],"estimates":[]}],"remoteSources":[],""" +
        """"estimates":[]}}}' AS scrubbed,
        | true AS bad_null
        |FROM orders WHERE o_orderkey <= 100 ORDER BY k""").stripMargin,
    "fn_wilson" ->
      """WITH b AS (SELECT c_custkey AS k,
        |        CAST(c_custkey % 51 AS DOUBLE) AS successes,
        |        50.0 + CAST(c_custkey % 25 AS DOUBLE) AS trials
        |       FROM customer WHERE c_custkey <= 300),
        |c AS (SELECT k, successes, trials, successes / trials AS p,
        |       (successes / trials + 1.96 * 1.96 / (2 * trials)) /
        |         (1 + 1.96 * 1.96 / trials) AS center,
        |       1.96 * sqrt((successes / trials) * (1 - successes / trials) / trials
        |         + 1.96 * 1.96 / (4 * trials * trials)) /
        |         (1 + 1.96 * 1.96 / trials) AS margin
        |      FROM b)
        |SELECT k, successes, trials,
        | ROUND(center - margin, 4) AS wilson_lower,
        | ROUND(center + margin, 4) AS wilson_upper
        |FROM c ORDER BY k""".stripMargin,
    "fn_ip" ->
      """WITH base AS (
        | SELECT c_custkey AS k,
        |  '10.' || CAST(c_custkey % 256 AS VARCHAR) || '.' ||
        |  CAST((c_custkey * 7) % 256 AS VARCHAR) || '.' ||
        |  CAST(c_nationkey % 256 AS VARCHAR) AS ip
        | FROM customer WHERE c_custkey <= 300),
        |n AS (SELECT k, ip,
        |  CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 +
        |  CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 +
        |  CAST(string_split(ip, '.')[3] AS BIGINT) * 256 +
        |  CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_num
        | FROM base)
        |SELECT k, ip, ip_num,
        | string_split(ip, '.')[1] || '.' || string_split(ip, '.')[2] || '.' ||
        |  string_split(ip, '.')[3] || '.0' AS slash24,
        | (ip_num >> 16) = 10 * 256 + 64 AS in_10_64_16,
        | (ip_num >> 13) = (10 * 16777216 + 64 * 65536) // 8192 AS in_10_64_13,
        | ip_num % 97 AS shard
        |FROM n ORDER BY k""".stripMargin,
    "fn_geo" ->
      """WITH pt AS (SELECT c_custkey AS k,
        |        CAST((c_custkey % 360) - 180 + 0.5 AS DOUBLE) AS x,
        |        CAST((c_nationkey * 7 % 180) - 90 + 0.5 AS DOUBLE) AS y
        |       FROM customer WHERE c_custkey <= 300)
        |SELECT k, x, y,
        | ROUND(sqrt(pow(x - 10.0, 2) + pow(y - 20.0, 2)), 4) AS dist,
        | ROUND(2.0 * 6371.0 * asin(sqrt(
        |   pow(sin(radians(y - 20.0) / 2), 2) +
        |   cos(radians(20.0)) * cos(radians(y)) *
        |   pow(sin(radians(x - 10.0) / 2), 2))), 4) AS hav_km,
        | x BETWEEN -50 AND 50 AND y BETWEEN -45 AND 45 AS in_bbox,
        | ROUND(abs(x * y) / 2, 4) AS tri_area,
        | ROUND((degrees(atan2(
        |   sin(radians(x - 10.0)) * cos(radians(y)),
        |   cos(radians(20.0)) * sin(radians(y)) -
        |   sin(radians(20.0)) * cos(radians(y)) * cos(radians(x - 10.0))))
        |   + 360.0) % 360.0, 4) AS bearing
        |FROM pt ORDER BY k""".stripMargin,
    "fn_vector" ->
      """WITH p AS (SELECT a.vec_id va, a.embedding ea, b.vec_id vb, b.embedding eb
        |           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |           WHERE a.vec_id < 20 AND b.vec_id < 20),
        |u AS (SELECT va, vb, unnest(ea) x, unnest(eb) y FROM p),
        |d AS (SELECT va, vb,
        |       SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) dot,
        |       SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
        |         * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))) l2,
        |       sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) na,
        |       sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) nb
        |      FROM u GROUP BY 1, 2)
        |SELECT va, vb, ROUND(dot, 4) AS dot, ROUND(l2, 4) AS l2sq,
        | ROUND(dot / (na * nb), 4) AS cos
        |FROM d ORDER BY va, vb""".stripMargin,
    "fn_hll" ->
      """SELECT lang, count(DISTINCT w) AS exact, true AS ok
        |FROM (SELECT lang, unnest(string_split(text, ' ')) w FROM documents)
        |GROUP BY lang
        |UNION ALL
        |SELECT '__merged__', count(DISTINCT w), true
        |FROM (SELECT unnest(string_split(text, ' ')) w FROM documents)
        |ORDER BY lang""".stripMargin,
    "fn_qdigest" ->
      """SELECT l_linestatus, ROUND(quantile_cont(l_quantity, 0.5), 4)
        |  AS exact_median, true AS ok
        |FROM lineitem GROUP BY l_linestatus
        |UNION ALL
        |SELECT '__merged__', ROUND(quantile_cont(l_quantity, 0.5), 4), true
        |FROM lineitem
        |ORDER BY l_linestatus""".stripMargin,
    "fn_sparse_math" ->
      """SELECT s_suppkey AS k,
        |  CAST((s_acctbal >= 0) AS BIGINT) + CAST((s_acctbal >= 2000) AS BIGINT)
        |    + CAST((s_acctbal >= 4000) AS BIGINT) + CAST((s_acctbal >= 6000) AS BIGINT)
        |    + CAST((s_acctbal >= 8000) AS BIGINT) AS wb_bins,
        |  CAST(CASE WHEN s_acctbal < 0 THEN 0
        |            WHEN s_acctbal >= 10000 THEN 11
        |            ELSE FLOOR(s_acctbal / 1000) + 1 END AS BIGINT) AS wb_uniform,
        |  ROUND(((s_suppkey % 11 + 1) * (s_suppkey % 5 + 1)) /
        |    (sqrt((s_suppkey % 7 + 1) * (s_suppkey % 7 + 1) +
        |          (s_suppkey % 11 + 1) * (s_suppkey % 11 + 1)) *
        |     sqrt((s_suppkey % 5 + 1) * (s_suppkey % 5 + 1) + 4.0)), 4)
        |    AS cos_sparse
        |FROM supplier ORDER BY k""".stripMargin,
    "fn_sketch_dispatch" ->
      """WITH words AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT lang AS k, 'hll' AS metric,
        |  CAST(count(DISTINCT w) AS DOUBLE) AS exact, true AS ok
        |FROM words GROUP BY lang
        |UNION ALL
        |SELECT '__merged_hll', 'hll',
        |  (SELECT CAST(count(DISTINCT w) AS DOUBLE) FROM words), true
        |UNION ALL
        |SELECT '__merged_qdigest', 'qdigest',
        |  (SELECT ROUND(quantile_cont(l_quantity, 0.5), 4) FROM lineitem), true
        |UNION ALL
        |SELECT '__merged_theta', 'theta',
        |  (SELECT CAST(count(DISTINCT s_suppkey) AS DOUBLE) FROM supplier), true
        |UNION ALL
        |SELECT '__merged_setdigest', 'setdigest',
        |  (SELECT CAST(count(DISTINCT s_suppkey) AS DOUBLE) FROM supplier), true
        |ORDER BY k, metric""".stripMargin
  )
}
