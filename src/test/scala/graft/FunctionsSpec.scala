package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, Hll, StringSimUtils}
import org.apache.spark.unsafe.types.UTF8String

/** Unit + integration tests for the custom Catalyst expression library
  * (the FunctionAssertions pattern — reference presto-main-base/src/test/
  * java/com/facebook/presto/operator/scalar/FunctionAssertions.java:166:
  * each function evaluated both interpreted and compiled). */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def u(s: String) = UTF8String.fromString(s)

  test("jaro_winkler matches reference values (incl. boost-threshold gate)") {
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("crate", "trace", 0.7333333333333334),
      ("arnab", "aranb", 0.9466666666666665),
      ("appel", "apple", 0.9533333333333333),
      ("abc", "xyz", 0.0),
      ("a", "a", 1.0),
      ("", "", 0.0),
      ("ab", "", 0.0),
      ("abcdefgh", "abzzzzzz", 0.5), // jaro < 0.7 → no prefix boost
      ("zzabcdef", "zzabzzzz", 0.6666666666666666))
    for ((a, b, expect) <- cases) {
      val got = StringSimUtils.jaroWinkler(u(a), u(b))
      assert(math.abs(got - expect) < 1e-12, s"jw($a,$b)=$got want $expect")
    }
  }

  test("hamming distance counts diffs and rejects unequal lengths") {
    assert(StringSimUtils.hamming(u("abcde"), u("abxde")) == 1L)
    assert(StringSimUtils.hamming(u(""), u("")) == 0L)
    intercept[IllegalArgumentException] {
      StringSimUtils.hamming(u("ab"), u("abc"))
    }
  }

  test("hamming distance counts code points, not UTF-16 units") {
    // 𝄞 (U+1D11E) is a surrogate pair: one position, not two
    assert(StringSimUtils.hamming(u("𝄞a"), u("𝄞b")) == 1L)
    assert(StringSimUtils.hamming(u("𝄞a"), u("xa")) == 1L)
    // equal code-point counts with different UTF-16 lengths are accepted
    assert(StringSimUtils.hamming(u("𝄞"), u("x")) == 1L)
  }

  test("porter stemmer matches the published algorithm's sample vocabulary") {
    import graft.functions.PorterStemmer.stem
    // examples straight from Porter 1980 §2 (step-by-step tables)
    val cases = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    for ((in, want) <- cases)
      assert(stem(in) == want, s"stem($in) = ${stem(in)}, want $want")
  }

  test("quantile digest: bounded rank error, merge composition, roundtrip") {
    import graft.functions.QDigest
    val n = 10000
    // build from a shuffled-but-deterministic stream
    val xs = (1 to n).map(i => ((i * 2654435761L) % n).toDouble)
    val d = xs.foldLeft(QDigest.empty(200))(QDigest.add)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = QDigest.quantile(d, q)
      val rankErr = math.abs(est - q * n) / n // uniform data: value ≈ rank
      assert(rankErr < 0.02, s"q=$q est=$est rankErr=$rankErr")
    }
    // merging 4 partial digests ≈ one global digest (partial-agg path)
    val parts = xs.grouped(n / 4).map(_.foldLeft(QDigest.empty(200))(QDigest.add))
    val merged = parts.reduce(QDigest.merge)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = QDigest.quantile(merged, q)
      assert(math.abs(est - q * n) / n < 0.02, s"merged q=$q est=$est")
    }
    // serialization roundtrip is lossless
    val rt = QDigest.deserialize(QDigest.serialize(merged))
    assert(QDigest.quantile(rt, 0.5) == QDigest.quantile(merged, 0.5))
  }

  test("mysql date-format specifiers translate to java patterns") {
    import graft.functions.MySqlFormat.toJava
    assert(toJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(toJava("%d/%m/%Y") == "dd/MM/yyyy")
    assert(toJava("%H:%i:%s") == "HH:mm:ss")
    assert(toJava("y=%Y 100%%") == "'y='yyyy 100%")
    assert(toJava("%W, %M %e") == "EEEE, MMMM d")
    intercept[IllegalArgumentException] { toJava("%Q") }
  }

  test("TRY(expr) nulls runtime errors instead of failing the query") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT try_expr(hamming_distance('ab', 'abc')) AS bad,
        |       try_expr(hamming_distance('ab', 'ax')) AS good""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 1L)
  }

  test("vector kernels reject mismatched dimensions") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Float*) = ArrayData.toArrayData(xs.toArray)
    intercept[IllegalArgumentException] {
      graft.functions.VectorUtils.dotF(arr(1f, 2f), arr(1f))
    }
    intercept[IllegalArgumentException] {
      graft.functions.VectorUtils.l2SquaredF(arr(1f), arr(1f, 2f))
    }
    intercept[IllegalArgumentException] {
      graft.functions.VectorUtils.cosineF(arr(1f), arr(1f, 2f))
    }
  }

  test("approx_most_frequent validates its arguments at build time") {
    val builder = GraftFunctions.all
      .find(_._1 == "approx_most_frequent").get._3
    import org.apache.spark.sql.catalyst.expressions.Literal
    intercept[IllegalArgumentException] { builder(Seq(Literal(3))) }
    intercept[IllegalArgumentException] {
      // non-foldable k (an attribute) must be a clear error
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      builder(Seq(UnresolvedAttribute("k"), Literal("v"), Literal(64)))
    }
  }

  test("SQL registration: custom functions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT jaro_winkler_similarity('martha', 'marhta') jw,
        |       hamming_distance('abcde', 'abxde') ham,
        |       cosine_similarity(array(1.0F, 2.0F), array(2.0F, 4.0F)) cos,
        |       dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) dot,
        |       l2_squared(array(1.0F, 2.0F), array(1.0F, 4.0F)) l2
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(r.getLong(1) == 1L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - 11.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 4.0) < 1e-12)
  }

  test("HLL estimate is within 5% of exact NDV on real data") {
    GraftFunctions.register(spark)
    val df = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val r = df.agg(
      GraftFunctions.hllCardinality(
        GraftFunctions.approxSet(col("l_partkey"))).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).collect()(0)
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL merge of partial sketches equals the global sketch exactly") {
    GraftFunctions.register(spark)
    val df = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val global = df.agg(
      GraftFunctions.hllCardinality(
        GraftFunctions.approxSet(col("l_partkey")))).collect()(0).getLong(0)
    // sketch per returnflag group, then merge the stored sketches
    val merged = df.groupBy("l_returnflag")
      .agg(GraftFunctions.approxSet(col("l_partkey")).as("sk"))
      .agg(GraftFunctions.hllCardinality(
        GraftFunctions.mergeHll(col("sk")))).collect()(0).getLong(0)
    assert(global == merged,
      s"merge must be exact (register max): global=$global merged=$merged")
  }

  test("HLL sketches survive a parquet round-trip (stable binary state)") {
    GraftFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    val df = Tables(spark, "/root/testdata/sf0.01", "orders")
    df.groupBy("o_orderstatus")
      .agg(GraftFunctions.approxSet(col("o_custkey")).as("sk"))
      .write.mode("overwrite").parquet(s"$dir/sketches")
    val re = spark.read.parquet(s"$dir/sketches")
      .agg(GraftFunctions.hllCardinality(GraftFunctions.mergeHll(col("sk"))))
      .collect()(0).getLong(0)
    val direct = df.agg(GraftFunctions.hllCardinality(
      GraftFunctions.approxSet(col("o_custkey")))).collect()(0).getLong(0)
    assert(re == direct, s"round-trip=$re direct=$direct")
  }

  test("hll kernel: small cardinalities are near-exact (linear counting)") {
    val buf = Hll.emptyBuffer(Hll.DefaultP)
    (1 to 100).foreach(i => Hll.add(buf,
      Hll.hash(java.nio.ByteBuffer.allocate(8).putLong(i.toLong).array())))
    val est = Hll.cardinality(buf)
    assert(math.abs(est - 100L) <= 2, s"est=$est")
  }

  test("set digest kernel: exact below k, bounded estimate above, merge-stable") {
    import graft.functions.SetDigestKmv
    // exact path
    var small = SetDigestKmv.empty(512)
    (1 to 300).foreach(i => small = SetDigestKmv.add(small, SetDigestKmv.hashValue(i.toLong)))
    assert(SetDigestKmv.cardinality(small) == 300L)
    // estimate path: 20k distinct → within ~3/sqrt(512) ≈ 13%
    var big = SetDigestKmv.empty(512)
    (1 to 20000).foreach(i => big = SetDigestKmv.add(big, SetDigestKmv.hashValue(i.toLong)))
    val est = SetDigestKmv.cardinality(big)
    assert(math.abs(est / 20000.0 - 1.0) < 0.13, s"est=$est")
    // split/merge equals direct build (KMV union-truncate is lossless here)
    var l = SetDigestKmv.empty(512); var r = SetDigestKmv.empty(512)
    (1 to 20000).foreach { i =>
      val h = SetDigestKmv.hashValue(i.toLong)
      if (i % 2 == 0) l = SetDigestKmv.add(l, h) else r = SetDigestKmv.add(r, h)
    }
    val merged = SetDigestKmv.merge(l, r)
    assert(merged.hashes.sameElements(big.hashes))
    // jaccard of 2/3-overlap sets within MinHash bound
    var a = SetDigestKmv.empty(512); var b = SetDigestKmv.empty(512)
    (1 to 15000).foreach { i =>
      val h = SetDigestKmv.hashValue(i.toLong)
      if (i % 3 != 0) a = SetDigestKmv.add(a, h)
      if (i % 3 != 1) b = SetDigestKmv.add(b, h)
    }
    val j = SetDigestKmv.jaccard(a, b)
    assert(math.abs(j - 1.0 / 3.0) < 0.08, s"jaccard=$j")
    // serialization round-trip
    assert(SetDigestKmv.deserialize(SetDigestKmv.serialize(big)).hashes
      .sameElements(big.hashes))
  }

  test("parse_presto_data_size: binary multipliers, truncation, errors") {
    import graft.functions.BinConvSketch.parseDataSize
    assert(parseDataSize("0B").longValueExact == 0L)
    assert(parseDataSize("1kB").longValueExact == 1024L)
    assert(parseDataSize("1.5MB").longValueExact == (1.5 * (1 << 20)).toLong)
    assert(parseDataSize("2.2GB").longValueExact == 2362232012L) // truncated
    assert(parseDataSize("1EB").toString == (BigInt(1) << 60).toString)
    assert(parseDataSize("1YB").toString == (BigInt(1) << 80).toString)
    intercept[IllegalArgumentException](parseDataSize("kB"))
    intercept[IllegalArgumentException](parseDataSize("1KB")) // case sensitive
    intercept[IllegalArgumentException](parseDataSize("1 MB")) // no space
    // SQL surface
    val r = graft.api.SqlSession.wrap(spark)
      .sql("SELECT parse_presto_data_size('2.3MB') v").collect()(0)
    assert(r.getDecimal(0).longValueExact == (2.3 * (1 << 20)).toLong)
  }

  test("ip prefix kernel: collapse, subnets, containment, private ranges") {
    import graft.functions.IpFns
    // reference mergeIpRanges doc example (IpPrefixFunctions.java:228):
    // 10/8 overlapping 10/7 etc. — minimal CIDR cover, sorted
    assert(IpFns.collapse(Seq("10.0.0.0/8", "9.255.255.0/24", "10.0.0.0/7",
      "10.1.0.0/24", "10.10.0.0/16")) == Seq("9.255.255.0/24", "10.0.0.0/7"))
    // adjacent /24s merge into a /23
    assert(IpFns.collapse(Seq("192.168.0.0/24", "192.168.1.0/24"))
      == Seq("192.168.0.0/23"))
    // non-aligned merge re-splits into maximal blocks
    assert(IpFns.collapse(Seq("192.168.1.0/24", "192.168.2.0/24"))
      == Seq("192.168.1.0/24", "192.168.2.0/24"))
    assert(IpFns.subnets("10.0.0.0/8", 10)
      == Seq("10.0.0.0/10", "10.64.0.0/10", "10.128.0.0/10", "10.192.0.0/10"))
    assert(IpFns.subnets("10.0.0.0/16", 8) == Nil) // shorter target: empty
    intercept[IllegalArgumentException](IpFns.subnets("0.0.0.0/0", 32))
    assert(IpFns.isSubnetOf("10.0.0.0/8", "10.255.1.2"))
    assert(!IpFns.isSubnetOf("10.0.0.0/8", "11.0.0.0"))
    assert(IpFns.isSubnetOf("10.0.0.0/8", "10.64.0.0/10"))
    assert(!IpFns.isSubnetOf("10.64.0.0/10", "10.0.0.0/8")) // wider not contained
    assert(IpFns.isPrivate("192.168.5.5") && IpFns.isPrivate("100.64.0.1") &&
      IpFns.isPrivate("203.0.113.9") && !IpFns.isPrivate("8.8.8.8"))
    assert(IpFns.subnetMax("0.0.0.0/0") == "255.255.255.255")
    intercept[IllegalArgumentException](IpFns.parse4("::1"))
    intercept[IllegalArgumentException](IpFns.parse4("1.2.3"))
    intercept[IllegalArgumentException](IpFns.parse4("1.2.3.999"))
  }

  test("fnv hashes match published vectors; binary conversions roundtrip") {
    import graft.functions.BinConv
    def b(s: String) = s.getBytes("UTF-8")
    // published FNV test vectors (isthe.com/chongo/tech/comp/fnv)
    assert(BinConv.fnv1_32(b("")) == 0x811c9dc5L)
    assert(BinConv.fnv1a_32(b("foobar")) == 0xbf9cf968L)
    assert(BinConv.fnv1_64(b("a")) == 0xaf63bd4c8601b7beL)
    assert(BinConv.fnv1a_64(b("foobar")) == 0x85944171f73967e8L)
    // big-endian + ieee754 conversions
    assert(BinConv.toBe64(1L).toSeq == Seq[Byte](0, 0, 0, 0, 0, 0, 0, 1))
    assert(BinConv.fromBe64(BinConv.toBe64(-123456789L)) == -123456789L)
    assert(BinConv.fromBe32(BinConv.toBe32(Int.MinValue)) == Int.MinValue)
    assert(BinConv.toIeee64(1.0).toSeq ==
      Seq[Byte](0x3f, -0x10, 0, 0, 0, 0, 0, 0)) // 0x3ff0000000000000
    assert(BinConv.fromIeee64(BinConv.toIeee64(math.Pi)) == math.Pi)
    assert(BinConv.fromIeee32(BinConv.toIeee32(1.5f)) == 1.5f)
    intercept[IllegalArgumentException](BinConv.fromBe64(Array[Byte](1, 2)))
    // longest_common_prefix
    assert(BinConv.lcp(u("foobar"), u("foobaz")).toString == "fooba")
    assert(BinConv.lcp(u("abc"), u("xyz")).toString == "")
    assert(BinConv.lcp(u("same"), u("same")).toString == "same")
  }

  test("construct/destructure tdigest round-trips internal state") {
    import graft.api.SqlSession
    val session = SqlSession.wrap(spark)
    spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("td_rt")
    val r = session.sql(
      """WITH s AS (SELECT tdigest_agg(v) AS d FROM td_rt),
        |x AS (SELECT d, destructure_tdigest(d) AS st FROM s)
        |SELECT st.compression, st.min, st.max, st.count, st.sum,
        |  tdigest_value_at_quantile(construct_tdigest(st.centroid_means,
        |    st.centroid_weights, st.compression, st.min, st.max), 0.5) AS med_rt,
        |  tdigest_value_at_quantile(d, 0.5) AS med
        |FROM x""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 100.0) // default compression
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1000.0)
    assert(r.getDouble(3) == 1000.0) // count = total weight
    assert(math.abs(r.getDouble(4) - 500500.0) < 1e-6) // sum of 1..1000
    assert(r.getDouble(5) == r.getDouble(6)) // identical reconstructed median
  }

  test("scale_qdigest/scale_tdigest keep quantiles, quantiles_at_values maps") {
    import graft.functions.{BinConvSketch, QDigest, TDigest}
    var qd = QDigest.empty(100)
    var td = TDigest.empty(100.0)
    (1 to 1000).foreach { i => qd = QDigest.add(qd, i.toDouble); td = TDigest.add(td, i.toDouble) }
    val qb = QDigest.serialize(qd)
    val tb = TDigest.serialize(TDigest.compress(td))
    for (f <- Seq(0.5, 2.0, 10.0); q <- Seq(0.1, 0.5, 0.9)) {
      assert(QDigest.valueAtQuantile(BinConvSketch.scaleQdigest(qb, f), q) ==
        QDigest.valueAtQuantile(qb, q), s"qdigest f=$f q=$q")
      assert(math.abs(TDigest.valueAtQuantile(BinConvSketch.scaleTdigest(tb, f), q) -
        TDigest.valueAtQuantile(tb, q)) < 1e-9, s"tdigest f=$f q=$q")
    }
    intercept[IllegalArgumentException](BinConvSketch.scaleQdigest(qb, 0.0))
    // quantiles_at_values through SQL = element-wise quantile_at_value
    import graft.api.SqlSession
    val session = SqlSession.wrap(spark)
    spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("qv")
    val r = session.sql(
      """SELECT quantiles_at_values(tdigest_agg(v), array(250.0, 500.0, 750.0)) q
        |FROM qv""".stripMargin).collect()(0).getSeq[Double](0)
    assert(r.size == 3 && r.sliding(2).forall(p => p(0) < p(1)))
    assert(math.abs(r(1) - 0.5) < 0.05, s"median rank ${r(1)}")
  }

  test("kdb tree: leaves tile the plane, point hits one leaf, json roundtrip") {
    import graft.functions.Kdb
    val rnd = new scala.util.Random(11)
    val pts = IndexedSeq.fill(2000)(
      { val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
        Kdb.Rect(x, y, x, y) })
    val root = Kdb.build(100, pts)
    val leaves = Kdb.leaves(root)
    assert(leaves.size >= 20, s"expected >= 20 leaves, got ${leaves.size}")
    // ids are distinct
    assert(leaves.map(_.id).distinct.size == leaves.size)
    // every probe point lands in exactly one leaf (right/top exclusive)
    (0 until 500).foreach { _ =>
      val x = rnd.nextDouble() * 120 - 10
      val y = rnd.nextDouble() * 120 - 10
      val hits = Kdb.intersectingLeaves(root, Kdb.Rect(x, y, x, y))
      assert(hits.size == 1, s"point ($x,$y) hit ${hits.size} leaves")
    }
    // envelopes hit every leaf they overlap; a huge envelope hits all
    val all = Kdb.intersectingLeaves(root, Kdb.Rect(-1e9, -1e9, 1e9, 1e9))
    assert(all.size == leaves.size)
    // per-leaf sample count respects the cap (no degenerate splits here)
    val counts = leaves.map(l => pts.count(p =>
      l.extent.xmin <= p.xmax && l.extent.xmax > p.xmin &&
        l.extent.ymin <= p.ymax && l.extent.ymax > p.ymin))
    assert(counts.forall(_ <= 100), s"leaf over capacity: ${counts.max}")
    // json round-trip preserves structure
    val rt = Kdb.fromJson(Kdb.toJson(root))
    assert(Kdb.toJson(rt) == Kdb.toJson(root))
    assert(Kdb.leaves(rt).map(_.id) == leaves.map(_.id))
  }

  test("regexp_replace lambda: groups, zero-width, null result, 2-arg removal") {
    import graft.api.SqlSession
    val session = SqlSession.wrap(spark)
    def one(q: String): Any = session.sql(q).collect()(0).get(0)
    // reference TestJoniRegexpFunctions lambda cases: capture-group array
    assert(one("SELECT regexp_replace('new york', '(y)(ork)', x -> upper(x[1]) || x[2])")
      == "new York")
    // non-participating alternation group is NULL in the array
    assert(one("SELECT regexp_replace('ab', '(a)|(b)', " +
      "x -> CASE WHEN x[1] IS NULL THEN 'B' ELSE 'A' END)") == "AB")
    // zero-width match interleaves (JoniRegexpReplaceLambdaFunction zero-width step)
    assert(one("SELECT regexp_replace('ab', '', x -> '-')") == "-a-b-")
    // NULL lambda result nulls the entire output
    assert(one("SELECT regexp_replace('abc', '(b)', x -> CAST(NULL AS STRING))") == null)
    // no match returns the source unchanged
    assert(one("SELECT regexp_replace('abc', '(z)', x -> 'X')") == "abc")
    // 2-arg form removes matches (reference regexp_replace(s, p))
    assert(one("SELECT regexp_replace('1a2b3c', '[a-z]')") == "123")
    // 3-arg string form still routes to Spark's builtin
    assert(one("SELECT regexp_replace('foo', 'o', '0')") == "f00")
    // Scala API lambda helper
    import org.apache.spark.sql.functions.{lit, upper, element_at}
    val df = spark.range(1).select(
      GraftFunctions.regexpReplaceLambda(lit("ax bx"), lit("([a-z])x"),
        g => upper(element_at(g, 1))).as("r"))
    assert(df.collect()(0).getString(0) == "A B")
  }

  test("weighted qdigest: weight w equals w repeats; rejects non-positive weight") {
    import graft.functions.QDigest
    var wd = QDigest.empty(200)
    var rep = QDigest.empty(200)
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val x = rnd.nextInt(1000).toDouble
      val w = 1 + rnd.nextInt(5)
      wd = QDigest.add(wd, x, w.toDouble)
      (1 to w).foreach(_ => rep = QDigest.add(rep, x))
    }
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val a = QDigest.quantile(wd, q)
      val b = QDigest.quantile(rep, q)
      assert(math.abs(a - b) <= 25.0, s"q=$q weighted=$a repeated=$b")
    }
    intercept[IllegalArgumentException](QDigest.add(QDigest.empty(10), 1.0, 0.0))
    intercept[IllegalArgumentException](QDigest.add(QDigest.empty(10), 1.0, -2.0))
  }

  test("khyperloglog kernel: exact/estimated regimes, uniqueness, merge-stable") {
    import graft.functions.Khll
    // exact regime: 1:1 value→uii fan-out
    val s1 = Khll.empty()
    (1 to 1000).foreach(i => Khll.add(s1, i.toLong, (i + 7).toLong))
    assert(Khll.isExact(s1) && Khll.cardinality(s1) == 1000L)
    val (_, dist) = Khll.uniquenessDistribution(s1, 4L)
    assert(math.abs(dist(0) - 1.0) < 1e-9 && dist(1) == 0.0)
    assert(Khll.reidentificationPotential(s1, 1L) == 1.0)
    // 5 uiis per value → mass on bucket 5 (HLL near-exact at card 5)
    val s5 = Khll.empty()
    for (v <- 1 to 500; u <- 1 to 5) Khll.add(s5, v.toLong, (v * 11 + u).toLong)
    val (_, d5) = Khll.uniquenessDistribution(s5, 8L)
    assert(d5(4) > 0.9, s"bucket-5 mass=${d5(4)}")
    assert(Khll.reidentificationPotential(s5, 1L) < 0.1)
    // estimated regime: 20k distinct values > K=4096
    val big = Khll.empty()
    (1 to 20000).foreach(i => Khll.add(big, i.toLong, (i % 97).toLong))
    assert(!Khll.isExact(big))
    val est = Khll.cardinality(big)
    assert(math.abs(est / 20000.0 - 1.0) < 0.1, s"est=$est")
    // split/merge equals direct build (same K smallest, same per-key HLLs)
    val l = Khll.empty(); val r = Khll.empty()
    (1 to 20000).foreach { i =>
      val t = if (i % 2 == 0) l else r
      Khll.add(t, i.toLong, (i % 97).toLong)
    }
    val merged = Khll.mergeInto(l, r)
    assert(merged.minhash.keySet == big.minhash.keySet)
    assert(Khll.cardinality(merged) == est)
    // jaccard of 2/3-overlap value sets within MinHash bound
    val a = Khll.empty(); val b = Khll.empty()
    (1 to 15000).foreach { i =>
      if (i % 3 != 0) Khll.add(a, i.toLong, 1L)
      if (i % 3 != 1) Khll.add(b, i.toLong, 1L)
    }
    val j = Khll.jaccard(a, b)
    assert(math.abs(j - 1.0 / 3.0) < 0.08, s"jaccard=$j")
    val inter = Khll.intersectionCardinality(a, b)
    assert(math.abs(inter / 5000.0 - 1.0) < 0.25, s"inter=$inter")
    // serialization round-trip preserves keys and registers
    val rt = Khll.deserialize(Khll.serialize(big))
    assert(rt.maxSize == big.maxSize && rt.minhash.keySet == big.minhash.keySet)
    assert(Khll.cardinality(rt) == est)
  }

  test("hmac matches RFC 4231 test vector (sha256)") {
    val out = graft.functions.HmacUtil.hmac("HmacSHA256",
      "Hi There".getBytes("UTF-8"), Array.fill[Byte](20)(0x0b))
    assert(out.map("%02x".format(_)).mkString ==
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
  }

  test("bing tile quadkey matches the published example") {
    // Bing tile docs: tile (3, 5, zoom 3) → quadkey "213"
    val df = spark.range(1).select(
      graft.functions.GeoFunctions.bingTileQuadkey(
        struct(lit(3L).as("x"), lit(5L).as("y"), lit(3).as("zoom"))).as("q"))
    assert(df.collect()(0).getString(0) == "213")
  }

  test("vector expressions agree with the HOF formulation bit-for-bit") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val cmp = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        GraftFunctions.cosineSimilarity(col("a.embedding"), col("b.embedding"))
          .as("expr_cos"),
        ops.Dedup.cosine(col("a.embedding"), col("b.embedding")).as("hof_cos"))
      .collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
  }

  test("vector_sum equals per-position scalar sums across partitionings") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    // exact mode: decimal-per-element accumulation is partition-order-proof
    def run(parts: Int): Array[Seq[Double]] = e.repartition(parts)
      .agg(GraftFunctions.vectorSumExact(col("embedding"), 6).as("vs"))
      .collect().map(_.getSeq[Double](0))
    val a = run(1); val b = run(7)
    assert(a.head == b.head, "exact vector_sum must not depend on partitioning")
    // agrees with d independent sum() aggregates (same decimal convention)
    val dim = a.head.length
    val scalar = e.select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(Tables.dsum(col("x").cast("double")).as("s"))
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    assert(scalar.length == dim)
    assert(a.head == scalar)
    // float (non-exact) mode stays within reordering tolerance of exact
    val fl = e.agg(GraftFunctions.vectorSum(col("embedding")).as("vs"))
      .collect()(0).getSeq[Double](0)
    fl.zip(a.head).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-3, s"$x vs $y") }
    // SQL-name registration
    GraftFunctions.register(spark)
    e.createOrReplaceTempView("emb_vs")
    val viaSql = spark.sql(
      "SELECT vector_sum(embedding, 6) FROM emb_vs").collect()(0).getSeq[Double](0)
    assert(viaSql == a.head)
    // mismatched dimensions are an error, not a truncated result
    val bad = spark.range(2).select(
      when(col("id") === 0, typedLit(Array(1.0f, 2.0f)))
        .otherwise(typedLit(Array(1.0f, 2.0f, 3.0f))).as("v"))
    val err = intercept[Exception] {
      bad.agg(GraftFunctions.vectorSum(col("v"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("noisy gaussian aggregates: scale-0 exactness, seeded determinism, clipping") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x").repartition(5)
    // noiseScale = 0 → exact count/sum/avg
    val exact = df.agg(
      GraftFunctions.noisyCountGaussian(col("x"), 0.0).as("c"),
      GraftFunctions.noisySumGaussian(col("x"), 0.0).as("s"),
      GraftFunctions.noisyAvgGaussian(col("x"), 0.0).as("a"),
      GraftFunctions.noisySumGaussian(col("x"), 0.0, Some((10.0, 20.0))).as("clip"),
      GraftFunctions.noisyCountIfGaussian(col("x") > 90, 0.0).as("ci"))
      .collect()(0)
    assert(exact.getLong(0) == 100L)
    assert(exact.getDouble(1) == 5050.0)
    assert(exact.getDouble(2) == 50.5)
    // clip to [10,20]: 9 values below → 10 each, 80 above → 20 each, 10..20 sum 165
    assert(exact.getDouble(3) == 9 * 10.0 + 165.0 + 80 * 20.0)
    assert(exact.getLong(4) == 10L)
    // seeded noise: exactly Random(seed).nextGaussian()*scale, independent of partitioning
    val want = 100.0 + new java.util.Random(42L).nextGaussian() * 5.0
    Seq(1, 7).foreach { parts =>
      val got = df.repartition(parts)
        .agg(GraftFunctions.noisyCountGaussian(col("x"), 5.0, Some(42L)))
        .collect()(0).getLong(0)
      assert(got == math.round(math.max(want, 0.0)), s"parts=$parts")
    }
    // zero rows → NULL, not 0
    val empty = df.filter(col("x") < 0).agg(
      GraftFunctions.noisyCountGaussian(col("x"), 0.0),
      GraftFunctions.noisySumGaussian(col("x"), 0.0)).collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1))
    // invalid parameters are analysis-time errors
    intercept[IllegalArgumentException] {
      GraftFunctions.noisySumGaussian(col("x"), -1.0)
    }
    intercept[IllegalArgumentException] {
      GraftFunctions.noisySumGaussian(col("x"), 1.0, Some((20.0, 10.0)))
    }
    // SQL names resolve through the registry
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("noisy_in")
    val viaSql = spark.sql(
      """SELECT noisy_count_gaussian(x, 0.0), noisy_sum_gaussian(x, 0.0, 10.0, 20.0),
        |       noisy_avg_gaussian(x, 0.0), noisy_count_if_gaussian(x > 90, 0.0)
        |FROM noisy_in""".stripMargin).collect()(0)
    assert(viaSql.getLong(0) == 100L)
    assert(viaSql.getDouble(1) == exact.getDouble(3))
    assert(viaSql.getDouble(2) == 50.5)
    assert(viaSql.getLong(3) == 10L)
  }

  test("differential_entropy: Vasicek, histogram MLE/jackknife, determinism") {
    import spark.implicits._
    val g = GraftFunctions
    // uniform[0,1) has 0 bits of differential entropy; the spacing
    // estimator on an even grid should land near it
    val grid = (0 until 1000).map(_ / 1000.0).toDF("x").repartition(8)
    val uni = grid.agg(g.differentialEntropy(2000, col("x")))
      .collect()(0).getDouble(0)
    assert(math.abs(uni) < 0.1, s"uniform entropy $uni")
    // deterministic under repartitioning while n <= reservoir size
    val again = grid.repartition(3)
      .agg(g.differentialEntropy(2000, col("x"))).collect()(0).getDouble(0)
    assert(uni == again)
    // weighted reservoir below capacity keeps every sample → same Vasicek
    val wtd = grid.agg(
      g.differentialEntropyWeighted(2000, col("x"), lit(3.0)))
      .collect()(0).getDouble(0)
    assert(wtd == uni)
    // MLE hand case: 2 buckets over [0,2), values {0,0,1,1} → exactly 1 bit
    val mle = Seq(0.0, 0.0, 1.0, 1.0).toDF("x").agg(
      g.differentialEntropyHistogram(2, col("x"), lit(1.0),
        "fixed_histogram_mle", 0.0, 2.0)).collect()(0).getDouble(0)
    assert(mle == 1.0)
    // jackknife hand case: values {0,1} → n·H − Σ holdouts = 2·1 − 0 = 2 bits
    val jk = Seq(0.0, 1.0).toDF("x").repartition(2).agg(
      g.differentialEntropyHistogram(2, col("x"), lit(1.0),
        "fixed_histogram_jacknife", 0.0, 2.0)).collect()(0).getDouble(0)
    assert(jk == 2.0)
    // out-of-range sample / unknown method are errors
    intercept[Exception] {
      Seq(5.0).toDF("x").agg(g.differentialEntropyHistogram(
        2, col("x"), lit(1.0), "fixed_histogram_mle", 0.0, 2.0)).collect()
    }
    intercept[IllegalArgumentException] {
      g.differentialEntropyHistogram(2, col("x"), lit(1.0), "bogus", 0.0, 2.0)
    }
    // SQL names resolve, 6-arg form included
    GraftFunctions.register(spark)
    grid.createOrReplaceTempView("de_in")
    val viaSql = spark.sql(
      """SELECT differential_entropy(2000, x),
        |       differential_entropy(2000, x, 2.0),
        |       differential_entropy(4, x, 1.0, 'fixed_histogram_mle', 0.0, 1.0)
        |FROM de_in""".stripMargin).collect()(0)
    assert(viaSql.getDouble(0) == uni)
    assert(viaSql.getDouble(1) == uni)
    // 4 equal buckets of width ¼ over uniform data: raw = ln 4, + ln ¼ → 0 bits
    assert(viaSql.getDouble(2) == 0.0)
  }

  test("url_encode/url_decode: form-parameter escaping, UTF-8, error cases") {
    import graft.functions.UrlCodecUtils
    def enc(s: String) = UrlCodecUtils.encode(u(s)).toString
    def dec(s: String) = UrlCodecUtils.decode(u(s)).toString
    assert(enc("abcXYZ019-_.*") == "abcXYZ019-_.*") // safe set untouched
    assert(enc("a b") == "a+b")
    assert(enc("a/b:c&d=e,f+g~h") == "a%2Fb%3Ac%26d%3De%2Cf%2Bg%7Eh")
    assert(enc("é") == "%C3%A9") // multibyte UTF-8, one %XX per byte
    assert(enc("𝄞") == "%F0%9D%84%9E")
    // decode inverts both conventions, including '+' for space
    for (s <- Seq("", "hello world", "a/b:c&d=e,f+g~h", "é𝄞 mixé"))
      assert(dec(enc(s)) == s, s)
    assert(dec("a+b") == "a b")
    assert(dec("%41") == "A")
    intercept[IllegalArgumentException](dec("abc%4")) // truncated escape
    intercept[IllegalArgumentException](dec("%GG")) // bad hex
    // registered SQL names + codegen path
    GraftFunctions.register(spark)
    val r = spark.range(1).select(
      expr("url_decode(url_encode('x y/z'))").as("rt"),
      expr("url_encode('x y/z')").as("e")).collect()(0)
    assert(r.getString(0) == "x y/z" && r.getString(1) == "x+y%2Fz")
  }

  test("SFM sketch: non-private determinism, estimate accuracy, DP merge algebra") {
    import graft.functions.Sfm
    // kernel: non-private estimate of n distinct values within FM85 error
    val s = Sfm.create(4096, 24)
    (1 to 20000).foreach(i => s.addHash(Sfm.hashOf(i.toLong)))
    val est = s.cardinality()
    assert(math.abs(est / 20000.0 - 1) < 0.05, s"est $est")
    // duplicate adds don't move the bitmap
    val before = s.serialize().toSeq
    (1 to 100).foreach(i => s.addHash(Sfm.hashOf(i.toLong)))
    assert(s.serialize().toSeq == before)
    // serde roundtrip preserves the estimate
    assert(Sfm.deserialize(s.serialize()).cardinality() == est)
    // non-private merge is exact bitwise OR: split/merge == whole
    val a = Sfm.create(4096, 24); val b = Sfm.create(4096, 24)
    (1 to 20000).foreach { i =>
      (if (i % 2 == 0) a else b).addHash(Sfm.hashOf(i.toLong))
    }
    a.mergeWith(b, java.util.concurrent.ThreadLocalRandom.current())
    assert(a.serialize().toSeq == before)
    // ε-flip: privacy-enabled sketch still estimates within DP tolerance
    val p = Sfm.deserialize(s.serialize())
    p.enablePrivacy(4.0, new java.util.Random(7))
    assert(p.isPrivacyEnabled)
    val dpEst = p.cardinality()
    assert(math.abs(dpEst / 20000.0 - 1) < 0.3, s"dp est $dpEst")
    // private sketches are immutable, shapes must match to merge
    intercept[IllegalArgumentException](p.addHash(123L))
    intercept[IllegalArgumentException](Sfm.create(1000, 24))
    intercept[IllegalArgumentException] {
      val small = Sfm.create(256, 24)
      small.mergeWith(Sfm.create(4096, 24),
        java.util.concurrent.ThreadLocalRandom.current())
    }
    // end-to-end through the aggregate + SQL names, partition-invariant at ε=∞
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (1L to 5000L).toDF("x")
    val r1 = df.repartition(7).agg(
      GraftFunctions.noisyApproxDistinctSfm(col("x"), Double.PositiveInfinity))
      .collect()(0).getLong(0)
    val r2 = df.repartition(2).agg(
      GraftFunctions.noisyApproxDistinctSfm(col("x"), Double.PositiveInfinity))
      .collect()(0).getLong(0)
    assert(r1 == r2, "non-private SFM must not depend on partitioning")
    assert(math.abs(r1 / 5000.0 - 1) < 0.1)
    df.createOrReplaceTempView("sfm_in")
    val viaSql = spark.sql(
      """SELECT noisy_approx_distinct_sfm(x, CAST('Infinity' AS DOUBLE)),
        |       sfm_cardinality(noisy_approx_set_sfm(x, CAST('Infinity' AS DOUBLE), 1024, 16))
        |FROM sfm_in""".stripMargin).collect()(0)
    assert(viaSql.getLong(0) == r1)
    assert(math.abs(viaSql.getLong(1) / 5000.0 - 1) < 0.15)
    // scalar surface: empty sketch is a zero-cardinality identity for merge
    val e0 = spark.sql(
      """SELECT sfm_cardinality(noisy_empty_approx_set_sfm(CAST('Infinity' AS DOUBLE))),
        |       merge_sfm(array(CAST(NULL AS BINARY)))""".stripMargin).collect()(0)
    assert(e0.getLong(0) == 0L)
    assert(e0.isNullAt(1), "all-null array merges to NULL")
    val ident = spark.sql(
      """SELECT sfm_cardinality(merge_sfm(array(
        |  noisy_empty_approx_set_sfm(CAST('Infinity' AS DOUBLE)),
        |  noisy_approx_set_sfm(x, CAST('Infinity' AS DOUBLE)))))
        |FROM sfm_in""".stripMargin).collect()(0).getLong(0)
    assert(ident == r1, "empty sketch must be a merge identity")
    // from_index_and_zeros: feeding the kernel's own (index, zeros) pairs
    // reproduces the direct sketch bit-for-bit at ε=∞
    val ibl = 12 // 4096 buckets
    val pairs = (1L to 5000L).map { v =>
      val h = Sfm.hashOf(v)
      (h >>> (64 - ibl),
        java.lang.Long.numberOfTrailingZeros(h | (1L << (64 - ibl))).toLong)
    }
    pairs.toDF("idx", "z").createOrReplaceTempView("sfm_pairs")
    val viaPairs = spark.sql(
      """SELECT sfm_cardinality(noisy_approx_set_sfm_from_index_and_zeros(
        |  idx, z, CAST('Infinity' AS DOUBLE), 4096))
        |FROM sfm_pairs""".stripMargin).collect()(0).getLong(0)
    assert(viaPairs == r1, s"$viaPairs != $r1")
  }

  test("polygon geometry: WKT parse, ray-cast contains, centroid, area") {
    import graft.functions.GeoFunctions._
    // explicitly-closed unit square: closing vertex dropped on parse
    val df = spark.range(1).select(
      stPolygonWkt(lit("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")).as("ring"))
    val r = df.select(
      stNumPoints(col("ring")).as("n"),
      stArea(col("ring")).as("a"),
      stPerimeter(col("ring")).as("p"),
      stX(stCentroid(col("ring"))).as("cx"),
      stY(stCentroid(col("ring"))).as("cy"),
      stContainsPoint(col("ring"), stPoint(lit(0.5), lit(0.5))).as("in1"),
      stContainsPoint(col("ring"), stPoint(lit(1.5), lit(0.5))).as("out1"),
      stContainsPoint(col("ring"), stPoint(lit(-0.1), lit(0.99))).as("out2"))
      .collect()(0)
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 4.0)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5)
    assert(r.getBoolean(5) && !r.getBoolean(6) && !r.getBoolean(7))
    // concave L-shape: the notch is outside even though its bbox contains it
    val l = spark.range(1).select(
      stPolygonWkt(lit("POLYGON((0 0, 2 0, 2 1, 1 1, 1 2, 0 2))")).as("ring"))
    val rl = l.select(
      stArea(col("ring")).as("a"),
      stContainsPoint(col("ring"), stPoint(lit(1.5), lit(1.5))).as("notch"),
      stContainsPoint(col("ring"), stPoint(lit(0.5), lit(1.5))).as("arm"))
      .collect()(0)
    assert(rl.getDouble(0) == 3.0)
    assert(!rl.getBoolean(1) && rl.getBoolean(2))
  }

  test("base conversion, great-circle, tile neighborhood, session scalars") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT to_base(255, 16), to_base(-10, 2), from_base('-ff', 16),
        |       round(great_circle_distance(36.12, -86.67, 33.94, -118.40), 2),
        |       size(bing_tiles_around(30.12, 60.0, 10)),
        |       size(bing_tiles_around(85.05, -179.9, 1)),
        |       current_timezone(), version()""".stripMargin).collect()(0)
    assert(r.getString(0) == "ff")
    assert(r.getString(1) == "-1010")
    assert(r.getLong(2) == -255L)
    // reference TestSphericalGeoFunctions BNA↔LAX vector: 2886.449 km
    assert(math.abs(r.getDouble(3) - 2886.45) < 0.01)
    assert(r.getInt(4) == 9) // interior tile: full 3x3
    assert(r.getInt(5) == 4) // zoom-1 corner: clamped to 2x2
    assert(r.getString(6) == "UTC")
    assert(r.getString(7).startsWith("graft-spark:"))
    // errors: bad radix / unparseable digits
    intercept[Exception](spark.sql("SELECT to_base(5, 1)").collect())
    intercept[Exception](spark.sql("SELECT from_base('zz', 16)").collect())
  }

  test("differential_entropy reservoirs survive eviction (n >> capacity)") {
    import spark.implicits._
    val g = GraftFunctions
    // 20k uniform samples through a 256-slot reservoir: sampling noise is
    // bounded, the estimate must stay near the true 0 bits and never
    // NaN/crash — this drives the unweighted replacement and the weighted
    // A-Res heap eviction/merge paths that the exact-regime tests skip
    val big = (0 until 20000).map(i => (i % 977) / 977.0).toDF("x").repartition(9)
    val un = big.agg(g.differentialEntropy(256, col("x"))).collect()(0).getDouble(0)
    assert(!un.isNaN && math.abs(un) < 0.8, s"unweighted $un")
    val wt = big.agg(g.differentialEntropyWeighted(256, col("x"), lit(2.0)))
      .collect()(0).getDouble(0)
    assert(!wt.isNaN && math.abs(wt) < 0.8, s"weighted $wt")
  }

  test("multimap_from_entries collects duplicate keys in encounter order") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT multimap_from_entries(array(
        |  struct('a', 1), struct('b', 2), struct('a', 3), struct('b', 4),
        |  struct('c', CAST(NULL AS INT))))""".stripMargin).collect()(0)
    val m = r.getMap[String, scala.collection.Seq[Any]](0)
    assert(m("a").toSeq == Seq(1, 3))
    assert(m("b").toSeq == Seq(2, 4))
    assert(m("c").toSeq == Seq(null))
    // null entry → error (reference "map entry cannot be null" contract);
    // null key → error (map key contract)
    intercept[Exception](spark.sql(
      """SELECT multimap_from_entries(array(
        |  CAST(struct('a', 1) AS STRUCT<k: STRING, v: INT>),
        |  CAST(NULL AS STRUCT<k: STRING, v: INT>)))""".stripMargin).collect())
    intercept[Exception](spark.sql(
      "SELECT multimap_from_entries(array(struct(CAST(NULL AS STRING), 1)))").collect())
  }

  test("polygon intersects + point buffer (ST_Intersects / ST_Buffer)") {
    import graft.functions.GeoFunctions._
    import org.apache.spark.sql.functions._
    def ring(pts: (Double, Double)*) = array(pts.map { case (x, y) =>
      struct(lit(x).as("x"), lit(y).as("y")) }: _*)
    val unit = ring((0, 0), (4, 0), (4, 4), (0, 4))
    val r = spark.range(1).select(
      // overlapping squares
      stPolygonIntersects(unit, ring((2, 2), (6, 2), (6, 6), (2, 6))).as("overlap"),
      // disjoint
      stPolygonIntersects(unit, ring((10, 10), (12, 10), (12, 12), (10, 12))).as("disjoint"),
      // fully contained (no edge crossings)
      stPolygonIntersects(unit, ring((1, 1), (2, 1), (2, 2), (1, 2))).as("contained"),
      // edge-touching
      stPolygonIntersects(unit, ring((4, 0), (8, 0), (8, 4), (4, 4))).as("touching"),
      // buffer: area of 32-gon approximation of unit disc -> pi within 1%
      stArea(stBufferPoint(stPoint(lit(5.0), lit(5.0)), lit(1.0))).as("barea"),
      stLinePolygonIntersects(
        array(struct(lit(-1.0).as("x"), lit(2.0).as("y")),
          struct(lit(5.0).as("x"), lit(2.0).as("y"))), unit).as("line_cross"),
      stLinePolygonIntersects(
        array(struct(lit(1.0).as("x"), lit(1.0).as("y")),
          struct(lit(3.0).as("x"), lit(3.0).as("y"))), unit).as("line_inside"))
      .collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(math.abs(r.getDouble(4) - math.Pi) < 0.05, s"buffer area ${r.getDouble(4)}")
    assert(r.getBoolean(5) && r.getBoolean(6))
  }

  test("Presto JSON dialect: parse/extract/size/array fns (TestJsonExtract pins)") {
    GraftFunctions.register(spark)
    def one(q: String): Any = { val r = spark.sql(q).collect()(0); if (r.isNullAt(0)) null else r.get(0) }
    // json_parse canonicalizes: sorted keys, compact, raises on garbage
    assert(one("""SELECT json_parse('{"b":1, "a": [1, 2]}')""") == """{"a":[1,2],"b":1}""")
    intercept[Exception](one("SELECT json_parse('{bad')"))
    intercept[Exception](one("SELECT json_parse('{} trailing')"))
    // json_format is identity on the varchar-encoded JSON
    assert(one("""SELECT json_format('{"x": 1}')""") == """{"x": 1}""")
    // Presto-JSONPath dialect: $.a, $["a b"], $[0]; no wildcards
    assert(one("""SELECT json_extract('{"a b": {"c": 3}}', '$["a b"].c')""") == "3")
    assert(one("""SELECT json_extract('{"a": "x"}', '$.a')""") == "\"x\"")
    assert(one("""SELECT json_extract('[10, 20]', '$[1]')""") == "20")
    assert(one("""SELECT json_extract('{"a": 1}', '$.miss')""") == null)
    assert(one("""SELECT json_extract('not json', '$.a')""") == null) // lenient
    intercept[Exception](one("""SELECT json_extract('{}', 'a.b')""")) // bad path
    // json_size: container size at path, 0 for scalars, NULL on miss
    assert(one("""SELECT json_size('{"a": {"x": 1, "y": 2}}', '$.a')""") == 2L)
    assert(one("""SELECT json_size('{"a": [1,2,3]}', '$.a')""") == 3L)
    assert(one("""SELECT json_size('{"a": 7}', '$.a')""") == 0L)
    assert(one("""SELECT json_size('{"a": 7}', '$.b')""") == null)
    // array fns: length NULL on non-array; contains token discipline;
    // get with negative index, scalars unquoted, containers as JSON
    assert(one("SELECT json_array_length('[1,2,3]')") == 3L)
    assert(one("""SELECT json_array_length('{"a":1}')""") == null)
    assert(one("SELECT json_array_contains('[1, 2, 3]', 2)") == true)
    assert(one("SELECT json_array_contains('[1.5]', 1.5)") == true)
    assert(one("SELECT json_array_contains('[1]', 1.0D)") == false) // int token != double needle
    assert(one("""SELECT json_array_contains('["x"]', 'x')""") == true)
    assert(one("SELECT json_array_get('[\"a\",\"b\",\"c\"]', -1)") == "c")
    assert(one("""SELECT json_array_get('[[1,2]]', 0)""") == "[1,2]")
    assert(one("SELECT json_array_get('[1,2]', 5)") == null)
    assert(one("SELECT is_json_scalar('7')") == true)
    assert(one("SELECT is_json_scalar('[1]')") == false)
  }

  test("mysql_date_format accepts a non-literal per-row format column") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT mysql_date_format(timestamp'2021-03-14 07:01:02', fmt) AS s
        |FROM VALUES ('%Y-%m-%d'), ('%H:%i:%s'), ('%d/%m/%Y') AS t(fmt)
        |ORDER BY fmt""".stripMargin).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("07:01:02", "2021-03-14", "14/03/2021"))
  }

  test("IANA-zone conversion honors the DST boundary (at_timezone semantics)") {
    // US spring-forward 2021-03-14: 06:59Z is 01:59 EST, 07:01Z is 03:01 EDT
    val r = spark.sql(
      """SELECT date_format(from_utc_timestamp(timestamp'2021-03-14 06:59:00',
        |         'America/New_York'), 'HH:mm'),
        |       date_format(from_utc_timestamp(timestamp'2021-03-14 07:01:00',
        |         'America/New_York'), 'HH:mm')""".stripMargin).collect()(0)
    assert(r.getString(0) == "01:59")
    assert(r.getString(1) == "03:01")
  }

  test("binary conversions and parse_duration match reference semantics") {
    // CRC-32 check value (ISO 3309 / reference VarbinaryFunctions crc32)
    val r = spark.range(1).select(
      crc32(encode(lit("123456789"), "UTF-8")).as("crc"),
      decode(encode(lit("héllo"), "UTF-8"), "UTF-8").as("rt")).collect()(0)
    assert(r.getLong(0) == 0xCBF43926L)
    assert(r.getString(1) == "héllo")
    // parse_duration via the fn_iso_duration gate columns: 1-row smoke
    val d = ops.Scalars.isoDuration(spark, sf).limit(1).collect()(0)
    assert(d.getBoolean(3) && d.getBoolean(4)) // both round trips hold
  }

  test("strict subscript raises the reference error contracts") {
    val ses = api.SqlSession.wrap(spark)
    def err(sql: String): String =
      intercept[Exception] { ses.sql(sql).collect() }.getMessage
    assert(err("SELECT a[5] FROM (SELECT array(1, 2, 3) AS a)")
      .contains("Array subscript out of bounds"))
    assert(err("SELECT a[0] FROM (SELECT array(1, 2, 3) AS a)")
      .contains("SQL array indices start at 1"))
    assert(err("SELECT a[-1] FROM (SELECT array(1, 2, 3) AS a)")
      .contains("Array subscript is negative"))
    assert(err("SELECT m['zz'] FROM (SELECT map('a', 1) AS m)")
      .contains("Key not present in map"))
    // valid paths + SQL null propagation stay intact
    val ok = ses.sql(
      """SELECT a[3], m['a'], a[CAST(NULL AS INT)]
        |FROM (SELECT array(1, 2, 3) AS a, map('a', 7) AS m)""".stripMargin)
      .collect()(0)
    assert(ok.getInt(0) == 3 && ok.getInt(1) == 7 && ok.isNullAt(2))
  }

  test("char(n) values pad to declared length through the dialect") {
    val ses = api.SqlSession.wrap(spark)
    val r = ses.sql(
      """SELECT CAST('ab' AS CHAR(5)), length(CAST('ab' AS CHAR(5))),
        |       CAST('ab' AS CHAR(5)) = 'ab',
        |       CAST(concat('a', 'b') AS CHAR(4)) = 'ab  '""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "ab   ")
    assert(r.getInt(1) == 5)
    assert(!r.getBoolean(2) && r.getBoolean(3))
  }

  test("murmur3_x64_128 matches the canonical algorithm's fixed points") {
    import graft.functions.Murmur3x64_128.hash
    // empty input with seed 0: h1 = h2 = 0 (no blocks, no tail, fmix(0)=0)
    assert(hash(Array.empty[Byte]).forall(_ == 0))
    assert(hash("a".getBytes("UTF-8")).length == 16)
    // tail-size boundaries (15/16/17 bytes) all differ pairwise
    val a15 = hash(("x" * 15).getBytes); val a16 = hash(("x" * 16).getBytes)
    val a17 = hash(("x" * 17).getBytes)
    assert(!a15.sameElements(a16) && !a16.sameElements(a17) &&
      !a15.sameElements(a17))
    // deterministic
    assert(hash("hello".getBytes).sameElements(hash("hello".getBytes)))
  }

  test("google polyline encodes the documented Maps example") {
    import graft.functions.Polyline
    // developers.google.com polyline algorithm reference example
    val pts = Seq((-120.2, 38.5), (-120.95, 40.7), (-126.453, 43.252))
    assert(Polyline.encode(pts) == "_p~iF~ps|U_ulLnnqC_mqNvxq`@")
    val dec = Polyline.decode("_p~iF~ps|U_ulLnnqC_mqNvxq`@")
    assert(dec.zip(pts).forall { case (a, b) =>
      math.abs(a._1 - b._1) < 1e-5 && math.abs(a._2 - b._2) < 1e-5 })
  }

  test("to_milliseconds, secure_random, sketch_theta_summary via SQL registry") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT to_milliseconds(INTERVAL '1 02:03:04.567' DAY TO SECOND) AS ms,
        |       secure_random(CAST(2 AS DOUBLE), CAST(5 AS DOUBLE)) AS sr""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 93784567L)
    assert(r.getDouble(1) >= 2.0 && r.getDouble(1) < 5.0)
    import spark.implicits._
    val summ = (1 to 1000).toDF("x")
      .selectExpr("theta_sketch_agg(x, 128) AS sk")
      .selectExpr("sketch_theta_summary(sk) AS s")
      .select("s.estimate", "s.theta", "s.upper_bound_std",
        "s.lower_bound_std", "s.retained_entries").collect()(0)
    val est = summ.getDouble(0)
    assert(math.abs(est - 1000) < 200, s"estimate $est within 20%")
    assert(summ.getDouble(1) > 0 && summ.getDouble(1) <= 1.0)
    assert(summ.getDouble(2) >= est && summ.getDouble(3) <= est)
    assert(summ.getInt(4) <= 128 * 2)
    // exact regime: zero-width bounds, retained = n
    val exact = (1 to 10).toDF("x")
      .selectExpr("theta_sketch_agg(x) AS sk")
      .selectExpr("sketch_theta_summary(sk) AS s")
      .select("s.estimate", "s.upper_bound_std", "s.retained_entries").collect()(0)
    assert(exact.getDouble(0) == 10.0 && exact.getDouble(1) == 10.0 &&
      exact.getInt(2) == 10)
  }

  test("starts_with / ends_with reference spellings reach Spark builtins") {
    val ses = api.SqlSession.wrap(spark)
    val r = ses.sql("SELECT starts_with('presto', 'pre') AS a, " +
      "ends_with('presto', 'sto') AS b, starts_with('presto', 'x') AS c")
      .collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
  }

  test("Teradata to_date/to_timestamp overrides leave Java patterns intact") {
    functions.GraftFunctions.register(spark)
    // mixed-case = Java pattern: must NOT be run through the Teradata
    // translator (regression: the session-wide override once mangled
    // yyyy-MM-dd'T'HH:mm:ss.SSS reached via the DataFrame API)
    val r = spark.sql(
      // single-quoted with '' escapes: the session runs with ANSI
      // doubleQuotedIdentifiers (reference quoting), so "..." is an
      // identifier, not a string
      "SELECT to_timestamp('2024-03-05T06:07:08.125', " +
        "'yyyy-MM-dd''T''HH:mm:ss.SSS') AS ts, " +
        "to_date('2024-03-05', 'yyyy-MM-dd') AS d, " +
        "to_date('2024/03/05', 'YYYY/MM/DD') AS td").collect()(0)
    assert(r.getTimestamp(0).toString == "2024-03-05 06:07:08.125")
    assert(r.getDate(1).toString == "2024-03-05")
    assert(r.getDate(2).toString == "2024-03-05")
    // non-literal format argument keeps builtin semantics (no translation)
    val n = spark.sql("SELECT to_date('2024-03-05', fmt) AS d FROM " +
      "(SELECT 'yyyy-MM-dd' AS fmt)").collect()(0)
    assert(n.getDate(0).toString == "2024-03-05")
  }

  test("reference builtin names resolve through the session dialect") {
    // the parity sweep's "missing from graft source" names that are in
    // fact Spark builtins — pin that each reference spelling parses and
    // evaluates through SqlSession (no shim needed, none silently lost)
    val ses = api.SqlSession.wrap(spark)
    val cases = Seq(
      "CAST(ceiling(1.5) AS DOUBLE)" -> 2.0, "bit_length('a')" -> 8,
      "ltrim(' x')" -> "x", "rtrim('x ')" -> "x",
      "typeof(1)" -> "int",
      "arrays_overlap(array(1), array(1))" -> true,
      "array_union(array(1), array(2))" -> Seq(1, 2),
      "array_intersect(array(1, 2), array(2))" -> Seq(2),
      "array_except(array(1, 2), array(2))" -> Seq(1))
    cases.foreach { case (exprTxt, expected) =>
      val v = ses.sql(s"SELECT $exprTxt AS v").collect()(0).get(0)
      val got = v match {
        case a: scala.collection.Seq[_] => a.toSeq
        case other => other
      }
      assert(got == expected, s"$exprTxt -> $got")
    }
    // aggregate spellings (regr_* family exists natively since Spark 3.4)
    val agg = ses.sql(
      """SELECT regr_sxx(y, x) AS sxx, regr_sxy(y, x) AS sxy,
        |  regr_syy(y, x) AS syy, regr_avgy(y, x) AS ay
        |FROM (SELECT CAST(1.0 AS DOUBLE) AS x, CAST(2.0 AS DOUBLE) AS y
        |      UNION ALL SELECT CAST(2.0 AS DOUBLE), CAST(4.0 AS DOUBLE))"""
        .stripMargin).collect()(0)
    assert(agg.getDouble(0) == 0.5 && agg.getDouble(1) == 1.0 &&
      agg.getDouble(2) == 2.0 && agg.getDouble(3) == 3.0)
    // session datetime spellings evaluate (values are clock-dependent);
    // bare LOCALTIMESTAMP/LOCALTIME are reference grammar — the dialect
    // adds the parens / TIME cast Spark requires
    Seq("current_timestamp", "localtimestamp", "localtime").foreach { f =>
      assert(ses.sql(s"SELECT $f AS v").collect().length == 1, f)
    }
    assert(ses.sql("SELECT localtime AS v").schema.head.dataType.sql
      .toLowerCase.startsWith("time"), "localtime is a TIME value")
    // the parenthesized spelling resolves through the registry too (the
    // name-sweep contract), with the same TIME result type
    assert(ses.sql("SELECT localtime() AS v").schema.head.dataType.sql
      .toLowerCase.startsWith("time"), "localtime() resolves via registry")
  }

  test("spooky_hash_v2 matches the reference's own test vectors") {
    // TestVarbinaryFunctions.java:385-388
    functions.GraftFunctions.register(spark)
    def hx(q: String): String =
      spark.sql(s"SELECT upper(hex($q)) AS v").collect()(0).getString(0)
    assert(hx("spooky_hash_v2_32(CAST('' AS BINARY))") == "6BF50919")
    assert(hx("spooky_hash_v2_32(CAST('hello' AS BINARY))") == "D382E6CA")
    assert(hx("spooky_hash_v2_64(CAST('' AS BINARY))") == "232706FC6BF50919")
    assert(hx("spooky_hash_v2_64(CAST('hello' AS BINARY))") ==
      "3768826AD382E6CA")
    // the long-form path (>= 192 bytes) stays stable and length-sensitive
    val a192 = "repeat('a', 192)"
    val a193 = "repeat('a', 193)"
    assert(hx(s"spooky_hash_v2_64(CAST($a192 AS BINARY))") !=
      hx(s"spooky_hash_v2_64(CAST($a193 AS BINARY))"))
  }

  test("entropy SQL aggregate name: H over counts, zero counts ignored") {
    functions.GraftFunctions.register(spark)
    // counts [1,1,2]: S=4, H = log2(4) - (0 + 0 + 2*1)/4 = 1.5; a zero
    // count contributes nothing (reference EntropyAggregation 0*log 0 = 0)
    val r = spark.sql(
      "SELECT round(entropy(c), 4) AS v FROM VALUES (1),(1),(2),(0) t(c)")
      .collect()(0)
    assert(r.getDouble(0) == 1.5)
  }

  test("array_cum_sum overflow raises; normalize form raises on bad form") {
    functions.GraftFunctions.register(spark)
    val e = intercept[Exception](spark.sql(
      s"SELECT array_cum_sum(array(${Long.MaxValue}L, 1L)) AS v").collect())
    assert(e.getMessage.toLowerCase.contains("overflow"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT normalize('abc', 'NFX') AS v").collect())
    assert(e2.getMessage.contains("NFX"))
  }

  test("width_bucket explicit bins: boundaries, errors (MathFunctions:1667)") {
    functions.GraftFunctions.register(spark)
    def wb(x: String, bins: String): Long = spark.sql(
      s"SELECT width_bucket($x, $bins) AS v").collect()(0).getLong(0)
    assert(wb("3.14D", "array(0D, 2D, 4D)") == 2L)
    assert(wb("-1D", "array(0D, 2D, 4D)") == 0L)
    assert(wb("99D", "array(0D, 2D, 4D)") == 3L)
    assert(wb("2D", "array(0D, 2D, 4D)") == 2L) // operand == bin counts
    // 4-arg uniform form still routes to Spark's native kernel
    assert(spark.sql("SELECT width_bucket(3.14D, 0D, 4D, 4) AS v")
      .collect()(0).getLong(0) == 4L)
    def msg(e: Throwable): String =
      Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    val e1 = intercept[Exception](wb("0D", "array()"))
    assert(msg(e1).contains("empty"), msg(e1))
    val e2 = intercept[Exception](
      wb("CAST('NaN' AS DOUBLE)", "array(0D, 1D)"))
    assert(msg(e2).contains("NaN"), msg(e2))
    val e3 = intercept[Exception](wb("1D", "array(4D, 2D, 0D)"))
    assert(msg(e3).contains("sorted"), msg(e3))
    val e4 = intercept[Exception](
      wb("1D", "array(0D, CAST(NULL AS DOUBLE), 2D)"))
    assert(msg(e4).contains("NULL"), msg(e4))
  }

  test("cosine_similarity sparse-map overload (MathFunctions:1712)") {
    functions.GraftFunctions.register(spark)
    // shared key 'b': dot = 2*3; norms sqrt(1+4), sqrt(9+16)
    val r = spark.sql(
      "SELECT cosine_similarity(map('a', 1D, 'b', 2D)," +
        " map('b', 3D, 'c', 4D)) AS v").collect()(0)
    assert(math.abs(r.getDouble(0) - 6.0 / (math.sqrt(5) * 5)) < 1e-12)
    // disjoint keys → 0; NULL map value → NULL; empty map → NaN (0 norm)
    val z = spark.sql(
      "SELECT cosine_similarity(map('a', 1D), map('b', 1D)) AS v")
      .collect()(0)
    assert(z.getDouble(0) == 0.0)
    val n = spark.sql(
      "SELECT cosine_similarity(map('a', CAST(NULL AS DOUBLE)), map('a', 1D)) AS v")
      .collect()(0)
    assert(n.isNullAt(0))
    val nan = spark.sql(
      "SELECT cosine_similarity(map('a', 1D), map_filter(map('a', 1D), (k, v) -> false)) AS v")
      .collect()(0)
    assert(nan.getDouble(0).isNaN)
    // arrays still take the dense float kernel through the same name
    val d = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS v")
      .collect()(0)
    assert(math.abs(d.getDouble(0) - 1.0) < 1e-6)
  }

  test("vec_pack/vec_unpack roundtrip exactly, distances match the array kernels (r13)") {
    GraftFunctions.register(spark)
    // NaN payload bits, negative zero, denormals — pack must preserve the
    // exact float32 bit patterns (floatToRawIntBits, not value semantics)
    val r = spark.sql(
      """SELECT v = vec_unpack(vec_pack(v)) AS rt,
        |  cosine_packed(vec_pack(v), vec_pack(w)) = cosine_similarity(v, w) AS ce,
        |  dot_packed(vec_pack(v), vec_pack(w)) = dot_product(v, w) AS de,
        |  l2_squared_packed(vec_pack(v), vec_pack(w)) = l2_squared(v, w) AS le,
        |  length(vec_pack(v)) AS bytes
        |FROM (SELECT array(1.5F, -0.0F, 1.4E-45F, 3.4028234E38F) AS v,
        |             array(-2.5F, 1.0F, 0.0F, 1.0F) AS w)""".stripMargin)
      .collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) &&
      r.getBoolean(3))
    assert(r.getInt(4) == 16)
    // empty vector roundtrips; dim mismatch raises
    assert(spark.sql(
      "SELECT size(vec_unpack(vec_pack(CAST(array() AS ARRAY<FLOAT>)))) AS n")
      .collect()(0).getInt(0) == 0)
    val e = intercept[Exception] {
      spark.sql("SELECT dot_packed(vec_pack(array(1.0F)), " +
        "vec_pack(array(1.0F, 2.0F)))").collect()
    }
    var m = ""; var c: Throwable = e
    while (c != null) { m += Option(c.getMessage).getOrElse(""); c = c.getCause }
    assert(m.contains("dims differ"), m)
    // NaN float32 bit pattern survives the roundtrip (raw bits, value-less)
    val nanBits = spark.sql(
      "SELECT vec_pack(array(CAST('NaN' AS FLOAT))) AS b").collect()(0)
      .getAs[Array[Byte]](0)
    assert(nanBits.length == 4)
  }
}
