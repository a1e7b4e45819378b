package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, Hll, SketchTag}

/** Tagged-sketch dispatch: the untyped `merge(sketch)` / `cardinality
  * (sketch)` spellings (reference registers one per sketch type —
  * MAIN/metadata/BuiltInTypeAndFunctionNamespaceManager.java; here a
  * versioned 1-byte tag on the varbinary carries the type). */
class SketchDispatchSpec extends AnyFunSuite {
  import TestSpark._

  private def registered = { GraftFunctions.register(spark); spark }

  test("tag codec: wrap/tagOf/payload roundtrip, raw bytes pass through") {
    val raw = Hll.emptyBuffer(Hll.DefaultP)
    val tagged = SketchTag.wrap(SketchTag.Hll, raw)
    assert(SketchTag.tagOf(tagged) == SketchTag.Hll)
    assert(SketchTag.payload(tagged).toSeq == raw.toSeq)
    // untagged payloads are left alone (legacy sketches keep working)
    assert(SketchTag.tagOf(raw) == 0)
    assert(SketchTag.payload(raw) eq raw)
    // no existing serialized format can begin with the magic byte
    assert(raw(0) != SketchTag.M0)
  }

  test("untyped merge + cardinality reproduce the typed HLL lifecycle") {
    val s = registered
    s.range(0, 5000).selectExpr("id % 37 AS g", "id AS v")
      .createOrReplaceTempView("sd_hll")
    val row = s.sql(
      """WITH per AS (SELECT g, approx_set(v) AS sk FROM sd_hll GROUP BY g)
        |SELECT cardinality(merge(sk)) AS untyped,
        |       hll_cardinality(merge_hll(sk)) AS typed
        |FROM per""".stripMargin).collect()(0)
    assert(row.getLong(0) == row.getLong(1))
    assert(math.abs(row.getLong(0).toDouble / 5000 - 1) <= 0.05)
  }

  test("untyped merge dispatches qdigest, theta, setdigest, tdigest, kll") {
    val s = registered
    s.range(0, 2000).selectExpr("id % 4 AS g", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("sd_multi")
    // qdigest: merged median of 0..1999 ~ 1000 (within p40..p60)
    val qd = s.sql(
      """WITH per AS (SELECT g, qdigest_agg(v) AS sk FROM sd_multi GROUP BY g)
        |SELECT value_at_quantile(merge(sk), 0.5d) AS m FROM per""".stripMargin)
      .collect()(0).getDouble(0)
    assert(qd >= 800 && qd <= 1200, s"qdigest merged median $qd")
    // theta below saturation: exact distinct
    val th = s.sql(
      """WITH per AS (SELECT g, theta_sketch_agg(v) AS sk FROM sd_multi GROUP BY g)
        |SELECT theta_sketch_estimate(merge(sk)) AS e FROM per""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.rint(th).toLong == 2000L)
    // setdigest below k=512: exact distinct via untyped cardinality
    val sd = s.sql(
      """WITH per AS (SELECT g, make_set_digest(v) AS sk FROM sd_multi
        |             WHERE v < 400 GROUP BY g)
        |SELECT cardinality(merge(sk)) AS c FROM per""".stripMargin)
      .collect()(0).getLong(0)
    assert(sd == 400L)
    // tdigest: merged median within 2%
    val td = s.sql(
      """WITH per AS (SELECT g, tdigest_agg(v) AS sk FROM sd_multi GROUP BY g)
        |SELECT tdigest_value_at_quantile(merge(sk), 0.5d) AS m FROM per""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(td / 999.5 - 1) <= 0.02, s"tdigest merged median $td")
    // kll: merged rank of the true median within 5%
    val kl = s.sql(
      """WITH per AS (SELECT g, kll_sketch_agg(v) AS sk FROM sd_multi GROUP BY g)
        |SELECT kll_rank(merge(sk), 999.5d) AS r FROM per""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(kl - 0.5) <= 0.05, s"kll merged rank $kl")
  }

  test("cardinality keeps Spark array/map semantics through the dispatch") {
    val s = registered
    val r = s.sql(
      "SELECT cardinality(array(1, 2, 3)) AS a, " +
        "cardinality(map('x', 1)) AS m, " +
        "cardinality(CAST(NULL AS ARRAY<INT>)) AS n").collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 1 && r.isNullAt(2))
  }

  test("merge raises on untagged bytes and on mixed sketch types") {
    val s = registered
    s.range(0, 10).selectExpr("CAST(CAST(id AS STRING) AS BINARY) AS sk")
      .createOrReplaceTempView("sd_raw")
    val e1 = intercept[Exception] {
      s.sql("SELECT merge(sk) FROM sd_raw").collect()
    }
    assert(e1.getMessage.contains("tagged") ||
      e1.getCause != null && e1.getCause.getMessage.contains("tagged"))
    s.range(0, 100).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g", "id AS v")
      .createOrReplaceTempView("sd_mixed")
    val e2 = intercept[Exception] {
      s.sql(
        """WITH per AS (
          |  SELECT g, CASE WHEN g = 'a' THEN approx_set(v)
          |                 ELSE theta_sketch_agg(v) END AS sk
          |  FROM sd_mixed GROUP BY g)
          |SELECT merge(sk) FROM per""".stripMargin).collect()
    }
    val msg2 = Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage
    assert(msg2.contains("cannot merge"))
  }

  test("cardinality raises for quantile sketches, pointing at estimators") {
    val s = registered
    s.range(0, 100).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("sd_q")
    val e = intercept[Exception] {
      s.sql("SELECT cardinality(qdigest_agg(v)) FROM sd_q").collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(msg.contains("value_at_quantile"))
  }

  test("jaccard_index / intersection_cardinality dispatch SetDigest vs KHLL") {
    val s = registered
    // two overlapping sets: 0..299 and 150..449 → |∩| = 150, J = 1/3
    s.range(0, 450).selectExpr(
      "CASE WHEN id < 300 THEN 'a' ELSE NULL END AS ga",
      "CASE WHEN id >= 150 THEN 'b' ELSE NULL END AS gb", "id AS v")
      .createOrReplaceTempView("sd_pair")
    // dispatch contract: the untyped names return EXACTLY what the typed
    // SetDigest kernels return, and both land near the truth (KMV is an
    // estimator even under k — tolerance, not equality, vs the exact 150)
    val viaSet = s.sql(
      """WITH a AS (SELECT make_set_digest(v) AS sk FROM sd_pair WHERE ga IS NOT NULL),
        |     b AS (SELECT make_set_digest(v) AS sk FROM sd_pair WHERE gb IS NOT NULL)
        |SELECT intersection_cardinality(a.sk, b.sk) AS i,
        |       jaccard_index(a.sk, b.sk) AS j FROM a, b""".stripMargin).collect()(0)
    assert(math.abs(viaSet.getLong(0) - 150L) <= 20,
      s"setdigest |A∩B| ${viaSet.getLong(0)} far from 150")
    assert(math.abs(viaSet.getDouble(1) - 1.0 / 3) < 0.05)
    val viaKhll = s.sql(
      """WITH a AS (SELECT khyperloglog_agg(v, v) AS sk FROM sd_pair WHERE ga IS NOT NULL),
        |     b AS (SELECT khyperloglog_agg(v, v) AS sk FROM sd_pair WHERE gb IS NOT NULL)
        |SELECT intersection_cardinality(a.sk, b.sk) AS i,
        |       jaccard_index(a.sk, b.sk) AS j FROM a, b""".stripMargin).collect()(0)
    assert(math.abs(viaKhll.getLong(0) - 150L) <= 15, s"khll |A∩B| ${viaKhll.getLong(0)}")
    assert(math.abs(viaKhll.getDouble(1) - 1.0 / 3) < 0.07)
    // mixing the two sketch kinds raises
    val e = intercept[Exception] {
      s.sql(
        """WITH a AS (SELECT make_set_digest(v) AS sk FROM sd_pair WHERE ga IS NOT NULL),
          |     b AS (SELECT khyperloglog_agg(v, v) AS sk FROM sd_pair WHERE gb IS NOT NULL)
          |SELECT jaccard_index(a.sk, b.sk) FROM a, b""".stripMargin).collect()
    }
    val m = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    assert(m.contains("cannot combine"), m)
  }

  test("untagged pair bytes raise; typed set_digest_* spellings accept them (r13)") {
    val s = registered
    s.range(0, 300).selectExpr("id AS v").createOrReplaceTempView("sd_raw")
    // strip the tag: raw legacy SetDigest bytes on BOTH sides must raise
    // with the merge path's message instead of silently assuming SetDigest
    // (a KHLL blob from an old round would be misread)
    s.sql(
      """SELECT substring(a.sk, 5) AS ska, substring(b.sk, 5) AS skb
        |FROM (SELECT make_set_digest(v) AS sk FROM sd_raw WHERE v < 200) a,
        |     (SELECT make_set_digest(v) AS sk FROM sd_raw WHERE v >= 100) b"""
        .stripMargin).createOrReplaceTempView("sd_raw_pair")
    for (fn <- Seq("jaccard_index", "intersection_cardinality")) {
      val e = intercept[Exception] {
        s.sql(s"SELECT $fn(ska, skb) FROM sd_raw_pair").collect()
      }
      val m = Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
      assert(m.contains("requires tagged sketches"), s"$fn: $m")
      assert(m.contains(s"set_digest_$fn"), s"$fn: $m")
    }
    // the typed spellings keep legacy blobs readable: |∩| = 100, J = 1/3
    val r = s.sql(
      """SELECT set_digest_intersection_cardinality(ska, skb) AS i,
        |       set_digest_jaccard_index(ska, skb) AS j
        |FROM sd_raw_pair""".stripMargin).collect()(0)
    assert(math.abs(r.getLong(0) - 100L) <= 15, s"|A∩B| ${r.getLong(0)}")
    assert(math.abs(r.getDouble(1) - 1.0 / 3) < 0.06, s"J ${r.getDouble(1)}")
    // one-sided untagged still follows the tagged side's type
    val one = s.sql(
      """SELECT jaccard_index(p.sk, q.ska) AS j
        |FROM (SELECT make_set_digest(v) AS sk FROM sd_raw WHERE v < 200) p,
        |     (SELECT ska FROM sd_raw_pair) q""".stripMargin).collect()(0)
    assert(one.getDouble(0) > 0.9, s"self-Jaccard ${one.getDouble(0)}")
  }

  test("typed spellings accept tagged sketches (store/reload unchanged)") {
    val s = registered
    s.range(0, 3000).selectExpr("id % 7 AS g", "id AS v")
      .createOrReplaceTempView("sd_typed")
    // tagged output of approx_set flows through every typed consumer
    val r = s.sql(
      """WITH per AS (SELECT g, approx_set(v) AS sk FROM sd_typed GROUP BY g)
        |SELECT min(hll_cardinality(sk)) AS mn,
        |       hll_cardinality(merge_hll(sk)) AS merged
        |FROM per""".stripMargin).collect()(0)
    assert(r.getLong(0) > 0 && math.abs(r.getLong(1).toDouble / 3000 - 1) <= 0.05)
  }
}
