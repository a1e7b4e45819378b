package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Resumable reservoir_sample (reference reservoirsample/
  * ReservoirSampleFunction.java 4-arg signature): fill regime, Vitter
  * replacement, seeded determinism, resume-state threading, the
  * proportional merge, and the reference's contract errors. */
class ReservoirSpec extends AnyFunSuite {
  import TestSpark._

  private def registered = { GraftFunctions.register(spark); spark }
  private val nullInit = "CAST(NULL AS ARRAY<BIGINT>)"

  test("fill regime: n <= k returns every value and the exact count") {
    val s = registered
    val row = s.range(1, 11).repartition(1)
      .selectExpr(s"reservoir_sample($nullInit, 0L, id, 50) AS r")
      .selectExpr("r.processed_count AS n", "array_sort(r.sample) AS sample")
      .collect()(0)
    assert(row.getLong(0) == 10L)
    assert(row.getSeq[Long](1) == (1L to 10L))
  }

  test("sampling regime: k of n, all distinct members, roughly uniform") {
    val s = registered
    val row = s.range(0, 10000).repartition(1)
      .selectExpr(s"reservoir_sample($nullInit, 0L, id, 100, 42) AS r")
      .selectExpr("r.processed_count AS n", "r.sample AS sample")
      .collect()(0)
    assert(row.getLong(0) == 10000L)
    val sample = row.getSeq[Long](1)
    assert(sample.length == 100)
    assert(sample.distinct.length == 100)
    assert(sample.forall(v => v >= 0 && v < 10000))
    val mean = sample.sum.toDouble / sample.length
    assert(math.abs(mean - 5000.0) < 1500, s"sample mean $mean far from uniform")
  }

  test("seeded runs are reproducible on one partition") {
    val s = registered
    def run() = s.range(0, 5000).repartition(1)
      .selectExpr(s"reservoir_sample($nullInit, 0L, id, 32, 7) AS r")
      .selectExpr("array_sort(r.sample) AS sample").collect()(0).getSeq[Long](0)
    assert(run() == run())
  }

  test("resume threads processed_count and keeps sampling uniform") {
    val s = registered
    val p1 = s.range(0, 500).repartition(1)
      .selectExpr(s"reservoir_sample($nullInit, 0L, id, 50, 3) AS r")
      .selectExpr("r.processed_count AS c", "r.sample AS sm").collect()(0)
    assert(p1.getLong(0) == 500L)
    val sm = p1.getSeq[Long](1)
    assert(sm.length == 50)
    s.createDataFrame(Seq(Tuple2(sm, 500L))).toDF("init", "initc")
      .createOrReplaceTempView("rs_init")
    val p2 = s.range(500, 1000).repartition(1).crossJoin(s.table("rs_init"))
      .selectExpr("reservoir_sample(init, initc, id, 50, 5) AS r")
      .selectExpr("r.processed_count AS c", "r.sample AS sm").collect()(0)
    assert(p2.getLong(0) == 1000L)
    val sm2 = p2.getSeq[Long](1)
    assert(sm2.length == 50 && sm2.distinct.length == 50)
    assert(sm2.forall(v => v >= 0 && v < 1000))
    // proportional resume: both halves contributed (500/500 weighting makes
    // an all-one-side sample astronomically unlikely under any seed)
    val old = sm2.count(_ < 500)
    assert(old > 5 && old < 45, s"resume merge skew: $old/50 from the old half")
  }

  test("heavily weighted resume keeps mostly the old sample") {
    val s = registered
    // old state: 50 sentinel values said to represent 9500 processed rows
    val init = (0L until 50L).map(-_ - 1)
    s.createDataFrame(Seq(Tuple2(init, 9500L))).toDF("init", "initc")
      .createOrReplaceTempView("rs_w")
    val sm = s.range(0, 500).repartition(1).crossJoin(s.table("rs_w"))
      .selectExpr("reservoir_sample(init, initc, id, 50, 13) AS r")
      .selectExpr("r.processed_count AS c", "r.sample AS sm").collect()(0)
    assert(sm.getLong(0) == 10000L)
    val oldKept = sm.getSeq[Long](1).count(_ < 0)
    assert(oldKept >= 40, s"expected ~95% old items kept, got $oldKept/50")
  }

  test("contract errors: partial resume state and non-empty zero-count init") {
    val s = registered
    // initial sample neither full (k) nor equal to initial count -> raise
    s.createDataFrame(Seq(Tuple2(Seq(1L, 2L, 3L, 4L, 5L), 10L)))
      .toDF("init", "initc").createOrReplaceTempView("rs_bad")
    val e1 = intercept[Exception] {
      s.range(0, 100).crossJoin(s.table("rs_bad"))
        .selectExpr("reservoir_sample(init, initc, id, 50) AS r").collect()
    }
    val m1 = Option(e1.getCause).map(_.getMessage).getOrElse("") + e1.getMessage
    assert(m1.contains("desired_sample_size"))
    // non-empty initial array with count <= 0 -> raise
    s.createDataFrame(Seq(Tuple2(Seq(1L, 2L), 0L)))
      .toDF("init", "initc").createOrReplaceTempView("rs_bad0")
    val e2 = intercept[Exception] {
      s.range(0, 100).crossJoin(s.table("rs_bad0"))
        .selectExpr("reservoir_sample(init, initc, id, 50) AS r").collect()
    }
    val m2 = Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage
    assert(m2.contains("null or empty"))
  }

  test("distributed merge across partitions preserves count and membership") {
    val s = registered
    val row = s.range(0, 20000).repartition(8)
      .selectExpr(s"reservoir_sample($nullInit, 0L, id, 64) AS r")
      .selectExpr("r.processed_count AS n", "r.sample AS sm").collect()(0)
    assert(row.getLong(0) == 20000L)
    val sm = row.getSeq[Long](1)
    assert(sm.length == 64 && sm.distinct.length == 64)
    assert(sm.forall(v => v >= 0 && v < 20000))
  }

  test("string values sample cleanly (buffer-aliasing copy path)") {
    val s = registered
    val row = s.range(0, 3000).selectExpr("concat('v', id) AS v").repartition(4)
      .selectExpr(s"reservoir_sample(CAST(NULL AS ARRAY<STRING>), 0L, v, 25) AS r")
      .selectExpr("r.processed_count AS n", "r.sample AS sm").collect()(0)
    assert(row.getLong(0) == 3000L)
    val sm = row.getSeq[String](1)
    assert(sm.length == 25 && sm.forall(_.startsWith("v")) && sm.distinct.length == 25)
  }
}
