package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, NumericHist, NumericHistogramAgg}

/** numeric_histogram beyond the oracle gate's exact regime: penalty-driven
  * bin merging, weight conservation, mergeability, SQL registration. */
class NumericHistogramSpec extends AnyFunSuite {
  import TestSpark._

  test("exact when distinct values fit in buckets") {
    val h = (1 to 100).foldLeft(NumericHist.empty(8)) {
      (acc, i) => NumericHist.add(acc, (i % 5).toDouble, 1.0)
    }
    val c = NumericHist.compact(h)
    assert(c.values.toSeq == Seq(0.0, 1.0, 2.0, 3.0, 4.0))
    assert(c.weights.toSeq == Seq(20.0, 20.0, 20.0, 20.0, 20.0))
  }

  test("compaction conserves total weight and merges nearest bins") {
    // two tight clusters + one outlier, 3 buckets
    val xs = Seq(1.0, 1.1, 0.9, 10.0, 10.1, 9.9, 100.0)
    val h = xs.foldLeft(NumericHist.empty(3))((a, x) => NumericHist.add(a, x, 1.0))
    val c = NumericHist.compact(h)
    assert(c.n == 3)
    assert(math.abs(c.weights.sum - xs.size) < 1e-9)
    // clusters collapse to their means; the outlier stays its own bin
    assert(math.abs(c.values(0) - 1.0) < 0.2)
    assert(math.abs(c.values(1) - 10.0) < 0.2)
    assert(c.values(2) == 100.0)
  }

  test("merge of partial histograms equals the single-pass result in the exact regime") {
    val left = (1 to 50).foldLeft(NumericHist.empty(8))(
      (a, i) => NumericHist.add(a, (i % 4).toDouble, 1.0))
    val right = (51 to 100).foldLeft(NumericHist.empty(8))(
      (a, i) => NumericHist.add(a, (i % 4).toDouble, 1.0))
    val merged = NumericHist.compact(NumericHist.merge(left, right))
    assert(merged.values.toSeq == Seq(0.0, 1.0, 2.0, 3.0))
    assert(merged.weights.toSeq == Seq(25.0, 25.0, 25.0, 25.0))
  }

  test("serialize roundtrip") {
    val h = Seq(3.0, 1.0, 2.0, 1.0).foldLeft(NumericHist.empty(4))(
      (a, x) => NumericHist.add(a, x, 2.0))
    val rt = NumericHist.deserialize(NumericHist.serialize(h))
    assert(rt.values.toSeq == Seq(1.0, 2.0, 3.0))
    assert(rt.weights.toSeq == Seq(4.0, 2.0, 2.0))
  }

  test("SQL registration with weight argument") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1.0, 2.0), (1.0, 3.0), (4.0, 1.0)).toDF("v", "w")
      .createOrReplaceTempView("nh_in")
    val m = spark.sql("SELECT numeric_histogram(4, v, w) AS h FROM nh_in")
      .collect()(0).getMap[Double, Double](0)
    assert(m == Map(1.0 -> 5.0, 4.0 -> 1.0))
    val bad = intercept[Exception](
      spark.sql("SELECT numeric_histogram(v, v) FROM nh_in").collect())
    assert(bad.getMessage.contains("foldable"))
  }
}
