package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

/** Binned range joins (ops/RangeJoin.scala): exact results vs the naive
  * BETWEEN join, single emission for multi-bin overlaps, boundary
  * inclusivity, and the plan shape (equi-join, no nested loop). */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val points =
    Seq((1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 99.5), (5L, -7.0))
      .toDF("pid", "p")
  private lazy val intervals =
    Seq((10L, 0.0, 10.0), (11L, 4.0, 6.0), (12L, 90.0, 200.0),
      (13L, -100.0, -1.0))
      .toDF("iid", "lo", "hi")

  test("point-in-interval matches the naive BETWEEN join exactly") {
    for (w <- Seq(0.5, 3.0, 50.0, 1000.0)) {
      val fast = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", binWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive, s"binWidth=$w")
      // boundaries are inclusive: p=0 and p=10 both match [0, 10]
      assert(fast.contains((1L, 10L)) && fast.contains((3L, 10L)))
    }
  }

  test("interval overlap emits each pair exactly once across bin widths") {
    val a = Seq((1L, 0.0, 100.0), (2L, 50.0, 60.0), (3L, 200.0, 210.0))
      .toDF("aid", "alo", "ahi")
    val b = Seq((7L, 90.0, 205.0), (8L, 55.0, 56.0), (9L, -50.0, -10.0))
      .toDF("bid", "blo", "bhi")
    for (w <- Seq(1.0, 7.0, 100.0, 10000.0)) {
      val rows = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi",
        binWidth = w).select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // duplicates would show as repeated pairs
      assert(rows.length == rows.toSet.size, s"dup pairs at binWidth=$w")
      assert(rows.toSet ==
        Set((1L, 7L), (1L, 8L), (2L, 8L), (3L, 7L)), s"binWidth=$w")
    }
  }

  test("plan is an equi-join on the bin, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", binWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join") || plan.contains("HashJoin"), plan)
  }

  test("invalid bin width refuses") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 0.0)
    }
  }
}
