package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOfJoin

/** As-of join (ops/AsOfJoin.scala) — single-shuffle union+window plan:
  * backward/forward nearest match, exact-match toggle, tolerance,
  * unmatched-left NULLs, and the plan shape (no join node at all). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) and quotes (right), two symbols
  private lazy val trades = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100L),
    ("A", ts("2024-01-01 10:05:00"), 101L),
    ("A", ts("2024-01-01 09:00:00"), 102L), // before any quote
    ("B", ts("2024-01-01 10:03:00"), 200L),
    ("C", ts("2024-01-01 10:00:00"), 300L)  // key with no quotes at all
  ).toDF("sym", "ts", "trade_id")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 09:59:00"), 1.0),
    ("A", ts("2024-01-01 10:00:00"), 2.0), // exactly at trade 100
    ("A", ts("2024-01-01 10:04:30"), 3.0),
    ("B", ts("2024-01-01 10:10:00"), 9.0)  // only after B's trade
  ).toDF("sym", "ts", "px")

  private def run(direction: String = "backward",
      tolerance: Option[org.apache.spark.sql.Column] = None,
      exact: Boolean = true): Map[Long, Option[Double]] =
    AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", "ts",
      direction = direction, tolerance = tolerance,
      allowExactMatch = exact, rightPrefix = "q_")
      .select(col("trade_id"), col("q_px"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("backward: latest quote at-or-before; no-match keys NULL") {
    val out = run()
    assert(out(100L) == Some(2.0)) // exact ts match included
    assert(out(101L) == Some(3.0))
    assert(out(102L) == None)      // trade before any quote
    assert(out(200L) == None)      // B's only quote is later
    assert(out(300L) == None)      // key absent from right
  }

  test("strict (allowExactMatch=false) skips the equal-ts quote") {
    val out = run(exact = false)
    assert(out(100L) == Some(1.0)) // 10:00 quote excluded, 09:59 wins
    assert(out(101L) == Some(3.0))
  }

  test("forward: earliest quote at-or-after") {
    val out = run(direction = "forward")
    assert(out(100L) == Some(2.0))  // exact match
    assert(out(101L) == None)       // no A quote after 10:05
    assert(out(102L) == Some(1.0))  // first A quote of the day
    assert(out(200L) == Some(9.0))
  }

  test("tolerance nulls matches farther than the bound") {
    val out = run(tolerance = Some(expr("INTERVAL 2 MINUTES")))
    assert(out(100L) == Some(2.0))  // 0s away
    assert(out(101L) == Some(3.0))  // 30s away
    assert(out(102L) == None)
    // widen: 61 minutes back is within a 2-hour bound
    val wide = AsOfJoin.asOfJoin(
      Seq(("A", ts("2024-01-01 11:05:00"), 1L)).toDF("sym", "ts", "id"),
      quotes, Seq("sym"), "ts", "ts",
      tolerance = Some(expr("INTERVAL 30 MINUTES")), rightPrefix = "q_")
      .select("q_px").collect()
    assert(wide.head.isNullAt(0)) // 10:04:30 is 60.5 min back > 30 min
  }

  test("plan is one window over a union — no join operator") {
    val plan = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("right payload columns carry the prefix; keys not duplicated") {
    val cols = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "ts", "ts",
      rightPrefix = "q_").columns.toSeq
    assert(cols == Seq("sym", "ts", "trade_id", "q_ts", "q_px"))
  }
}
