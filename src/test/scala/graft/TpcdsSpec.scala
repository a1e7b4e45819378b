package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** TPC-DS slice sanity: derivation invariants + canonical plan shapes.
  * Full value correctness is the per-round DuckDB oracle gate (ds_q* keys);
  * these specs pin what the oracle can't see — derived-dimension contracts,
  * rollup grand totals, and broadcast-join planning. */
class TpcdsSpec extends AnyFunSuite {
  import TestSpark._
  import tpcds.Tpcds

  test("derived dimensions have the contracted cardinalities and key ranges") {
    assert(Tpcds.dateDim(spark).count() == 2557)
    assert(Tpcds.store(spark).count() == 10)
    assert(Tpcds.customerDemographics(spark).count() == 100)
    assert(Tpcds.householdDemographics(spark).count() == 50)
    assert(Tpcds.promotion(spark).count() == 20)
    val ss = Tpcds.storeSales(spark, sf)
    val rng = ss.agg(min("ss_sold_date_sk"), max("ss_sold_date_sk"),
      min("ss_store_sk"), max("ss_store_sk")).collect()(0)
    assert(rng.getLong(0) >= 0 && rng.getLong(1) < 2557, "date_sk within calendar")
    assert(rng.getLong(2) >= 0 && rng.getLong(3) <= 9, "store_sk within stores")
  }

  test("q27 rollup emits per-state, per-item-subtotal and grand-total rows") {
    val rows = Tpcds.q27(spark, sf).collect()
    if (rows.nonEmpty) { // sf0.001 slice can be empty for this demographic
      val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
      assert(grand.length == 1, "exactly one grand-total row")
      val subtotals = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
      assert(subtotals.nonEmpty, "per-item subtotal rows present")
      val grandCnt = grand(0).getLong(2)
      assert(subtotals.map(_.getLong(2)).sum == grandCnt,
        "item subtotals add up to the grand total")
    }
  }

  test("q98 revenue ratios sum to ~100 within each class") {
    val rows = Tpcds.q98(spark, sf).collect()
    rows.groupBy(_.getString(2)).foreach { case (_, rs) =>
      val total = rs.map(_.getDouble(5)).sum
      assert(math.abs(total - 100.0) < 1e-6, s"class ratios sum to $total")
    }
  }

  test("star-join plans broadcast every dimension (no shuffle on dims)") {
    for (q <- Seq(Tpcds.q3 _, Tpcds.q42 _, Tpcds.q55 _)) {
      val plan = q(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), "dims broadcast")
    }
  }

  test("multi-channel q60 unions three channel aggregates") {
    val plan = Tpcds.q60(spark, sf).queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"), "union of channels survives optimization")
  }
}
