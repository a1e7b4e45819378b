package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesStore
import graft.ops.TimeSeriesStore.TsQuery

/** Segment-store behavior pins: interval routing reads only in-range day
  * dirs, the rollup answers exactly what the raw scan answers (lossless
  * for its query class), canAnswer mirrors the query-generator check, and
  * the fallback path engages when it must. */
class TimeSeriesStoreSpec extends AnyFunSuite {
  import TestSpark._

  private val path = "/tmp/graft_tseries_spec/seg"
  private lazy val events = Tables(spark, sf, "events")
  private lazy val ingested: Unit =
    TimeSeriesStore.ingest(events, "ts", Seq("event_type"), "value", path)

  test("query interval lists only in-range segment dirs") {
    ingested
    val q = TimeSeriesStore.query(spark, path,
      TsQuery("day", Seq("event_type"), "2024-01-03", "2024-01-06"))
    val files = q.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f =>
      Seq("2024-01-03", "2024-01-04", "2024-01-05")
        .exists(d => f.contains(s"seg_day=$d"))))
    val allDays = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("seg_day="))
    assert(allDays > 3) // pruning was real
  }

  test("rollup answers match the raw-scan fallback exactly at every grain") {
    ingested
    for (g <- Seq("hour", "day", "month", "all")) {
      val q = TsQuery(g, Seq("event_type"), "2024-01-02", "2024-01-09",
        Map("event_type" -> Seq("click", "view")))
      val (seg, fromSegments) = TimeSeriesStore.queryOrFallback(
        spark, path, events, "ts", "value", Seq("event_type"), q)
      assert(fromSegments)
      // force the fallback by demanding a dim the store lacks, then
      // compare on the shared dims via the same query without it
      val (raw, rawFlag) = TimeSeriesStore.queryOrFallback(
        spark, path, events, "ts", "value", Seq.empty, q)
      assert(!rawFlag)
      val a = seg.orderBy("bucket", "event_type")
        .collect().map(_.toSeq).toSeq
      val b = raw.orderBy("bucket", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(a === b, s"grain $g diverged")
      assert(a.nonEmpty)
    }
  }

  test("canAnswer mirrors the generator check: unknown dim, unknown " +
    "filter dim, bad grain all refuse") {
    val dims = Seq("event_type")
    assert(TimeSeriesStore.canAnswer(
      TsQuery("day", Seq("event_type"), "2024-01-01", "2024-01-02"), dims))
    assert(!TimeSeriesStore.canAnswer(
      TsQuery("day", Seq("user_id"), "2024-01-01", "2024-01-02"), dims))
    assert(!TimeSeriesStore.canAnswer(
      TsQuery("day", Nil, "2024-01-01", "2024-01-02",
        Map("user_id" -> Seq("1"))), dims))
    assert(!TimeSeriesStore.canAnswer(
      TsQuery("minute", Nil, "2024-01-01", "2024-01-02"), dims))
  }

  test("gates run with oracles declared") {
    val a = TimeSeriesStore.segmentsGate(spark, sf)
    assert(a.collect().nonEmpty)
    assert(a.columns.toSeq ===
      Seq("bucket", "event_type", "cnt", "sum_m", "min_m", "max_m"))
    val b = TimeSeriesStore.monthlyGate(spark, sf)
    assert(b.collect().length === 1) // one month in the fixture
    Seq("src_timeseries_segments", "src_timeseries_monthly").foreach(k =>
      assert(SparkEntry.oracleSql.contains(k)))
  }
}
