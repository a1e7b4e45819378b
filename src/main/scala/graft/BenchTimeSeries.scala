package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesStore
import graft.ops.TimeSeriesStore.TsQuery

/** Segment-store scale bench — the measured evidence behind the
  * Druid/Pinot-analogue's claims (ops/TimeSeriesStore.scala): on a
  * 20M-row synthetic event stream spanning 60 days, ingest once into
  * hour-grain day-partitioned segments, then measure
  *
  *  - the ROLLUP RATIO (segment rows / raw rows) — Druid's core storage
  *    win: queries touch rollup-cardinality data, not event-cardinality;
  *  - interval routing: a 3-day query lists only 3 of 60 day dirs, the
  *    read fraction computed from dir file sizes (the honest metric,
  *    per the r12 ANN-evidence lesson);
  *  - the same query answered from segments vs the raw-scan fallback —
  *    latency ratio AND value equality (the rollup is lossless for its
  *    query class, so agree must be true).
  *
  * Output: one JSON line on stdout + BENCH_tseries_r13.json in the cwd.
  * N overrides via SPARK_GRAFT_TS_N for quick dev runs.
  */
object BenchTimeSeries {

  private val N = sys.env.getOrElse("SPARK_GRAFT_TS_N", "20000000").toLong
  private val Days = 60
  private val Types = 8

  /** Deterministic stream: event i lands uniformly over the window with
    * a per-type value pattern. */
  private def events(s: SparkSession): DataFrame =
    s.range(N).toDF("event_id")
      .withColumn("ts", timestamp_seconds(
        lit(1704067200L) + // 2024-01-01 00:00:00 UTC
          (col("event_id") * 97 % (Days * 86400L))))
      .withColumn("event_type",
        concat(lit("type"), pmod(col("event_id"), lit(Types))))
      .withColumn("value",
        (pmod(col("event_id") * 31, lit(100000)) / lit(100.0)))

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def dirBytes(p: java.io.File): Long =
    if (!p.exists()) 0L
    else if (p.isFile) p.length()
    else p.listFiles().map(dirBytes).sum

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-tseries")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val path = "/tmp/graft_bench_tseries/seg"
    // materialize the raw stream to parquet first: the fallback path must
    // pay real scan IO, not re-derive an in-memory range (which would
    // understate the rollup's advantage)
    val rawPath = "/tmp/graft_bench_tseries/raw"
    events(s).write.mode("overwrite").parquet(rawPath)
    val raw = s.read.parquet(rawPath)

    val (_, ingestSec) = time {
      TimeSeriesStore.ingest(raw, "ts", Seq("event_type"), "value", path)
    }
    val segRows = s.read.parquet(path).count()
    val rollupRatio = segRows.toDouble / N

    val root = new java.io.File(path)
    val allDays = root.listFiles().count(_.getName.startsWith("seg_day="))
    val totalBytes = dirBytes(root)
    val q = TsQuery("day", Seq("event_type"), "2024-01-10", "2024-01-13",
      Map("event_type" -> Seq("type1", "type3", "type5")))
    val probedBytes = Seq("2024-01-10", "2024-01-11", "2024-01-12")
      .map(d => dirBytes(new java.io.File(s"$path/seg_day=$d"))).sum

    // 1 prewarm + 2 measured (min), the repo bench protocol — first-run
    // listing/codegen overhead would otherwise dominate the tiny probe
    def bestOf2[A](f: => A): (A, Double) = {
      f
      val (a, t1) = time(f)
      val (_, t2) = time(f)
      (a, math.min(t1, t2))
    }
    val (segRes, segSec) = bestOf2 {
      TimeSeriesStore.query(s, path, q)
        .orderBy("bucket", "event_type").collect()
    }
    val (rawRes, rawSec) = bestOf2 {
      TimeSeriesStore.queryOrFallback(
        s, path, raw, "ts", "value", Seq.empty, q)._1
        .orderBy("bucket", "event_type").collect()
    }
    val agree = segRes.map(_.toSeq).toSeq == rawRes.map(_.toSeq).toSeq

    // the cluster-scale claim is BYTES TOUCHED, not local wall-clock
    // (at 20M rows / 32 local cores both paths are sub-second): the raw
    // fallback must scan the whole unsorted table, the segment probe
    // reads 3 day-dirs of rollup-cardinality data
    val rawBytes = dirBytes(new java.io.File(rawPath))
    val json =
      f"""{"metric":"tseries_segments","n_events":$N,"days":$Days,""" +
        f""""ingest_sec":$ingestSec%.1f,"segment_rows":$segRows,""" +
        f""""rollup_ratio":$rollupRatio%.6f,""" +
        f""""probe_days":3,"all_days":$allDays,""" +
        f""""read_fraction":${probedBytes.toDouble / totalBytes}%.5f,""" +
        f""""raw_mib":${rawBytes / 1048576.0}%.1f,""" +
        f""""probed_mib":${probedBytes / 1048576.0}%.3f,""" +
        f""""bytes_reduction":${rawBytes.toDouble / probedBytes}%.0f,""" +
        f""""segment_query_sec":$segSec%.3f,"raw_query_sec":$rawSec%.3f,""" +
        f""""speedup":${rawSec / segSec}%.1f,"agree":$agree}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_tseries_r13.json"),
      (json + "\n").getBytes)
    s.stop()
  }
}
