package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Time-series segment store — the Spark-first analogue of the
  * reference's Druid/Pinot connectors (presto-druid, presto-pinot).
  * Those engines hold INGEST-TIME ROLLUPS: data lands in time-interval
  * segments pre-aggregated at (time-grain, dimensions), and the
  * connector's whole job is deciding whether a query's
  * aggregation/filter/project subtree can be answered by the remote
  * engine — DruidQueryGenerator.generate compiles the subtree to Druid
  * SQL and DruidPlanOptimizer.java:148-163 swaps the plan to the pushed
  * query, falling back to a plain scan when generate() returns empty
  * (`!dql.isPresent()` at :149). Pinot mirrors this with
  * PinotQueryGenerator.
  *
  * Here the segment store is parquet partitioned by segment day, rows
  * pre-aggregated at (hour, dims) with Druid's standard metric set
  * (count / sum / min / max); [[canAnswer]] is the query-generator
  * analogue (dims and filters must be a subset of the rollup's, metrics
  * a subset of the stored set, granularity no finer than the stored
  * grain), [[query]] answers from segments listing ONLY the days in the
  * query interval (the broker's interval-to-segment routing), and
  * [[queryOrFallback]] reproduces the optimizer's swap-or-scan decision
  * against the raw table.
  *
  * Exactness at scale: sums are carried as DECIMAL(18,6) partials in the
  * segments (the repo's dsum convention), so hour partials re-aggregate
  * to day/month/all-grain totals order-independently and match the
  * DuckDB replay over the RAW events bit-for-bit — the rollup is
  * lossless for its query class, which is the Druid data-model claim.
  * 100 TB shape: ingest is one hash aggregate shuffled on
  * (day, hour, dims); a query reads only its interval's segment dirs and
  * re-aggregates rows whose cardinality is |days| × |hour buckets| ×
  * |dim values| — independent of raw event count.
  */
object TimeSeriesStore {

  private def tmp(name: String): String = s"/tmp/graft_tseries/$name"

  /** Ingest raw events into hour-grain segments partitioned by day.
    * Metrics follow Druid's ingestion rollup spec: count + sum/min/max
    * of the metric column. */
  def ingest(events: DataFrame, tsCol: String, dims: Seq[String],
      metricCol: String, path: String): Unit = {
    events
      .withColumn("seg_day", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("seg_hour", date_trunc("hour", col(tsCol)))
      .groupBy(col("seg_day") +: col("seg_hour") +: dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col(metricCol).cast(DecimalType(18, 6))).as("sum_m"),
        min(col(metricCol)).as("min_m"),
        max(col(metricCol)).as("max_m"))
      .write.mode("overwrite").partitionBy("seg_day").parquet(path)
  }

  /** The query class the rollup can answer (DruidQueryGenerator's
    * supported-subtree check). */
  final case class TsQuery(
      granularity: String, // "hour" | "day" | "month" | "all"
      dims: Seq[String],
      from: String, // inclusive ISO day
      until: String, // exclusive ISO day
      dimFilter: Map[String, Seq[String]] = Map.empty)

  private val Grains = Seq("hour", "day", "month", "all")

  /** generate()-style answerability: grouped dims and filtered dims must
    * exist in the rollup, granularity must be no finer than the stored
    * hour grain. Anything else → the caller falls back to the raw scan,
    * like DruidPlanOptimizer when generate() returns empty. */
  def canAnswer(q: TsQuery, storeDims: Seq[String]): Boolean =
    Grains.contains(q.granularity) &&
      q.dims.forall(storeDims.contains) &&
      q.dimFilter.keys.forall(storeDims.contains)

  // seg_day always re-read as string: path partition-type inference would
  // otherwise surface it as DATE and change the output schema
  private def grainExpr(granularity: String) = granularity match {
    case "hour" => date_format(col("seg_hour"), "yyyy-MM-dd HH:00:00")
    case "day" => col("seg_day").cast("string")
    case "month" => substring(col("seg_day").cast("string"), 1, 7)
    case "all" => lit("all")
  }

  /** Answer from the segments: list ONLY the query interval's day dirs
    * (broker interval routing), apply dim filters, re-aggregate the
    * partials to the requested granularity. Decimal partial sums make
    * the re-aggregation exact at any grain. */
  def query(s: SparkSession, path: String, q: TsQuery): DataFrame = {
    val days = Iterator.iterate(java.time.LocalDate.parse(q.from))(_.plusDays(1))
      .takeWhile(_.isBefore(java.time.LocalDate.parse(q.until)))
      .map(_.toString).toSeq
    val dirs = days.map(d => s"$path/seg_day=$d")
      .filter(p => new java.io.File(p).isDirectory)
    val src =
      if (dirs.isEmpty) s.read.parquet(path).where(lit(false))
      else s.read.option("basePath", path).parquet(dirs: _*)
    val filtered = q.dimFilter.foldLeft(src) { case (df, (d, vs)) =>
      df.where(col(d).isin(vs: _*))
    }
    filtered
      .groupBy(grainExpr(q.granularity).as("bucket") +: q.dims.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum_m")).cast("double").as("sum_m"),
        min(col("min_m")).as("min_m"),
        max(col("max_m")).as("max_m"))
  }

  /** The optimizer's swap-or-scan decision: segments when answerable,
    * raw-event aggregation otherwise. Returns the result plus which path
    * ran (spec-pinned to agree in value). */
  def queryOrFallback(s: SparkSession, path: String, raw: DataFrame,
      tsCol: String, metricCol: String, storeDims: Seq[String],
      q: TsQuery): (DataFrame, Boolean) =
    if (canAnswer(q, storeDims)) (query(s, path, q), true)
    else {
      val days = (col(tsCol) >= to_timestamp(lit(q.from))) &&
        (col(tsCol) < to_timestamp(lit(q.until)))
      val filtered = q.dimFilter.foldLeft(
        raw.where(days)
          .withColumn("seg_day", date_format(col(tsCol), "yyyy-MM-dd"))
          .withColumn("seg_hour", date_trunc("hour", col(tsCol)))) {
        case (df, (d, vs)) => df.where(col(d).isin(vs: _*))
      }
      (filtered
        .groupBy(grainExpr(q.granularity).as("bucket") +: q.dims.map(col): _*)
        .agg(
          count(lit(1)).as("cnt"),
          sum(col(metricCol).cast(DecimalType(18, 6))).cast("double")
            .as("sum_m"),
          min(col(metricCol)).as("min_m"),
          max(col(metricCol)).as("max_m")), false)
    }

  // ------------------------------------------------------------------ gates

  /** Day-granularity aggregate over a 15-day interval with a dim filter,
    * answered FROM THE ROLLUP (hour partials → day totals), verified
    * against DuckDB replaying the raw events — proves segment routing,
    * the dim filter, and the lossless decimal re-aggregation at once. */
  def segmentsGate(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("events_segments")
    ingest(Tables(s, dir, "events"), "ts", Seq("event_type"), "value", path)
    query(s, path, TsQuery("day", Seq("event_type"),
      "2024-01-05", "2024-01-20",
      Map("event_type" -> Seq("click", "purchase", "error"))))
      .orderBy("bucket", "event_type")
  }

  /** Month granularity over the same store — the query-time grain
    * rollup (hour → month) the Druid broker performs. */
  def monthlyGate(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("events_segments_m")
    ingest(Tables(s, dir, "events"), "ts", Seq("event_type"), "value", path)
    query(s, path, TsQuery("month", Nil, "2024-01-01", "2024-02-01"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_timeseries_segments" -> segmentsGate,
    "src_timeseries_monthly" -> monthlyGate)

  val oracle: Map[String, String] = Map(
    "src_timeseries_segments" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS bucket, event_type,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_m,
        |  min(value) AS min_m, max(value) AS max_m
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |  AND event_type IN ('click','purchase','error')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "src_timeseries_monthly" ->
      """SELECT strftime(ts, '%Y-%m') AS bucket,
        |  count(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_m,
        |  min(value) AS min_m, max(value) AS max_m
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |  AND ts < TIMESTAMP '2024-02-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
