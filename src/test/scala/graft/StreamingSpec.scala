package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming exercises: the batch-verified transforms in
  * graft.streaming.Streams run under readStream with watermarks — tumbling
  * window aggregation and session windows, with late-data handling. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("tumbling window aggregation over a stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val counts = mem.toDF().toDF("t", "event_type", "value")
      .withWatermark("t", "10 minutes")
      .groupBy(window(col("t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val q = counts.writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(5), "a", 1.0), (ts(20), "a", 2.0), (ts(61), "b", 5.0))
      q.processAllAvailable()
      // watermark advances past hour 0 → first window can close
      mem.addData((ts(140), "b", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, total FROM tumbling_test")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains(("a", 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("HLL sketch aggregate runs as streaming state (windowed approx distinct)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("t", "user_id")
      .withWatermark("t", "10 minutes")
      .groupBy(window(col("t"), "1 hour"))
      .agg(graft.functions.GraftFunctions.approxSet(col("user_id")).as("sk"))
      .select(col("window"),
        graft.functions.GraftFunctions.hllCardinality(col("sk")).as("nd"))
    val q = agg.writeStream.format("memory").queryName("hll_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // 3 distinct users in hour 0, one repeated — across separate batches,
      // so the sketch state must merge across micro-batches
      mem.addData((ts(5), 1L), (ts(10), 2L))
      q.processAllAvailable()
      mem.addData((ts(20), 2L), (ts(30), 3L))
      q.processAllAvailable()
      mem.addData((ts(140), 9L)) // advance watermark, close hour 0
      q.processAllAvailable()
      val nd = spark.sql("SELECT nd FROM hll_stream_test").collect()
        .map(_.getLong(0))
      assert(nd.contains(3L), s"expected a closed window with 3 distinct, got ${nd.toSeq}")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("t", "value")
      .withWatermark("t", "5 minutes")
      .groupBy(window(col("t"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(5), 1.0), (ts(30), 1.0))
      q.processAllAvailable()
      mem.addData((ts(6), 99.0)) // late: watermark is 25min, window [0,10) closed
      q.processAllAvailable()
      mem.addData((ts(60), 1.0))
      q.processAllAvailable()
      val n0 = spark.sql(
        "SELECT n FROM late_test WHERE window.start = timestamp '1970-01-01 00:00:00'")
        .collect()
      assert(n0.length == 1 && n0(0).getLong(0) == 1L,
        "late row leaked into a closed window")
    } finally q.stop()
  }

  test("session_window groups events by inactivity gap on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val sess = mem.toDF().toDF("t", "user_id")
      .withWatermark("t", "10 minutes")
      .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = sess.writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at 0,10,20 (one session), then 120 (new session)
      mem.addData((ts(0), 1L), (ts(10), 1L), (ts(20), 1L), (ts(120), 1L))
      q.processAllAvailable()
      mem.addData((ts(300), 1L)) // advance watermark so sessions close
      q.processAllAvailable()
      val rows = spark.sql("SELECT n FROM session_test").collect().map(_.getLong(0))
      assert(rows.contains(3L), s"expected a 3-event session, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("stateful stream dedup keeps the first arrival per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val dedup = mem.toDF().toDF("t", "user_id", "event_type")
      .withWatermark("t", "10 minutes")
      .dropDuplicates("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), 1L, "click"), (ts(1), 1L, "click"), (ts(2), 1L, "view"),
        (ts(3), 2L, "click"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, event_type FROM dedup_test")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((1L, "click"), (1L, "view"), (2L, "click")), s"got $rows")
    } finally q.stop()
  }

  test("custom keyed state via flatMapGroupsWithState: per-user running count") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val counted = mem.toDF().toDF("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "n_events")
    val q = counted.writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((1L, 1.0), (1L, 2.0), (2L, 5.0))
      q.processAllAvailable()
      mem.addData((1L, 3.0))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT max(n_events) FROM state_test WHERE user_id = 1").collect()(0).getLong(0)
      assert(last == 3L, s"state did not accumulate across batches: $last")
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks on both sides") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val c = clicks.toDF().toDF("c_t", "c_user", "c_id")
      .withWatermark("c_t", "10 minutes")
    val b = buys.toDF().toDF("b_t", "b_user", "b_value")
      .withWatermark("b_t", "10 minutes")
    val joined = c.join(b,
      col("c_user") === col("b_user") &&
        col("b_t") >= col("c_t") &&
        col("b_t") < col("c_t") + expr("INTERVAL 15 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // event times start at ts(60): the initial watermark is epoch 0 and the
      // join's late-row filter drops input at-or-below it (verified behavior)
      clicks.addData((ts(60), 1L, 100L), (ts(60), 2L, 101L))
      buys.addData((ts(65), 1L, 9.5)) // within 15min of user 1's click
      buys.addData((ts(90), 2L, 1.0)) // outside the interval for user 2
      q.processAllAvailable()
      val rows = spark.sql("SELECT c_id, b_value FROM ssjoin_test")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((100L, 9.5)), s"got $rows")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join releases unmatched rows with nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val c = clicks.toDF().toDF("c_t", "c_user", "c_id")
      .withWatermark("c_t", "10 minutes")
    val b = buys.toDF().toDF("b_t", "b_user", "b_value")
      .withWatermark("b_t", "10 minutes")
    val joined = c.join(b,
      col("c_user") === col("b_user") &&
        col("b_t") >= col("c_t") &&
        col("b_t") < col("c_t") + expr("INTERVAL 15 MINUTES"), "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssouter_test")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(60), 1L, 100L), (ts(60), 2L, 101L))
      buys.addData((ts(65), 1L, 9.5)) // user 1 converts; user 2 never does
      q.processAllAvailable()
      // advance BOTH watermarks far past the join window so the state
      // store can emit user 2's click as an unmatched (null) outer row
      clicks.addData((ts(200), 9L, 999L))
      buys.addData((ts(200), 9L, 0.1))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT c_id, b_value FROM ssouter_test WHERE c_id IN (100, 101)")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
      assert(rows == Set((100L, Some(9.5)), (101L, None)), s"got $rows")
    } finally q.stop()
  }

  test("batch outer interval-join counts unconverted clicks") {
    import spark.implicits._
    val df = Seq(
      ("click", 1L, 0L * 60000000000L, 1L, 0.0),
      ("purchase", 1L, 5L * 60000000000L, 2L, 9.5),
      ("click", 2L, 0L * 60000000000L, 4L, 0.0) // never converts
    ).toDF("event_type", "user_id", "ts", "event_id", "value")
    val r = graft.streaming.Streams.outerIntervalJoin(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(r == Set((1L, 1L, 1L, 0L, 9.5), (2L, 1L, 0L, 1L, 0.0)), s"got $r")
  }

  test("batch interval-join logic matches a hand-computed case") {
    import spark.implicits._
    val df = Seq(
      ("click", 1L, 0L * 60000000000L, 1L, 0.0),
      ("purchase", 1L, 5L * 60000000000L, 2L, 9.5),   // joins (within 15m)
      ("purchase", 1L, 20L * 60000000000L, 3L, 1.0),  // outside window
      ("click", 2L, 0L * 60000000000L, 4L, 0.0)       // no purchase
    ).toDF("event_type", "user_id", "ts", "event_id", "value")
    val r = graft.streaming.Streams.intervalJoin(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(r == Set((1L, 1L, 1L, 9.5)))
  }

  test("batch session logic matches a hand-computed case") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L * 60000000000L, 1L, 1.0),
      (1L, 10L * 60000000000L, 2L, 1.0),
      (1L, 50L * 60000000000L, 3L, 1.0), // 40min gap → new session
      (2L, 0L * 60000000000L, 4L, 1.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val r = graft.streaming.Streams.sessions(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r == Set((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("stream-static enrichment join needs no watermark or state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "ALPHA"), (1L, "BETA")).toDF("k", "name")
    val mem = MemoryStream[(Long, Double)]
    val enriched = mem.toDF().toDF("user_id", "value")
      .withColumn("k", col("user_id") % 2)
      .join(org.apache.spark.sql.functions.broadcast(dim), "k")
      .select("name", "value")
    val q = enriched.writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((2L, 1.0), (3L, 2.0), (4L, 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT name, value FROM enrich_test")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(rows == Set(("ALPHA", 1.0), ("BETA", 2.0), ("ALPHA", 3.0)))
      // no stateful operator in the plan: nothing to watermark or expire
      val lastProgress = q.lastProgress
      assert(lastProgress == null || lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("Iceberg source: snapshot-ordinal offsets, appends stream, " +
      "deletes refuse") {
    import spark.implicits._
    import graft.ops.{DeltaLake, IcebergTable}
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ice_pipe_${System.nanoTime()}")
    val a = new java.io.File(root, "a")
    val b = new java.io.File(root, "b")
    a.mkdirs(); b.mkdirs()
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val f0 = IcebergTable.writeDataFile(df, a, "f0.parquet")
    IcebergTable.commitSnapshot(a, 1, 1L,
      Seq(IcebergTable.Entry(1, f0)))
    DeltaLake.commit(b, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema)))
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.IcebergSourceProvider")
        .option("path", a.getPath).load()
        .writeStream
        .option("checkpointLocation", new java.io.File(root, "ckpt").getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(
          graft.streaming.DeltaSink.exactlyOnce(b.getPath, "icepipe"))
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(DeltaLake.read(spark, b.getPath).count() == 2L)
    IcebergTable.insertAppend(spark, a.getPath,
      Seq((3L, "z")).toDF("k", "s"))
    runOnce() // restart: only the appended snapshot's rows flow
    assert(DeltaLake.read(spark, b.getPath).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    IcebergTable.delete(spark, a.getPath, col("k") === 1L)
    val ex = intercept[
      org.apache.spark.sql.streaming.StreamingQueryException] { runOnce() }
    assert(ex.getMessage.contains("ignoreChanges") ||
      Option(ex.getCause).exists(_.getMessage.contains("ignoreChanges")))
  }

  test("Delta source maxVersionsPerTrigger bounds each micro-batch") {
    import spark.implicits._
    import graft.ops.DeltaLake
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_rate_${System.nanoTime()}")
    val a = new java.io.File(root, "a")
    a.mkdirs()
    val df = Seq((1L, "x")).toDF("k", "s")
    DeltaLake.commit(a, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema)))
    DeltaLake.insert(spark, a.getPath, df)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.DeltaSourceProvider")
        .option("path", a.getPath)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream
        .option("checkpointLocation", new java.io.File(root, "ckpt").getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.incrementAndGet()
          rows.addAndGet(b.count())
          ()
        }
        .start()
      q.awaitTermination()
    }
    runOnce() // initial snapshot: one batch
    assert(batches.get() == 1 && rows.get() == 1L)
    (2L to 4L).foreach(i =>
      DeltaLake.insert(spark, a.getPath, Seq((i, "v")).toDF("k", "s")))
    runOnce() // 3 backlog versions → 3 capped micro-batches
    assert(batches.get() == 4, s"batches=${batches.get()}")
    assert(rows.get() == 4L)
  }

  test("Delta source → Iceberg sink: cross-format exactly-once pipeline") {
    import spark.implicits._
    import graft.ops.{DeltaLake, IcebergTable}
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_cross_pipe_${System.nanoTime()}")
    val a = new java.io.File(root, "a")
    val b = new java.io.File(root, "b")
    a.mkdirs(); b.mkdirs()
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    DeltaLake.writeDataFile(df, a, "f0.parquet")
    DeltaLake.commit(a, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    val s0 = IcebergTable.writeDataFile(df.limit(0), b, "seed.parquet")
    IcebergTable.commitSnapshot(b, 1, 1L,
      Seq(IcebergTable.Entry(1, s0)))
    val sink = graft.streaming.IcebergSink.exactlyOnce(b.getPath, "xpipe")
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.DeltaSourceProvider")
        .option("path", a.getPath).load()
        .writeStream
        .option("checkpointLocation", new java.io.File(root, "ckpt").getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(IcebergTable.read(spark, b.getPath).count() == 2L)
    DeltaLake.insert(spark, a.getPath, Seq((3L, "z")).toDF("k", "s"))
    runOnce()
    assert(IcebergTable.read(spark, b.getPath).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // replayed batchId is a no-op on the Iceberg side too
    sink(df, 0L)
    assert(IcebergTable.read(spark, b.getPath).count() == 3L)
  }

  test("Delta source → Delta sink: incremental pipeline with restart, " +
      "optimize invisibility, and CoW refusal") {
    import spark.implicits._
    import graft.ops.DeltaLake
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_delta_pipe_${System.nanoTime()}")
    val a = new java.io.File(root, "a")
    val b = new java.io.File(root, "b")
    val ckpt = new java.io.File(root, "ckpt").getPath
    a.mkdirs(); b.mkdirs()
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    DeltaLake.writeDataFile(df, a, "f0.parquet")
    DeltaLake.commit(a, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    DeltaLake.commit(b, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema)))
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.DeltaSourceProvider")
        .option("path", a.getPath).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(
          graft.streaming.DeltaSink.exactlyOnce(b.getPath, "pipe"))
        .start()
      q.awaitTermination()
    }
    runOnce() // initial snapshot
    assert(DeltaLake.read(spark, b.getPath).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // append to A, restart from the checkpoint: ONLY the new rows land
    DeltaLake.insert(spark, a.getPath, Seq((3L, "z")).toDF("k", "s"))
    runOnce()
    assert(DeltaLake.read(spark, b.getPath).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(DeltaLake.read(spark, b.getPath).count() == 3L) // no re-emit
    // OPTIMIZE on A is dataChange=false: the stream sees nothing new
    DeltaLake.optimize(spark, a.getPath)
    runOnce()
    assert(DeltaLake.read(spark, b.getPath).count() == 3L)
    // a copy-on-write DELETE is not an append: the source refuses
    DeltaLake.delete(spark, a.getPath, col("k") === 1L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    assert(ex.getMessage.contains("ignoreChanges") ||
      Option(ex.getCause).exists(_.getMessage.contains("ignoreChanges")))
  }
}
