package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source-connector specs beyond the oracle gates: the file-backed Kafka
  * topic stand-in must behave like a stream source too — the same
  * topic-shaped data consumed via readStream with the same decode. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("kafka-shaped topic consumes identically in batch and readStream") {
    // materialize the topic via the batch gate (also sanity-checks rows)
    val batch = ops.Sources.kafkaBatch(spark, sf).collect()
    assert(batch.nonEmpty, "batch consume returned rows")
    val topicDir = "/tmp/graft_sources/kafka_topic_events"
    val schema = spark.read.parquet(topicDir).schema
    val payload = new org.apache.spark.sql.types.StructType()
      .add("event_id", "long").add("user_id", "long")
      .add("event_type", "string").add("value", "double")
    val streamed = spark.readStream.schema(schema).parquet(topicDir)
      .filter(col("topic") === "events" && col("offset") >= 1)
      .select(from_json(col("value").cast("string"), payload).as("v"))
      .groupBy(col("v.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = streamed.writeStream.format("memory").queryName("kafka_stand_in")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT event_type, n FROM kafka_stand_in")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = batch.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"stream $got != batch $want")
    } finally q.stop()
  }

  test("JDBC filters push down to the source (reference QueryBuilder)") {
    // materialize SUPPLIER_RT in embedded Derby via the gate
    ops.Sources.jdbcRoundtrip(spark, sf).count()
    val url = "jdbc:derby:/tmp/graft_sources/derby_db"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = spark.read.jdbc(url, "SUPPLIER_RT", props)
      .filter(col("s_suppkey") <= 3 && col("s_nationkey") > 0)
      .select("s_suppkey", "s_name")
    val plan = df.queryExecution.executedPlan.toString
    // the predicates must reach the JDBC relation as PushedFilters (they
    // become the remote WHERE clause — presto-base-jdbc QueryBuilder.java
    // builds the same); a plan that filters AFTER a full-table fetch
    // would ship the whole remote table at scale
    // (the plan's metadata string truncates at 100 chars, hence the
    // prefix match on the second filter)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("LessThanOrEqual(s_suppkey,3)") &&
      plan.contains("GreaterThan(s_na"), plan)
    // column pruning reaches the source too: only the selected columns
    // (plus filter columns) appear in the JDBC ReadSchema
    assert(!plan.contains("s_acctbal"), plan)
    assert(df.collect().map(_.getLong(0)).forall(_ <= 3))
  }

  test("snapshot-table MERGE commits atomically: readers see old or new, never partial") {
    import ops.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft_snap").toFile
    SnapshotTable.write(spark, base, spark.range(0, 1000).toDF("id"))
    // reader polls throughout two merge commits; every observation must be
    // one of the committed snapshot counts (old-or-new, the reference's
    // TableFinishOperator contract)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) seen.add(SnapshotTable.read(spark, base).count())
    })
    reader.start()
    try {
      SnapshotTable.merge(spark, base)(df =>
        df.unionByName(spark.range(1000, 1500).toDF("id")))
      SnapshotTable.merge(spark, base)(df =>
        df.filter(org.apache.spark.sql.functions.col("id") < 1200))
    } finally { stop = true; reader.join() }
    val allowed = Set(1000L, 1500L, 1200L)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.nonEmpty && seen.asScala.forall(allowed.contains),
      s"reader observed non-snapshot counts: ${seen.asScala}")
    assert(SnapshotTable.read(spark, base).count() == 1200L)
    assert(SnapshotTable.currentVersion(base).contains(3))
    SnapshotTable.drop(base)
  }

  test("snapshot-table DELETE: TRUE removes, NULL condition keeps the row") {
    import ops.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft_snap_del").toFile
    val df = spark.range(0, 10).toDF("id")
      .withColumn("v", when(col("id") < 8, col("id")).otherwise(lit(null)))
    SnapshotTable.write(spark, base, df)
    // v > 4 is NULL for ids 8,9 — ANSI DELETE keeps NULL-condition rows
    SnapshotTable.delete(spark, base, col("v") > 4)
    val left = SnapshotTable.read(spark, base).collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L))
    SnapshotTable.drop(base)
  }

  test("snapshot-table UPDATE: SET expressions read the pre-update row") {
    import ops.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft_snap_upd").toFile
    SnapshotTable.write(spark, base,
      spark.range(0, 4).toDF("a").withColumn("b", col("a") * 10))
    // swap: a=b, b=a must use ORIGINAL values simultaneously (ANSI UPDATE)
    SnapshotTable.update(spark, base,
      Seq("a" -> col("b"), "b" -> col("a")), col("a") >= 2)
    val rows = SnapshotTable.read(spark, base)
      .orderBy("b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // a<2 untouched: (0,0), (1,10); a>=2 swapped simultaneously
    assert(rows.toSeq == Seq((0L, 0L), (20L, 2L), (30L, 3L), (1L, 10L)))
    SnapshotTable.drop(base)
  }

  test("snapshot-table conflicting rewrites raise instead of losing updates") {
    import ops.SnapshotTable
    val base = java.nio.file.Files.createTempDirectory("graft_snap_ww").toFile
    SnapshotTable.write(spark, base, spark.range(0, 100).toDF("id"))
    // a rewrite that commits while another rewrite is in flight: the
    // in-flight one must see the conflict at commit, never clobber
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.transformCommit(spark, base) { df =>
        SnapshotTable.write(spark, base,
          spark.range(0, 50).toDF("id")) // interleaved commit
        df.filter(col("id") < 10)
      }
    }
    assert(e.getMessage.contains("retry"))
    assert(SnapshotTable.read(spark, base).count() == 50L)
    SnapshotTable.drop(base)
  }

  test("dynamic partition pruning reaches the fact scan (dynamic filtering)") {
    // materialize the partitioned fact once via the gate builder
    ops.Sources.dynamicPruned(spark, sf).count()
    val plan = ops.Sources
      .dynamicPrunedQuery(spark, sf, "/tmp/graft_sources/orders_dpp")
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime dynamicpruning filter:\n$plan")
  }

  test("runtime bloom filter injects on a non-partition join key") {
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100GB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // shuffle join: the bloom filter prunes probe rows pre-shuffle (the
      // reference's dynamic filter on unpartitioned columns)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables(spark, sf, "lineitem")
      val dim = Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val plan = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").count()
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"probe side must carry a runtime bloom filter:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
