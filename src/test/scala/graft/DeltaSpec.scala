package graft

import java.io.File
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DeltaLake

/** Minimal Delta-log reader (ops/DeltaLake.scala; reference presto-delta/):
  * JSON-action replay — add/remove tombstones, last-metaData-wins schema,
  * partitionValues injection as typed columns. */
class DeltaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir(tag: String): File = {
    val f = new File(sys.props("java.io.tmpdir"),
      s"graft_delta_spec_${tag}_${System.nanoTime()}")
    f.mkdirs()
    f
  }

  test("replay applies removes: compacted files never resurface") {
    val dir = freshDir("rm")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    // v1 compaction: rewrite f0 as f1 (same rows) + add f2
    DeltaLake.writeDataFile(df, dir, "f1.parquet")
    DeltaLake.writeDataFile(Seq((4L, "d")).toDF("k", "s"), dir, "f2.parquet")
    DeltaLake.commit(dir, 1, Seq(DeltaLake.removeAction("f0.parquet"),
      DeltaLake.addAction("f1.parquet"), DeltaLake.addAction("f2.parquet")))
    val out = DeltaLake.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("partitionValues inject typed partition columns per file group") {
    val dir = freshDir("part")
    val full = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("v", "double").add("p", "integer")
    // data files carry only (k, v); p lives in the log
    DeltaLake.writeDataFile(Seq((1L, 1.5), (2L, 2.5)).toDF("k", "v"),
      dir, "p1.parquet")
    DeltaLake.writeDataFile(Seq((3L, 3.5)).toDF("k", "v"), dir, "p2.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(full, Seq("p")),
      DeltaLake.addAction("p1.parquet", Map("p" -> "10")),
      DeltaLake.addAction("p2.parquet", Map("p" -> "20"))))
    val out = DeltaLake.read(spark, dir.getPath)
    assert(out.schema.fieldNames.toSeq == Seq("k", "v", "p"))
    assert(out.schema("p").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val rows = out.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1L, 1.5, 10), (2L, 2.5, 10), (3L, 3.5, 20)))
    // a filter on the partition column folds to a constant per file group:
    // only p=20 files are scanned (one group remains)
    assert(out.filter(col("p") === 20).count() == 1)
  }

  test("last metaData wins: schema evolution adds a column") {
    val dir = freshDir("evo")
    val v0 = Seq((1L, "x")).toDF("k", "s")
    DeltaLake.writeDataFile(v0, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(v0.schema), DeltaLake.addAction("f0.parquet")))
    val widened = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("s", "string").add("extra", "double")
    val v1 = Seq((2L, "y", 9.5)).toDF("k", "s", "extra")
    DeltaLake.writeDataFile(v1, dir, "f1.parquet")
    DeltaLake.commit(dir, 1, Seq(DeltaLake.metaDataAction(widened),
      DeltaLake.addAction("f1.parquet")))
    val out = DeltaLake.read(spark, dir.getPath).orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).isNullAt(2)) // old file: null
    assert(out(1).getLong(0) == 2L && out(1).getDouble(2) == 9.5)
  }

  test("checkpoint seeds the snapshot after log retention deletes commits") {
    val dir = freshDir("ckpt")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    DeltaLake.writeDataFile(Seq((3L, "c")).toDF("k", "s"), dir, "f1.parquet")
    DeltaLake.commit(dir, 1, Seq(DeltaLake.addAction("f1.parquet")))
    val v = DeltaLake.writeCheckpoint(spark, dir)
    assert(v == 1L)
    // retention: delete every JSON commit the checkpoint covers — without
    // the checkpoint branch the reader would now find nothing
    val logDir = new File(dir, "_delta_log")
    logDir.listFiles().filter(_.getName.endsWith(".json"))
      .foreach(f => assert(f.delete()))
    // a post-checkpoint commit still replays on top of the seeded state
    DeltaLake.writeDataFile(Seq((4L, "d")).toDF("k", "s"), dir, "f2.parquet")
    DeltaLake.commit(dir, 2, Seq(DeltaLake.removeAction("f0.parquet"),
      DeltaLake.addAction("f2.parquet")))
    val out = DeltaLake.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(3L -> "c", 4L -> "d"))
  }

  test("filters push down to the parquet scan through the replay") {
    val dir = freshDir("push")
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    val plan = DeltaLake.read(spark, dir.getPath)
      .filter(org.apache.spark.sql.functions.col("k") > 90)
      .select("k")
      .queryExecution.executedPlan.toString
    // the replay hands plain parquet relations to Spark, so predicate
    // pushdown and column pruning reach the scan untouched
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,90)]"),
      plan)
    assert(plan.contains("ReadSchema: struct<k:bigint>"), plan)
  }

  test("multi-part checkpoints read as one seeded snapshot") {
    val dir = freshDir("ckpt_parts")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    // 3 separate add commits so the checkpoint has enough rows to split
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    DeltaLake.writeDataFile(Seq((4L, "d")).toDF("k", "s"), dir, "f1.parquet")
    DeltaLake.commit(dir, 1, Seq(DeltaLake.addAction("f1.parquet")))
    DeltaLake.writeDataFile(Seq((5L, "e")).toDF("k", "s"), dir, "f2.parquet")
    DeltaLake.commit(dir, 2, Seq(DeltaLake.addAction("f2.parquet")))
    assert(DeltaLake.writeCheckpoint(spark, dir, parts = 2) == 2L)
    val logDir = new File(dir, "_delta_log")
    assert(logDir.listFiles().count(
      _.getName.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
      == 2)
    logDir.listFiles().filter(_.getName.endsWith(".json"))
      .foreach(f => assert(f.delete()))
    val out = DeltaLake.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e"))
  }

  test("time travel: readVersion replays only up to the asked commit") {
    val dir = freshDir("tt")
    val df = Seq((1L, "a")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    DeltaLake.writeDataFile(Seq((2L, "b")).toDF("k", "s"), dir, "f1.parquet")
    DeltaLake.commit(dir, 1, Seq(DeltaLake.removeAction("f0.parquet"),
      DeltaLake.addAction("f1.parquet")))
    assert(DeltaLake.read(spark, dir.getPath)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(DeltaLake.readVersion(spark, dir.getPath, 0L)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // a checkpoint beyond the asked version falls back to a pure JSON
    // replay while commits 0..version all survive retention ...
    DeltaLake.writeCheckpoint(spark, dir)
    assert(DeltaLake.readVersion(spark, dir.getPath, 0L)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // ... and errors only once they are actually gone
    assert(new File(dir, "_delta_log/00000000000000000000.json").delete())
    intercept[IllegalArgumentException] {
      DeltaLake.readVersion(spark, dir.getPath, 0L)
    }
  }

  test("reader protocol guard: minReaderVersion > 1 errors, not wrong rows") {
    val dir = freshDir("protov3")
    val df = Seq((1L, "a")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    // a deletion-vector table advertises reader version 3 + features; a
    // version-1 reader replaying it would silently resurrect deleted rows
    DeltaLake.commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      DeltaLake.metaDataAction(df.schema),
      DeltaLake.addAction("f0.parquet")))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.read(spark, dir.getPath)
    }
    assert(e.getMessage.contains("minReaderVersion=3"), e.getMessage)
    assert(e.getMessage.contains("deletionVectors"), e.getMessage)
  }

  test("column-mapping tables are refused (names would misread)") {
    val dir = freshDir("colmap")
    val df = Seq((1L, "a")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema).replace(""""configuration":{}""",
        """"configuration":{"delta.columnMapping.mode":"name"}"""),
      DeltaLake.addAction("f0.parquet")))
    val e = intercept[IllegalArgumentException] {
      DeltaLake.read(spark, dir.getPath)
    }
    assert(e.getMessage.contains("columnMapping"), e.getMessage)
  }

  test("delta_scan / hudi_scan / iceberg_scan resolve in SQL text") {
    val ses = graft.api.SqlSession.wrap(spark)
    // delta
    val dd = freshDir("sqlscan")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dd, "f0.parquet")
    DeltaLake.commit(dd, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    val viaSql = ses.sql(
      s"SELECT count(*) AS n, sum(k) AS sk FROM delta_scan('${dd.getPath}')")
      .collect()(0)
    assert(viaSql.getLong(0) == 2L && viaSql.getLong(1) == 3L)
    // time travel argument + join with a plain view in the same text
    DeltaLake.writeDataFile(Seq((3L, "c")).toDF("k", "s"), dd, "f1.parquet")
    DeltaLake.commit(dd, 1, Seq(DeltaLake.addAction("f1.parquet")))
    assert(ses.sql(
      s"SELECT count(*) AS n FROM delta_scan('${dd.getPath}', 0)")
      .collect()(0).getLong(0) == 2L)
    // hudi
    val hd = freshDir("sqlscan_hudi")
    graft.ops.HudiCow.writeBaseFile(Seq((5L, "x")).toDF("k", "s"),
      hd, "", "g1", "001")
    graft.ops.HudiCow.completeCommit(hd, "001")
    assert(ses.sql(
      s"SELECT k FROM hudi_scan('${hd.getPath}')").collect()(0).getLong(0) == 5L)
    // a literal mentioning delta_scan must NOT rewrite
    val lit = ses.sql("SELECT 'use delta_scan(''/x'')' AS s").collect()(0)
    assert(lit.getString(0) == "use delta_scan('/x')")
  }

  test("insert appends atomically; partitioned inserts record values") {
    val dir = freshDir("ins")
    val full = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("s", "string").add("p", "integer")
    DeltaLake.writeDataFile(Seq((1L, "a")).toDF("k", "s"), dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(full, Seq("p")),
      DeltaLake.addAction("f0.parquet", Map("p" -> "10"))))
    // engine-side INSERT: two partitions in one atomic commit
    val v = DeltaLake.insert(spark, dir.getPath,
      Seq((2L, "b", 10), (3L, "c", 20)).toDF("k", "s", "p"))
    assert(v == 1L)
    val out = DeltaLake.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20)))
    // partition pruning still works over the inserted files
    assert(DeltaLake.read(spark, dir.getPath)
      .filter(col("p") === 20).count() == 1)
    // time travel: version 0 predates the insert
    assert(DeltaLake.readVersion(spark, dir.getPath, 0L).count() == 1)
    // a mismatched schema is rejected before anything writes
    intercept[IllegalArgumentException] {
      DeltaLake.insert(spark, dir.getPath, Seq((9L, 1.0)).toDF("k", "x"))
    }
    assert(DeltaLake.read(spark, dir.getPath).count() == 3)
  }

  test("insert writes a checkpoint every 10 commits (replay stays O(10))") {
    val dir = freshDir("ins_ckpt")
    val df = Seq((0L, "base")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    (1 to 9).foreach { i =>
      DeltaLake.insert(spark, dir.getPath, Seq((i.toLong, s"v$i")).toDF("k", "s"))
    }
    val logDir = new File(dir, "_delta_log")
    assert(logDir.listFiles().exists(
      _.getName == "00000000000000000009.checkpoint.parquet"))
    assert(DeltaLake.read(spark, dir.getPath).count() == 10)
    // the checkpoint is self-sufficient: retention may delete the commits
    logDir.listFiles().filter(_.getName.endsWith(".json"))
      .foreach(f => assert(f.delete()))
    assert(DeltaLake.read(spark, dir.getPath).count() == 10)
  }

  test("INSERT INTO delta_scan / iceberg_scan works in SQL text") {
    val ses = graft.api.SqlSession.wrap(spark)
    val dd = freshDir("sqlins")
    val df = Seq((1L, "a")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dd, "f0.parquet")
    DeltaLake.commit(dd, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    val r = ses.sql(
      s"INSERT INTO delta_scan('${dd.getPath}') SELECT 2, 'b'").collect()
    assert(r(0).getLong(0) == 1L) // landed row count
    assert(ses.sql(s"SELECT count(*) AS n FROM delta_scan('${dd.getPath}')")
      .collect()(0).getLong(0) == 2L)
    val id = freshDir("sqlins_ice")
    val a = graft.ops.IcebergTable.writeDataFile(
      Seq((1L, "x")).toDF("k", "s"), id, "a.parquet")
    graft.ops.IcebergTable.commitSnapshot(id, 1, 1L,
      Seq(graft.ops.IcebergTable.Entry(1, a)))
    assert(ses.sql(
      s"INSERT INTO iceberg_scan('${id.getPath}') SELECT 2, 'y'")
      .collect()(0).getLong(0) == 1L)
    assert(ses.sql(
      s"SELECT count(*) AS n FROM iceberg_scan('${id.getPath}')")
      .collect()(0).getLong(0) == 2L)
  }

  test("DELETE rewrites only the files holding matches; NULL keeps rows") {
    val dir = freshDir("del")
    val lo = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val hi = Seq((10L, "x"), (11L, null.asInstanceOf[String])).toDF("k", "s")
    DeltaLake.writeDataFile(lo, dir, "lo.parquet")
    DeltaLake.writeDataFile(hi, dir, "hi.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(lo.schema),
      DeltaLake.addAction("lo.parquet"), DeltaLake.addAction("hi.parquet")))
    // condition is NULL for k=11 (s is null): ANSI DELETE keeps that row
    val n = DeltaLake.delete(spark, dir.getPath, col("s") === "x")
    assert(n == 1L)
    val out = DeltaLake.read(spark, dir.getPath).orderBy("k")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 11L))
    // the untouched file survives VERBATIM (never rewritten): its add
    // action still names lo.parquet
    assert(new File(dir, "lo.parquet").isFile)
    val log1 = new String(java.nio.file.Files.readAllBytes(
      new File(dir, "_delta_log/00000000000000000001.json").toPath))
    assert(log1.contains(""""remove":{"path":"hi.parquet"""), log1)
    assert(!log1.contains("lo.parquet"), log1)
  }

  test("UPDATE evaluates SET against the pre-update row; partition col rejected") {
    val dir = freshDir("upd")
    val full = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("v", "long").add("p", "integer")
    DeltaLake.writeDataFile(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(full, Seq("p")),
      DeltaLake.addAction("f0.parquet", Map("p" -> "1"))))
    // SET k = v, v = k must swap (both read the PRE-update row)
    val n = DeltaLake.update(spark, dir.getPath, col("k") === 1L,
      Map("k" -> col("v"), "v" -> col("k")))
    assert(n == 1L)
    val out = DeltaLake.read(spark, dir.getPath).orderBy("v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((10L, 1L, 1), (2L, 20L, 1)))
    intercept[IllegalArgumentException] {
      DeltaLake.update(spark, dir.getPath, col("k") === 2L,
        Map("p" -> lit(9)))
    }
  }

  test("fully-removed table reads as empty with the declared schema") {
    val dir = freshDir("empty")
    val df = Seq((1L, "a")).toDF("k", "s")
    DeltaLake.writeDataFile(df, dir, "f0.parquet")
    DeltaLake.commit(dir, 0, Seq(DeltaLake.protocolAction,
      DeltaLake.metaDataAction(df.schema), DeltaLake.addAction("f0.parquet")))
    DeltaLake.commit(dir, 1, Seq(DeltaLake.removeAction("f0.parquet")))
    val out = DeltaLake.read(spark, dir.getPath)
    assert(out.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(out.count() == 0)
  }
}
