package graft

import java.io.File
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{HudiCow, HudiMor}

/** Minimal Hudi CoW snapshot reader (ops/HudiCow.scala; reference
  * presto-hudi/ HudiSplitManager latest-base-file-per-file-group rule):
  * newest COMPLETED slice per file group wins; inflight instants stay
  * invisible; partition dirs walk recursively. */
class HudiSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir(tag: String): File = {
    val f = new File(sys.props("java.io.tmpdir"),
      s"graft_hudi_spec_${tag}_${System.nanoTime()}")
    f.mkdirs()
    f
  }

  test("latest committed slice per file group wins; inflight invisible") {
    val dir = freshDir("slices")
    HudiCow.writeBaseFile(Seq((1L, "old"), (2L, "old")).toDF("k", "s"),
      dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    // CoW rewrite of g1 (row 2 updated, row 1 kept) + a new group g2
    HudiCow.writeBaseFile(Seq((1L, "old"), (2L, "new")).toDF("k", "s"),
      dir, "", "g1", "002")
    HudiCow.writeBaseFile(Seq((3L, "g2")).toDF("k", "s"), dir, "", "g2", "002")
    HudiCow.completeCommit(dir, "002")
    // an inflight compaction writes g1@003 — must not be read
    HudiCow.writeBaseFile(Seq((9L, "BAD")).toDF("k", "s"),
      dir, "", "g1", "003")
    HudiCow.inflightCommit(dir, "003")
    val out = HudiCow.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "old", 2L -> "new", 3L -> "g2"))
  }

  test("file groups resolve per partition directory") {
    val dir = freshDir("parts")
    HudiCow.writeBaseFile(Seq((1L, "us")).toDF("k", "r"),
      dir, "region=us", "g1", "001")
    HudiCow.writeBaseFile(Seq((2L, "eu")).toDF("k", "r"),
      dir, "region=eu", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    // same fileId name in a DIFFERENT partition is a different group:
    // rewriting region=us/g1 must not shadow region=eu/g1
    HudiCow.writeBaseFile(Seq((1L, "us-v2")).toDF("k", "r"),
      dir, "region=us", "g1", "002")
    HudiCow.completeCommit(dir, "002")
    val out = HudiCow.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "us-v2", 2L -> "eu"))
  }

  test("time travel: readAt(instant) hides later commits") {
    val dir = freshDir("tt")
    HudiCow.writeBaseFile(Seq((1L, "v1")).toDF("k", "s"), dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiCow.writeBaseFile(Seq((1L, "v2")).toDF("k", "s"), dir, "", "g1", "002")
    HudiCow.writeBaseFile(Seq((2L, "v2")).toDF("k", "s"), dir, "", "g2", "002")
    HudiCow.completeCommit(dir, "002")
    assert(HudiCow.read(spark, dir.getPath).count() == 2)
    val old = HudiCow.readAt(spark, dir.getPath, "001")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(old.toSeq == Seq(1L -> "v1"))
  }

  test("a table with only uncommitted instants refuses to read") {
    val dir = freshDir("none")
    HudiCow.writeBaseFile(Seq((1L, "x")).toDF("k", "s"), dir, "", "g1", "001")
    HudiCow.inflightCommit(dir, "001")
    intercept[IllegalArgumentException] {
      HudiCow.read(spark, dir.getPath)
    }
  }

  private val logSchema = new org.apache.spark.sql.types.StructType()
    .add("k", "long").add("s", "string")

  test("MoR: log upserts and deletes merge over the base file") {
    val dir = freshDir("mor")
    HudiCow.writeProperties(dir, "MERGE_ON_READ", "k")
    HudiCow.writeBaseFile(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiMor.writeLogFile(dir, "", "g1", "001", 1, Seq(
      HudiMor.DataBlock("002", Seq(Row(2L, "B2"), Row(4L, "d")), logSchema),
      HudiMor.DeleteBlock("003", Seq("3"))))
    HudiCow.completeDeltaCommit(dir, "002")
    HudiCow.completeDeltaCommit(dir, "003")
    val out = HudiCow.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "a", 2L -> "B2", 4L -> "d"))
  }

  test("MoR: blocks of uncommitted instants stay invisible; re-insert wins") {
    val dir = freshDir("mor_vis")
    HudiCow.writeProperties(dir, "MERGE_ON_READ", "k")
    HudiCow.writeBaseFile(Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiMor.writeLogFile(dir, "", "g1", "001", 1, Seq(
      HudiMor.DeleteBlock("002", Seq("2")),
      // a later delta commit re-inserts key 2: latest instant wins
      HudiMor.DataBlock("003", Seq(Row(2L, "back")), logSchema),
      // instant 004 never completed: its block must not be read
      HudiMor.DataBlock("004", Seq(Row(9L, "BAD")), logSchema)))
    HudiCow.completeDeltaCommit(dir, "002")
    HudiCow.completeDeltaCommit(dir, "003")
    val out = HudiCow.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "a", 2L -> "back"))
  }

  test("MoR: compaction supersedes the old slice's log files") {
    val dir = freshDir("mor_compact")
    HudiCow.writeProperties(dir, "MERGE_ON_READ", "k")
    HudiCow.writeBaseFile(Seq((1L, "a")).toDF("k", "s"), dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiMor.writeLogFile(dir, "", "g1", "001", 1, Seq(
      HudiMor.DataBlock("002", Seq(Row(1L, "amended")), logSchema)))
    HudiCow.completeDeltaCommit(dir, "002")
    assert(HudiCow.read(spark, dir.getPath).collect()
      .map(_.getString(1)).toSeq == Seq("amended"))
    // compaction at 003 folds the log into a new base; the old slice's
    // log must no longer apply on top of it
    HudiCow.writeBaseFile(Seq((1L, "compacted")).toDF("k", "s"),
      dir, "", "g1", "003")
    HudiCow.completeCommit(dir, "003")
    assert(HudiCow.read(spark, dir.getPath).collect()
      .map(_.getString(1)).toSeq == Seq("compacted"))
  }

  test("MoR: merge is partition-scoped — same key in two partitions is two records") {
    val dir = freshDir("mor_parts")
    HudiCow.writeProperties(dir, "MERGE_ON_READ", "k")
    // Hudi's default (non-global) index: key 1 exists independently in
    // region=us and region=eu; an update in us must not shadow eu
    HudiCow.writeBaseFile(Seq((1L, "us-v1")).toDF("k", "s"),
      dir, "region=us", "g1", "001")
    HudiCow.writeBaseFile(Seq((1L, "eu-v1")).toDF("k", "s"),
      dir, "region=eu", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiMor.writeLogFile(dir, "region=us", "g1", "001", 1, Seq(
      HudiMor.DataBlock("002", Seq(Row(1L, "us-v2")), logSchema)))
    HudiCow.completeDeltaCommit(dir, "002")
    val out = HudiCow.read(spark, dir.getPath).orderBy("s")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "eu-v1", 1L -> "us-v2"))
  }

  test("read-optimized query: base files only, logs skipped on MoR") {
    val dir = freshDir("ro")
    HudiCow.writeProperties(dir, "MERGE_ON_READ", "k")
    HudiCow.writeBaseFile(Seq((1L, "a"), (2L, "b")).toDF("k", "s"),
      dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiMor.writeLogFile(dir, "", "g1", "001", 1, Seq(
      HudiMor.DataBlock("002", Seq(Row(2L, "B2"), Row(3L, "c")), logSchema)))
    HudiCow.completeDeltaCommit(dir, "002")
    // snapshot sees the merged view; read-optimized the base only
    assert(HudiCow.read(spark, dir.getPath).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "a", 2L -> "B2", 3L -> "c"))
    assert(HudiCow.readOptimized(spark, dir.getPath).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "a", 2L -> "b"))
    // SQL surface: '#ro' suffix
    val ses = graft.api.SqlSession.wrap(spark)
    assert(ses.sql(s"SELECT count(*) AS n FROM hudi_scan(" +
      s"'${dir.getPath}#ro')").collect()(0).getLong(0) == 2L)
  }

  test("table-type guard: unknown types and missing key field error") {
    val dir = freshDir("guard")
    HudiCow.writeBaseFile(Seq((1L, "x")).toDF("k", "s"), dir, "", "g1", "001")
    HudiCow.completeCommit(dir, "001")
    HudiCow.writeProperties(dir, "MERGE_ON_READ") // no record key field
    val e1 = intercept[IllegalArgumentException] {
      HudiCow.read(spark, dir.getPath)
    }
    assert(e1.getMessage.contains("recordkey"), e1.getMessage)
    HudiCow.writeProperties(dir, "BOGUS_TYPE", "k")
    val e2 = intercept[IllegalArgumentException] {
      HudiCow.read(spark, dir.getPath)
    }
    assert(e2.getMessage.contains("hoodie.table.type=BOGUS_TYPE"),
      e2.getMessage)
  }
}
