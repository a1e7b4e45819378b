package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HudiCow

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
}
