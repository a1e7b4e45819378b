package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.IcebergTable
import graft.ops.IcebergTable.Entry

/** Minimal Iceberg v1 snapshot reader (ops/IcebergTable.scala; reference
  * presto-iceberg/): version-hint → metadata.json → manifest-list avro →
  * manifest avro → data files, with DELETED (status 2) entries skipped
  * and older snapshots invisible. */
class IcebergSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir(tag: String): File = {
    val f = new File(sys.props("java.io.tmpdir"),
      s"graft_iceberg_spec_${tag}_${System.nanoTime()}")
    f.mkdirs()
    f
  }

  test("current snapshot resolves through the avro manifest chain") {
    val dir = freshDir("chain")
    val a = IcebergTable.writeDataFile(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir, "a.parquet")
    IcebergTable.commitSnapshot(dir, 1, 10L, Seq(Entry(1, a)))
    val out = IcebergTable.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "a", 2L -> "b"))
  }

  test("DELETED manifest entries are tombstones; new snapshot wins") {
    val dir = freshDir("del")
    val a = IcebergTable.writeDataFile(
      Seq((1L, "old"), (2L, "old")).toDF("k", "s"), dir, "a.parquet")
    IcebergTable.commitSnapshot(dir, 1, 10L, Seq(Entry(1, a)))
    // snapshot 2: a replaced by b (rewrite), c appended; a's tombstone
    // rides in the same manifest, as a real Iceberg commit writes it
    val b = IcebergTable.writeDataFile(
      Seq((1L, "new"), (2L, "new")).toDF("k", "s"), dir, "b.parquet")
    val c = IcebergTable.writeDataFile(
      Seq((3L, "c")).toDF("k", "s"), dir, "c.parquet")
    IcebergTable.commitSnapshot(dir, 2, 20L,
      Seq(Entry(2, a), Entry(1, b), Entry(1, c)))
    val out = IcebergTable.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "new", 2L -> "new", 3L -> "c"))
  }

  test("v2 positional deletes anti-join rows out by (file, row_index)") {
    val dir = freshDir("v2del")
    val a = IcebergTable.writeDataFile(
      (0L to 9L).map(i => (i, s"r$i")).toDF("k", "s")
        .orderBy("k"), dir, "a.parquet")
    val b = IcebergTable.writeDataFile(
      Seq((100L, "other")).toDF("k", "s"), dir, "b.parquet")
    // delete rows 1, 3, 8 of a.parquet only — b stays whole
    val d = IcebergTable.writeDeleteFile(spark, dir, "d.parquet",
      Seq((a, 1L), (a, 3L), (a, 8L)))
    IcebergTable.commitSnapshot(dir, 1, 10L, Seq(Entry(1, a), Entry(1, b),
      Entry(1, d, content = 1)))
    val out = IcebergTable.read(spark, dir.getPath).orderBy("k")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 2L, 4L, 5L, 6L, 7L, 9L, 100L))
  }

  test("time travel: readAt sees an old snapshot; metadata tables answer") {
    val dir = freshDir("tt")
    val a = IcebergTable.writeDataFile(
      Seq((1L, "v1")).toDF("k", "s"), dir, "a.parquet")
    IcebergTable.commitSnapshot(dir, 1, 10L, Seq(Entry(1, a)))
    val b = IcebergTable.writeDataFile(
      Seq((1L, "v2"), (2L, "v2")).toDF("k", "s"), dir, "b.parquet")
    IcebergTable.commitSnapshot(dir, 2, 20L, Seq(Entry(2, a), Entry(1, b)))
    // current = snapshot 20; snapshot 10 still reads via time travel
    assert(IcebergTable.read(spark, dir.getPath).count() == 2)
    val old = IcebergTable.readAt(spark, dir.getPath, 10L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(old.toSeq == Seq(1L -> "v1"))
    val snaps = IcebergTable.snapshots(spark, dir.getPath)
      .orderBy("snapshot_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(snaps.toSeq == Seq(10L -> false, 20L -> true))
    val files = IcebergTable.files(spark, dir.getPath)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(files.toSeq == Seq(0 -> "data/b.parquet"))
  }

  test("v2 equality deletes anti-join on the delete file's columns") {
    val dir = freshDir("eqdel")
    val a = IcebergTable.writeDataFile(
      Seq((1L, "us"), (2L, "eu"), (3L, "us"), (4L, "ap"))
        .toDF("k", "region"), dir, "a.parquet")
    // equality fields = (region): every 'us' row is deleted
    val d = IcebergTable.writeDataFile(
      Seq("us").toDF("region"), dir, "d.parquet")
    IcebergTable.commitSnapshot(dir, 1, 10L,
      Seq(Entry(1, a), Entry(1, d, content = 2)))
    val out = IcebergTable.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(2L -> "eu", 4L -> "ap"))
  }

  test("EXISTING entries (status 0) keep carried-forward files visible") {
    val dir = freshDir("exist")
    val a = IcebergTable.writeDataFile(
      Seq((1L, "keep")).toDF("k", "s"), dir, "a.parquet")
    IcebergTable.commitSnapshot(dir, 1, 10L, Seq(Entry(1, a)))
    val b = IcebergTable.writeDataFile(
      Seq((2L, "add")).toDF("k", "s"), dir, "b.parquet")
    IcebergTable.commitSnapshot(dir, 2, 20L,
      Seq(Entry(0, a), Entry(1, b)))
    val out = IcebergTable.read(spark, dir.getPath).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "keep", 2L -> "add"))
  }
}
