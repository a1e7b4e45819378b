package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cdc

/** apply_changelog (functions/ApplyChangelog.scala) — the reference's
  * ChangelogRecord.merge contract: max ordinal wins; equal-ordinal
  * INSERT/UPDATE_AFTER replaces unless the held record is an INSERT
  * (error); equal-ordinal UPDATE_BEFORE/DELETE is dropped; final DELETE
  * evaluates to NULL. */
class CdcSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fold(rows: Seq[(Long, Long, String, String)]) =
    Cdc.applyChangelog(
      rows.toDF("k", "ord", "op", "payload")
        .withColumn("rec", struct(col("payload")))
        .repartition(7), // force partial states + merge
      Seq("k"), "ord", "op", "rec")
      .select(col("k"), col("row.payload").as("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap

  test("max ordinal wins; delete folds to NULL; empty-op rows merge") {
    val out = fold(Seq(
      (1L, 1L, "INSERT", "a"), (1L, 3L, "UPDATE_AFTER", "c"),
      (1L, 2L, "UPDATE_BEFORE", "a"),
      (2L, 1L, "INSERT", "x"), (2L, 2L, "DELETE", "x"),
      (3L, 5L, "INSERT", "only")))
    assert(out == Map(1L -> "c", 2L -> null, 3L -> "only"))
  }

  test("equal ordinal: UPDATE_AFTER replaces non-insert, pre-images dropped") {
    val out = fold(Seq(
      (1L, 2L, "UPDATE_BEFORE", "old"), (1L, 2L, "UPDATE_AFTER", "new"),
      (2L, 4L, "UPDATE_AFTER", "kept"), (2L, 4L, "DELETE", "dropped")))
    assert(out(1L) == "new")
    assert(out(2L) == "kept")
  }

  test("two inserts at one ordinal are unresolvable") {
    val e = intercept[org.apache.spark.SparkException] {
      fold(Seq((1L, 1L, "INSERT", "a"), (1L, 1L, "INSERT", "b")))
    }
    assert(e.getMessage.contains("unresolvable") ||
      Option(e.getCause).exists(_.getMessage.contains("unresolvable")))
  }

  test("unsupported operation raises") {
    val e = intercept[org.apache.spark.SparkException] {
      fold(Seq((1L, 1L, "INSERT", "a"), (1L, 1L, "UPSERT", "b")))
    }
    assert(e.getMessage.contains("unsupported operation") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported operation")))
  }
}
