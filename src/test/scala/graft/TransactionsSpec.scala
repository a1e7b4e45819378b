package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.SqlSession
import graft.ops.{SnapshotTable, Transactions}

/** START TRANSACTION / COMMIT / ROLLBACK over managed snapshot tables
  * (ops/Transactions.scala) — reference task semantics + error texts. */
class TransactionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def base(n: String) = new java.io.File(s"/tmp/graft_test/tx_$n")
  private def fresh(n: String, rows: Seq[Long]): java.io.File = {
    val b = base(n)
    if (Transactions.inTransaction(spark)) Transactions.rollback(spark)
    SnapshotTable.drop(b)
    SnapshotTable.write(spark, b, rows.toDF("id"))
    b
  }
  private def ids(b: java.io.File): Seq[Long] =
    SnapshotTable.read(spark, b).collect().map(_.getLong(0)).sorted.toSeq

  test("rollback discards staged writes; commit publishes them") {
    val b = fresh("rb", 1L to 10L)
    val q = SqlSession.wrap(spark)
    q.sql("START TRANSACTION")
    Transactions.delete(spark, b, col("id") > 5)
    assert(Transactions.read(spark, b).count() == 5) // read-your-writes
    assert(ids(b) == (1L to 10L)) // uncommitted: invisible outside
    q.sql("ROLLBACK")
    assert(ids(b) == (1L to 10L))
    assert(SnapshotTable.currentVersion(b).contains(1))

    q.sql("START TRANSACTION")
    Transactions.delete(spark, b, col("id") > 5)
    Transactions.update(spark, b, Seq("id" -> (col("id") + 100)), col("id") === 1)
    q.sql("COMMIT")
    assert(ids(b) == Seq(2L, 3L, 4L, 5L, 101L))
  }

  test("reference error texts: nested, no-transaction, read-only write") {
    val b = fresh("err", 1L to 3L)
    val q = SqlSession.wrap(spark)
    assert(intercept[IllegalStateException] { q.sql("COMMIT") }
      .getMessage == "No transaction in progress")
    assert(intercept[IllegalStateException] { q.sql("ROLLBACK WORK") }
      .getMessage == "No transaction in progress")
    q.sql("START TRANSACTION READ ONLY")
    assert(intercept[IllegalStateException] { q.sql("START TRANSACTION") }
      .getMessage == "Nested transactions not supported")
    assert(intercept[IllegalStateException] {
      Transactions.delete(spark, b, col("id") > 1)
    }.getMessage == "Cannot execute write in a read-only transaction")
    assert(Transactions.read(spark, b).count() == 3) // reads still fine
    q.sql("COMMIT") // empty read-only commit succeeds
  }

  test("conflicting outside commit rolls the transaction back") {
    val b = fresh("cf", 1L to 8L)
    val q = SqlSession.wrap(spark)
    q.sql("START TRANSACTION")
    Transactions.delete(spark, b, col("id") > 4)
    // another "session": auto-commit write moves the table forward
    SnapshotTable.delete(spark, b, col("id") === 1)
    val e = intercept[java.util.ConcurrentModificationException] { q.sql("COMMIT") }
    assert(e.getMessage.contains("during transaction"))
    assert(!Transactions.inTransaction(spark))
    assert(ids(b) == (2L to 8L)) // the outside write won; tx fully discarded
  }

  test("repeatable reads: pin survives an outside commit") {
    val b = fresh("rr", 1L to 6L)
    val q = SqlSession.wrap(spark)
    q.sql("START TRANSACTION ISOLATION LEVEL REPEATABLE READ")
    assert(Transactions.read(spark, b).count() == 6) // pins v1
    SnapshotTable.delete(spark, b, col("id") > 3) // outside commit → v2
    assert(Transactions.read(spark, b).count() == 6) // still the pinned snapshot
    assert(SnapshotTable.read(spark, b).count() == 3)
    q.sql("ROLLBACK")
    assert(Transactions.read(spark, b).count() == 3) // back to committed view
  }
}
