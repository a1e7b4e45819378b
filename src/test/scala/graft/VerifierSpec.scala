package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Verifier

/** The verifier checksum must be order-independent (XOR + sums commute)
  * and value-sensitive — the two properties the reference's
  * ChecksumValidator relies on to compare production result sets without
  * shipping them. */
class VerifierSpec extends AnyFunSuite {
  import TestSpark._

  private def li = Tables(spark, sf, "lineitem")
    .select("l_orderkey", "l_returnflag", "l_quantity")

  test("checksum is invariant under row order and partitioning") {
    val a = Verifier.checksum(li).collect()(0)
    val b = Verifier.checksum(li.orderBy(desc("l_quantity"))).collect()(0)
    val c = Verifier.checksum(li.repartition(17)).collect()(0)
    assert(a == b && a == c)
  }

  test("checksum detects a single changed value") {
    val base = Verifier.checksum(li).collect()(0)
    val perturbed = li.withColumn("l_returnflag",
      when(col("l_orderkey") === 7, lit("Z")).otherwise(col("l_returnflag")))
    val p = Verifier.checksum(perturbed).collect()(0)
    assert(base != p)
    // only the perturbed column's checksum moved
    assert(base.getAs[Long]("l_returnflag_checksum") !=
      p.getAs[Long]("l_returnflag_checksum"))
    assert(base.getAs[Long]("l_orderkey_checksum") ==
      p.getAs[Long]("l_orderkey_checksum"))
    assert(base.getAs[Double]("l_quantity_sum") ==
      p.getAs[Double]("l_quantity_sum"))
  }

  test("checksum detects a dropped row that count alone sees too") {
    val base = Verifier.checksum(li).collect()(0)
    val dropped = Verifier.checksum(li.filter(col("l_orderkey") =!= 7))
      .collect()(0)
    assert(base.getAs[Long]("n_rows") != dropped.getAs[Long]("n_rows"))
    assert(base.getAs[Long]("l_orderkey_checksum") !=
      dropped.getAs[Long]("l_orderkey_checksum"))
  }
}
