package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** zorder (functions/ZOrder.scala) + the z-clustered layout writer
  * (ops/Layout.scala). */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("key order is order-preserving per column and total over nulls") {
    val df = Seq(
      (Long.MinValue, 0L), (-1L, 0L), (0L, 0L), (1L, 0L), (Long.MaxValue, 0L))
      .toDF("a", "b")
      .select(hex(Layout.zorderKey(col("a"), col("b"))).as("z"))
    val zs = df.collect().map(_.getString(0))
    assert(zs.toSeq == zs.sorted.toSeq, "bigint order must survive encoding")

    val doubles = Seq(
      Double.NegativeInfinity, -1.5, -0.0, 0.0, 2.5, Double.PositiveInfinity)
    val dz = doubles.map(d => Tuple1(d)).toDF("d")
      .select(hex(Layout.zorderKey(col("d"), lit(0L)))).collect().map(_.getString(0))
    assert(dz.toSeq == dz.sorted.toSeq, "double order must survive encoding")
    assert(dz(2) < dz(3), "-0.0 sorts before +0.0 (IEEE total order)")
  }

  test("z-ordered layout bounds BOTH dimensions; linear sort only one") {
    val n = 4096
    val data = spark.range(n)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        col("id").as("payload"))
    val zpath = "/tmp/graft_test/zorder_layout"
    val lpath = "/tmp/graft_test/linear_layout"
    Layout.writeZOrdered(data, Seq(col("x"), col("y")), zpath, 16)
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(lpath)

    def avgYExtent(path: String): Double = {
      val boxes = Layout.fileBoxes(spark, path, "x", "y")
        .select((col("ymax") - col("ymin")).cast("double").as("ey"))
        .agg(avg("ey")).head.getDouble(0)
      boxes
    }
    val zy = avgYExtent(zpath)
    val ly = avgYExtent(lpath)
    // linear x-sort leaves y unconstrained (~full 0..63 range per file);
    // the z-curve must cut the per-file y-extent at least in half
    assert(ly > 40.0, s"x-sorted layout should span y (got $ly)")
    assert(zy < ly / 2.0, s"z-order must bound y too (z=$zy linear=$ly)")
  }

  test("SQL name rejects unsupported types") {
    val e = intercept[Exception] {
      graft.api.SqlSession.wrap(spark)
        .sql("SELECT zorder(named_struct('a', array(1, 2)))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("zorder"))
  }
}
