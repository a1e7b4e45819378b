package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.rules.ArrayContainsJoin

/** rules/ArrayContainsJoin.scala — the reference's
  * CrossJoinWithArrayContainsToInnerJoin contract: contains(arr, key)
  * join predicates become equi-joins over the unnested distinct array. */
class ArrayContainsJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    if (!prev.contains(ArrayContainsJoin))
      spark.experimental.extraOptimizations = prev :+ ArrayContainsJoin
    body
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("duplicate array elements still yield one row per pair") {
    withRule {
      val left = spark.range(3).select(col("id").as("lid"),
        array(col("id").cast("int"), col("id").cast("int"),
          lit(2), lit(2)).as("arr"))
      val right = spark.range(5).select(col("id").cast("int").as("rid"))
      val q = left.crossJoin(right)
        .filter(array_contains(col("arr"), col("rid")))
        .select("lid", "rid")
      assert(!planOf(q).contains("NestedLoop") && !planOf(q).contains("Cartesian"))
      val rows = q.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(rows == Seq((0L, 0), (0L, 2), (1L, 1), (1L, 2), (2L, 2)))
    }
  }

  test("mirrored orientation: array on the right, key on the left") {
    withRule {
      val left = spark.range(4).select(col("id").cast("int").as("k"))
      val right = spark.range(2).select(col("id").as("rid"),
        array(col("id").cast("int"), lit(3)).as("arr"))
      val q = left.crossJoin(right)
        .filter(array_contains(col("arr"), col("k")))
        .select("k", "rid")
      assert(!planOf(q).contains("NestedLoop") && !planOf(q).contains("Cartesian"))
      val rows = q.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      assert(rows == Seq((0, 0L), (1, 1L), (3, 0L), (3, 1L)))
    }
  }

  test("same-side contains is NOT rewritten") {
    withRule {
      val left = spark.range(3).select(col("id").as("lid"),
        array(col("id").cast("int")).as("arr"),
        col("id").cast("int").as("lkey"))
      val right = spark.range(2).select(col("id").as("rid"))
      // contains references only the LEFT side — not a join predicate shape
      val q = left.crossJoin(right)
        .filter(array_contains(col("arr"), col("lkey")))
        .select("lid", "rid")
      assert(q.count() == 6) // all pairs survive; rewrite must not fire
    }
  }

  test("LEFT join with the array on the right rewrites and preserves rows") {
    withRule {
      val left = spark.range(5).select(col("id").cast("int").as("k"))
      val right = spark.range(2).select(col("id").as("rid"),
        array(col("id").cast("int"), lit(3)).as("arr"))
      val q = left.join(right,
        array_contains(col("arr"), col("k")), "left_outer")
        .select("k", "rid")
      assert(!planOf(q).contains("NestedLoop") && !planOf(q).contains("Cartesian"))
      val rows = q.collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sorted.toSeq
      // k=0 matches rid 0; k=1 matches rid 1; k=3 matches both; k=2,4 none
      assert(rows == Seq((0, 0L), (1, 1L), (2, -1L), (3, 0L), (3, 1L), (4, -1L)))
    }
  }

  test("LEFT join with the array on the PRESERVED side is NOT rewritten") {
    withRule {
      val left = spark.range(3).select(col("id").as("lid"),
        array(col("id").cast("int")).as("arr"))
      val right = spark.range(2).select(col("id").cast("int").as("rid"))
      val q = left.join(right,
        array_contains(col("arr"), col("rid")), "left_outer")
        .select("lid", "rid")
      // exploding the preserved side would duplicate it — must nested-loop
      assert(planOf(q).contains("NestedLoop") || planOf(q).contains("Cartesian"))
      val rows = q.collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .sorted.toSeq
      assert(rows == Seq((0L, 0), (1L, 1), (2L, -1)))
    }
  }

  test("extra conjuncts are preserved") {
    withRule {
      val left = spark.range(3).select(col("id").as("lid"),
        array(col("id").cast("int"), lit(9)).as("arr"))
      val right = spark.range(10).select(col("id").cast("int").as("rid"))
      val q = left.crossJoin(right)
        .filter(array_contains(col("arr"), col("rid")) && col("rid") < 9 &&
          col("lid") > 0)
      val rows = q.select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(rows == Seq((1L, 1), (2L, 2)))
    }
  }
}
