package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for operator compositions that rewrite a reference
  * feature Spark lacks — verified against hand-computed cases (the
  * reference's operator-unit-test pattern, e.g. presto-main-base/src/test/
  * java/com/facebook/presto/operator/TestWindowOperator.java). */
class OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("GROUPS frame rewrite (dense_rank + RANGE) matches hand computation") {
    import spark.implicits._
    // partition "a": values 1,1,2,3,3 — peer groups {1,1},{2},{3,3}
    // GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING sums:
    //  rows of group1: 1+1+2           = 4
    //  row  of group2: 1+1+2+3+3      = 10
    //  rows of group3: 2+3+3          = 8
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("a", 3), ("a", 3))
      .toDF("p", "x")
    val wOrd = Window.partitionBy("p").orderBy(asc("x"))
    val wGroups = Window.partitionBy("p").orderBy(asc("dr")).rangeBetween(-1, 1)
    val got = df.withColumn("dr", dense_rank().over(wOrd))
      .select(col("x"), sum("x").over(wGroups).as("s"))
      .orderBy("x").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 4L), (1, 4L), (2, 10L), (3, 8L), (3, 8L)))
  }

  test("sequence TVF explodes with correct ordinality arithmetic") {
    val r = ops.Relational.tvfSequence(spark, sf).collect()
    // nation key k → sequence 1..k+1: n=k+1, total=(k+1)(k+2)/2, max_ord=k
    for (row <- r) {
      val k = row.getAs[Number](0).longValue()
      assert(row.getLong(1) == k + 1)
      assert(row.getLong(2) == (k + 1) * (k + 2) / 2)
      assert(row.getLong(3) == k)
    }
  }

  test("merge-hint join plans as SortMergeJoin, bucketed join plans no exchange") {
    val smj = ops.Relational.joinMergeSorted(spark, sf)
    val plan = smj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
  }

  test("unique-id assignment is globally unique across partitions") {
    val r = ops.Relational.uniqueId(spark, sf).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
  }

  test("deterministic reservoir picks are stable across runs") {
    val a = ops.Aggregates.reservoir(spark, sf).collect().toSeq
    val b = ops.Aggregates.reservoir(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("filters and projections are pushed into the parquet scan") {
    val plan = ops.Relational.scanProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(p_size,40"), s"no pushdown in:\n$plan")
    // column pruning: only the 3 projected columns reach the scan
    assert(plan.contains("ReadSchema") && !plan.contains("p_retailprice"),
      s"scan reads unprojected columns:\n$plan")
  }

  test("per-group top-k plans as WindowGroupLimit (heap, not full sort)") {
    val plan = ops.Windows.topnRownum(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no group-limit in:\n$plan")
  }

  test("small dimension joins broadcast instead of shuffling") {
    val plan = ops.Relational.joinInner(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("bucketed tables join with zero exchanges") {
    import org.apache.spark.sql.functions.col
    ops.Sources.bucketedJoin(spark, sf).collect() // materialize bucketed tables
    // force the big×big path (at test scale the planner would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("builtin skewness/kurtosis agree with the gate's two-pass formula") {
    import org.apache.spark.sql.functions._
    // agg_skew_kurt pins cross-engine arithmetic to the two-pass centered
    // formula; this guards that Spark's one-pass builtins compute the same
    // statistic (population central moments) to float tolerance.
    val builtin = spark.read.parquet(s"$sf/supplier.parquet")
      .groupBy("s_nationkey")
      .agg(skewness(col("s_acctbal")).as("bs"), kurtosis(col("s_acctbal")).as("bk"))
    val pinned = ops.Aggregates.skewKurt(spark, sf)
      .withColumnRenamed("skew", "ps").withColumnRenamed("kurt", "pk")
    val joined = builtin.join(pinned, "s_nationkey").collect()
    assert(joined.nonEmpty)
    for (r <- joined; (b, p) <- Seq(("bs", "ps"), ("bk", "pk"))) {
      val bv = Option(r.getAs[Any](b)).map(_.asInstanceOf[Double])
      val pv = Option(r.getAs[Any](p)).map(_.asInstanceOf[Double])
      (bv, pv) match {
        case (Some(x), Some(y)) if !x.isNaN =>
          assert(math.abs(x - y) < 1e-3, s"nation ${r.get(0)}: $b=$x vs $p=$y")
        case _ => // constant group: builtin NaN/NULL ↔ pinned NULL
      }
    }
  }
}
