package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the three AQE behaviors SURVEY §4 leans on for the 100 TB story
  * (the reference's runtime adaptivity analogues: RuntimeReorderJoinSides,
  * skew handling, exchange sizing) — claims that were previously asserted
  * by citation only:
  *   1. a skewed sort-merge join splits the hot partition (skew=true),
  *   2. small shuffles coalesce to fewer partitions than configured,
  *   3. a statically-unbroadcastable join converts to broadcast at
  *      runtime once actual sizes are known.
  */
class AqeSpec extends AnyFunSuite {
  import TestSpark._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.shuffle.partitions" -> "8") {
      // 150k rows, 80% on one key, fat payload -> one hot shuffle partition
      val left = spark.range(150000L).toDF("i")
        .select(when(col("i") % 5 < 4, lit(0L)).otherwise(col("i") % 100)
          .as("k"), repeat(md5(col("i").cast("string")), 3).as("pad"))
      val right = spark.range(100L).toDF("k")
        .withColumn("v", col("k") * 2)
      val j = left.join(right, "k")
      // drive THIS plan (count() builds a different query; the inspected
      // one would stay isFinalPlan=false)
      assert(j.queryExecution.toRdd.count() == 150000L)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew split in final plan:\n${finalPlan.take(2000)}")
    }
  }

  test("AQE coalesces a small shuffle below the configured partitions") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "32") {
      val agg = Tables(spark, sf, "nation")
        .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
      val parts = agg.queryExecution.toRdd.getNumPartitions
      assert(parts < 32, s"expected coalesced read, got $parts partitions")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"), plan.take(1500))
    }
  }

  test("AQE converts a statically-unbroadcastable join to broadcast at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // never statically
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10MB",
      "spark.sql.shuffle.partitions" -> "8") {
      val fact = Tables(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity")
      val dim = Tables(spark, sf, "orders")
        .filter(col("o_orderkey") < 50).select("o_orderkey")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      j.queryExecution.toRdd.count()
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"join not converted:\n${finalPlan.take(2000)}")
    }
  }
}
