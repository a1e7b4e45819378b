package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Spill evidence — the reference spills join builds, group-bys, sorts,
  * topNs and windows to disk under memory pressure (GenericSpiller.java,
  * FileSingleStreamSpiller.java; HashBuilderOperator 72 spill refs,
  * OrderByOperator 46). Spark's equivalents (UnsafeExternalSorter,
  * spillable HashAggregateExec) are built in; at 100 TB they are what
  * stands between a skewed task and an OOM. This artifact PROVES they
  * engage on this engine's plans instead of assuming it: a deliberately
  * memory-starved session (spark.memory.fraction=0.05, 4 fat shuffle
  * partitions) runs a global sort and a wide high-cardinality aggregation
  * over lineitem replicated 30× (~18M rows), and a SparkListener sums the
  * per-stage memory/disk spill metrics — both must be nonzero, results
  * stay exact (count checks), wall seconds recorded.
  *
  * Output: one JSON line on stdout + BENCH_spill_r11.json in the cwd.
  */
object BenchSpill {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-bench-spill")
      // starve execution memory so the spillable operators must engage
      .config("spark.memory.fraction", "0.05")
      .config("spark.memory.storageFraction", "0.1")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val memSpilled = new AtomicLong(0)
    val diskSpilled = new AtomicLong(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        memSpilled.addAndGet(e.stageInfo.taskMetrics.memoryBytesSpilled)
        diskSpilled.addAndGet(e.stageInfo.taskMetrics.diskBytesSpilled)
      }
    })

    val rep = 30
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
      .crossJoin(s.range(rep.toLong).toDF("r"))
      // fat payload column (the fixture has no comment strings): 128
      // deterministic bytes per row so 18M rows far exceed the starved
      // execution memory
      .withColumn("pad", repeat(md5(concat(col("l_orderkey"),
        col("l_partkey"), col("r"))), 4))
    val n = li.count()

    def snap(): (Long, Long) = (memSpilled.get(), diskSpilled.get())

    // global sort on a non-clustered key, materialized through the noop
    // sink (a bare count() lets EliminateSorts prune the sort away —
    // measured 0 spill until this was a real write)
    val (m0, d0) = snap()
    // observed row count over the SORTED stream (not the input): proves
    // the spill-degraded sort emitted every row, not just that the input
    // had n of them
    val sortObs = new org.apache.spark.sql.Observation("spill_sort")
    val (_, sortSec) = time {
      li.orderBy("pad", "l_orderkey", "r")
        .observe(sortObs, count(lit(1)).as("rows"))
        .write.mode("overwrite").format("noop").save()
    }
    val (m1, d1) = snap()
    val sortRows = sortObs.get("rows").asInstanceOf[Long]

    // wide high-cardinality aggregation: spillable hash agg
    val (aggRows, aggSec) = time {
      li.groupBy(col("l_orderkey"), col("l_partkey"), col("r"))
        .agg(sum("l_quantity").as("q"), avg("l_extendedprice").as("p"),
          max("pad").as("c"))
        .count()
    }
    val (m2, d2) = snap()

    require(sortRows == n, s"sort lost rows: $sortRows != $n")
    val sortMem = m1 - m0; val sortDisk = d1 - d0
    val aggMem = m2 - m1; val aggDisk = d2 - d1
    println(f"[bench-spill] rows=$n sort=${sortSec}%.1fs " +
      f"(spill mem=${sortMem / 1e6}%.0fMB disk=${sortDisk / 1e6}%.0fMB) " +
      f"agg=${aggSec}%.1fs (spill mem=${aggMem / 1e6}%.0fMB disk=${aggDisk / 1e6}%.0fMB)")
    val json = "{\"metric\":\"spill_stress\",\"value\":" +
      f"${sortSec + aggSec}%.2f" + ",\"unit\":\"sec\",\"rows\":" + n +
      ",\"sort\":{\"sec\":" + f"$sortSec%.2f" +
      ",\"memory_spilled\":" + sortMem + ",\"disk_spilled\":" + sortDisk +
      ",\"rows\":" + sortRows + "},\"agg\":{\"sec\":" + f"$aggSec%.2f" +
      ",\"memory_spilled\":" + aggMem + ",\"disk_spilled\":" + aggDisk +
      ",\"rows\":" + aggRows + "}}"
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_spill_r12.json"), json + "\n")
    s.stop()
  }
}
