package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import graft.api.{StatementClient, StatementServer}

/** Protocol-server scale artifact — measured evidence for the
  * coordinator-shaped claims of `POST /v1/statement`
  * (api/StatementServer.scala): concurrent dispatch under resource-group
  * admission, bounded-window page streaming, and no head-of-line
  * blocking (reference contracts DispatchManager.java:234,
  * ExecutingStatementResource.java:99-151). Three measurements over real
  * localhost HTTP against sf0.1:
  *
  *  1. throughput: 4 client threads × 25 mixed aggregates each — wall
  *     seconds + queries/sec;
  *  2. streaming: SELECT * over sf0.1 lineitem (~600k rows) paged to
  *     exhaustion at 5k rows/page — rows/sec and the server-side page
  *     window high-water (must stay ≤ 3: the driver never materializes
  *     the result);
  *  3. head-of-line: a 5 s sleeper occupies a slot while a short query
  *     runs — the short query's latency is reported (the r10 design
  *     would have serialized it behind the sleeper).
  *
  * Output: one JSON line on stdout + BENCH_protocol_r11.json in cwd. */
object BenchProtocol {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-protocol")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    val base = StatementServer.ensureStarted(spark, pageSize = 5000)

    val mixed = Seq(
      "SELECT count(*) AS n FROM lineitem",
      "SELECT l_returnflag, sum(l_quantity) AS q FROM lineitem GROUP BY 1",
      "SELECT count(DISTINCT o_custkey) AS n FROM orders",
      "SELECT max(c_acctbal) AS m FROM customer",
      "SELECT n_name, count(*) AS n FROM nation GROUP BY 1")

    // warm the scans once
    StatementClient.execute(spark, base, mixed.head)

    // ---- 1. concurrent throughput
    val clients = 4
    val perClient = 25
    val errs = new AtomicLong(0)
    val (_, thrSec) = time {
      val pool = Executors.newFixedThreadPool(clients)
      val latch = new CountDownLatch(clients)
      (0 until clients).foreach { c =>
        pool.execute { () =>
          try {
            (0 until perClient).foreach { i =>
              StatementClient.execute(spark, base, mixed((c + i) % mixed.size))
            }
          } catch { case _: Throwable => errs.incrementAndGet() }
          finally latch.countDown()
        }
      }
      latch.await(600, TimeUnit.SECONDS)
      pool.shutdown()
    }
    val qps = clients * perClient / thrSec

    // ---- 2. large-result streaming through the bounded window
    val big = "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem"
    var bigId: String = null
    val (bigRows, streamSec) = time {
      var r = StatementClient.post(base, big)
      bigId = r.id
      var rows = 0L
      var spin = 0
      while (r.nextUri.isDefined) {
        rows += r.data.size
        if (r.data.isEmpty && r.columns.isEmpty) {
          spin += 1
          if (spin > 100000) throw new IllegalStateException("livelock")
        }
        r = StatementClient.advance(r.nextUri.get)
      }
      rows + r.data.size
    }
    val highWater = StatementServer.bufferedPagesHighWater(bigId)

    // ---- 3. no head-of-line blocking
    val sleeper = StatementClient.post(base,
      "SELECT java_method('java.lang.Thread', 'sleep', 5000L) AS z")
    Thread.sleep(200) // let it take its slot
    val (_, shortSec) = time {
      StatementClient.execute(spark, base,
        "SELECT count(*) AS n FROM region")
    }
    StatementClient.cancel(sleeper.nextUri.get)

    val json =
      f"""{"metric":"protocol","sf":"$sfDir","clients":$clients,""" +
        f""""queries_per_client":$perClient,"errors":${errs.get()},""" +
        f""""throughput_sec":$thrSec%.3f,"qps":$qps%.2f,""" +
        f""""stream_rows":$bigRows,"stream_sec":$streamSec%.3f,""" +
        f""""stream_rows_per_sec":${bigRows / streamSec}%.0f,""" +
        f""""page_window_high_water":$highWater,""" +
        f""""short_query_beside_sleeper_sec":$shortSec%.3f}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_protocol_r11.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
