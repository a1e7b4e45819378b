package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew stress bench — the committed evidence behind the 100 TB claim for
  * the two skew-prone shuffle shapes in the repo:
  *
  *   1. the skew-salted join (ops/Relational.scala saltedJoin) against a
  *      fact table where ONE hot key holds ~30 % of all rows (sf1-lineitem
  *      volume: 6M rows), vs the plain shuffle join on the same data;
  *   2. the SemDeDup within-cell pair stage (ops/Dedup.scala
  *      semanticDupKeepers) against a corpus where ONE IVF cell holds
  *      ~30 % of all vectors, salted vs unsalted.
  *
  * The reference encodes its own skew stance in benchto group scale
  * factors (presto-benchto-benchmarks/.../tpch.yaml:16-31); this is the
  * equivalent artifact here: for each path it records wall seconds plus
  * PER-TASK shuffle-read record counts and run times from a
  * SparkListener, and the headline numbers are max/median task ratios —
  * "no single-task blowup" means the salted variants keep that ratio
  * bounded while the unsalted hot task reads ~30 % of the data alone.
  * Broadcast joins are disabled for the run: at real scale neither side
  * of these joins broadcasts, and the shuffle path is the one under test.
  *
  * Output: one JSON line on stdout + BENCH_skew_r10.json in the cwd.
  */
object BenchSkew {

  /** Collects per-task run time and shuffle-read records while attached. */
  private final class TaskStats extends SparkListener {
    val runMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        runMs.add(t.taskMetrics.executorRunTime)
        recs.add(t.taskMetrics.shuffleReadMetrics.recordsRead)
      }
  }

  private final case class Measured(sec: Double, taskMaxMs: Long,
      taskMedMs: Long, recMax: Long, recMed: Long) {
    def recRatio: Double =
      if (recMed <= 0) Double.NaN else recMax.toDouble / recMed.toDouble
  }

  /** Run `action` once with a fresh listener; stats cover only its tasks.
    * Medians are over tasks that read shuffle data (the join/agg stages —
    * scan tasks read 0 shuffle records and would dilute the median). */
  private def measure(spark: SparkSession)(action: => Long): Measured = {
    val l = new TaskStats
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    action
    val sec = (System.nanoTime() - t0) / 1e9
    // listener bus is async; let the last task-end events drain
    Thread.sleep(300)
    spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    val ms = l.runMs.asScala.toVector.sorted
    val rs = l.recs.asScala.toVector.filter(_ > 0).sorted
    Measured(sec,
      if (ms.isEmpty) 0L else ms.last,
      if (ms.isEmpty) 0L else ms(ms.size / 2),
      if (rs.isEmpty) 0L else rs.last,
      if (rs.isEmpty) 0L else rs(rs.size / 2))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 4x cores: 8 cells x salts bucket keys must not collapse into
      // few shuffle partitions, or salting re-serializes
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // the shuffle-join path is the one under test (at scale neither
      // side broadcasts); AQE stays ON — production config
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.shuffle.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- 1. skewed JOIN at sf1-lineitem volume ------------------------
    val n = 6000000L
    val dimN = 100000L
    val hotShare = 0.3
    // key 0 takes 30 % of the fact; the rest spread over dimN keys
    val fact = spark.range(n).select(
      when(pmod(col("id"), lit(10)) < 3, 0L)
        .otherwise(pmod(col("id"), lit(dimN - 1)) + 1).as("k"),
      (col("id") % 997).cast("double").as("v"))
    val dim = spark.range(dimN).select(col("id").as("dk"),
      concat(lit("attr_"), col("id") % 50).as("attr"))
    fact.count(); dim.count() // materialize range + JIT prewarm

    def plainJoin(): Long =
      fact.join(dim, col("k") === col("dk"))
        .groupBy("attr").agg(sum("v")).count()
    def saltedJoin(): Long =
      ops.Relational.saltedJoin(fact, dim, "k", "dk", 16)
        .groupBy("attr").agg(sum("v")).count()

    plainJoin(); saltedJoin() // prewarm (codegen + shuffle paths)
    val plain = measure(spark)(plainJoin())
    val salted = measure(spark)(saltedJoin())

    // deterministic partition-size histogram of the salted hot key: how
    // many shuffle buckets the 1.8M hot rows landed in, and the biggest
    val hotBuckets = ops.Relational
      .saltedShuffleHistogram(fact, "k", 16)
      .filter(col("k") === 0L)
      .collect().map(r => r.getLong(2))
    val hotRows = (n * hotShare).toLong
    val hotMaxShare = hotBuckets.max.toDouble / hotRows

    // ---- 2. SemDeDup pair stage with a hot IVF cell -------------------
    val nv = 10000L
    // cell 0 takes 30 % of vectors; 7 more cells share the rest. Each
    // vector points mostly along its cell axis with deterministic noise,
    // so same-cell cosines are high and the pair stage does real work.
    val vecs = spark.range(nv).select(
      col("id").as("vec_id"),
      when(pmod(col("id"), lit(10)) < 3, 0L)
        .otherwise(pmod(col("id"), lit(7)) + 1).as("cell"))
      .withColumn("embedding", transform(sequence(lit(0), lit(15)),
        i => when(i === col("cell").cast("int"), lit(1.0))
          .otherwise(pmod(xxhash64(col("vec_id") * 16 + i.cast("bigint")),
            lit(100)).cast("double") / 1000.0)))
    val cells = vecs.select(col("vec_id"), col("embedding"), col("cell"))
    cells.count() // materialize + prewarm

    def semantic(salts: Int): Long =
      ops.Dedup.semanticDupKeepers(cells, 0.45, salts).count()

    semantic(16) // prewarm the pair-stage codegen on the cheap path
    val semSalted = measure(spark)(semantic(16))
    val semPlain = measure(spark)(semantic(1))

    def fmt(d: Double): String =
      if (d.isNaN) "null"
      else BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val line =
      s"""{"metric":"skew_stress","unit":"sec","join_rows":$n,"hot_share":$hotShare,""" +
      s""""plain_join_sec":${fmt(plain.sec)},"salted_join_sec":${fmt(salted.sec)},""" +
      s""""plain_join_task_max_ms":${plain.taskMaxMs},"plain_join_task_med_ms":${plain.taskMedMs},""" +
      s""""salted_join_task_max_ms":${salted.taskMaxMs},"salted_join_task_med_ms":${salted.taskMedMs},""" +
      s""""plain_join_rec_ratio":${fmt(plain.recRatio)},"salted_join_rec_ratio":${fmt(salted.recRatio)},""" +
      s""""hot_key_salt_buckets":${hotBuckets.length},"hot_key_max_bucket_share":${fmt(hotMaxShare)},""" +
      s""""sem_vectors":$nv,"sem_hot_cell_share":$hotShare,""" +
      s""""sem_unsalted_sec":${fmt(semPlain.sec)},"sem_salted_sec":${fmt(semSalted.sec)},""" +
      s""""sem_unsalted_task_max_ms":${semPlain.taskMaxMs},"sem_unsalted_task_med_ms":${semPlain.taskMedMs},""" +
      s""""sem_salted_task_max_ms":${semSalted.taskMaxMs},"sem_salted_task_med_ms":${semSalted.taskMedMs},""" +
      s""""sem_salted_rec_ratio":${fmt(semSalted.recRatio)},"cpus":"$cpus"}"""
    println(line)
    System.out.flush()
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_skew_r10.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
