package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VecPack}

/** Packed-vector at-rest evidence (functions/VecPack.scala — the lance
  * connector's fixed-size-list float32 story, presto-lance): the same
  * vector corpus persisted as `array<float>` parquet vs packed float32
  * varbinary parquet, reporting (a) bytes at rest and (b) wall seconds
  * for an identical brute cosine top-10 probe over each representation —
  * the packed kernel reads raw bytes with no per-row array allocation.
  * Output: one JSON line on stdout + BENCH_vecpack_r13.json in the cwd.
  * N overrides via SPARK_GRAFT_VECPACK_N. */
object BenchVecPack {

  private val N = sys.env.getOrElse("SPARK_GRAFT_VECPACK_N", "200000").toInt
  private val Dim = 64
  private val NQueries = 20
  private val TopK = 10

  private def corpus(s: SparkSession): DataFrame =
    s.range(N.toLong).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(Dim - 1)), j =>
          (sin(col("vec_id") % 128 * 37.1 + j * 1.7) +
            sin(col("vec_id") * 131.7 + j * 17.3) * 0.8).cast("float")))

  private def dirBytes(p: String): Long = {
    var t = 0L
    java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      .filter(_.toString.endsWith(".parquet"))
      .forEach(f => t += java.nio.file.Files.size(f))
    t
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-vecpack")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files
      .createTempDirectory("graft_bench_vecpack").toFile.getPath
    val arrDir = s"$base/arr"
    val pkdDir = s"$base/pkd"
    val e = corpus(s)
    e.write.parquet(arrDir)
    e.select(col("vec_id"), VecPack.pack(col("embedding")).as("embedding"))
      .write.parquet(pkdDir)
    val arrBytes = dirBytes(arrDir)
    val pkdBytes = dirBytes(pkdDir)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("c"), asc("vec_id"))
    def probe(dir: String, cosine: (org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Long = {
      val corp = s.read.parquet(dir)
      val q = corp.filter(col("vec_id") % (N / NQueries) === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      broadcast(q).join(corp, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("embedding")).as("c"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TopK)
        .queryExecution.toRdd.count()
    }
    // prewarm both paths (codegen + footers), then measure
    probe(arrDir, GraftFunctions.cosineSimilarity)
    probe(pkdDir, VecPack.cosine)
    val (na, arrSec) = time(probe(arrDir, GraftFunctions.cosineSimilarity))
    val (np, pkdSec) = time(probe(pkdDir, VecPack.cosine))
    require(na == np, s"probe row counts differ: $na vs $np")

    val json =
      f"""{"metric":"vecpack","n":$N,"dim":$Dim,""" +
        f""""array_mib":${arrBytes / 1048576.0}%.1f,""" +
        f""""packed_mib":${pkdBytes / 1048576.0}%.1f,""" +
        f""""at_rest_ratio":${pkdBytes.toDouble / arrBytes}%.3f,""" +
        f""""array_probe_sec":$arrSec%.3f,"packed_probe_sec":$pkdSec%.3f,""" +
        f""""probe_speedup":${arrSec / pkdSec}%.2f}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_vecpack_r13.json"), json + "\n")
    s.stop()
  }
}
