package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** ANN scale bench — the measured evidence behind the similarity-search
  * 100 TB claim: on a 1M-vector clustered corpus (64-dim), exact
  * brute-force top-10 vs the IVF probe path (k-means-refined centroids,
  * nprobe-limited cell join), reporting wall seconds for both, the
  * speedup, and recall@10 so the accuracy cost of the approximation is a
  * NUMBER, not a hope. The reference's vector story is the lance
  * connector + create_vector_index seed (presto-lance/,
  * CreateVectorIndexAggregation.java:37); this artifact shows the Spark
  * plan shapes holding at volume: brute = one broadcast × corpus pass;
  * IVF = build once (assignment + 2 Lloyd iterations), then probe joins
  * that read nprobe/K of the corpus per query.
  *
  * Output: one JSON line on stdout + BENCH_ann_r12.json in the cwd.
  * N overrides via SPARK_GRAFT_ANN_N for quick dev runs.
  */
object BenchAnn {

  private val N = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "1000000").toInt
  private val Dim = 64
  private val K = 64
  private val NProbes = Seq(1, 2, 4)
  private val NQueries = 20
  private val TopK = 10

  /** Deterministic clustered corpus: vector i belongs to latent cluster
    * i % K; components = cluster signature + 60 % per-vector noise, so
    * neighborhoods straddle cell boundaries and the nprobe sweep shows a
    * real recall/cost curve instead of a saturated 1.0. */
  private def corpus(s: SparkSession): DataFrame =
    s.range(N.toLong).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(Dim - 1)), j =>
          (sin(col("vec_id") % K * 37.1 + j * 1.7) +
            sin(col("vec_id") * 131.7 + j * 17.3) * 0.6).cast("float")))

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Exact top-k per query over the whole corpus. */
  private def brute(q: DataFrame, e: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("c"), asc("vec_id"))
    broadcast(q).join(e, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Dedup.cosine(col("qvec"), col("embedding")).as("c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("vec_id"))
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-ann")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val e = corpus(s).cache()
    e.count() // materialize: generation cost stays out of every timing
    val q = e.filter(col("vec_id") % (N / NQueries) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .cache()
    q.count()

    // ---- exact baseline
    val (bruteRows, bruteSec) = time {
      brute(q, e).collect()
    }
    val truth = bruteRows.map(r => (r.getLong(0), r.getLong(1))).toSet

    // ---- IVF build: seed centroids (one per latent cluster stripe) +
    // 2 Lloyd refinements, then the cell-partitioned assignment
    val ((cells, cents), buildSec) = time {
      var c = e.filter(col("vec_id") < K)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      for (_ <- 1 to 2)
        c = Similarity.kmeansRefine(e, c)
          .select(col("cent_id"), transform(col("cvec"),
            _.cast("float")).as("cvec"))
          .localCheckpoint()
      val asg = Similarity.centRank(e, c).filter(col("crk") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
        .repartition(col("cell")).cache()
      asg.count()
      (asg, c)
    }

    // ---- IVF query at each probe width: the recall/cost curve
    val sweep = NProbes.map { nprobe =>
      val (ivfRows, ivfSec) = time {
        val probes = Similarity.centRank(
          q.select(col("query_id").as("vec_id"), col("qvec").as("embedding")),
          cents)
          .filter(col("crk") <= nprobe)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
            col("cent_id").as("probe"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("c"), asc("vec_id"))
        broadcast(probes)
          .join(cells, col("probe") === col("cell") &&
            col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id"),
            Dedup.cosine(col("qvec"), col("embedding")).as("c"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= TopK)
          .select(col("query_id"), col("vec_id"))
          .collect()
      }
      val hits = ivfRows.count(r => truth((r.getLong(0), r.getLong(1))))
      (nprobe, ivfSec, hits.toDouble / (NQueries * TopK))
    }
    val sweepJson = sweep.map { case (np, sec, rec) =>
      f"""{"nprobe":$np,"sec":$sec%.4f,"speedup":${bruteSec / sec}%.2f,"recall_at10":$rec%.4f}"""
    }.mkString("[", ",", "]")

    val json =
      f"""{"metric":"ann","n":$N,"dim":$Dim,"k":$K,""" +
        f""""queries":$NQueries,"topk":$TopK,""" +
        f""""brute_sec":$bruteSec%.4f,"ivf_build_sec":$buildSec%.4f,""" +
        f""""sweep":$sweepJson}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_ann_r12.json"),
      json.getBytes("UTF-8"))
    s.stop()
  }
}
