package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Corpus-pipeline scale bench — measured evidence that the LLM-curation
  * operators hold at volume, not just on the 500-doc gate fixture: the
  * sf0.1 documents corpus replicated 20× (≈100k docs, heavy duplication —
  * the worst case for the dedup family since every gram collides across
  * replicas) driven through the round's five stages:
  *
  *   substring-dup profile (k-gram inverted index + islands),
  *   C4 span removal (per-gram first-occurrence election + rebuild),
  *   Gopher quality battery (pure scan-speed projections),
  *   hashed classifier (train 5×512 model + score + argmax),
  *   cluster balance (seed-centroid assign + budget resample, on the
  *   sf0.1 embeddings replicated 20×).
  *
  * Wall seconds per stage + rows touched; one JSON line on stdout and
  * BENCH_corpus_r11.json in the cwd. Every stage is the SAME code the
  * oracle gates run — no bench-only forks.
  */
object BenchCorpus {

  private val Rep = 20

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-corpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // replicate deterministically: replica r of doc d gets id d*Rep+r, so
    // ids stay unique and the hash coins differ per replica
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(s.range(Rep.toLong).toDF("r"))
      .select((col("doc_id") * Rep + col("r")).as("doc_id"),
        col("text"), col("lang"), col("source"))
      .cache()
    val nDocs = docs.count()
    val embs = s.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(s.range(Rep.toLong).toDF("r"))
      .select((col("vec_id") * Rep + col("r")).as("vec_id"),
        col("embedding"))
      .cache()
    val nVecs = embs.count()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bench_corpus").toFile
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    embs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    docs.unpersist(); embs.unpersist()
    val d = dir.getPath

    val stages: Seq[(String, () => Long)] = Seq(
      "substring_dup" -> (() => Dedup.substringDup(s, d).count()),
      "span_removal" -> (() => Dedup.spanDedup(s, d).count()),
      "gopher_quality" -> (() => TextAnalysis.gopherQuality(s, d).count()),
      "hashed_classifier" -> (() => TextAnalysis.hashedClassifier(s, d).count()),
      "cluster_balance" -> (() => Similarity.clusterBalance(s, d).count()))
    val results = stages.map { case (name, f) =>
      val (rows, sec) = time(f())
      println(f"[bench-corpus] $name%-18s ${sec}%8.2f s  ($rows rows)")
      (name, sec, rows)
    }

    val total = results.map(_._2).sum
    val json = "{\"metric\":\"corpus_ops_sf01x" + Rep + "\"," +
      "\"value\":" + f"$total%.2f" + ",\"unit\":\"sec\"," +
      "\"docs\":" + nDocs + ",\"vectors\":" + nVecs + "," +
      "\"ops\":{" + results.map { case (n, sec, rows) =>
        "\"" + n + "\":{\"sec\":" + f"$sec%.2f" + ",\"rows\":" + rows + "}"
      }.mkString(",") + "}}"
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_corpus_r11.json"), json + "\n")
    s.stop()
  }
}
