package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Corpus-pipeline scale bench — measured evidence that the LLM-curation
  * operators hold at volume, not just on the 500-doc gate fixture: the
  * sf0.1 documents corpus replicated 200× (≈1M docs, ~300 MB of text,
  * heavy duplication — the worst case for the dedup family since every
  * gram collides across replicas) and the sf0.1 embeddings replicated
  * 500× (≈1M 64-d vectors) driven through the round's five stages:
  *
  *   substring-dup profile (k-gram inverted index + islands),
  *   C4 span removal (per-gram first-occurrence election + rebuild),
  *   Gopher quality battery (pure scan-speed projections),
  *   hashed classifier (train 5×512 model + score + argmax),
  *   cluster balance (seed-centroid assign + budget resample).
  *
  * Wall seconds + rows + SHUFFLE VOLUME + SPILL per stage (records/bytes
  * written and memory/disk bytes spilled, summed from a task-end
  * listener — the scale-truth signals: a stage whose shuffle grows
  * super-linearly in the corpus is the one that dies at 100 TB, and the
  * records_per_doc field makes linearity comparable across replication
  * factors); one JSON line on stdout and BENCH_corpus_r13.json (or
  * SPARK_GRAFT_CORPUS_OUT) in the cwd. Every stage is the SAME code the
  * oracle gates run — no bench-only forks. Replication factors override
  * via SPARK_GRAFT_CORPUS_REP / SPARK_GRAFT_VECTOR_REP; the spill-scale
  * run pairs a large rep with SPARK_GRAFT_MEM_FRACTION=0.15 and
  * SPARK_DRIVER_MEM sized so the gram sorts must go to disk.
  */
object BenchCorpus {

  /** Sums shuffle write volume AND spill bytes for one stage's tasks —
    * spill is the at-scale survival signal: a stage that degrades to disk
    * under a starved execution-memory budget instead of OOMing is the one
    * that finishes on a real cluster with more data than memory. */
  private final class ShuffleStats extends SparkListener {
    val wRecs = new java.util.concurrent.atomic.LongAdder
    val wBytes = new java.util.concurrent.atomic.LongAdder
    val memSpill = new java.util.concurrent.atomic.LongAdder
    val diskSpill = new java.util.concurrent.atomic.LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        wRecs.add(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
        wBytes.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        memSpill.add(t.taskMetrics.memoryBytesSpilled)
        diskSpill.add(t.taskMetrics.diskBytesSpilled)
      }
  }

  private final case class StageStats(rows: Long, sec: Double, recs: Long,
    bytes: Long, memSpill: Long, diskSpill: Long)

  private def timed(s: SparkSession)(f: => Long): StageStats = {
    val l = new ShuffleStats
    s.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    val rows = f
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // async listener bus drain
    s.sparkContext.removeSparkListener(l)
    StageStats(rows, sec, l.wRecs.sum(), l.wBytes.sum(),
      l.memSpill.sum(), l.diskSpill.sum())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repDocs = sys.env.getOrElse("SPARK_GRAFT_CORPUS_REP", "200").toInt
    val repVecs = sys.env.getOrElse("SPARK_GRAFT_VECTOR_REP", "500").toInt
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-corpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // heap: spark.driver.memory is a no-op once the local-mode JVM is
      // running (r12 ADVICE) — size the fork via SPARK_DRIVER_MEM=16g,
      // which build.sbt turns into the forked -Xmx. For the spill-scale
      // run, SPARK_GRAFT_MEM_FRACTION starves the unified execution+
      // storage pool so the gram shuffle sorts degrade to disk instead
      // of growing the heap (r12 verdict "do this" #6).
      .config("spark.memory.fraction",
        sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.6"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // replicate deterministically: replica r of doc d gets id d*rep+r, so
    // ids stay unique and the hash coins differ per replica
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bench_corpus").toFile
    s.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(s.range(repDocs.toLong).toDF("r"))
      .select((col("doc_id") * repDocs + col("r")).as("doc_id"),
        col("text"), col("lang"), col("source"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    s.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(s.range(repVecs.toLong).toDF("r"))
      .select((col("vec_id") * repVecs + col("r")).as("vec_id"),
        col("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val d = dir.getPath
    val nDocs = s.read.parquet(s"$d/documents.parquet").count()
    val nVecs = s.read.parquet(s"$d/embeddings.parquet").count()
    println(s"[bench-corpus] fixture: $nDocs docs, $nVecs vectors at $d")

    // .count() would let Catalyst ELIMINATE work (a left join whose right
    // side aggregates on the join key drops out of a count-star plan — the
    // r11 artifact under-measured substring_dup/span_removal exactly this
    // way); toRdd.count() executes the full physical plan, every column.
    def full(df: DataFrame): Long = df.queryExecution.toRdd.count()
    val stages: Seq[(String, () => Long)] = Seq(
      "substring_dup" -> (() => full(Dedup.substringDup(s, d))),
      "span_removal" -> (() => full(Dedup.spanDedup(s, d))),
      "gopher_quality" -> (() => full(TextAnalysis.gopherQuality(s, d))),
      "hashed_classifier" -> (() => full(TextAnalysis.hashedClassifier(s, d))),
      "cluster_balance" -> (() => full(Similarity.clusterBalance(s, d))))
    val results = stages.map { case (name, f) =>
      val st = timed(s)(f())
      println(f"[bench-corpus] $name%-18s ${st.sec}%8.2f s  (${st.rows} rows, " +
        f"${st.recs} shuffle recs, ${st.bytes / 1048576.0}%.1f MiB shuffled, " +
        f"${st.diskSpill / 1048576.0}%.1f MiB disk-spilled)")
      (name, st)
    }

    val total = results.map(_._2.sec).sum
    val json = "{\"metric\":\"corpus_ops_sf01x" + repDocs + "\"," +
      "\"value\":" + f"$total%.2f" + ",\"unit\":\"sec\"," +
      "\"docs\":" + nDocs + ",\"vectors\":" + nVecs + "," +
      "\"mem_fraction\":\"" +
      sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.6") + "\"," +
      "\"ops\":{" + results.map { case (n, st) =>
        // shuffle records per doc: the linearity signal — compare across
        // replication factors; a super-linear stage dies at 100 TB
        val perDoc = st.recs.toDouble / nDocs
        "\"" + n + "\":{\"sec\":" + f"${st.sec}%.2f" + ",\"rows\":" + st.rows +
          ",\"shuffle_records\":" + st.recs + ",\"shuffle_mib\":" +
          f"${st.bytes / 1048576.0}%.1f" + ",\"records_per_doc\":" +
          f"$perDoc%.2f" + ",\"mem_spill_mib\":" +
          f"${st.memSpill / 1048576.0}%.1f" + ",\"disk_spill_mib\":" +
          f"${st.diskSpill / 1048576.0}%.1f" + "}"
      }.mkString(",") + "}}"
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse(
        "SPARK_GRAFT_CORPUS_OUT", "BENCH_corpus_r13.json")), json + "\n")
    s.stop()
  }
}
