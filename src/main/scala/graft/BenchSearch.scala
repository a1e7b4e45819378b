package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SearchIndex

/** Full-text-search scale bench — the measured evidence behind the
  * search connector's 100 TB claim (the ES-analogue in
  * ops/SearchIndex.scala): on a 1M-doc synthetic corpus, build the
  * term-bucket-partitioned inverted index once, then measure
  *
  *  - probe cost: a term query lists ONLY its terms' bucket dirs; the
  *    pruning fraction is computed from the probed dirs' file sizes over
  *    the whole index's file sizes (the r12 ADVICE lesson: listener
  *    bytesRead under-counts, file sizes don't lie) and must be
  *    >= distinctBuckets/buckets, the physical floor;
  *  - index-side BM25 top-10 latency vs the corpus-side full recompute —
  *    the build-once/query-many ratio.
  *
  * Output: one JSON line on stdout + BENCH_search_r13.json in the cwd.
  * N overrides via SPARK_GRAFT_SEARCH_N for quick dev runs.
  */
object BenchSearch {

  private val N = sys.env.getOrElse("SPARK_GRAFT_SEARCH_N", "1000000").toInt
  private val Buckets = 256
  private val DocLen = 40
  private val Vocab = 50000

  /** Deterministic corpus with a skewed term distribution: position j of
    * doc i draws from a small head vocabulary every 5th slot (high-df
    * terms) and a large tail otherwise (low-df terms), so probes hit
    * both regimes. */
  private def corpus(s: SparkSession): DataFrame =
    s.range(N.toLong).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(DocLen - 1)), j =>
          when(j % 5 === 0,
            concat(lit("h"), pmod(col("doc_id") + j * 131, lit(50))))
            .otherwise(concat(lit("t"),
              pmod(col("doc_id") * 37 + j * j * 101, lit(Vocab)))))))

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def dirBytes(p: java.io.File): Long =
    if (!p.exists()) 0L
    else if (p.isFile) p.length()
    else p.listFiles().map(dirBytes).sum

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bench-search")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val path = "/tmp/graft_bench_search/idx"
    val docs = corpus(s)

    val (_, buildSec) = time {
      SearchIndex.writeIndex(docs, "doc_id", "text", path, Buckets)
    }
    val root = new java.io.File(path)
    val totalBytes = dirBytes(root)
    val allBuckets = root.listFiles().count(_.getName.startsWith("bucket="))

    // probe 1: two high-df head terms that CO-OCCUR by construction
    //   (docs with doc_id % 50 == 3 carry both h3 and h18) — worst-case
    //   posting volume for the conjunction
    // probe 2: one low-df tail term — the point-lookup regime
    val probes = Seq(
      "head2" -> Seq("h3", "h18"),
      "tail1" -> Seq("t123"))

    val probeResults = probes.map { case (name, terms) =>
      val bs = terms.map(SearchIndex.termBucket(_, Buckets)).distinct
      val probedBytes = bs.map(b =>
        dirBytes(new java.io.File(s"$path/bucket=$b"))).sum
      // honest fraction: actual on-disk bytes of the probed dirs over the
      // whole index (file sizes, not listener bytesRead); uniform_share
      // is what a skew-free index would give — tail buckets legitimately
      // come in under it, head buckets over it
      val frac = probedBytes.toDouble / totalBytes
      val share = bs.size.toDouble / allBuckets
      val (nDocs, sec) = time {
        SearchIndex.termSearch(s, path, terms, Buckets).count()
      }
      require(nDocs > 0, s"probe $name matched no docs — probe-design bug")
      (name, terms.size, bs.size, nDocs, sec, frac, share)
    }

    // BM25: index-probe vs full corpus-side recompute, same query
    val q = Seq("h3", "h18", "t123")
    val (idxRows, idxSec) = time {
      SearchIndex.bm25Index(s, path, q, 10, Buckets).collect()
    }
    val (directRows, directSec) = time {
      SearchIndex.bm25(docs, "doc_id", "text", q, 10).collect()
    }
    val agree = idxRows.map(_.toSeq).toSeq == directRows.map(_.toSeq).toSeq

    val probesJson = probeResults.map { case (n, nt, nb, nd, sec, fr, sh) =>
      f"""{"probe":"$n","terms":$nt,"buckets_probed":$nb,"docs":$nd,""" +
        f""""sec":$sec%.3f,"read_fraction":$fr%.5f,"uniform_share":$sh%.5f}"""
    }.mkString("[", ",", "]")

    val json =
      f"""{"metric":"search_corpus","n_docs":$N,"buckets":$Buckets,""" +
        f""""build_sec":$buildSec%.1f,"index_mib":${totalBytes / 1048576.0}%.1f,""" +
        f""""probes":$probesJson,""" +
        f""""bm25_index_sec":$idxSec%.3f,"bm25_direct_sec":$directSec%.3f,""" +
        f""""bm25_speedup":${directSec / idxSec}%.1f,"bm25_agree":$agree}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_search_r13.json"),
      (json + "\n").getBytes)
    s.stop()
  }
}
