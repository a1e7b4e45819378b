package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SearchIndex

/** Search connector behavior pins: BM25 against hand-computed scores,
  * phrase adjacency, conjunctive term search, and the scale property the
  * design leans on — a term probe reads ONLY the probed buckets' files
  * of the persisted index. */
class SearchIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("BM25 matches a hand-computed score on a 3-doc corpus") {
    // corpus: dl = 4, 4, 2; avgdl = 10/3; query term "cat":
    //   df(cat) = 2, N = 3 -> idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    val docs = docsDf(Seq(
      (1L, "cat cat dog bird"),
      (2L, "dog bird fish frog"),
      (3L, "cat fish")))
    val got = SearchIndex.bm25(docs, "doc_id", "text", Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    def score(tf: Double, dl: Double): Long = {
      val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
      val avgdl = 10.0 / 3.0
      val s = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      math.floor(s * 1e6).toLong
    }
    // doc 3 is shorter (dl=2 < avgdl) so its single "cat" outranks
    // doc 1's double "cat" in a longer doc only if saturation+norm says so
    val expect = Map(1L -> score(2.0, 4.0), 3L -> score(1.0, 2.0))
    assert(got.map(x => x._1 -> x._3).toMap === expect)
    assert(got.forall(_._2 === 1L)) // one query term matched each
    // ranking is by the integer grid score, descending
    assert(got.map(_._3).toSeq === got.map(_._3).sortBy(-_).toSeq)
  }

  test("phrase match requires adjacency in order") {
    val docs = docsDf(Seq(
      (1L, "big data rocks"),
      (2L, "data big rocks"),   // reversed - no match
      (3L, "big x data"),       // gap - no match
      (4L, "so big data")))
    val got = SearchIndex.phraseMatch(docs, "doc_id", "text", Seq("big", "data"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 4L))
  }

  test("conjunctive term search returns docs containing ALL terms and " +
    "reads only the probed buckets of the persisted index") {
    val path = "/tmp/graft_search_spec/idx"
    val docs = docsDf(Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta"),
      (3L, "beta gamma"),
      (4L, "alpha beta")))
    SearchIndex.writeIndex(docs, "doc_id", "text", path, buckets = 16)

    val q = SearchIndex.termSearch(spark, path, Seq("alpha", "beta"), 16)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))

    // pruning: the scan's file listing covers only the probed buckets
    val probed = Seq("alpha", "beta").map(SearchIndex.termBucket(_, 16)).toSet
    val files = q.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(p => probed.exists(b => p.contains(s"bucket=$b"))))
    val allBuckets = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(probed.size < allBuckets) // the probe really skipped buckets
  }

  test("index-side BM25 probe scores identically to the corpus-side path " +
    "and reads only the probed buckets + side tables") {
    val path = "/tmp/graft_search_spec/bm25idx"
    val docs = docsDf(Seq(
      (1L, "cat cat dog bird"),
      (2L, "dog bird fish frog"),
      (3L, "cat fish"),
      (4L, "bird bird bird cat dog")))
    graft.ops.SearchIndex.writeIndex(docs, "doc_id", "text", path, buckets = 16)
    val viaIndex = graft.ops.SearchIndex
      .bm25Index(TestSpark.spark, path, Seq("cat", "bird"), 10, 16)
      .collect().map(_.toSeq).toSeq
    val direct = graft.ops.SearchIndex
      .bm25(docs, "doc_id", "text", Seq("cat", "bird"), 10)
      .collect().map(_.toSeq).toSeq
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)
  }

  test("termBucket mirrors the write-side pmod(xxhash64) bucketing") {
    val docs = docsDf(Seq((1L, "zeta")))
    val b = docs.select(
      pmod(xxhash64(lit("zeta")), lit(64)).cast("int")).head().getInt(0)
    assert(SearchIndex.termBucket("zeta", 64) === b)
  }

  test("index build + bm25 run on the fixture corpus; gate keys declared " +
    "with oracles") {
    val out = SearchIndex.bm25Gate(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.length <= 20)
    Seq("search_bm25", "search_term_index", "search_phrase").foreach { k =>
      assert(SparkEntry.queries.contains(k))
      assert(SparkEntry.oracleSql.contains(k))
    }
  }
}
