package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Semantic tests for the LLM-pipeline operators (beyond the oracle gate):
  * recall/consistency properties that SQL hash-compare can't express. */
class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("minhash LSH finds the high-jaccard pairs the exact verifier confirms") {
    val pairs = Dedup.minhashLsh(spark, sf).collect()
    // every emitted pair really is >= the 0.8 threshold
    assert(pairs.forall(_.getDouble(2) >= 0.8))
    // pairs are canonical (a < b) and unique
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length == pairs.length)
  }

  test("simhash pairs overlap minhash pairs (both find the near-dup cluster)") {
    val mh = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (mh.nonEmpty && sh.nonEmpty)
      assert((mh intersect sh).nonEmpty, s"no overlap: minhash=$mh simhash=$sh")
  }

  test("LSH ANN results are a subset-quality approximation of brute force") {
    val brute = Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.lshAnn(spark, sf).collect()
    // every ANN neighbor must score <= the brute-force best for that query
    val bruteBest = Similarity.bruteTopK(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getDouble(3)).max }
    for (r <- ann) {
      val q = r.getLong(0)
      assert(r.getDouble(3) <= bruteBest(q) + 1e-9,
        s"ANN returned a better-than-exact score for query $q")
    }
    // and buckets should recover at least one true neighbor overall
    val annPairs = ann.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert((annPairs intersect brute).nonEmpty || annPairs.isEmpty)
  }

  test("exact dedup summary is consistent with raw counts") {
    val r = Dedup.exact(spark, sf).collect()(0)
    val total = Tables(spark, sf, "documents").count()
    assert(r.getLong(1) == total) // n_docs
    assert(r.getLong(0) + r.getLong(3) == total) // unique + redundant = total
  }

  test("language id prefers en for en-stopword-bearing text, deterministic") {
    val a = TextAnalysis.langId(spark, sf).collect()
    val b = TextAnalysis.langId(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => Set("en", "de", "es", "fr", "zh")(r.getString(1))))
  }

  test("quality score is bounded [0,1]") {
    val q = TextAnalysis.quality(spark, sf).collect()
    assert(q.forall(r => r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0))
  }

  test("multimodal decode is deterministic, partition-count invariant") {
    val f1 = Multimodal.features(spark, sf).collect()
    val f8 = Multimodal.decodeFeatures(
      Multimodal.assets(spark, sf).repartition(8)).toDF()
      .orderBy("doc_id").collect()
    assert(f1.map(_.toString).sameElements(f8.map(_.toString)))
    // checksum is content-derived: distinct payloads → mostly distinct sums
    assert(f1.map(_.getLong(3)).distinct.length > f1.length / 2)
  }

  test("cosine is symmetric and self-similarity is 1") {
    import spark.implicits._
    val e = Tables(spark, sf, "embeddings").limit(10)
    val self = e.select(Dedup.cosine(col("embedding"), col("embedding")).as("c"))
      .collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
