package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Bigram-LM quality scoring (ops/TextAnalysis.lmScore): hand-computed
  * smoothed probabilities, and the filtering property — repetitive
  * in-distribution text outscores one-off gibberish. */
class LmScoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hand-computed add-one bigram means") {
    // corpus: "a b a b" and "a b" -> bigrams: (a,b)x3, (b,a)x1; V=2
    // heads: c(a·)=3, c(b·)=1
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: p(a,b)=(3+1)/(3+2)=0.8 twice; p(b,a)=(1+1)/(1+2)=2/3 —
    // each floor-quantized to 1e-9 (the exact integer-sum contract)
    val exp1 = (800000000L * 2 + 666666666L).toDouble / 3.0 / 1e9
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - exp1) < 1e-15)
    // doc 2: single bigram (a,b) -> 0.8
    assert(out(1).getLong(1) == 1L)
    assert(math.abs(out(1).getDouble(2) - 0.8) < 1e-12)
  }

  test("in-distribution text outscores gibberish under the corpus model") {
    val repeated = Seq.fill(20)("the cat sat on the mat").mkString(" ")
    val gibberish = (1 to 120).map(i => s"zq$i").mkString(" ")
    val docs = (Seq((1L, repeated), (2L, repeated), (3L, gibberish)) ++
      (4 to 10).map(i => (i.toLong, repeated))).toDF("doc_id", "text")
    val scores = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > 10 * scores(3L),
      s"typical ${scores(1L)} should dominate gibberish ${scores(3L)}")
  }
}
