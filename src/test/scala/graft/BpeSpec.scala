package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.ops.TextAnalysis

/** BPE learn + encode (ops/TextAnalysis.bpeLearn,
  * functions/BpeEncode.scala): the Sennrich reference example
  * hand-computed, rank-ordered application semantics, losslessness, and
  * learn→apply end-to-end. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // the classic corpus: low ×5, lower ×2, newest ×6, widest ×3
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .mkString(" ")

  test("learn: merge ranks follow weighted pair frequency") {
    val m = TextAnalysis.bpeLearn(Seq(corpus).toDF("text"), "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // pair frequencies: es/st appear in newest+widest = 9 each; the 'es'
    // vs 'st' tie breaks lexicographically -> es first, then (es,t) = 9
    assert(m(0) == ((1, "e", "s", "es", 9L)))
    assert(m(1) == ((2, "es", "t", "est", 9L)))
    // next: lo appears in low+lower = 7
    assert(m(2) == ((3, "l", "o", "lo", 7L)))
    assert(m(3) == ((4, "lo", "w", "low", 7L)))
  }

  test("encode: merges apply in rank order, all occurrences per step") {
    def enc(s: String, merges: Seq[String]): Seq[String] =
      Seq(s).toDF("t")
        .select(GraftFunctions.bpeEncode(col("t"),
          array(merges.map(lit): _*)))
        .collect().head.getSeq[String](0)
    assert(enc("newest", Seq("e s", "es t")) == Seq("n", "e", "w", "est"))
    // rank order matters: ("ab" before "bc") consumes the b first
    assert(enc("abc", Seq("a b", "b c")) == Seq("ab", "c"))
    assert(enc("abc", Seq("b c", "a b")) == Seq("a", "bc"))
    // all occurrences in one step, leftmost-first on overlaps
    assert(enc("aaaa", Seq("a a")) == Seq("aa", "aa"))
    assert(enc("aaa", Seq("a a")) == Seq("aa", "a"))
    // words are independent; unknown pairs stay characters
    assert(enc("ab xy", Seq("a b")) == Seq("ab", "x", "y"))
  }

  test("learn then encode reproduces the trained segmentation losslessly") {
    val df = Seq(corpus).toDF("text")
    val merges = TextAnalysis.bpeLearn(df, "text", 8)
      .orderBy("rank").collect()
      .map(r => r.getString(1) + " " + r.getString(2)).toSeq
    val toks = Seq("newest lowest").toDF("t")
      .select(GraftFunctions.bpeEncode(col("t"),
        array(merges.map(lit): _*)))
      .collect().head.getSeq[String](0)
    assert(toks.mkString == "newestlowest") // lossless
    assert(toks.contains("est") || toks.contains("newest")) // learned unit
    assert(toks.length < "newest lowest".replace(" ", "").length)
  }

  test("sql name registered; empty merge table is identity-to-chars") {
    val r = graft.api.SqlSession.wrap(spark).sql(
      "SELECT bpe_encode('ab', array('a b')) AS tk").collect()
      .head.getSeq[String](0)
    assert(r == Seq("ab"))
    val none = Seq("ab").toDF("t")
      .select(GraftFunctions.bpeEncode(col("t"),
        array().cast("array<string>")))
      .collect().head.getSeq[String](0)
    assert(none == Seq("a", "b"))
  }
}
