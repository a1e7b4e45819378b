package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** wordpiece_encode (functions/WordPiece.scala): greedy longest-match
  * subword tokenization — longest piece wins, spaces separate, unknown
  * characters fall back to single-char tokens, lossless reconstruction. */
class WordPieceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val vocab = Seq("the", "ing", "in", "or", "a", "b", "c", "o",
    "r", "t", "h", "e", "y", "g")

  private def enc(s: String): Seq[String] = {
    val df = Seq(s).toDF("t")
    df.select(GraftFunctions.wordpieceEncode(col("t"),
      array(vocab.map(lit): _*)).as("tk"))
      .collect().head.getSeq[String](0)
  }

  test("greedy longest match wins over shorter pieces") {
    assert(enc("thetheing") == Seq("the", "the", "ing"))
    // after the first "the", rest is "thing": "the" no longer prefixes,
    // so the single chars bridge to the "ing" suffix
    assert(enc("thething") == Seq("the", "t", "h", "ing"))
    assert(enc("theory") == Seq("the", "or", "y"))
    // "ing" beats "in": greedy takes the longest at each position
    assert(enc("ing") == Seq("ing"))
  }

  test("spaces separate and emit nothing; reconstruction is lossless") {
    assert(enc("the cat") == Seq("the", "c", "a", "t"))
    assert(enc("  the  ") == Seq("the"))
    val s = "the orange thing"
    assert(enc(s).mkString == s.replace(" ", ""))
  }

  test("unknown characters fall back to single-char tokens") {
    assert(enc("a-b") == Seq("a", "-", "b"))
    assert(enc("x") == Seq("x"))     // not in vocab: itself
    assert(enc("犬の") == Seq("犬", "の"))
  }

  test("null text yields null; empty text yields empty array") {
    val df = Seq[(Integer, String)]((1, null), (2, "")).toDF("id", "t")
    val r = df.select(col("id"), GraftFunctions.wordpieceEncode(col("t"),
        array(vocab.map(lit): _*)).as("tk"))
      .orderBy("id").collect()
    assert(r(0).isNullAt(1))
    assert(r(1).getSeq[String](1).isEmpty)
  }

  test("non-foldable vocab (per-row column) still encodes") {
    val df = Seq(("theory", Seq("the", "or", "y")),
      ("theory", Seq("t", "h", "e", "o", "r", "y"))).toDF("t", "v")
    val r = df.select(GraftFunctions.wordpieceEncode(col("t"), col("v")))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("the", "or", "y"))
    assert(r(1) == Seq("t", "h", "e", "o", "r", "y"))
  }

  test("registered SQL name works through the dialect") {
    val r = graft.api.SqlSession.wrap(spark).sql(
      "SELECT wordpiece_encode('thetheing', array('the', 'ing', 't', 'h', 'i', 'n', 'g')) AS tk")
      .collect().head.getSeq[String](0)
    assert(r == Seq("the", "the", "ing"))
  }
}
