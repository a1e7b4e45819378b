package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Domain-mixture resampling (ops/TextAnalysis.scala mixtureSample):
  * deterministic hash sampling to target domain weights — capped domains
  * keep everything, zero-weight domains drop everything, achieved counts
  * track the targets, and the sample is exactly rerunnable. */
class MixtureSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 3 domains with very different sizes: a 1000, b 100, c 500
  private lazy val docs =
    ((1 to 1000).map(i => (i.toLong, "a")) ++
      (1001 to 1100).map(i => (i.toLong, "b")) ++
      (1101 to 1600).map(i => (i.toLong, "c")))
      .toDF("doc_id", "domain")

  test("rates hit targets; cap and zero-weight behave; deterministic") {
    // budget 0.25 of 1600 = 400 target rows: a gets 0.5*400=200 of 1000
    // (rate .2), b gets 0.5*400=200 of 100 -> capped, keep all 100,
    // c has no weight -> dropped
    val out = TextAnalysis.mixtureSample(docs, "domain", "doc_id",
      Map("a" -> 0.5, "b" -> 0.5), budget = 0.25)
    val byDom = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.getOrElse("b", 0L) == 100L) // capped: keep all
    assert(!byDom.contains("c"))             // zero weight: drop all
    val a = byDom.getOrElse("a", 0L)
    assert(a > 140 && a < 260, s"a kept $a, target 200") // hash noise bound
    // exact rerun: the same rows, not just the same counts
    val again = TextAnalysis.mixtureSample(docs, "domain", "doc_id",
      Map("a" -> 0.5, "b" -> 0.5), budget = 0.25)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("budget 1 with proportional weights keeps everything") {
    val out = TextAnalysis.mixtureSample(docs, "domain", "doc_id",
      Map("a" -> 1000.0 / 1600, "b" -> 100.0 / 1600, "c" -> 500.0 / 1600),
      budget = 1.0)
    assert(out.count() == 1600)
  }

  test("different salt draws a different (but same-sized-ish) sample") {
    val s1 = TextAnalysis.mixtureSample(docs, "domain", "doc_id",
      Map("a" -> 1.0), budget = 0.3, salt = "s1_")
    val s2 = TextAnalysis.mixtureSample(docs, "domain", "doc_id",
      Map("a" -> 1.0), budget = 0.3, salt = "s2_")
    assert(s1.except(s2).count() > 0)
  }
}
