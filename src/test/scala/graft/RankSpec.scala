package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Rank

/** PageRank invariants the hash gate can't express: positivity, mass
  * bounds (dangling drop means total <= Scale), and in-degree-zero nodes
  * pinned at the base rank. */
class RankSpec extends AnyFunSuite {
  import TestSpark._

  test("pagerank: positive ranks, bounded mass, sinks at base rank") {
    val rows = Rank.pageRank(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
    // total mass never exceeds the scaled unit (dangling mass is dropped,
    // floor division only loses mass)
    val total = rows.map(_.getLong(1)).sum
    assert(total <= 1000000000000L, s"mass created: $total")
    // deterministic across runs
    val again = Rank.pageRank(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // output is rank-desc sorted with node tiebreak
    val ranks = rows.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(ranks == ranks.sorted)
  }
}
