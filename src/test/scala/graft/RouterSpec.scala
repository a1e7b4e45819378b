package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Router, StatementClient, StatementServer}

/** The router proxies submits and schedules backends like the reference's
  * presto-router; one embedded coordinator registered under two backend
  * slots makes scheduling observable without a second JVM. */
class RouterSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val backend: String = {
    Tables.registerAll(spark, sf)
    StatementServer.ensureStarted(spark, pageSize = 10)
  }

  test("round robin alternates backends; the proxied query still runs") {
    val r = Router.ensureStarted(Seq(backend, backend), Router.RoundRobin)
    try {
      val rows = StatementClient.execute(spark, r,
        "SELECT CAST(r_regionkey AS BIGINT) AS k FROM region ORDER BY k")
        .collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
      StatementClient.execute(spark, r, "SELECT 1 AS x").collect()
      StatementClient.execute(spark, r, "SELECT 2 AS x").collect()
      val idxs = Router.picks.map(_._2)
      assert(idxs.size >= 3)
      // strict alternation 0,1,0,1,...
      assert(idxs == idxs.indices.map(_ % 2))
    } finally Router.stop()
  }

  test("user hash pins a user to one backend; weighted favors the heavy one") {
    val r = Router.ensureStarted(Seq(backend, backend), Router.UserHash)
    try {
      (1 to 3).foreach { _ =>
        val resp = StatementClient.post(r, "SELECT 1 AS x",
          Map("X-Presto-User" -> "alice"))
        assert(resp.id.nonEmpty)
      }
      val alicePicks = Router.picks.filter(_._1 == "alice").map(_._2)
      assert(alicePicks.size == 3 && alicePicks.distinct.size == 1)
    } finally Router.stop()

    val w = Router.ensureStarted(Seq(backend, backend), Router.Weighted(Seq(3, 1)))
    try {
      (1 to 8).foreach(i =>
        StatementClient.post(w, s"SELECT $i AS x").id.nonEmpty)
      val idxs = Router.picks.map(_._2)
      assert(idxs.count(_ == 0) == 6 && idxs.count(_ == 1) == 2)
    } finally Router.stop()
  }

  test("protocol headers flow through the proxy (session context works)") {
    val r = Router.ensureStarted(Seq(backend), Router.RoundRobin)
    try {
      val r0 = StatementClient.post(r, "SHOW SESSION",
        Map("X-Presto-Session" -> "optimize_hash_generation=true"))
      var resp = r0
      val rows = Vector.newBuilder[org.apache.spark.sql.Row]
      var guard = 0
      while (resp.nextUri.isDefined && guard < 10000) {
        guard += 1; rows ++= resp.data
        resp = StatementClient.advance(resp.nextUri.get)
      }
      rows ++= resp.data
      assert(rows.result().exists(row =>
        row.getString(0) == "optimize_hash_generation" &&
          row.getString(1) == "true"))
      // nextUri pointed at the BACKEND, not the router: the router is
      // off the data path after submit
      assert(r0.nextUri.exists(_.startsWith(backend)))
    } finally Router.stop()
  }
}
