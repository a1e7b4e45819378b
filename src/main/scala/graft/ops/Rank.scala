package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PageRank for corpus curation — the domain/popularity weighting stage
  * of web-corpus builds (CCNet/RefinedWeb weight documents by host rank;
  * the reference's graph seeds are the ML/array kernels, e.g.
  * presto-main-base/.../scalar/MathFunctions.java cosine + the iterative
  * patterns its clients run as query loops). The fixture has no link
  * table, so a deterministic synthetic graph derives from events
  * (src = user_id % 50, dst = (user_id*31 + event_id) % 50, distinct).
  *
  * Arithmetic is INTEGER-EXACT so any engine replays it bit-for-bit:
  * ranks are scaled by 1e12; one step is
  *   r'(n) = floor(0.15 * 1e12 / N) + Σ_in-edges floor(floor(r(u)*17/20)/odeg(u))
  * with floor division at each stage (doubles would drift ULPs across
  * engines and iterations). 10 synchronous iterations, dangling mass
  * dropped (the standard simplification, mirrored in the oracle's
  * unrolled CTE chain).
  *
  * Scale shape (the same discipline as Dedup.nearDupClusters): each
  * iteration is ONE hash-shuffle of contributions on dst + a broadcast
  * of nothing; lineage is cut with localCheckpoint per round so 10 (or
  * 100) iterations never build a mega-plan. At 100 TB the edge table
  * partitions by src and stays put; only (dst, contrib) pairs move. */
object Rank {

  private val Scale = 1000000000000L // 1e12
  private val Iters = 10

  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables(s, dir, "events")
      .select((col("user_id") % 50).as("src"),
        ((col("user_id") * 31 + col("event_id")) % 50).as("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct()
      .localCheckpoint()
    val nNodes = nodes.count()
    val base = Scale * 15L / 100L / nNodes
    val odeg = edges.groupBy("src").agg(count(lit(1)).as("c"))
    var pr = nodes.withColumn("r", lit(Scale / nNodes))
    for (_ <- 1 to Iters) {
      val contrib = edges.join(pr, edges("src") === pr("n"))
        .join(odeg, "src")
        .select(col("dst"), expr("r * 17 DIV 20 DIV c").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("in_mass"))
      pr = nodes.join(contrib, nodes("n") === contrib("dst"), "left")
        .select(col("n"), (lit(base) + coalesce(col("in_mass"), lit(0L))).as("r"))
        .localCheckpoint()
    }
    pr.select(col("n").cast("long").as("node"), col("r").as("rank"))
      .orderBy(desc("rank"), asc("node"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pageRank)

  private def oracleSteps: String = (1 to Iters).map { i =>
    val prev = if (i == 1) "pr0" else s"pr${i - 1}"
    s"""pr$i AS (
       |  SELECT nodes.n,
       |    bs.base + COALESCE((
       |      SELECT CAST(SUM(p.r * 17 // 20 // o.c) AS BIGINT)
       |      FROM edges e JOIN $prev p ON p.n = e.src
       |      JOIN odeg o ON o.src = e.src
       |      WHERE e.dst = nodes.n), 0) AS r
       |  FROM nodes, bs)""".stripMargin
  }.mkString(",\n")

  val oracle: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH edges AS (SELECT DISTINCT user_id % 50 AS src,
         |    (user_id * 31 + event_id) % 50 AS dst FROM events),
         |nodes AS (SELECT DISTINCT src AS n FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |odeg AS (SELECT src, count(*) AS c FROM edges GROUP BY 1),
         |nn AS (SELECT count(*) AS nc FROM nodes),
         |bs AS (SELECT CAST(${Scale}::BIGINT * 15 // 100 // nc AS BIGINT)
         |         AS base,
         |         CAST(${Scale}::BIGINT // nc AS BIGINT) AS init
         |       FROM nn),
         |pr0 AS (SELECT n, init AS r FROM nodes, bs),
         |$oracleSteps
         |SELECT CAST(n AS BIGINT) AS node, CAST(r AS BIGINT) AS rank
         |FROM pr$Iters ORDER BY rank DESC, node""".stripMargin)
}
