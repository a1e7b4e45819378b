package graft.rules

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** History-based optimization seed — the reference's HBO
  * (presto-main-base/.../cost/HistoryBasedPlanStatisticsCalculator.java +
  * HistoricalStatisticsEquivalentPlanMarkingOptimizer: record the ACTUAL
  * output statistics of executed plan fragments keyed by a canonicalized
  * plan fingerprint, and serve them to the optimizer the next time an
  * equivalent fragment is planned).
  *
  * Spark-first mapping: a QueryExecutionListener walks every executed
  * physical node back to its logical link and records the observed
  * `numOutputRows` under the CANONICALIZED logical subtree (Catalyst's
  * canonical form normalizes expression ids and aliases — the same role
  * as the reference's plan-canonicalization hash). The optimizer side is
  * one Rule[LogicalPlan]: a join side whose recorded actual rows are
  * small gets a BROADCAST join hint when static size estimates would
  * have chosen a shuffle join. This is the cross-QUERY complement to
  * AQE's within-query re-planning: AQE can only convert to broadcast
  * after the small side's map stage has already run; the history hint
  * plans the broadcast from the start — at 100 TB that is the difference
  * between shuffling a fact table and not.
  *
  * History is bounded (LRU-ish cap) and keyed per-JVM; the reference
  * persists its history service-side, which an engine deployment would
  * do with an external store — the planning contract is identical.
  */
object HistoryBasedStats {

  /** canonicalized-subtree fingerprint → last observed output rows. */
  private val history = TrieMap.empty[Long, Long]
  private val MaxEntries = 4096

  /** Row count under which an observed side is broadcast-worthy (the
    * hint analog of autoBroadcastJoinThreshold, in rows because history
    * records rows; ~10MB at 100B/row). */
  @volatile var broadcastRowThreshold: Long = 100000L

  /** Gate for both recording and hinting — the reference exposes HBO as
    * session properties (`track_history_based_plan_statistics` /
    * `use_history_based_plan_statistics`,
    * SystemSessionProperties.java), default off; install() turns it on. */
  @volatile var enabled: Boolean = false

  /** 64-bit fingerprint of the canonicalized subtree. A 32-bit product
    * hashCode gives ~50% collision odds at ~77k distinct plans (birthday
    * bound) — and a collision here is not "a slow plan" but a BROADCAST
    * hint attached to the wrong (possibly huge) side. Two independent
    * 32-bit hashes of the canonicalized plan STRING (JLS-stable
    * String.hashCode + fixed-seed MurmurHash3) concatenated to 64 bits
    * push that bound past 5 billion plans, and a string hash is also
    * stable across JVM versions in a way case-class product hashing is
    * not guaranteed to be (save/load shares history across processes). */
  def fingerprint(plan: LogicalPlan): Long = {
    val s = plan.canonicalized.toString
    (s.hashCode.toLong << 32) |
      (scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL)
  }

  def recorded(plan: LogicalPlan): Option[Long] =
    history.get(fingerprint(plan))

  def clear(): Unit = history.clear()

  /** Debug view of the recorded history (fingerprint → rows). */
  def dump: Seq[(Long, Long)] = history.toSeq

  /** Persist / restore the history. The reference keeps its statistics
    * store OUTSIDE the coordinator process (redis-hbo-provider /
    * HistoryBasedPlanStatisticsProvider SPI) so history survives restarts
    * and is shared across coordinators; a deployment of this engine
    * points `save`/`load` at a shared path with the same effect.
    * Fingerprints are 64-bit string hashes of canonicalized plans
    * (stable values: paths, schemas, normalized expression ids), so they
    * remain valid across JVMs reading the same tables. */
  def save(file: java.io.File): Unit = {
    val text = history.toSeq.sorted
      .map { case (k, v) => s"$k,$v" }.mkString("", "\n", "\n")
    val tmp = new java.io.File(file.getParentFile, file.getName + ".tmp")
    java.nio.file.Files.write(tmp.toPath, text.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, file.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def load(file: java.io.File): Unit =
    if (file.isFile)
      new String(java.nio.file.Files.readAllBytes(file.toPath), "UTF-8")
        .linesIterator.filter(_.nonEmpty).foreach { line =>
          val c = line.indexOf(',')
          if (c > 0) history.put(line.take(c).toLong, line.drop(c + 1).toLong)
        }

  private def put(plan: LogicalPlan, rows: Long): Unit = {
    if (history.size >= MaxEntries) history.clear() // crude bound; rebuilt fast
    history.put(fingerprint(plan), rows)
    ()
  }

  /** Record actuals from one executed plan tree. `foreach` alone is not
    * enough under AQE: `QueryStageExec` nodes (ShuffleQueryStage,
    * BroadcastQueryStage, ResultQueryStage) are LEAVES of the adaptive
    * tree whose materialized subtree hangs off `.plan` — descend into
    * them explicitly or the walk stops at the root stage. */
  private def record(plan: SparkPlan): Unit = if (enabled) walk(plan)

  private def walk(node: SparkPlan): Unit = {
    for {
      ll <- node.logicalLink
      m <- node.metrics.get("numOutputRows")
      if m.value > 0
    } put(ll, m.value)
    node match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case _ => node.children.foreach(walk)
    }
  }

  object Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      try record(qe.executedPlan) catch { case _: Throwable => () }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        exception: Exception): Unit = ()
  }

  /** The planner side: hint a join side BROADCAST when history says its
    * actual output is small and no explicit strategy hint exists. */
  object Rule extends Rule[LogicalPlan] {
    /** History for the side, descending through row-preserving Projects
      * (ProjectExec carries no numOutputRows metric, so history lands on
      * the Filter/relation below it — same row count). */
    @annotation.tailrec
    private def lookup(side: LogicalPlan): Option[Long] =
      recorded(side) match {
        case s @ Some(_) => s
        case None => side match {
          case p: Project => lookup(p.child)
          case _ => None
        }
      }
    /** Static-estimate guard: a BROADCAST hint bypasses Spark's size
      * checks, so a stale/colliding history entry must not broadcast a
      * side whose static size estimate is plainly enormous. The guard is
      * deliberately generous (history exists precisely because static
      * estimates miss filter selectivity — a filtered scan's static size
      * is the full-scan size), so only a history-vs-static disagreement
      * of OOM magnitude suppresses the hint. */
    @volatile var staticBytesGuard: BigInt = BigInt(8L << 30)
    private def smallInHistory(side: LogicalPlan): Boolean =
      lookup(side).exists(_ <= broadcastRowThreshold) &&
        side.stats.sizeInBytes <= staticBytesGuard
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!enabled) plan else plan.transformUp {
      case j @ Join(left, right, _, _, JoinHint(None, None)) =>
        val hintLeft = smallInHistory(left)
        val hintRight = smallInHistory(right)
        if (!hintLeft && !hintRight) j
        else {
          val bc = Some(HintInfo(strategy = Some(BROADCAST)))
          j.copy(hint = JoinHint(
            leftHint = if (hintLeft) bc else None,
            rightHint = if (hintRight) bc else None))
        }
    }
  }

  /** Register listener + rule on a session and enable (idempotent). */
  def install(spark: SparkSession): Unit = {
    enabled = true
    if (!spark.experimental.extraOptimizations.contains(Rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Rule
    // listenerManager dedups registered instances? It does not — guard
    // with a session-keyed set.
    if (installed.add(spark)) spark.listenerManager.register(Listener)
  }

  private val installed =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
}
