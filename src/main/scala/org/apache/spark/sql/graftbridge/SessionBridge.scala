package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Access to `SparkSession.cloneSession()` (private[sql]): an isolated
  * copy of the session — own SQL conf, temp views, and registered
  * functions, snapshotted at clone time — sharing the SparkContext and
  * the persistent catalog. The statement protocol clones one per request
  * so concurrent queries cannot see each other's SET SESSION / PREPARE
  * effects, the way the reference coordinator rebuilds a Session per
  * request (presto-main QueuedStatementResource.java). `newSession()`
  * (public) is NOT enough: it starts from empty state and would not see
  * the temp views the host application registered. */
object SessionBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
