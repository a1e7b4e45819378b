package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import scala.collection.concurrent.TrieMap

/** Session-statement surface of the reference's coordinator: PREPARE /
  * EXECUTE [USING] / DEALLOCATE PREPARE (presto-main-base/.../execution/
  * PrepareTask.java, DeallocateTask.java, the parameter rewrite in
  * …/sql/planner/ParameterRewriter.java), DESCRIBE INPUT / DESCRIBE OUTPUT
  * (…/sql/rewrite/DescribeInputRewrite.java, DescribeOutputRewrite.java)
  * and SET / RESET / SHOW SESSION (…/execution/SetSessionTask.java,
  * ResetSessionTask.java, properties in …/SystemSessionProperties.java).
  *
  * Statements are session-scoped: state keys on `spark.sessionUUID`, so
  * prepared names and properties follow the SparkSession exactly like the
  * reference's Session object. Two reference properties are bridged to
  * their Spark equivalents (`hash_partition_count` →
  * spark.sql.shuffle.partitions, `join_distribution_type` → the broadcast
  * threshold); every property round-trips through SHOW SESSION.
  *
  * DESCRIBE OUTPUT reports (column_name, type) — the reference adds
  * catalog/schema/table provenance columns Catalyst doesn't track
  * per-column; DESCRIBE INPUT reports positions with type `unknown`, the
  * reference's answer for parameters whose type isn't inferable.
  */
object SessionStatements {

  private val prepared = TrieMap.empty[(String, String), String]
  private val props = TrieMap.empty[(String, String), String]

  private val Prepare = """(?is)\APREPARE\s+(\w+)\s+FROM\s+(.+)\z""".r
  private val Execute = """(?is)\AEXECUTE\s+(\w+)(?:\s+USING\s+(.+))?\z""".r
  private val Dealloc = """(?is)\ADEALLOCATE\s+PREPARE\s+(\w+)\z""".r
  private val DescIn = """(?is)\ADESCRIBE\s+INPUT\s+(\w+)\z""".r
  private val DescOut = """(?is)\ADESCRIBE\s+OUTPUT\s+(\w+)\z""".r
  private val SetSess = """(?is)\ASET\s+SESSION\s+([\w.]+)\s*=\s*(.+)\z""".r
  private val ResetSess = """(?is)\ARESET\s+SESSION\s+([\w.]+)\z""".r
  private val ShowSess = """(?is)\ASHOW\s+SESSION\z""".r
  // transaction control (SqlBase.g4 startTransaction/commit/rollback;
  // StartTransactionTask / CommitTask / RollbackTask)
  private val StartTx = """(?is)\ASTART\s+TRANSACTION(?:\s+(.*))?\z""".r
  private val CommitTx = """(?is)\ACOMMIT(?:\s+WORK)?\z""".r
  private val RollbackTx = """(?is)\AROLLBACK(?:\s+WORK)?\z""".r

  /** Try to handle `text` as a session statement; None → plain query. */
  def dispatch(ses: SqlSession, text: String): Option[DataFrame] = {
    val spark = ses.spark
    val sid = DdlStatements.sessionId(spark)
    text.trim.stripSuffix(";").trim match {
      case Prepare(name, query) =>
        prepared.put((sid, name.toLowerCase), query.trim)
        Some(status(spark, "PREPARE"))
      case Execute(name, using) =>
        val q = lookup(sid, name)
        val params = Option(using).map(splitTopLevel).getOrElse(Nil)
        Some(ses.sql(substitute(q, params)))
      case Dealloc(name) =>
        lookup(sid, name) // raises on unknown name like DeallocateTask
        prepared.remove((sid, name.toLowerCase))
        Some(status(spark, "DEALLOCATE"))
      case DescIn(name) =>
        val n = countParameters(lookup(sid, name))
        Some(spark.createDataFrame(
          spark.sparkContext.parallelize(
            (1 to n).map(i => Row(i.toLong, "unknown")), 1),
          StructType(Seq(StructField("position", LongType, nullable = false),
            StructField("type", StringType, nullable = false)))))
      case DescOut(name) =>
        val schema = ses.sql(substitute(lookup(sid, name),
          List.fill(countParameters(lookup(sid, name)))("NULL"))).schema
        Some(spark.createDataFrame(
          spark.sparkContext.parallelize(
            // reference type spellings (DescribeOutputRewrite emits varchar
            // etc.), matching SHOW COLUMNS' vocabulary
            schema.fields.map(f =>
              Row(f.name, DdlStatements.prestoTypeName(f.dataType))).toSeq, 1),
          StructType(Seq(StructField("column_name", StringType, nullable = false),
            StructField("type", StringType, nullable = false)))))
      case SetSess(key, raw) =>
        val v = unquote(raw.trim)
        props.put((sid, key), v)
        bridge(spark, key, Some(v))
        Some(status(spark, "SET SESSION"))
      case ResetSess(key) =>
        props.remove((sid, key))
        bridge(spark, key, None)
        Some(status(spark, "RESET SESSION"))
      case ShowSess() =>
        val rows = props.collect { case ((s, k), v) if s == sid => (k, v) }
          .toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
        Some(spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("name", StringType, nullable = false),
            StructField("value", StringType, nullable = false)))))
      case StartTx(modes) =>
        val m = Option(modes).getOrElse("").toUpperCase
        if (m.contains("READ ONLY") && m.contains("READ WRITE"))
          throw new IllegalArgumentException("Invalid transaction mode")
        val iso = "ISOLATION\\s+LEVEL\\s+(READ\\s+UNCOMMITTED|READ\\s+COMMITTED|REPEATABLE\\s+READ|SERIALIZABLE)".r
          .findFirstMatchIn(m).map(_.group(1).replaceAll("\\s+", " "))
          .getOrElse("READ COMMITTED")
        graft.ops.Transactions.begin(spark,
          readOnly = m.contains("READ ONLY"), isolation = iso)
        Some(status(spark, "START TRANSACTION"))
      case CommitTx() =>
        graft.ops.Transactions.commit(spark)
        Some(status(spark, "COMMIT"))
      case RollbackTx() =>
        graft.ops.Transactions.rollback(spark)
        Some(status(spark, "ROLLBACK"))
      case _ => None
    }
  }

  private def lookup(sid: String, name: String): String =
    prepared.getOrElse((sid, name.toLowerCase),
      throw new IllegalArgumentException(
        s"Prepared statement not found: ${name.toLowerCase}"))

  private def status(spark: SparkSession, s: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(s)), 1),
      StructType(Seq(StructField("result", StringType, nullable = false))))

  /** Reference session properties with a direct Spark equivalent. */
  private def bridge(spark: SparkSession, key: String, v: Option[String]): Unit =
    key match {
      case "hash_partition_count" =>
        v match {
          case Some(n) => spark.conf.set("spark.sql.shuffle.partitions", n.toInt)
          case None => spark.conf.unset("spark.sql.shuffle.partitions")
        }
      case "join_distribution_type" =>
        v.map(_.toUpperCase) match {
          case Some("PARTITIONED") =>
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
          case _ => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        }
      // reference HBO toggles (SystemSessionProperties.java:
      // track_history_based_plan_statistics /
      // use_history_based_plan_statistics) — both map onto the one
      // history store + hint rule in rules/HistoryBasedStats.scala
      case "track_history_based_plan_statistics"
         | "use_history_based_plan_statistics" =>
        v.map(_.toLowerCase) match {
          case Some("true") => graft.rules.HistoryBasedStats.install(spark)
          case _ => graft.rules.HistoryBasedStats.enabled = false
        }
      case _ => () // engine-agnostic property: recorded, surfaced by SHOW
    }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else s

  /** Positional `?` parameters outside string literals. */
  private def countParameters(sql: String): Int = {
    var n = 0; var i = 0; var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (c == '?' && !inStr) n += 1
      i += 1
    }
    n
  }

  /** Substitute `?` placeholders left-to-right with literal texts —
    * the textual analogue of ParameterRewriter over the parsed tree. */
  private def substitute(sql: String, params: Seq[String]): String = {
    val sb = new StringBuilder
    var i = 0; var inStr = false; var p = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inStr = !inStr; sb.append(c) }
      else if (c == '?' && !inStr) {
        if (p >= params.length) throw new IllegalArgumentException(
          s"Incorrect number of parameters: expected > ${params.length}")
        sb.append(params(p)); p += 1
      } else sb.append(c)
      i += 1
    }
    if (p != params.length) throw new IllegalArgumentException(
      s"Incorrect number of parameters: expected $p but found ${params.length}")
    sb.toString
  }

  /** Split `USING a, b, c` on top-level commas (quotes and parens nest). */
  private def splitTopLevel(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach { c =>
      if (c == '\'') { inStr = !inStr; sb.append(c) }
      else if (!inStr && (c == '(' || c == '[')) { depth += 1; sb.append(c) }
      else if (!inStr && (c == ')' || c == ']')) { depth -= 1; sb.append(c) }
      else if (!inStr && c == ',' && depth == 0) { out += sb.toString.trim; sb.clear() }
      else sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.toList
  }
}
