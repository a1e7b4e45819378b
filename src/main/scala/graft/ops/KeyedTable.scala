package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import JdbcDialects.{JdbcDomain, JdbcRange}

/** Keyed-table connector — the Spark-first analogue of the reference's
  * Cassandra/Kudu connectors (presto-cassandra, presto-kudu): tables
  * whose physical layout IS the index. Cassandra routes a query by its
  * PARTITION KEY to the owning nodes (CassandraPartitionManager.java:60-104
  * enumerates the partitions matching the key predicate) and pushes
  * CLUSTERING KEY predicates into CQL under the prefix rule
  * (CassandraClusteringPredicatesExtractor.getClusteringKeysSet:69-163):
  * clustering columns are consumed IN DECLARED ORDER; a missing or
  * nullable domain stops the prefix; equality / IN keeps it going; a
  * range predicate is pushed but TERMINATES the prefix (only the last
  * pushed column may be a range); a mixed equality+range domain on one
  * column is not pushable at all.
  *
  * Here the layout is parquet bucketed by hash(partition key) into
  * `pk_bucket=NN` dirs and sorted by (pk, clustering keys) within files:
  *  - [[lookup]] lists ONLY the probed keys' bucket dirs (the
  *    partition-routing analogue, same probe-pruning pattern as
  *    IndexJoin/SearchIndex) and compiles every domain through
  *    [[DocumentStore.domainFilter]] — the sorted layout turns the
  *    clustering prefix into parquet row-group min/max pruning, which is
  *    exactly the role the CQL pushdown plays server-side;
  *  - [[clusteringPushdown]] reproduces the extractor's prefix split
  *    (pushed vs residual), spec-pinned shape-for-shape, and [[cql]]
  *    renders the CQL SELECT a real Cassandra endpoint would receive.
  *
  * 100 TB shape: a point lookup touches 1 of B bucket dirs regardless of
  * table size; clustering ranges scan only row groups whose (sorted)
  * min/max overlap. Nothing enumerates the table.
  */
object KeyedTable {

  private def tmp(name: String): String = s"/tmp/graft_keyed/$name"

  def bucketExpr(c: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(c), lit(buckets)).cast("int")

  /** Mirror of the write-side bucketing for probe routing (long keys). */
  def bucketOf(key: Long, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      key, LongType, 42L)
    ((h % buckets) + buckets).toInt % buckets
  }

  /** Write the keyed layout: bucket dirs by hashed partition key, files
    * sorted by (pk, clustering keys) for row-group pruning. */
  def create(df: DataFrame, pkCol: String, ckCols: Seq[String],
      buckets: Int, path: String): Unit =
    df.withColumn("pk_bucket", bucketExpr(col(pkCol), buckets))
      .repartition(col("pk_bucket"))
      .sortWithinPartitions((pkCol +: ckCols).map(col): _*)
      .write.mode("overwrite").partitionBy("pk_bucket").parquet(path)

  /** getClusteringKeysSet's prefix split: returns (pushed, residual)
    * domains. `domains` must be keyed by clustering column name; columns
    * absent from it stop the prefix. */
  def clusteringPushdown(ckCols: Seq[String],
      domains: Map[String, JdbcDomain]): (Seq[JdbcDomain], Seq[JdbcDomain]) = {
    val pushed = scala.collection.mutable.ArrayBuffer[JdbcDomain]()
    var open = true
    ckCols.foreach { ck =>
      if (open) domains.get(ck) match {
        case None => open = false
        case Some(d) if d.nullAllowed || d.isAll || d.isNone => open = false
        case Some(d) =>
          val singles = d.ranges.count(_.isSingleValue)
          val ranges = d.ranges.size - singles
          if (singles > 0 && ranges > 0) open = false // mixed: not pushable
          else {
            pushed += d
            if (ranges > 0) open = false // range terminates the prefix
          }
      }
    }
    val pushedCols = pushed.map(_.column).toSet
    (pushed.toSeq,
      domains.valuesIterator.filterNot(d => pushedCols(d.column)).toSeq)
  }

  /** The CQL SELECT a real endpoint would receive: partition-key IN
    * restriction + the pushed clustering prefix (rendered with the
    * extractor's =, IN, and range spellings). */
  def cql(table: String, pkCol: String, pkValues: Seq[Any],
      pushed: Seq[JdbcDomain]): String = {
    def v(x: Any): String = x match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case other => other.toString
    }
    val pk =
      if (pkValues.size == 1) s"$pkCol = ${v(pkValues.head)}"
      else s"$pkCol IN (${pkValues.map(v).mkString(",")})"
    val cks = pushed.map { d =>
      val singles = d.ranges.filter(_.isSingleValue).map(_.low.get)
      if (singles.size == 1) s"${d.column} = ${v(singles.head)}"
      else if (singles.size > 1)
        s"${d.column} IN (${singles.map(v).mkString(",")})"
      else d.ranges.flatMap(r =>
        r.low.map(lo =>
          s"${d.column} ${if (r.lowInclusive) ">=" else ">"} ${v(lo)}").toSeq ++
        r.high.map(hi =>
          s"${d.column} ${if (r.highInclusive) "<=" else "<"} ${v(hi)}").toSeq)
        .mkString(" AND ")
    }
    s"SELECT * FROM $table WHERE " + (pk +: cks).mkString(" AND ")
  }

  /** Partition-routed read: list only the probed keys' bucket dirs, then
    * apply pk IN + all clustering domains (pushed and residual both
    * evaluate here; the split decides what a remote CQL endpoint would
    * see, and is exercised by [[cql]] + the spec). */
  def lookup(s: SparkSession, path: String, pkCol: String,
      pkValues: Seq[Long], ckDomains: Seq[JdbcDomain],
      buckets: Int): DataFrame = {
    val bs = pkValues.map(bucketOf(_, buckets)).distinct
    val dirs = bs.map(b => s"$path/pk_bucket=$b")
      .filter(p => new java.io.File(p).isDirectory)
    val src =
      if (dirs.isEmpty) s.read.parquet(path).where(lit(false))
      else s.read.option("basePath", path).parquet(dirs: _*)
    val keyed = src.where(col(pkCol).isin(pkValues: _*))
    ckDomains.foldLeft(keyed)((df, d) =>
      df.where(DocumentStore.domainFilter(d)))
      .drop("pk_bucket")
  }

  // ------------------------------------------------------------------ gates

  /** Orders keyed by customer (Cassandra's canonical "partition per
    * customer" model), clustered by order date: point-lookup three
    * customers, clustering range on the date prefix. */
  def keyedLookupGate(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("orders_by_cust")
    create(Tables(s, dir, "orders")
        .withColumn("o_date", col("o_orderdate").cast("date").cast("string")),
      "o_custkey", Seq("o_date"), 32, path)
    val (pushed, residual) = clusteringPushdown(Seq("o_date"), Map(
      "o_date" -> JdbcDomain("o_date", StringType,
        Seq(JdbcRange(Some("1994-01-01"), true, Some("1997-01-01"), false)))))
    require(residual.isEmpty && pushed.size == 1)
    lookup(s, path, "o_custkey", Seq(7L, 43L, 101L, 222L, 333L, 444L, 555L, 666L, 777L, 888L), pushed, 32)
      .select("o_orderkey", "o_custkey", "o_date", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_keyed_lookup" -> keyedLookupGate)

  val oracle: Map[String, String] = Map(
    "src_keyed_lookup" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
        |  o_totalprice
        |FROM orders
        |WHERE o_custkey IN (7, 43, 101, 222, 333, 444, 555, 666, 777, 888)
        |  AND CAST(CAST(o_orderdate AS DATE) AS VARCHAR) >= '1994-01-01'
        |  AND CAST(CAST(o_orderdate AS DATE) AS VARCHAR) < '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin)
}
