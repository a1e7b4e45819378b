package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import JdbcDialects.{JdbcDomain, JdbcRange}

/** Document-store connector — the Spark-first analogue of the reference's
  * MongoDB connector (presto-mongodb). The reference maps a schemaless
  * collection to a typed table (schema inferred and kept in a `_schema`
  * collection — MongoSession.getTableMetadata), projects nested fields by
  * dotted path (MongoSession.execute:246-259 builds the projection
  * document), and pushes the constraint down as a Mongo filter document
  * (MongoSession.buildPredicate:299-345: non-singleton ranges become
  * {"$gte"/"$gt"/"$lte"/"$lt": v} conjunct documents, singletons collapse
  * to {"$eq": v} or {"$in": [...]}, a nullable domain appends the
  * {"$exists": true, "$eq": null} disjunct, and multiple disjuncts wrap
  * in {"$or": [{name: d}, ...]}).
  *
  * Here a collection is a JSON-lines directory (schemaless at rest, like
  * BSON), the table schema is Spark's JSON schema inference (the
  * `_schema` analogue), dotted-path projection is Catalyst struct-field
  * access, and the SAME column-domain model the JDBC dialects push to
  * remote SQL (JdbcDialects.JdbcDomain) compiles both ways:
  *
  *  - [[queryDocument]] renders the reference's Mongo filter document
  *    (generation-tested against buildPredicate's shapes — what a real
  *    mongo endpoint would receive);
  *  - [[domainFilter]] compiles the identical domain to a Catalyst
  *    Column, which is what executes here and what the oracle verifies.
  *
  * 100 TB shape: the filter document IS the scale story — evaluated
  * engine-side in real Mongo, and as a pushed-down data-source filter
  * here; projection documents prune columns the same way ReadSchema
  * pruning does on parquet. Nothing collects; schema inference samples
  * files, it does not scan the corpus.
  */
object DocumentStore {

  private def tmp(name: String): String = s"/tmp/graft_docstore/$name"

  // ------------------------------------------------- filter-document render

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n => n.toString
  }

  /** One column's predicate as the Mongo filter sub-document
    * (MongoSession.buildPredicate). Returns the JSON text of the
    * whole-column document ({name: {...}} or {"$or": [...]}). */
  def predicateDocument(d: JdbcDomain): String = {
    val name = jsonValue(d.column)
    if (d.isNone && d.nullAllowed)
      return s"""{$name: {"$$exists": true, "$$eq": null}}"""
    if (d.isAll && !d.nullAllowed)
      return s"""{$name: {"$$ne": null}}"""

    val disjuncts = scala.collection.mutable.ArrayBuffer[String]()
    val singles = scala.collection.mutable.ArrayBuffer[Any]()
    d.ranges.foreach { r =>
      if (r.isSingleValue) singles += r.low.get
      else {
        val conj = scala.collection.mutable.ArrayBuffer[String]()
        r.low.foreach(lo =>
          conj += s""""$$${if (r.lowInclusive) "gte" else "gt"}": ${jsonValue(lo)}""")
        r.high.foreach(hi =>
          conj += s""""$$${if (r.highInclusive) "lte" else "lt"}": ${jsonValue(hi)}""")
        disjuncts += "{" + conj.mkString(", ") + "}"
      }
    }
    if (singles.size == 1) disjuncts += s"""{"$$eq": ${jsonValue(singles.head)}}"""
    else if (singles.size > 1)
      disjuncts += s"""{"$$in": [${singles.map(jsonValue).mkString(", ")}]}"""
    if (d.nullAllowed) disjuncts += """{"$exists": true, "$eq": null}"""

    if (disjuncts.size == 1) s"{$name: ${disjuncts.head}}"
    else s"""{"$$or": [${disjuncts.map(dj => s"{$name: $dj}").mkString(", ")}]}"""
  }

  /** The whole find() filter document: per-column predicates merged into
    * one document (MongoSession.buildQuery:285-296 putAll). */
  def queryDocument(domains: Seq[JdbcDomain]): String =
    "{" + domains.map { d =>
      val doc = predicateDocument(d)
      doc.substring(1, doc.length - 1) // splice the column entries together
    }.mkString(", ") + "}"

  /** The projection document (MongoSession.execute:248-251: each
    * projected path mapped to 1). */
  def projectionDocument(paths: Seq[String]): String =
    "{" + paths.map(p => s"${jsonValue(p)}: 1").mkString(", ") + "}"

  // ------------------------------------------------------ Catalyst compile

  /** The same domain compiled to a Catalyst Column — what executes here.
    * Dotted paths resolve through struct fields, like Mongo's dotted
    * field names resolve through sub-documents. */
  def domainFilter(d: JdbcDomain): Column = {
    val c = col(d.column)
    if (d.isNone) return if (d.nullAllowed) c.isNull else lit(false)
    if (d.isAll) return if (d.nullAllowed) lit(true) else c.isNotNull

    val disjuncts = scala.collection.mutable.ArrayBuffer[Column]()
    val singles = scala.collection.mutable.ArrayBuffer[Any]()
    d.ranges.foreach { r =>
      if (r.isSingleValue) singles += r.low.get
      else {
        val conj = scala.collection.mutable.ArrayBuffer[Column]()
        r.low.foreach(lo => conj += (if (r.lowInclusive) c >= lo else c > lo))
        r.high.foreach(hi => conj += (if (r.highInclusive) c <= hi else c < hi))
        disjuncts += conj.reduce(_ && _)
      }
    }
    if (singles.size == 1) disjuncts += (c === singles.head)
    else if (singles.size > 1) disjuncts += c.isin(singles.toSeq: _*)
    if (d.nullAllowed) disjuncts += c.isNull
    disjuncts.reduce(_ || _)
  }

  def find(collection: DataFrame, domains: Seq[JdbcDomain],
      projection: Seq[String]): DataFrame = {
    val filtered =
      if (domains.isEmpty) collection
      else collection.where(domains.map(domainFilter).reduce(_ && _))
    // project dotted paths, aliased to their leaf names like the
    // reference surfaces nested fields as columns
    filtered.select(projection.map(p =>
      col(p).as(p.split('.').last)): _*)
  }

  // ------------------------------------------------------------------ gates

  /** End-to-end: nest orders under their customer into JSON documents
    * (the shape a Mongo collection of order-docs would have), infer the
    * schema back, push a mixed range+IN+string-range constraint, project
    * dotted paths. The oracle replays over the original relational
    * tables, so schema inference, the JSON value round-trip, AND the
    * filter semantics are all verified. */
  def docstoreQuery(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("orders_coll")
    val orders = Tables(s, dir, "orders")
    val customer = Tables(s, dir, "customer")
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(struct(
          col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
          col("o_orderstatus")).as("order"),
        struct(col("c_custkey"), col("c_name"), col("c_mktsegment")).as("cust"))
      .write.mode("overwrite").json(path)

    val coll = s.read.json(path) // inferred schema — the _schema analogue
    val domains = Seq(
      JdbcDomain("order.o_totalprice", DoubleType,
        Seq(JdbcRange(Some(1000.0), true, Some(150000.0), false))),
      JdbcDomain("cust.c_mktsegment", StringType,
        Seq(JdbcRange.equalTo("BUILDING"), JdbcRange.equalTo("AUTOMOBILE"))),
      JdbcDomain("order.o_orderdate", StringType,
        Seq(JdbcRange(Some("1994-01-01"), true, Some("1996-12-31"), true))))
    find(coll, domains,
      Seq("order.o_orderkey", "cust.c_name", "order.o_totalprice"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_docstore_query" -> docstoreQuery)

  val oracle: Map[String, String] = Map(
    "src_docstore_query" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice >= 1000.0 AND o_totalprice < 150000.0
        |  AND c_mktsegment IN ('BUILDING','AUTOMOBILE')
        |  AND CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |        BETWEEN '1994-01-01' AND '1996-12-31'
        |ORDER BY o_orderkey""".stripMargin)
}
