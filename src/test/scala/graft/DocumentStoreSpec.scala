package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.ops.DocumentStore
import graft.ops.JdbcDialects.{JdbcDomain, JdbcRange}

/** Pins the Mongo filter-document generation against the reference's
  * MongoSession.buildPredicate:299-345 shapes, and checks the Catalyst
  * compile of the same domain agrees with the document semantics. */
class DocumentStoreSpec extends AnyFunSuite {

  test("single value renders {\"$eq\"}; several collapse to {\"$in\"}") {
    assert(DocumentStore.predicateDocument(
      JdbcDomain("age", IntegerType, Seq(JdbcRange.equalTo(30))))
      === """{"age": {"$eq": 30}}""")
    assert(DocumentStore.predicateDocument(
      JdbcDomain("seg", StringType,
        Seq(JdbcRange.equalTo("A"), JdbcRange.equalTo("B"))))
      === """{"seg": {"$in": ["A", "B"]}}""")
  }

  test("bounded range renders gte/lt conjunct document") {
    assert(DocumentStore.predicateDocument(
      JdbcDomain("price", DoubleType,
        Seq(JdbcRange(Some(10.0), true, Some(20.0), false))))
      === """{"price": {"$gte": 10.0, "$lt": 20.0}}""")
  }

  test("range + singleton disjuncts wrap in $or; nullable appends the " +
    "exists/eq-null disjunct (buildPredicate:330-341)") {
    assert(DocumentStore.predicateDocument(
      JdbcDomain("n", IntegerType,
        Seq(JdbcRange(Some(1), true, Some(5), true), JdbcRange.equalTo(9))))
      === """{"$or": [{"n": {"$gte": 1, "$lte": 5}}, {"n": {"$eq": 9}}]}""")
    assert(DocumentStore.predicateDocument(
      JdbcDomain("n", IntegerType, Seq(JdbcRange.equalTo(7)),
        nullAllowed = true))
      === """{"$or": [{"n": {"$eq": 7}}, {"n": {"$exists": true, "$eq": null}}]}""")
  }

  test("NONE-with-null and ALL-without-null shortcuts " +
    "(isNullPredicate / isNotNullPredicate)") {
    assert(DocumentStore.predicateDocument(
      JdbcDomain("x", IntegerType, Nil, nullAllowed = true, isNone = true))
      === """{"x": {"$exists": true, "$eq": null}}""")
    assert(DocumentStore.predicateDocument(
      JdbcDomain("x", IntegerType, Nil, isAll = true))
      === """{"x": {"$ne": null}}""")
  }

  test("buildQuery merges per-column predicates into one document " +
    "(MongoSession.buildQuery putAll); projection document maps paths to 1") {
    val q = DocumentStore.queryDocument(Seq(
      JdbcDomain("a", IntegerType, Seq(JdbcRange.equalTo(1))),
      JdbcDomain("b.c", StringType, Seq(JdbcRange.equalTo("z")))))
    assert(q === """{"a": {"$eq": 1}, "b.c": {"$eq": "z"}}""")
    assert(DocumentStore.projectionDocument(Seq("a", "b.c"))
      === """{"a": 1, "b.c": 1}""")
  }

  test("the Catalyst compile of a domain selects the same rows the " +
    "document describes, through nested dotted paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    val coll = Seq(
      (1L, 5, Some("A")), (2L, 12, Some("B")), (3L, 25, None),
      (4L, 9, Some("A")), (5L, 40, Some("C")))
      .toDF("id", "v", "tag")
      .selectExpr("id", "named_struct('v', v, 'tag', tag) AS doc")

    val got = DocumentStore.find(coll,
      Seq(
        JdbcDomain("doc.v", IntegerType,
          Seq(JdbcRange(Some(6), true, Some(30), false))),
        JdbcDomain("doc.tag", StringType,
          Seq(JdbcRange.equalTo("A"), JdbcRange.equalTo("B")),
          nullAllowed = true)),
      Seq("id", "doc.v"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    // v in [6,30): ids 2(12,B), 3(25,null), 4(9,A); tag A/B-or-null keeps all 3
    assert(got.toSeq === Seq((2L, 12), (3L, 25), (4L, 9)))
  }

  test("gate runs end-to-end on the fixtures with an oracle declared") {
    val out = DocumentStore.docstoreQuery(TestSpark.spark, TestSpark.sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSeq === Seq("o_orderkey", "c_name", "o_totalprice"))
    assert(SparkEntry.oracleSql.contains("src_docstore_query"))
  }
}
