package graft

import java.io.File
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AvroSource

/** Avro container source/sink (ops/AvroSource.scala): full type
  * roundtrip incl. nulls/date/timestamp/binary, distributed multi-file
  * layout, schema errors on unsupported types. */
class AvroSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fresh(name: String): String = {
    val d = new File(System.getProperty("java.io.tmpdir"), s"avrospec_$name")
    if (d.exists()) d.listFiles().foreach(_.delete())
    d.getPath
  }

  test("all supported types roundtrip, including nulls") {
    val rows = Seq(
      (1L, 7, 1.5f, 2.5, "a", true, Array[Byte](1, 2),
        Date.valueOf("2024-03-01"),
        Timestamp.valueOf("2024-03-01 10:11:12.123456")),
      (2L, 8, -0.5f, -3.5, "", false, Array.empty[Byte],
        Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:59:59.000001")))
      .toDF("l", "i", "f", "d", "s", "b", "bin", "dt", "ts")
    val withNulls = rows.unionByName(rows.limit(1).select(
      lit(3L).as("l"), lit(null).cast("int").as("i"),
      lit(null).cast("float").as("f"), lit(null).cast("double").as("d"),
      lit(null).cast("string").as("s"), lit(null).cast("boolean").as("b"),
      lit(null).cast("binary").as("bin"), lit(null).cast("date").as("dt"),
      lit(null).cast("timestamp").as("ts")))
    val out = fresh("types")
    assert(AvroSource.write(withNulls, out) == 3L)
    val back = AvroSource.read(spark, out).orderBy("l")
    assert(back.schema == withNulls.schema)
    val a = withNulls.orderBy("l").collect()
    val b = back.collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Array[Byte], q: Array[Byte]) => assert(p.sameElements(q))
          case (p, q) => assert(p == q, s"col $i: $p != $q")
        }
      }
    }
  }

  test("multi-partition write produces one file per non-empty partition") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(5)
    val out = fresh("parts")
    AvroSource.write(df, out)
    val files = new File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    assert(AvroSource.read(spark, out).count() == 100)
    assert(AvroSource.read(spark, out).agg(sum("k")).collect()
      .head.getLong(0) == 5050L)
  }

  test("unsupported column type refuses to write") {
    val df = Seq((1, Seq(1, 2))).toDF("k", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroSource.write(df, fresh("bad"))
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("read of an empty directory errors clearly") {
    val e = intercept[IllegalArgumentException] {
      AvroSource.read(spark, fresh("empty"))
    }
    assert(e.getMessage.contains("no .avro files"))
  }
}
