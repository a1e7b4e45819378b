package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RecordDecoders
import graft.ops.RecordDecoders.Field

/** Decoder semantics beyond the oracle gate: the raw decoder's
  * byte-range + big-endian contract (reference raw/RawRowDecoder.java
  * ByteBuffer reads) against hand-computed frames, and json temporal
  * field decoders. */
class RecordDecodersSpec extends AnyFunSuite {
  import TestSpark._

  test("raw decoder reads big-endian ranges like the reference's ByteBuffer") {
    import spark.implicits._
    // frame: 8-byte long 258, 4-byte int 7, 8-byte double 1.5
    val long258 = Array[Byte](0, 0, 0, 0, 0, 0, 1, 2)
    val int7 = Array[Byte](0, 0, 0, 7)
    val d15 = java.nio.ByteBuffer.allocate(8).putDouble(1.5).array()
    val frame = long258 ++ int7 ++ d15
    val df = Seq(Tuple1(frame)).toDF("value")
    val out = RecordDecoders.decode(df, "raw", Seq(
      Field("a", "long", "0:8", "LONG"),
      Field("b", "int", "8:12", "INT"),
      Field("c", "double", "12:20", "DOUBLE"))).collect()(0)
    assert(out.getLong(0) == 258L)
    assert(out.getInt(1) == 7)
    assert(out.getDouble(2) == 1.5)
  }

  test("raw BYTE/SHORT hints decode single and double bytes") {
    import spark.implicits._
    val frame = Array[Byte](5, 1, 1) // byte 5, short 257
    val df = Seq(Tuple1(frame)).toDF("value")
    val out = RecordDecoders.decode(df, "raw", Seq(
      Field("b", "byte", "0:1", "BYTE"),
      Field("s", "short", "1:3", "SHORT"))).collect()(0)
    assert(out.getByte(0) == 5.toByte)
    assert(out.getShort(1) == 257.toShort)
  }

  test("json temporal field decoders parse the reference's dataFormats") {
    import spark.implicits._
    val df = Seq(Tuple1(
      """{"iso":"2021-06-15T12:30:00Z","sec":1623760200,"ms":1623760200500}"""
        .getBytes("UTF-8"))).toDF("value")
    val out = RecordDecoders.decode(df, "json", Seq(
      Field("i", "timestamp", "iso", "iso8601"),
      Field("s", "timestamp", "sec", "seconds-since-epoch"),
      Field("m", "timestamp", "ms", "milliseconds-since-epoch"))).collect()(0)
    assert(out.getTimestamp(0).toInstant.toString == "2021-06-15T12:30:00Z")
    assert(out.getTimestamp(1).toInstant.getEpochSecond == 1623760200L)
    assert(out.getTimestamp(2).toInstant.toEpochMilli == 1623760200500L)
  }

  test("csv decoder maps zero-based indices") {
    import spark.implicits._
    val df = Seq(Tuple1("7,foo,2.5".getBytes("UTF-8"))).toDF("value")
    val out = RecordDecoders.decode(df, "csv", Seq(
      Field("x", "long", "0"),
      Field("y", "string", "1"),
      Field("z", "double", "2"))).collect()(0)
    assert(out.getLong(0) == 7L && out.getString(1) == "foo" &&
      out.getDouble(2) == 2.5)
  }
}
