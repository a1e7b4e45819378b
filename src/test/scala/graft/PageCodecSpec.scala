package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.PageCodec

/** SerializedPage wire codec (api/PageCodec.scala; reference presto-spi
  * page/SerializedPage.java + PagesSerdeUtil.java + presto-common block
  * encodings): byte-exact framing, CRC32 checksum contract, null
  * bitmaps, and the scalar block-encoding family. */
class PageCodecSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("d", DoubleType),
    StructField("i", IntegerType), StructField("f", FloatType),
    StructField("sh", ShortType), StructField("b", BooleanType),
    StructField("y", ByteType), StructField("s", StringType),
    StructField("bin", BinaryType), StructField("dt", DateType),
    StructField("ts", TimestampType)))

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("all scalar encodings round-trip with nulls in every column") {
    val rows = Seq(
      Row(1L, 1.5, 7, 2.5f, 3.toShort, true, 9.toByte, "hello",
        Array[Byte](1, 2, 3), java.sql.Date.valueOf("2021-06-15"),
        ts("2021-06-15 12:34:56.789")),
      Row(null, null, null, null, null, null, null, null, null, null, null),
      Row(-42L, Double.NaN, -1, Float.NegativeInfinity, -2.toShort, false,
        -9.toByte, "héllo wörld", Array[Byte](),
        java.sql.Date.valueOf("1969-12-31"), ts("1969-12-31 23:59:59.999")))
    val bytes = PageCodec.serialize(schema, rows)
    val back = PageCodec.deserialize(schema, bytes)
    assert(back.size == rows.size)
    rows.zip(back).zipWithIndex.foreach { case ((want, got), ri) =>
      schema.fields.indices.foreach { i =>
        (want.get(i), got.get(i)) match {
          case (null, g) => assert(g == null, s"row $ri col $i")
          case (w: Array[Byte], g: Array[Byte]) =>
            assert(w.sameElements(g), s"row $ri col $i")
          case (w: Double, g: Double) if w.isNaN => assert(g.isNaN)
          case (w, g) => assert(w == g, s"row $ri col $i: $w != $g")
        }
      }
    }
  }

  test("a 9+ row page exercises multi-byte null bitmaps") {
    val s = StructType(Seq(StructField("v", LongType)))
    val rows = (0 until 21).map(i =>
      Row(if (i % 3 == 0) null else i.toLong))
    val back = PageCodec.deserialize(s, PageCodec.serialize(s, rows))
    assert(back.map(r => if (r.isNullAt(0)) null else r.getLong(0)) ==
      rows.map(r => r.get(0)))
  }

  test("LONG_ARRAY block bytes match the reference layout exactly") {
    val s = StructType(Seq(StructField("v", LongType)))
    val bytes = PageCodec.serialize(s, Seq(Row(1L), Row(null), Row(3L)))
    // metadata: positionCount=3 | markers=4 (CHECKSUMMED) | sizes | crc
    def intLE(b: Array[Byte], o: Int) =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    assert(intLE(bytes, 0) == 3)
    assert(bytes(4) == 4)
    val bodyLen = intLE(bytes, 5)
    assert(intLE(bytes, 9) == bodyLen)
    val body = bytes.drop(21)
    assert(body.length == bodyLen)
    // body: channelCount=1 | nameLen=10 | "LONG_ARRAY" | positions=3 |
    //       mayHaveNull=1 | bitmap 0b0100_0000 | longs 1 and 3
    assert(intLE(body, 0) == 1)
    assert(intLE(body, 4) == 10)
    assert(new String(body.slice(8, 18), "UTF-8") == "LONG_ARRAY")
    assert(intLE(body, 18) == 3)
    assert(body(22) == 1 && (body(23) & 0xff) == 0x40)
    assert(intLE(body, 24) == 1 && intLE(body, 28) == 0)
    assert(intLE(body, 32) == 3 && intLE(body, 36) == 0)
    assert(body.length == 40)
  }

  test("checksum detects corruption; encrypted pages are refused") {
    val s = StructType(Seq(StructField("v", LongType)))
    val bytes = PageCodec.serialize(s, Seq(Row(5L), Row(6L)))
    val tampered = bytes.clone()
    tampered(tampered.length - 1) = (tampered.last ^ 0x7f).toByte
    val e = intercept[IllegalArgumentException] {
      PageCodec.deserialize(s, tampered)
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
    // flipping COMPRESSED on an uncompressed page breaks the CRC (markers
    // feed the checksum) instead of misreading
    val flipped = bytes.clone()
    flipped(4) = (flipped(4) | 1).toByte
    val e2 = intercept[IllegalArgumentException] {
      PageCodec.deserialize(s, flipped)
    }
    assert(e2.getMessage.contains("checksum"), e2.getMessage)
    val encrypted = bytes.clone()
    encrypted(4) = (encrypted(4) | 2).toByte // ENCRYPTED marker
    val e3 = intercept[IllegalArgumentException] {
      PageCodec.deserialize(s, encrypted)
    }
    assert(e3.getMessage.contains("not supported"), e3.getMessage)
  }

  test("LZ4 COMPRESSED pages round-trip with the reference marker layout") {
    val s = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val rows = (0 until 4000).map(i => Row(i.toLong, s"repetitive-payload-${i % 7}"))
    val bytes = PageCodec.serialize(s, rows, compress = true)
    // metadata layout: positionCount int | markers byte | uncompressed int | size int
    assert((bytes(4) & 1) == 1, "COMPRESSED bit not set on a compressible page")
    assert((bytes(4) & 4) == 4, "CHECKSUMMED bit must stay set")
    def leInt(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    val uncompressedSize = leInt(5)
    val storedSize = leInt(9)
    assert(storedSize < uncompressedSize * 0.9,
      s"stored $storedSize not <90% of raw $uncompressedSize")
    assert(bytes.length == 4 + 1 + 4 + 4 + 8 + storedSize)
    val back = PageCodec.deserialize(s, bytes)
    assert(back == rows)
  }

  test("incompressible or small pages stay uncompressed under compress=true") {
    val s = StructType(Seq(StructField("b", BinaryType)))
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { _ =>
      val b = new Array[Byte](256); rnd.nextBytes(b); Row(b)
    }
    val bytes = PageCodec.serialize(s, rows, compress = true)
    assert((bytes(4) & 1) == 0, "random bytes must not carry COMPRESSED")
    val back = PageCodec.deserialize(s, bytes)
    assert(back.map(_.getAs[Array[Byte]](0).toSeq) ==
      rows.map(_.getAs[Array[Byte]](0).toSeq))
    // tiny page: below the threshold no compression is attempted
    val small = PageCodec.serialize(
      StructType(Seq(StructField("s", StringType))),
      Seq(Row("aaaaaaaaaa"), Row("aaaaaaaaaa")), compress = true)
    assert((small(4) & 1) == 0)
  }

  test("corruption inside a compressed body is caught by the checksum") {
    val s = StructType(Seq(StructField("v", StringType)))
    val rows = (0 until 3000).map(i => Row(s"zzzz-${i % 3}"))
    val bytes = PageCodec.serialize(s, rows, compress = true)
    assert((bytes(4) & 1) == 1)
    val tampered = bytes.clone()
    tampered(tampered.length - 5) = (tampered(tampered.length - 5) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException] {
      PageCodec.deserialize(s, tampered)
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("schema/channel mismatches error instead of misreading") {
    val s = StructType(Seq(StructField("v", LongType)))
    val bytes = PageCodec.serialize(s, Seq(Row(5L)))
    val wider = StructType(Seq(StructField("v", LongType),
      StructField("w", StringType)))
    intercept[IllegalArgumentException] {
      PageCodec.deserialize(wider, bytes)
    }
    val retyped = StructType(Seq(StructField("v", StringType)))
    intercept[IllegalArgumentException] {
      PageCodec.deserialize(retyped, bytes)
    }
  }
}
