package graft.api

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The reference's SerializedPage wire codec (presto-spi/src/main/java/
  * com/facebook/presto/spi/page/SerializedPage.java, PagesSerdeUtil.java:
  * 64-87; block bodies per presto-common block/ ...BlockEncoding.java) —
  * the page format workers and the coordinator exchange, and what the
  * spooling/exchange surfaces persist. Byte-exact layout:
  *
  *   metadata: positionCount int | pageCodecMarkers byte |
  *             uncompressedSizeInBytes int | sizeInBytes int |
  *             checksum long         (all little-endian, airlift Slice)
  *   body:     channelCount int, then per channel one BLOCK:
  *             length-prefixed encoding name, encoding-specific body
  *
  * Block encodings implemented (the scalar family):
  *   LONG_ARRAY / INT_ARRAY / SHORT_ARRAY / BYTE_ARRAY —
  *     positionCount, nulls-as-bits (mayHaveNull byte + MSB-first packed
  *     bitmap, EncoderUtil.encodeNullsAsBits), then values for NON-NULL
  *     positions only;
  *   VARIABLE_WIDTH — positionCount, cumulative end-offset int per
  *     position (nulls contribute 0 length), nulls-as-bits, totalLength,
  *     raw bytes.
  *
  * Spark type mapping mirrors the reference's: bigint→LONG_ARRAY,
  * double→LONG_ARRAY of doubleToLongBits, integer/date→INT_ARRAY,
  * real→INT_ARRAY of floatToIntBits, smallint→SHORT_ARRAY,
  * boolean/tinyint→BYTE_ARRAY, varchar/varbinary→VARIABLE_WIDTH.
  * Markers: CHECKSUMMED (bit 3) always set; checksum is CRC32 over the
  * STORED body bytes (compressed bytes when COMPRESSED is set) + markers
  * byte + positionCount + uncompressedSize exactly as
  * PagesSerdeUtil.computeSerializedPageChecksum folds them.
  *
  * COMPRESSED (bit 1): LZ4 block format over the raw body, like the
  * reference's Lz4Compressor default (execution/buffer/PagesSerdeFactory
  * .java:75); per PagesSerde.wrapSlice the marker is set only when the
  * compressed body lands under MINIMUM_COMPRESSION_RATIO = 0.9 of the raw
  * size, else the page ships uncompressed. uncompressedSizeInBytes always
  * carries the raw length, sizeInBytes the stored length. ENCRYPTED pages
  * are still rejected loudly (no spill cipher in this engine). */
object PageCodec {

  private val Compressed: Int = 1 << 0
  private val Encrypted: Int = 1 << 1
  private val Checksummed: Int = 1 << 2

  /** PagesSerde.MINIMUM_COMPRESSION_RATIO — keep compression only when it
    * actually saves ≥10%. */
  private val MinCompressionRatio = 0.9
  /** Don't bother compressing tiny pages (fits the reference's behavior of
    * compressing serialized pages that matter; threshold is ours). */
  val CompressionThreshold = 1024

  private lazy val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance()

  // ---------- little-endian primitives (airlift Slice byte order)

  private final class Out {
    val bos = new ByteArrayOutputStream()
    def byte(b: Int): Unit = bos.write(b & 0xff)
    def int(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def short(v: Short): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def long(v: Long): Unit = { int(v.toInt); int((v >> 32).toInt) }
    def bytes(b: Array[Byte]): Unit = bos.write(b)
    def result(): Array[Byte] = bos.toByteArray
  }

  private final class In(buf: Array[Byte], var pos: Int) {
    def byte(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def int(): Int = byte() | (byte() << 8) | (byte() << 16) | (byte() << 24)
    def short(): Short = (byte() | (byte() << 8)).toShort
    def long(): Long = (int().toLong & 0xffffffffL) | (int().toLong << 32)
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
  }

  private def encodingFor(dt: DataType): String = dt match {
    case LongType | DoubleType | TimestampType | TimestampNTZType =>
      "LONG_ARRAY"
    case IntegerType | DateType | FloatType => "INT_ARRAY"
    case ShortType => "SHORT_ARRAY"
    case BooleanType | ByteType => "BYTE_ARRAY"
    case StringType | BinaryType => "VARIABLE_WIDTH"
    case other => throw new IllegalArgumentException(
      s"SerializedPage codec: unsupported type $other")
  }

  // EncoderUtil.encodeNullsAsBits: mayHaveNull boolean byte, then the
  // bitmap MSB-first per 8 positions
  private def writeNulls(out: Out, nulls: Array[Boolean]): Unit = {
    val mayHaveNull = nulls.exists(identity)
    out.byte(if (mayHaveNull) 1 else 0)
    if (!mayHaveNull) return
    var i = 0
    while (i < nulls.length) {
      var b = 0
      var mask = 0x80
      var j = i
      while (j < math.min(i + 8, nulls.length)) {
        if (nulls(j)) b |= mask
        mask >>>= 1
        j += 1
      }
      out.byte(b)
      i += 8
    }
  }

  private def readNulls(in: In, n: Int): Array[Boolean] = {
    val out = new Array[Boolean](n)
    if (in.byte() == 0) return out
    var i = 0
    while (i < n) {
      val b = in.byte()
      var mask = 0x80
      var j = i
      while (j < math.min(i + 8, n)) {
        out(j) = (b & mask) != 0
        mask >>>= 1
        j += 1
      }
      i += 8
    }
    out
  }

  private def toLongBits(v: Any, dt: DataType): Long = dt match {
    case LongType => v.asInstanceOf[Long]
    case DoubleType => java.lang.Double.doubleToRawLongBits(
      v.asInstanceOf[Double])
    case TimestampType =>
      v.asInstanceOf[java.sql.Timestamp].getTime * 1000L +
        (v.asInstanceOf[java.sql.Timestamp].getNanos / 1000) % 1000
    case TimestampNTZType =>
      java.time.Duration.between(java.time.LocalDateTime.ofEpochSecond(
        0, 0, java.time.ZoneOffset.UTC),
        v.asInstanceOf[java.time.LocalDateTime]).toNanos / 1000
    case _ => throw new IllegalArgumentException(dt.toString)
  }

  private def fromLongBits(l: Long, dt: DataType): Any = dt match {
    case LongType => l
    case DoubleType => java.lang.Double.longBitsToDouble(l)
    case TimestampType =>
      val t = new java.sql.Timestamp(Math.floorDiv(l, 1000L))
      t.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      t
    case TimestampNTZType => java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(l, 1000000L), (Math.floorMod(l, 1000000L) * 1000).toInt,
      java.time.ZoneOffset.UTC)
    case _ => throw new IllegalArgumentException(dt.toString)
  }

  private def toIntBits(v: Any, dt: DataType): Int = dt match {
    case IntegerType => v.asInstanceOf[Int]
    case FloatType => java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float])
    case DateType => v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
    }
    case _ => throw new IllegalArgumentException(dt.toString)
  }

  private def fromIntBits(i: Int, dt: DataType): Any = dt match {
    case IntegerType => i
    case FloatType => java.lang.Float.intBitsToFloat(i)
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i))
    case _ => throw new IllegalArgumentException(dt.toString)
  }

  private def writeName(out: Out, name: String): Unit = {
    val b = name.getBytes("UTF-8")
    out.int(b.length)
    out.bytes(b)
  }

  private def writeBlock(out: Out, dt: DataType, values: Array[Any]): Unit = {
    val name = encodingFor(dt)
    writeName(out, name)
    val n = values.length
    val nulls = values.map(_ == null)
    name match {
      case "LONG_ARRAY" =>
        out.int(n); writeNulls(out, nulls)
        values.foreach(v => if (v != null) out.long(toLongBits(v, dt)))
      case "INT_ARRAY" =>
        out.int(n); writeNulls(out, nulls)
        values.foreach(v => if (v != null) out.int(toIntBits(v, dt)))
      case "SHORT_ARRAY" =>
        out.int(n); writeNulls(out, nulls)
        values.foreach(v => if (v != null) out.short(v.asInstanceOf[Short]))
      case "BYTE_ARRAY" =>
        out.int(n); writeNulls(out, nulls)
        values.foreach(v => if (v != null) out.byte(dt match {
          case BooleanType => if (v.asInstanceOf[Boolean]) 1 else 0
          case _ => v.asInstanceOf[Byte].toInt
        }))
      case "VARIABLE_WIDTH" =>
        out.int(n)
        val raw = values.map {
          case null => Array.empty[Byte]
          case s: String => s.getBytes("UTF-8")
          case b: Array[Byte] => b
        }
        var total = 0
        raw.foreach { b => total += b.length; out.int(total) }
        writeNulls(out, nulls)
        out.int(total)
        raw.foreach(out.bytes)
    }
  }

  private def readBlock(in: In, dt: DataType): Array[Any] = {
    val nameLen = in.int()
    val name = new String(in.bytes(nameLen), "UTF-8")
    require(name == encodingFor(dt),
      s"block encoding $name does not match expected " +
        s"${encodingFor(dt)} for $dt")
    val n = in.int()
    name match {
      case "LONG_ARRAY" =>
        val nulls = readNulls(in, n)
        nulls.map(isNull => if (isNull) null else fromLongBits(in.long(), dt))
      case "INT_ARRAY" =>
        val nulls = readNulls(in, n)
        nulls.map(isNull => if (isNull) null else fromIntBits(in.int(), dt))
      case "SHORT_ARRAY" =>
        val nulls = readNulls(in, n)
        nulls.map(isNull => if (isNull) null
        else (in.short(): java.lang.Short))
      case "BYTE_ARRAY" =>
        val nulls = readNulls(in, n)
        nulls.map(isNull => if (isNull) null else dt match {
          case BooleanType => java.lang.Boolean.valueOf(in.byte() != 0)
          case _ => java.lang.Byte.valueOf(in.byte().toByte)
        })
      case "VARIABLE_WIDTH" =>
        val offsets = (0 until n).map(_ => in.int())
        val nulls = readNulls(in, n)
        val total = in.int()
        val raw = in.bytes(total)
        var prev = 0
        (0 until n).map { i =>
          val end = offsets(i)
          val slice = java.util.Arrays.copyOfRange(raw, prev, end)
          prev = end
          if (nulls(i)) null
          else dt match {
            case StringType => new String(slice, "UTF-8")
            case _ => slice
          }
        }.toArray[Any]
    }
  }

  /** PagesSerdeUtil.updateCrc: an int feeds CRC32 one byte at a time,
    * low byte first. */
  private def updateCrc(crc: CRC32, v: Int): Unit = {
    var i = 0
    while (i < 32) { crc.update((v >> i) & 0xff); i += 8 }
  }

  private def checksum(body: Array[Byte], markers: Int, positions: Int,
      uncompressed: Int): Long = {
    val crc = new CRC32()
    crc.update(body, 0, body.length)
    crc.update(markers & 0xff)
    updateCrc(crc, positions)
    updateCrc(crc, uncompressed)
    crc.getValue
  }

  /** Serialize one page of rows: metadata + body, CHECKSUMMED; bodies at
    * or above [[CompressionThreshold]] are LZ4-compressed when `compress`
    * is set AND the result saves ≥10% (PagesSerde.wrapSlice policy). */
  def serialize(schema: StructType, rows: Seq[Row],
      compress: Boolean = false): Array[Byte] = {
    val body = new Out
    body.int(schema.size)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      writeBlock(body, f.dataType, rows.map(r =>
        if (r.isNullAt(i)) null else r.get(i)).toArray)
    }
    val b = body.result()
    var markers = Checksummed
    var stored = b
    if (compress && b.length >= CompressionThreshold) {
      val compressed = lz4.fastCompressor().compress(b)
      if (compressed.length < b.length * MinCompressionRatio) {
        markers |= Compressed
        stored = compressed
      }
    }
    val out = new Out
    out.int(rows.size)
    out.byte(markers)
    out.int(b.length) // uncompressedSizeInBytes
    out.int(stored.length) // sizeInBytes
    out.long(checksum(stored, markers, rows.size, b.length))
    out.bytes(stored)
    out.result()
  }

  /** Deserialize one wire page; validates markers and checksum, inflates
    * COMPRESSED bodies. */
  def deserialize(schema: StructType, bytes: Array[Byte]): Seq[Row] = {
    val in = new In(bytes, 0)
    val positions = in.int()
    val markers = in.byte()
    require((markers & Encrypted) == 0,
      "encrypted SerializedPages are not supported")
    val uncompressed = in.int()
    val size = in.int()
    if ((markers & Compressed) == 0)
      require(uncompressed == size,
        s"uncompressed size $uncompressed != slice length $size on an " +
          "uncompressed page")
    val expected = in.long()
    val stored = in.bytes(size)
    if ((markers & Checksummed) != 0) {
      // checksum covers the bytes as stored (compressed if COMPRESSED)
      val actual = checksum(stored, markers, positions, uncompressed)
      require(actual == expected,
        f"SerializedPage checksum mismatch: got $actual%x, page carries " +
          f"$expected%x (corrupt page)")
    }
    val body =
      if ((markers & Compressed) == 0) stored
      else {
        val raw = new Array[Byte](uncompressed)
        lz4.fastDecompressor().decompress(stored, 0, raw, 0, uncompressed)
        raw
      }
    val bin = new In(body, 0)
    val channels = bin.int()
    require(channels == schema.size,
      s"page has $channels channels, schema expects ${schema.size}")
    val cols = schema.fields.map(f => readBlock(bin, f.dataType))
    (0 until positions).map(p =>
      Row.fromSeq(cols.toIndexedSeq.map(_(p))))
  }
}
