package graft.ops

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}

/** Delta deletion vectors (protocol spec "Deletion Vectors", reader
  * version 3 feature `deletionVectors`) — hand-rolled from the PUBLIC
  * protocol document, like the rest of the Delta reader:
  *
  *  - an `add.deletionVector` descriptor points at a serialized 64-bit
  *    roaring bitmap of the file's DELETED row indexes: storageType `u`
  *    (a `deletion_vector_<uuid>.bin` file under the table, the UUID
  *    Z85-encoded in `pathOrInlineDv` after an optional random prefix),
  *    `i` (the bitmap Z85-inlined in the descriptor), or `p` (absolute
  *    path);
  *  - DV files: 1 version byte (=1), then per vector at `offset`:
  *    4-byte big-endian size, the bitmap bytes, 4-byte big-endian CRC32;
  *  - the bitmap is a RoaringBitmapArray in the PORTABLE format: magic
  *    1681511377 (4B little-endian), number of 32-bit bitmaps (8B LE),
  *    then per bitmap its key (4B LE) + a standard-format 32-bit roaring
  *    bitmap (RoaringFormatSpec: cookie 12346/12347, array / bitmap /
  *    run containers). Row index = key * 2^32 + contained value.
  *
  * The reference connector predates DVs (presto-delta reads protocol 1);
  * this implements the read side so protocol-3 DV tables return correct
  * rows instead of resurrecting deleted ones. Writers still refuse DV
  * tables — rewriting a file without honoring its DV would corrupt. */
object DeletionVectors {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Int, sizeInBytes: Int, cardinality: Long)

  // ---------- Z85 (ZeroMQ base-85: 5 chars <-> 4 bytes, big-endian)

  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val d = Z85Rev(s.charAt(i + j).toInt)
        require(d >= 0, s"invalid Z85 char '${s.charAt(i + j)}'")
        v = v * 85 + d
      }
      val o = i / 5 * 4
      out(o) = (v >> 24).toByte
      out(o + 1) = (v >> 16).toByte
      out(o + 2) = (v >> 8).toByte
      out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "Z85 input must be a multiple of 4 bytes")
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      var v = ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
      val block = new Array[Char](5)
      (4 to 0 by -1).foreach { j =>
        block(j) = Z85((v % 85).toInt)
        v /= 85
      }
      sb.appendAll(block)
      i += 4
    }
    sb.toString
  }

  // ---------- roaring bitmap array (portable format)

  private val MAGIC = 1681511377
  private val COOKIE_NO_RUN = 12346
  private val COOKIE_RUN = 12347

  /** Deleted row indexes, ascending. */
  def deserialize(data: Array[Byte]): Seq[Long] = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt() == MAGIC, "bad RoaringBitmapArray magic")
    val nBitmaps = b.getLong()
    val out = Seq.newBuilder[Long]
    (0L until nBitmaps).foreach { _ =>
      val key = b.getInt().toLong & 0xffffffffL
      readBitmap32(b).foreach(v => out += (key << 32) | v)
    }
    out.result()
  }

  /** One standard-format 32-bit roaring bitmap from the buffer, values
    * ascending as unsigned ints in a Long. */
  private def readBitmap32(b: ByteBuffer): Seq[Long] = {
    val cookieWord = b.getInt()
    val cookie = cookieWord & 0xffff
    require(cookie == COOKIE_NO_RUN || cookie == COOKIE_RUN,
      s"bad roaring cookie $cookie")
    val hasRun = cookie == COOKIE_RUN
    val n =
      if (hasRun) (cookieWord >>> 16) + 1
      else b.getInt()
    val runBitset: Array[Byte] =
      if (hasRun) {
        val a = new Array[Byte]((n + 7) / 8)
        b.get(a)
        a
      } else Array.empty
    def isRun(i: Int): Boolean =
      hasRun && (runBitset(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    (0 until n).foreach { i =>
      keys(i) = b.getShort() & 0xffff
      cards(i) = (b.getShort() & 0xffff) + 1
    }
    // the offsets section is present unless (run format && n < 4)
    if (!hasRun || n >= 4) (0 until n).foreach(_ => b.getInt())
    val out = Seq.newBuilder[Long]
    (0 until n).foreach { i =>
      val base = keys(i).toLong << 16
      if (isRun(i)) {
        val nRuns = b.getShort() & 0xffff
        (0 until nRuns).foreach { _ =>
          val start = b.getShort() & 0xffff
          val len = b.getShort() & 0xffff
          (start to start + len).foreach(v => out += base | v)
        }
      } else if (cards(i) <= 4096) { // array container
        (0 until cards(i)).foreach(_ => out += base | (b.getShort() & 0xffff))
      } else { // bitmap container: 1024 64-bit words
        (0 until 1024).foreach { w =>
          val word = b.getLong()
          if (word != 0L) (0 until 64).foreach { bit =>
            if ((word & (1L << bit)) != 0L) out += base | (w * 64 + bit)
          }
        }
      }
    }
    out.result()
  }

  /** Serialize ascending row indexes as a portable RoaringBitmapArray
    * (array containers only — the writer side exists for fixtures and
    * round-trip pins). */
  def serialize(values: Seq[Long]): Array[Byte] = {
    val byHigh = values.sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val parts = byHigh.map { case (key, vs) =>
      val byContainer = vs.map(_ & 0xffffffffL).groupBy(_ >>> 16)
        .toSeq.sortBy(_._1)
      val n = byContainer.size
      val size = 4 + 4 + n * 4 + n * 4 +
        byContainer.map(_._2.size * 2).sum
      val b = ByteBuffer.allocate(4 + size).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(key.toInt)
      b.putInt(COOKIE_NO_RUN)
      b.putInt(n)
      byContainer.foreach { case (hi, cv) =>
        b.putShort((hi & 0xffff).toShort)
        b.putShort(((cv.size - 1) & 0xffff).toShort)
      }
      var off = 4 + 4 + n * 4 + n * 4
      byContainer.foreach { case (_, cv) =>
        b.putInt(off)
        off += cv.size * 2
      }
      byContainer.foreach { case (_, cv) =>
        cv.foreach(v => b.putShort((v & 0xffff).toShort))
      }
      b.array()
    }
    val total = ByteBuffer.allocate(12 + parts.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    total.putInt(MAGIC)
    total.putLong(byHigh.size.toLong)
    parts.foreach(total.put)
    total.array()
  }

  // ---------- descriptor resolution

  /** The deleted row indexes a descriptor names, resolved against the
    * table root. */
  def positions(tableDir: File, d: Descriptor): Seq[Long] = {
    val data: Array[Byte] = d.storageType match {
      case "i" =>
        z85Decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case "u" | "p" =>
        val f = d.storageType match {
          case "p" => new File(d.pathOrInlineDv)
          case _ =>
            // <optional random prefix><20-char Z85 uuid>
            val enc = d.pathOrInlineDv
            val prefix = enc.dropRight(20)
            val uuidBytes = z85Decode(enc.takeRight(20))
            val bb = ByteBuffer.wrap(uuidBytes)
            val uuid = new java.util.UUID(bb.getLong, bb.getLong)
            val name = s"deletion_vector_$uuid.bin"
            if (prefix.isEmpty) new File(tableDir, name)
            else new File(new File(tableDir, prefix), name)
        }
        require(f.isFile, s"deletion vector file missing: $f")
        val all = java.nio.file.Files.readAllBytes(f.toPath)
        require(all(0) == 1, s"unsupported DV file version ${all(0)}")
        val b = ByteBuffer.wrap(all, d.offset, 4)
          .order(ByteOrder.BIG_ENDIAN)
        val size = b.getInt()
        require(size == d.sizeInBytes,
          s"DV size $size != descriptor sizeInBytes ${d.sizeInBytes}")
        val data = java.util.Arrays.copyOfRange(all, d.offset + 4,
          d.offset + 4 + size)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        val stored = ByteBuffer.wrap(all, d.offset + 4 + size, 4)
          .order(ByteOrder.BIG_ENDIAN).getInt()
        require(stored == crc.getValue.toInt, "DV checksum mismatch")
        data
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType $other")
    }
    val pos = deserialize(data)
    require(d.cardinality < 0 || pos.size == d.cardinality,
      s"DV cardinality ${pos.size} != descriptor ${d.cardinality}")
    pos
  }

  /** Fixture writer: persist `values` as a `u`-addressed DV file in the
    * table root; returns the descriptor. */
  def writeDvFile(tableDir: File, values: Seq[Long]): Descriptor = {
    val data = serialize(values)
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(bb.array())
    val f = new File(tableDir, s"deletion_vector_$uuid.bin")
    val out = ByteBuffer.allocate(1 + 4 + data.length + 4)
    out.put(1.toByte)
    out.order(ByteOrder.BIG_ENDIAN).putInt(data.length)
    out.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    out.putInt(crc.getValue.toInt)
    java.nio.file.Files.write(f.toPath, out.array())
    Descriptor("u", enc, offset = 1, sizeInBytes = data.length,
      cardinality = values.size.toLong)
  }
}
