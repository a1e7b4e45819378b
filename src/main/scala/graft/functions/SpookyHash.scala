package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** SpookyHash V2 (Bob Jenkins, public-domain algorithm and reference
  * implementation, burtleburtle.net/bob/hash/spooky.html) — the
  * reference's spooky_hash_v2_32 / spooky_hash_v2_64
  * (MAIN/operator/scalar/VarbinaryFunctions.java:373,383): seed 0,
  * big-endian output bytes (the reference Integer/Long.reverseBytes the
  * little-endian hash words). Independent port from the published
  * algorithm; pinned against the reference's own test vectors
  * (TestVarbinaryFunctions.java:385-388) in FunctionsSpec. */
object SpookyHashV2 {
  private val SC = 0xdeadbeefdeadbeefL // sc_const

  @inline private def rot(x: Long, k: Int): Long = (x << k) | (x >>> (64 - k))

  @inline private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  /** hash128 with both seeds; returns (h0, h1). */
  def hash128(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) =
    if (data.length < 192) short(data, seed1, seed2)
    else long(data, seed1, seed2)

  def hash64(data: Array[Byte], seed: Long): Long =
    hash128(data, seed, seed)._1

  def hash32(data: Array[Byte], seed: Long): Int =
    hash128(data, seed, seed)._1.toInt

  private def short(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = data.length
    var h0 = seed1; var h1 = seed2; var h2 = SC; var h3 = SC
    var off = 0
    var remainder = length % 32

    @inline def shortMix(): Unit = {
      h2 = rot(h2, 50); h2 += h3; h0 ^= h2
      h3 = rot(h3, 52); h3 += h0; h1 ^= h3
      h0 = rot(h0, 30); h0 += h1; h2 ^= h0
      h1 = rot(h1, 41); h1 += h2; h3 ^= h1
      h2 = rot(h2, 54); h2 += h3; h0 ^= h2
      h3 = rot(h3, 48); h3 += h0; h1 ^= h3
      h0 = rot(h0, 38); h0 += h1; h2 ^= h0
      h1 = rot(h1, 37); h1 += h2; h3 ^= h1
      h2 = rot(h2, 62); h2 += h3; h0 ^= h2
      h3 = rot(h3, 34); h3 += h0; h1 ^= h3
      h0 = rot(h0, 5); h0 += h1; h2 ^= h0
      h1 = rot(h1, 36); h1 += h2; h3 ^= h1
    }

    if (length > 15) {
      val blocks = length / 32
      var i = 0
      while (i < blocks) {
        h2 += le64(data, off); h3 += le64(data, off + 8)
        shortMix()
        h0 += le64(data, off + 16); h1 += le64(data, off + 24)
        off += 32; i += 1
      }
      if (remainder >= 16) {
        h2 += le64(data, off); h3 += le64(data, off + 8)
        shortMix()
        off += 16; remainder -= 16
      }
    }

    h3 += length.toLong << 56
    // remainder bytes: 8..14 into h3, 0..7 into h2 (reference switch with
    // fall-through; off is the start of the remainder)
    if (remainder >= 8) {
      if (remainder >= 12) {
        var i = remainder - 1
        while (i >= 12) { h3 += (data(off + i) & 0xffL) << (8 * (i - 8)); i -= 1 }
        h3 += le32(data, off + 8)
      } else {
        var i = remainder - 1
        while (i >= 8) { h3 += (data(off + i) & 0xffL) << (8 * (i - 8)); i -= 1 }
      }
      h2 += le64(data, off)
    } else if (remainder > 0) {
      if (remainder >= 4) {
        var i = remainder - 1
        while (i >= 4) { h2 += (data(off + i) & 0xffL) << (8 * i); i -= 1 }
        h2 += le32(data, off)
      } else {
        var i = remainder - 1
        while (i >= 0) { h2 += (data(off + i) & 0xffL) << (8 * i); i -= 1 }
      }
    } else {
      h2 += SC; h3 += SC
    }

    // ShortEnd
    h3 ^= h2; h2 = rot(h2, 15); h3 += h2
    h0 ^= h3; h3 = rot(h3, 52); h0 += h3
    h1 ^= h0; h0 = rot(h0, 26); h1 += h0
    h2 ^= h1; h1 = rot(h1, 51); h2 += h1
    h3 ^= h2; h2 = rot(h2, 28); h3 += h2
    h0 ^= h3; h3 = rot(h3, 9); h0 += h3
    h1 ^= h0; h0 = rot(h0, 47); h1 += h0
    h2 ^= h1; h1 = rot(h1, 54); h2 += h1
    h3 ^= h2; h2 = rot(h2, 32); h3 += h2
    h0 ^= h3; h3 = rot(h3, 25); h0 += h3
    h1 ^= h0; h0 = rot(h0, 63); h1 += h0
    (h0, h1)
  }

  private def long(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = data.length
    val h = new Array[Long](12)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = SC; h(5) = SC; h(8) = SC; h(11) = SC

    @inline def mix(b: Array[Byte], o: Int): Unit = {
      h(0) += le64(b, o); h(2) ^= h(10); h(11) ^= h(0); h(0) = rot(h(0), 11); h(11) += h(1)
      h(1) += le64(b, o + 8); h(3) ^= h(11); h(0) ^= h(1); h(1) = rot(h(1), 32); h(0) += h(2)
      h(2) += le64(b, o + 16); h(4) ^= h(0); h(1) ^= h(2); h(2) = rot(h(2), 43); h(1) += h(3)
      h(3) += le64(b, o + 24); h(5) ^= h(1); h(2) ^= h(3); h(3) = rot(h(3), 31); h(2) += h(4)
      h(4) += le64(b, o + 32); h(6) ^= h(2); h(3) ^= h(4); h(4) = rot(h(4), 17); h(3) += h(5)
      h(5) += le64(b, o + 40); h(7) ^= h(3); h(4) ^= h(5); h(5) = rot(h(5), 28); h(4) += h(6)
      h(6) += le64(b, o + 48); h(8) ^= h(4); h(5) ^= h(6); h(6) = rot(h(6), 39); h(5) += h(7)
      h(7) += le64(b, o + 56); h(9) ^= h(5); h(6) ^= h(7); h(7) = rot(h(7), 57); h(6) += h(8)
      h(8) += le64(b, o + 64); h(10) ^= h(6); h(7) ^= h(8); h(8) = rot(h(8), 55); h(7) += h(9)
      h(9) += le64(b, o + 72); h(11) ^= h(7); h(8) ^= h(9); h(9) = rot(h(9), 54); h(8) += h(10)
      h(10) += le64(b, o + 80); h(0) ^= h(8); h(9) ^= h(10); h(10) = rot(h(10), 22); h(9) += h(11)
      h(11) += le64(b, o + 88); h(1) ^= h(9); h(10) ^= h(11); h(11) = rot(h(11), 46); h(10) += h(0)
    }

    @inline def endPartial(): Unit = {
      h(11) += h(1); h(2) ^= h(11); h(1) = rot(h(1), 44)
      h(0) += h(2); h(3) ^= h(0); h(2) = rot(h(2), 15)
      h(1) += h(3); h(4) ^= h(1); h(3) = rot(h(3), 34)
      h(2) += h(4); h(5) ^= h(2); h(4) = rot(h(4), 21)
      h(3) += h(5); h(6) ^= h(3); h(5) = rot(h(5), 38)
      h(4) += h(6); h(7) ^= h(4); h(6) = rot(h(6), 33)
      h(5) += h(7); h(8) ^= h(5); h(7) = rot(h(7), 10)
      h(6) += h(8); h(9) ^= h(6); h(8) = rot(h(8), 13)
      h(7) += h(9); h(10) ^= h(7); h(9) = rot(h(9), 38)
      h(8) += h(10); h(11) ^= h(8); h(10) = rot(h(10), 53)
      h(9) += h(11); h(0) ^= h(9); h(11) = rot(h(11), 42)
      h(10) += h(0); h(1) ^= h(10); h(0) = rot(h(0), 54)
    }

    val blockSize = 96
    val blocks = length / blockSize
    var off = 0
    var i = 0
    while (i < blocks) { mix(data, off); off += blockSize; i += 1 }

    val remainder = length - off
    val buf = new Array[Byte](blockSize)
    System.arraycopy(data, off, buf, 0, remainder)
    buf(blockSize - 1) = remainder.toByte
    // End: h += buf words, then three EndPartial rounds
    var j = 0
    while (j < 12) { h(j) += le64(buf, j * 8); j += 1 }
    endPartial(); endPartial(); endPartial()
    (h(0), h(1))
  }

  /** Reference output layout: reverseBytes of the LE hash word. */
  def bytes32(data: Array[Byte]): Array[Byte] = {
    val v = hash32(data, 0)
    Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  }

  def bytes64(data: Array[Byte]): Array[Byte] = {
    val v = hash64(data, 0)
    Array[Byte]((v >>> 56).toByte, (v >>> 48).toByte, (v >>> 40).toByte,
      (v >>> 32).toByte, (v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
  }
}

/** spooky_hash_v2_32 / spooky_hash_v2_64 over varbinary. */
case class SpookyHash(child: Expression, wide: Boolean) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires varbinary, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (wide) "spooky_hash_v2_64" else "spooky_hash_v2_32"
  override protected def nullSafeEval(v: Any): Any =
    if (wide) SpookyHashV2.bytes64(v.asInstanceOf[Array[Byte]])
    else SpookyHashV2.bytes32(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (wide) s"graft.functions.SpookyHashV2.bytes64($c)"
      else s"graft.functions.SpookyHashV2.bytes32($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
