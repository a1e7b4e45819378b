package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Nondeterministic
import org.apache.spark.sql.types._

/** MurmurHash3 x64 128-bit (reference HashFunctions.java murmur3_x64_128,
  * which delegates to io.airlift.slice Murmur3Hash128 — the published
  * public-domain Appleby algorithm, seed 0). Returns the 16-byte digest
  * little-endian per the canonical reference implementation. */
object Murmur3x64_128 {
  private val C1 = 0x87c37b91114253d5L
  private val C2 = 0x4cf5ad432745937fL

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  def hash(data: Array[Byte]): Array[Byte] = {
    val len = data.length
    var h1 = 0L
    var h2 = 0L
    val nblocks = len / 16
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nblocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    var k1 = 0L
    var k2 = 0L
    var r = len & 15
    while (r > 8) { // bytes 9..15 into k2
      k2 ^= (data(tail + r - 1) & 0xffL) << ((r - 9) * 8)
      r -= 1
    }
    if ((len & 15) > 8) { k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2 }
    r = math.min(len & 15, 8)
    while (r > 0) {
      k1 ^= (data(tail + r - 1) & 0xffL) << ((r - 1) * 8)
      r -= 1
    }
    if ((len & 15) > 0) { k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1 }
    h1 ^= len; h2 ^= len
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(h1).putLong(h2).array()
  }
}

case class Murmur3Hash128(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "murmur3_x64_128"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"murmur3_x64_128 expects varbinary, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    Murmur3x64_128.hash(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** secure_random(lower, upper) → double in [lower, upper) from a
  * cryptographically seeded generator (reference MathFunctions.java
  * secureRandom — SecureRandom-backed, per-call fresh value, marked
  * non-deterministic so the optimizer never folds or reuses it). */
case class SecureRandomExpr(left: Expression, right: Expression)
    extends Expression with Nondeterministic with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "secure_random"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"secure_random expects (double, double), got (${a.sql}, ${b.sql})")
    }

  @transient private var rng: java.security.SecureRandom = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()

  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val lo = left.eval(input).asInstanceOf[Double]
    val hi = right.eval(input).asInstanceOf[Double]
    if (!(lo < hi))
      throw new IllegalArgumentException("secure_random: lower must be < upper")
    lo + rng.nextDouble() * (hi - lo)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
