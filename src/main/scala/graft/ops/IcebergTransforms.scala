package graft.ops

import java.time.LocalDate

/** Iceberg partition transforms (spec "Partition Transforms"; reference
  * presto-iceberg/src/main/java/com/facebook/presto/iceberg/
  * PartitionTransforms.java:60-63). A partition spec maps a source
  * column through a transform; data files record the TRANSFORMED value,
  * so partition pruning must apply the same transform to the predicate
  * before comparing — `bucket(4, k)` prunes on `k = 42` only by hashing
  * 42 the way the writer did.
  *
  *  - `identity`                   — the value itself
  *  - `bucket[N]`                  — (murmur3_x86_32(bytes) & MaxInt) % N
  *    with the spec's byte encodings (ints/longs/dates as 8-byte
  *    little-endian longs, strings as UTF-8)
  *  - `truncate[W]`                — v - (((v % W) + W) % W) for ints,
  *    first W chars for strings
  *  - `year`/`month`/`day`/`hour`  — ordinals since the epoch
  *  - `void`                       — always null
  *
  * bucket is equality-only; the rest are ORDER-PRESERVING, so range
  * predicates prune too (transformed bounds compare directly).
  */
object IcebergTransforms {

  /** murmur3_x86_32, seed 0 — the spec's hash (public algorithm). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n = data.length / 4 * 4
    var i = 0
    while (i < n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (data.length & 3) match {
      case 3 =>
        k ^= (data(n + 2) & 0xff) << 16
        k ^= (data(n + 1) & 0xff) << 8
        k ^= data(n) & 0xff
      case 2 =>
        k ^= (data(n + 1) & 0xff) << 8
        k ^= data(n) & 0xff
      case 1 => k ^= data(n) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** murmur3_x86_32 of the spec's 8-byte little-endian encoding of an
    * integral value — allocation-free (two unrolled 4-byte words, no
    * tail), called from the codegen'd bucket expression
    * (functions/IcebergBucket.scala) on the write hot path. */
  def murmur3Long(v: Long): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    var k = v.toInt // low word (little-endian first)
    k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    k = (v >>> 32).toInt // high word
    k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    h ^= 8
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** bucket[N] of an integral/date-ordinal value (spec encoding). */
  def bucketLong(v: Long, n: Int): Int =
    (murmur3Long(v) & Integer.MAX_VALUE) % n

  /** bucket[N] of raw bytes (UTF-8 string / binary). */
  def bucketBytes(b: Array[Byte], n: Int): Int =
    (murmur3(b) & Integer.MAX_VALUE) % n

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def toDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case d: java.sql.Date => d.toLocalDate
    case s: String => LocalDate.parse(s)
    case other => throw new IllegalArgumentException(s"not a date: $other")
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: Number => n.longValue
    case other => throw new IllegalArgumentException(s"not integral: $other")
  }

  val Bucket = """bucket\[(\d+)\]""".r
  val Truncate = """truncate\[(\d+)\]""".r

  /** Apply `transform` to a predicate/source value. Date transforms
    * accept LocalDate / java.sql.Date / ISO strings. */
  def apply(transform: String, v: Any): Any =
    if (v == null) null
    else transform match {
      case "identity" => v
      case "void" => null
      case Bucket(n) =>
        val bytes = v match {
          case s: String => s.getBytes("UTF-8")
          case d: LocalDate => leLong(d.toEpochDay)
          case d: java.sql.Date => leLong(d.toLocalDate.toEpochDay)
          case other => leLong(toLong(other))
        }
        (murmur3(bytes) & Integer.MAX_VALUE) % n.toInt
      case Truncate(w) => v match {
        case s: String => s.substring(0, math.min(s.length, w.toInt))
        case other =>
          val width = w.toLong
          val l = toLong(other)
          l - (((l % width) + width) % width)
      }
      case "year" => toDate(v).getYear - 1970
      case "month" =>
        val d = toDate(v)
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      case "day" => toDate(v).toEpochDay.toInt
      case "hour" => v match {
        case t: java.sql.Timestamp => (t.getTime / 3600000L).toInt
        case t: java.time.Instant => (t.getEpochSecond / 3600L).toInt
        case other => throw new IllegalArgumentException(
          s"hour() needs a timestamp, got $other")
      }
      case other =>
        throw new IllegalArgumentException(s"unknown transform: $other")
    }

  /** Order-preserving transforms admit range pruning. */
  def isMonotonic(transform: String): Boolean = transform match {
    case "identity" | "year" | "month" | "day" | "hour" => true
    case Truncate(_) => true
    case _ => false
  }

  /** Compare two transformed values of the same transform output type. */
  def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x, y) => java.lang.Long.compare(toLong(x), toLong(y))
  }
}
