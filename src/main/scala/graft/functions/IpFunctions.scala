package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** IP prefix functions, phase-2 (reference operator/scalar/
  * IpPrefixFunctions.java:55 — ip_prefix, ip_subnet_min/max/range,
  * is_subnet_of, is_private_ip, ip_prefix_collapse, ip_prefix_subnets).
  * IPv4 over varchar ('a.b.c.d' / 'a.b.c.d/len') in place of the
  * reference's IPADDRESS/IPPREFIX types; IPv6 is documented-unsupported
  * (clear error, SURVEY known-gap). All scalar per-row work. */
object IpFns {
  /** RFC special-purpose IPv4 ranges the reference treats as private
    * (IpPrefixFunctions.java:64-79). */
  private val privatePrefixes = Seq(
    "0.0.0.0/8", "10.0.0.0/8", "100.64.0.0/10", "127.0.0.0/8",
    "169.254.0.0/16", "172.16.0.0/12", "192.0.0.0/24", "192.0.2.0/24",
    "192.88.99.0/24", "192.168.0.0/16", "198.18.0.0/15", "198.51.100.0/24",
    "203.0.113.0/24", "240.0.0.0/4")

  def parse4(s: String): Long = {
    if (s.indexOf(':') >= 0) throw new IllegalArgumentException(
      s"IPv6 addresses are not supported by this engine: $s")
    val parts = s.split("\\.", -1)
    require(parts.length == 4, s"malformed IPv4 address: $s")
    var out = 0L
    var i = 0
    while (i < 4) {
      val o = parts(i).toInt
      require(o >= 0 && o <= 255, s"malformed IPv4 address: $s")
      out = (out << 8) | o
      i += 1
    }
    out
  }

  def fmt4(ip: Long): String =
    s"${(ip >> 24) & 0xff}.${(ip >> 16) & 0xff}.${(ip >> 8) & 0xff}.${ip & 0xff}"

  /** ('a.b.c.d/len') → (network base, len). */
  def parsePrefix(s: String): (Long, Int) = {
    val slash = s.lastIndexOf('/')
    require(slash > 0, s"malformed IPv4 prefix: $s")
    val len = s.substring(slash + 1).toInt
    require(len >= 0 && len <= 32, s"prefix length must be in [0, 32]: $s")
    (parse4(s.substring(0, slash)) & mask(len), len)
  }

  private def mask(len: Int): Long =
    if (len == 0) 0L else (0xffffffffL << (32 - len)) & 0xffffffffL

  def ipPrefix(ip: String, len: Int): String = {
    require(len >= 0 && len <= 32, s"prefix length must be in [0, 32]: $len")
    fmt4(parse4(ip) & mask(len)) + "/" + len
  }

  def subnetMin(prefix: String): String = fmt4(parsePrefix(prefix)._1)

  def subnetMax(prefix: String): String = {
    val (base, len) = parsePrefix(prefix)
    fmt4(base | (~mask(len) & 0xffffffffL))
  }

  def isSubnetOf(prefix: String, other: String): Boolean = {
    val (base, len) = parsePrefix(prefix)
    if (other.indexOf('/') >= 0) {
      // prefix-in-prefix: other's network is contained when its length is
      // >= ours and its base shares our network bits
      val (obase, olen) = parsePrefix(other)
      olen >= len && (obase & mask(len)) == base
    } else (parse4(other) & mask(len)) == base
  }

  def isPrivate(ip: String): Boolean = {
    val v = parse4(ip)
    privatePrefixes.exists { p =>
      val (base, len) = parsePrefix(p)
      (v & mask(len)) == base
    }
  }

  /** Sorted, merged minimal CIDR cover of the input prefixes
    * (IpPrefixFunctions.mergeIpRanges): overlapping/adjacent ranges merge,
    * then each merged range re-splits into maximal aligned CIDR blocks. */
  def collapse(prefixes: Seq[String]): Seq[String] = {
    if (prefixes.isEmpty) return Nil
    val ranges = prefixes.map { p =>
      val (base, len) = parsePrefix(p)
      (base, base | (~mask(len) & 0xffffffffL))
    }.sortBy(_._1)
    // merge overlapping or adjacent ranges
    val merged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for ((lo, hi) <- ranges) {
      if (merged.nonEmpty && lo <= merged.last._2 + 1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, hi))
      else merged += ((lo, hi))
    }
    // emit maximal aligned CIDR blocks per range
    val out = Seq.newBuilder[String]
    for ((lo0, hi) <- merged) {
      var lo = lo0
      while (lo <= hi) {
        // largest block: aligned at lo and not passing hi
        var len = if (lo == 0) 0 else 32 - java.lang.Long.numberOfTrailingZeros(lo)
        while (len < 32 && lo + (~mask(len) & 0xffffffffL) > hi) len += 1
        out += (fmt4(lo) + "/" + len)
        lo += (~mask(len) & 0xffffffffL) + 1
      }
    }
    out.result()
  }

  /** Split a prefix into all subnets of newLen (ip_prefix_subnets).
    * Bounded fan-out: at most 2^16 subnets per call. */
  def subnets(prefix: String, newLen: Int): Seq[String] = {
    val (base, len) = parsePrefix(prefix)
    require(newLen >= 0 && newLen <= 32, s"prefix length must be in [0, 32]: $newLen")
    if (newLen < len) return Nil // reference returns empty for shorter target
    require(newLen - len <= 16,
      s"ip_prefix_subnets fan-out 2^${newLen - len} exceeds the 2^16 cap")
    val step = (~mask(newLen) & 0xffffffffL) + 1
    (0L until (1L << (newLen - len))).map(i => fmt4(base + i * step) + "/" + newLen)
  }
}

/** One thin expression per IP op (CodegenFallback — cold-path string ops). */
case class IpExpr(args: Seq[Expression], op: String)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = args
  override def nullable: Boolean = true

  override def dataType: DataType = op match {
    case "ip_prefix" | "ip_subnet_min" | "ip_subnet_max" => StringType
    case "ip_subnet_range" | "ip_prefix_subnets" | "ip_prefix_collapse" =>
      ArrayType(StringType, containsNull = false)
    case "is_subnet_of" | "is_private_ip" => BooleanType
    case other => throw new IllegalArgumentException(s"unknown ip op: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val expect: Seq[DataType] = op match {
      case "ip_prefix" => Seq(StringType, LongType)
      case "ip_subnet_min" | "ip_subnet_max" | "ip_subnet_range" |
           "is_private_ip" => Seq(StringType)
      case "is_subnet_of" => Seq(StringType, StringType)
      case "ip_prefix_subnets" => Seq(StringType, LongType)
      case "ip_prefix_collapse" => Seq(ArrayType(StringType, containsNull = true))
      case _ => Seq.empty
    }
    if (args.length == expect.length &&
      args.zip(expect).forall { case (a, t) =>
        a.dataType == t ||
          (t == ArrayType(StringType, containsNull = true) &&
            (a.dataType match { // element type must be string, any nullability
              case ArrayType(StringType, _) => true
              case _ => false
            }))
      }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$op argument types: got ${args.map(_.dataType.simpleString).mkString(", ")}")
  }

  override def prettyName: String = op

  override def eval(input: InternalRow): Any = {
    val vals = args.map(_.eval(input))
    if (vals.contains(null)) return null
    op match {
      case "ip_prefix" =>
        UTF8String.fromString(
          IpFns.ipPrefix(vals(0).toString, vals(1).asInstanceOf[Long].toInt))
      case "ip_subnet_min" =>
        UTF8String.fromString(IpFns.subnetMin(vals(0).toString))
      case "ip_subnet_max" =>
        UTF8String.fromString(IpFns.subnetMax(vals(0).toString))
      case "ip_subnet_range" =>
        new GenericArrayData(Array[Any](
          UTF8String.fromString(IpFns.subnetMin(vals(0).toString)),
          UTF8String.fromString(IpFns.subnetMax(vals(0).toString))))
      case "is_subnet_of" =>
        IpFns.isSubnetOf(vals(0).toString, vals(1).toString)
      case "is_private_ip" => IpFns.isPrivate(vals(0).toString)
      case "ip_prefix_subnets" =>
        new GenericArrayData(
          IpFns.subnets(vals(0).toString, vals(1).asInstanceOf[Long].toInt)
            .map(UTF8String.fromString).toArray[Any])
      case "ip_prefix_collapse" =>
        val arr = vals(0).asInstanceOf[ArrayData]
        val in = (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString)
        new GenericArrayData(
          IpFns.collapse(in).map(UTF8String.fromString).toArray[Any])
    }
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression = copy(args = newChildren)
}
