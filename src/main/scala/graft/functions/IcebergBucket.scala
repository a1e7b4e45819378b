package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.IcebergTransforms

/** Iceberg `bucket[N]` partition transform as a codegen'd expression —
  * `(murmur3_x86_32(spec bytes) & MaxInt) % N` with the spec's byte
  * encodings: integral/date-ordinal values as 8-byte little-endian
  * longs (allocation-free unrolled kernel), strings as UTF-8 bytes
  * (reference presto-iceberg PartitionTransforms.java:60-63). Replaces
  * the r12 write path's per-row ScalaUDFs: at 100 TB write volume the
  * UDF serialization boundary is a real cost, and this stays inside
  * whole-stage codegen. */
case class IcebergBucket(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"bucket count must be positive: $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket expects bigint/varchar/varbinary, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: Long => IcebergTransforms.bucketLong(l, buckets)
    case s: UTF8String => IcebergTransforms.bucketBytes(s.getBytes, buckets)
    case b: Array[Byte] => IcebergTransforms.bucketBytes(b, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = "graft.ops.IcebergTransforms"
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$t.bucketLong($c, $buckets)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$t.bucketBytes($c.getBytes(), $buckets)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$t.bucketBytes($c, $buckets)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IcebergBucket {
  def column(src: Column, buckets: Int): Column =
    Bridge.column(IcebergBucket(Bridge.expression(src), buckets))
}
