package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Keyed-hash MACs — the reference's HmacFunctions.java (hmac_md5 /
  * hmac_sha1 / hmac_sha256 / hmac_sha512 over varbinary). Spark ships the
  * plain digests (md5/sha1/sha2) but no HMAC, so this is a custom
  * expression over the JDK's javax.crypto.Mac. Stateless per-row kernel →
  * embeds straight into whole-stage codegen. */
object HmacUtil {
  def hmac(algo: String, data: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance(algo)
    mac.init(new javax.crypto.spec.SecretKeySpec(key, algo))
    mac.doFinal(data)
  }
}

/** hmac_<algo>(data, key) → varbinary. */
case class Hmac(left: Expression, right: Expression, jdkAlgo: String)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (varbinary data, varbinary key), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    "hmac_" + jdkAlgo.stripPrefix("Hmac").toLowerCase
  override protected def nullSafeEval(l: Any, r: Any): Any =
    HmacUtil.hmac(jdkAlgo, l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"""graft.functions.HmacUtil.hmac("$jdkAlgo", $a, $b)""")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
