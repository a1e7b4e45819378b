package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper, SerializationFeature}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference JSON function dialect (MAIN/operator/scalar/JsonFunctions.java,
  * JsonExtract.java). JSON is represented as StringType (SURVEY §1.2: Spark
  * has no JSON type), matching the reference where the JSON type is a varchar
  * slice at runtime.
  *
  * Semantics pinned to the reference:
  *  - json_parse canonicalizes with SORTED key order (JsonFunctions.java:140
  *    uses SORTED_MAPPER) and raises on malformed input / trailing chars.
  *  - json_format is the identity on the JSON value (JsonFunctions.java:132).
  *  - json_array_length / json_array_contains / json_array_get / json_size /
  *    json_extract are LENIENT: malformed JSON or a non-matching shape
  *    returns NULL, never an error.
  *  - json_array_get returns scalar elements as their raw string value
  *    (unquoted — JsonFunctions.java:375 getValueAsString) but nested
  *    arrays/objects as JSON text.
  *  - json_extract returns JSON text (strings keep their quotes), the
  *    Presto-JSONPath subset: $, $.field, $["field"], $[index]
  *    (JsonExtract.java tokenizer — no wildcards, no recursive descent).
  */
object JsonDialect {

  private[functions] lazy val sortedMapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    // the reference raises on trailing characters after the value
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS, true)
    m
  }
  private[functions] lazy val mapper = new ObjectMapper()

  /** Parse or null (the lenient read used by everything but json_parse). */
  private[functions] def readOrNull(json: UTF8String): JsonNode =
    try {
      val n = mapper.readTree(json.toString)
      n
    } catch { case _: Exception => null }

  /** Presto-JSONPath subset tokenizer: $.a.b, $["a b"], $['a'], $[0].
    * Throws IllegalArgumentException on malformed paths (the reference
    * raises INVALID_FUNCTION_ARGUMENT when the path doesn't parse). */
  private[functions] def parsePath(path: String): Seq[Either[String, Int]] = {
    val p = path.trim
    if (p.isEmpty || p.charAt(0) != '$')
      throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
    val out = scala.collection.mutable.ArrayBuffer.empty[Either[String, Int]]
    var i = 1
    while (i < p.length) {
      p.charAt(i) match {
        case '.' =>
          val start = i + 1
          var j = start
          while (j < p.length && p.charAt(j) != '.' && p.charAt(j) != '[') j += 1
          if (j == start)
            throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
          out += Left(p.substring(start, j))
          i = j
        case '[' =>
          if (i + 1 >= p.length)
            throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
          val q = p.charAt(i + 1)
          if (q == '"' || q == '\'') {
            val end = p.indexOf(q, i + 2)
            if (end < 0 || end + 1 >= p.length || p.charAt(end + 1) != ']')
              throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
            out += Left(p.substring(i + 2, end))
            i = end + 2
          } else {
            val end = p.indexOf(']', i + 1)
            val idx =
              try p.substring(i + 1, end).trim.toInt
              catch { case _: Exception =>
                throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
              }
            out += Right(idx)
            i = end + 1
          }
        case _ =>
          throw new IllegalArgumentException(s"Invalid JSON path: '$path'")
      }
    }
    out.toSeq
  }

  /** Walk the path; null when any step misses (lenient, like the
    * reference's streaming extractor). */
  private[functions] def navigate(root: JsonNode,
      steps: Seq[Either[String, Int]]): JsonNode = {
    var node = root
    val it = steps.iterator
    while (node != null && it.hasNext) {
      node = it.next() match {
        case Left(field) if node.isObject => node.get(field)
        case Right(idx) if node.isArray => node.get(idx)
        case _ => null
      }
    }
    node
  }
}

/** json_parse(varchar) → canonical JSON text; raises on malformed input. */
case class JsonParseExpr(child: Expression) extends UnaryExpression
  with CodegenFallback {
  override def prettyName: String = "json_parse"
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    try {
      val value = JsonDialect.sortedMapper.readValue(s, classOf[Object])
      UTF8String.fromString(JsonDialect.sortedMapper.writeValueAsString(value))
    } catch { case _: Exception =>
      throw new IllegalArgumentException(s"Cannot convert '$s' to JSON")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** is_json_scalar(json) → true for number/string/bool/null tokens. */
case class IsJsonScalar(child: Expression) extends UnaryExpression
  with CodegenFallback {
  override def prettyName: String = "is_json_scalar"
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any = {
    val n = JsonDialect.readOrNull(v.asInstanceOf[UTF8String])
    if (n == null)
      throw new IllegalArgumentException(
        s"Cannot convert '${v.asInstanceOf[UTF8String]}' to JSON")
    n.isValueNode
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_array_length(json) → BIGINT; NULL when not an array / malformed. */
case class JsonArrayLength(child: Expression) extends UnaryExpression
  with CodegenFallback {
  override def prettyName: String = "json_array_length"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val n = JsonDialect.readOrNull(v.asInstanceOf[UTF8String])
    if (n == null || !n.isArray) null else n.size().toLong
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_array_contains(json, value) for boolean/bigint/double/varchar
  * needles (4 reference overloads): scans top-level scalar elements only;
  * NULL for malformed / non-array input. The numeric overloads match the
  * reference token discipline — bigint needles only match integral tokens,
  * double needles only floating tokens (JsonFunctions.java:199-334). */
case class JsonArrayContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "json_array_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case BooleanType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | StringType => TypeCheckResult.TypeCheckSuccess
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess // 2.5 literals
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_array_contains needle must be boolean/bigint/double/varchar, " +
        s"got ${other.simpleString}")
  }
  override protected def nullSafeEval(json: Any, needle: Any): Any = {
    val n = JsonDialect.readOrNull(json.asInstanceOf[UTF8String])
    if (n == null || !n.isArray) return null
    val it = n.elements()
    var found = false
    while (!found && it.hasNext) {
      val e = it.next()
      found = (right.dataType, needle) match {
        case (BooleanType, b: java.lang.Boolean) =>
          e.isBoolean && e.booleanValue() == b.booleanValue()
        case (StringType, s: UTF8String) =>
          e.isTextual && e.textValue() == s.toString
        case (DoubleType | FloatType, num: Number) =>
          e.isFloatingPointNumber && e.doubleValue() == num.doubleValue()
        case (_: DecimalType, d: org.apache.spark.sql.types.Decimal) =>
          e.isFloatingPointNumber && e.doubleValue() == d.toDouble
        case (_, num: Number) =>
          e.isIntegralNumber && e.longValue() == num.longValue()
        case _ => false
      }
    }
    found
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** json_array_get(json, index) — element at index (negative = from end);
  * scalars unquoted via getValueAsString, containers as JSON text
  * (JsonFunctions.java:375). */
case class JsonArrayGet(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "json_array_get"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(json: Any, idx: Any): Any = {
    val n = JsonDialect.readOrNull(json.asInstanceOf[UTF8String])
    if (n == null || !n.isArray) return null
    val i0 = idx.asInstanceOf[Number].longValue()
    val size = n.size().toLong
    val i = if (i0 < 0) size + i0 else i0
    if (i < 0 || i >= size) return null
    val e = n.get(i.toInt)
    if (e.isNull) null
    else if (e.isContainerNode) UTF8String.fromString(e.toString)
    else if (e.isTextual) UTF8String.fromString(e.textValue())
    else UTF8String.fromString(e.asText())
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** json_extract(json, path) → JSON text of the node at the Presto-JSONPath
  * (strings keep quotes); NULL when the path misses or input is malformed. */
case class JsonExtractJson(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "json_extract"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val steps = JsonDialect.parsePath(path.asInstanceOf[UTF8String].toString)
    val root = JsonDialect.readOrNull(json.asInstanceOf[UTF8String])
    val node = JsonDialect.navigate(root, steps)
    if (node == null) null else UTF8String.fromString(node.toString)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** json_size(json, path) → members of an object / elements of an array /
  * 0 for scalars; NULL when the path misses (JsonExtract size extractor). */
case class JsonSize(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "json_size"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val steps = JsonDialect.parsePath(path.asInstanceOf[UTF8String].toString)
    val root = JsonDialect.readOrNull(json.asInstanceOf[UTF8String])
    val node = JsonDialect.navigate(root, steps)
    if (node == null) null
    else if (node.isContainerNode) node.size().toLong
    else 0L
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
