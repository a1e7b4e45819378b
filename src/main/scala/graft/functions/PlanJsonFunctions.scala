package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's query-plan introspection functions
  * (MAIN/operator/scalar/queryplan/JsonPrestoQueryPlanFunctions.java)
  * over the JSON plan rendering (JsonRenderer.JsonRenderedNode:
  * `{"<fragmentId>": {"plan": {id, name, identifier, details,
  * children: [...], remoteSources}}}` — the shape this engine's
  * `EXPLAIN (FORMAT JSON)` emits):
  *
  *  - json_presto_query_plan_ids(json) → array<varchar> of every node id
  *  - json_presto_query_plan_node_children(json, id) → the node's
  *    children ids (NULL for an unknown id)
  *  - json_presto_query_plan_scrub(json) → runtime info removed, plan
  *    STRUCTURE kept: id→"PLANID", identifier→its tableName= prefix or
  *    "IDENTIFIER", details→"DETAILS", Aggregate names collapsed to
  *    their step, estimates dropped (scrubJsonPlan:190-241)
  *
  * Malformed input returns NULL (the reference's parse contract). */
object PlanJson {
  private val mapper = new ObjectMapper()

  /** Parse to the per-fragment plan nodes; None on malformed shape. */
  private def fragments(json: String): Option[Seq[JsonNode]] =
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isObject) return None
      val plans = Seq.newBuilder[JsonNode]
      val it = root.fields()
      while (it.hasNext) {
        val plan = it.next().getValue.get("plan")
        if (plan == null || !plan.isObject) return None
        plans += plan
      }
      Some(plans.result())
    } catch { case _: Exception => None }

  private def childIds(node: JsonNode): Seq[String] = {
    val ch = node.get("children")
    if (ch == null || !ch.isArray) Nil
    else (0 until ch.size()).map(i => ch.get(i).path("id").asText())
  }

  private def walk(node: JsonNode, into: (String, Seq[String]) => Unit): Unit = {
    into(node.path("id").asText(), childIds(node))
    val ch = node.get("children")
    if (ch != null && ch.isArray)
      (0 until ch.size()).foreach(i => walk(ch.get(i), into))
  }

  def planIds(json: String): Option[Seq[String]] =
    fragments(json).map { frs =>
      val ids = Seq.newBuilder[String]
      frs.foreach(walk(_, (id, _) => ids += id))
      ids.result()
    }

  def nodeChildren(json: String, planId: String): Option[Seq[String]] =
    fragments(json).flatMap { frs =>
      var found: Option[Seq[String]] = None
      frs.foreach(walk(_, (id, ch) => if (id == planId) found = Some(ch)))
      found
    }

  // scrubName (reference :205): Aggregate variants collapse to their step
  private def scrubName(name: String): String =
    if (name.startsWith("Aggregate(PARTIAL)")) "Aggregate(PARTIAL)"
    else if (name.startsWith("Aggregate(FINAL)")) "Aggregate(FINAL)"
    else if (name.startsWith("Aggregate")) "Aggregate"
    else name

  private def scrubIdentifier(id: String): String =
    if (id.startsWith("[table")) {
      val m = java.util.regex.Pattern.compile("tableName=(\\w)").matcher(id)
      if (m.find()) "tableName=" + m.group(1) else "IDENTIFIER"
    } else "IDENTIFIER"

  private def scrubNode(node: JsonNode): ObjectNode = {
    val out = mapper.createObjectNode()
    out.put("id", "PLANID")
    out.put("name", scrubName(node.path("name").asText()))
    out.put("identifier", scrubIdentifier(node.path("identifier").asText()))
    out.put("details", "DETAILS")
    val children: ArrayNode = out.putArray("children")
    val ch = node.get("children")
    if (ch != null && ch.isArray)
      (0 until ch.size()).foreach(i => children.add(scrubNode(ch.get(i))))
    val rs: ArrayNode = out.putArray("remoteSources")
    val r = node.get("remoteSources")
    if (r != null && r.isArray)
      (0 until r.size()).foreach(i => rs.add(r.get(i).asText()))
    out.putArray("estimates")
    out
  }

  /** Render a Catalyst plan in the JsonRenderedNode shape (one fragment,
    * "0" — a single-JVM engine has no remote fragments): preorder ids,
    * nodeName, the arg summary as the identifier. EXPLAIN (FORMAT JSON)
    * emits this, and the three functions above consume it. */
  def render(root: org.apache.spark.sql.catalyst.trees.TreeNode[_]): String = {
    var n = -1
    // AQE wrappers hold their actual plan outside TreeNode.children —
    // descend through them so the rendering shows the real operators
    def kids(t: org.apache.spark.sql.catalyst.trees.TreeNode[_])
        : Seq[org.apache.spark.sql.catalyst.trees.TreeNode[_]] = t match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case other => other.children
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])
    }
    def build(t: org.apache.spark.sql.catalyst.trees.TreeNode[_]): ObjectNode = {
      n += 1
      val o = mapper.createObjectNode()
      o.put("id", n.toString)
      o.put("name", t.nodeName)
      o.put("identifier", "[" + t.argString(60) + "]")
      o.put("details", "")
      val ch = o.putArray("children")
      kids(t).foreach(c => ch.add(build(c)))
      o.putArray("remoteSources")
      o.putArray("estimates")
      o
    }
    val out = mapper.createObjectNode()
    val frag = mapper.createObjectNode()
    frag.set[JsonNode]("plan", build(root))
    out.set[JsonNode]("0", frag)
    mapper.writeValueAsString(out)
  }

  def scrub(json: String): Option[String] =
    try {
      val root = mapper.readTree(json)
      if (root == null || !root.isObject) return None
      val out = mapper.createObjectNode()
      val it = root.fields()
      while (it.hasNext) {
        val e = it.next()
        val plan = e.getValue.get("plan")
        if (plan == null || !plan.isObject) return None
        val frag = mapper.createObjectNode()
        frag.set[JsonNode]("plan", scrubNode(plan))
        out.set[JsonNode](e.getKey, frag)
      }
      Some(mapper.writeValueAsString(out))
    } catch { case _: Exception => None }
}

/** mode: "ids" (json), "children" (json, id), "scrub" (json). */
case class PlanJsonCall(mode: String, children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_presto_query_plan_$mode requires string arguments")

  override def dataType: DataType = mode match {
    case "scrub" => StringType
    case _ => ArrayType(StringType, containsNull = false)
  }
  override def nullable: Boolean = true
  override def prettyName: String = mode match {
    case "ids" => "json_presto_query_plan_ids"
    case "children" => "json_presto_query_plan_node_children"
    case _ => "json_presto_query_plan_scrub"
  }

  override def eval(input: InternalRow): Any = {
    val j = children.head.eval(input)
    if (j == null) return null
    val json = j.toString
    mode match {
      case "ids" =>
        PlanJson.planIds(json)
          .map(ids => new GenericArrayData(
            ids.map(UTF8String.fromString).toArray[Any])).orNull
      case "children" =>
        val id = children(1).eval(input)
        if (id == null) return null
        PlanJson.nodeChildren(json, id.toString)
          .map(ids => new GenericArrayData(
            ids.map(UTF8String.fromString).toArray[Any])).orNull
      case _ =>
        PlanJson.scrub(json).map(UTF8String.fromString).orNull
    }
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
