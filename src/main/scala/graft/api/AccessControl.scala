package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.collection.concurrent.TrieMap

/** Role-based access control statements — the reference's DCL surface
  * (SqlBase.g4:115-137,155-156: CREATE/DROP ROLE, GRANT/REVOKE roles,
  * GRANT/REVOKE table privileges, SET ROLE, SHOW ROLES / CURRENT ROLES /
  * ROLE GRANTS / GRANTS; executed by CreateRoleTask / GrantRolesTask /
  * GrantTask / SetRoleTask and checked through
  * presto-spi/.../security/AccessDeniedException.java).
  *
  * Semantics mirrored:
  *   - `public` is a built-in role every identity holds, `admin` is
  *     pre-created (the hive SqlStandardAccessControl defaults);
  *   - role grants are TRANSITIVE: enabled roles = closure of the grant
  *     graph from the user (GrantRolesTask role hierarchies), restricted
  *     by SET ROLE ALL / NONE / <role> exactly like SetRoleTask;
  *   - a table privilege (SELECT / INSERT / DELETE / UPDATE, or ALL
  *     PRIVILEGES) counts when granted to the user directly or to any
  *     enabled role; WITH GRANT OPTION / ADMIN OPTION flags round-trip
  *     into SHOW GRANTS ("Grantable") and SHOW ROLE GRANTS;
  *   - missing roles raise `Role '<r>' does not exist` (MISSING_ROLE),
  *     denied queries raise `Access Denied: Cannot select from table <t>`
  *     (AccessDeniedException.denySelectTable);
  *   - SHOW GRANTS emits the reference's 10-column shape
  *     (ShowQueriesRewrite.visitShowGrants over
  *     information_schema.table_privileges).
  *
  * Enforcement is opt-in per session (`enable(spark)`, the analog of
  * attaching an access-control plugin): when on, every plain query that
  * reaches the translate path is checked for SELECT on each referenced
  * view before execution. State is session-keyed like every other
  * statement family; at scale this is coordinator-side metadata — zero
  * cost in the data plane.
  */
object AccessControl {

  private case class RoleGrant(role: String, grantee: String,
    granteeType: String, adminOption: Boolean)
  private case class PrivGrant(privilege: String, table: String,
    grantee: String, granteeType: String, grantOption: Boolean, grantor: String)

  private val roles = TrieMap.empty[String, Set[String]] // sid → role names
  private val roleGrants = TrieMap.empty[String, Vector[RoleGrant]]
  private val privGrants = TrieMap.empty[String, Vector[PrivGrant]]
  private val users = TrieMap.empty[String, String] // sid → current user
  private val setRole = TrieMap.empty[String, Option[Set[String]]] // None=ALL
  private val enforce = TrieMap.empty[String, Boolean]

  // ---- row filters + column masks (reference SPI SystemAccessControl
  // .getRowFilters / .getColumnMasks returning ViewExpressions the
  // analyzer splices into every scan of the table, presto-main
  // StatementAnalyzer; plugins configure them per identity) -------------
  private case class RowFilter(table: String, granteeType: String,
    grantee: String, predicate: String)
  private case class ColumnMask(table: String, column: String,
    granteeType: String, grantee: String, expression: String)
  private val rowFilters = TrieMap.empty[String, Vector[RowFilter]]
  private val columnMasks = TrieMap.empty[String, Vector[ColumnMask]]

  def setRowFilter(spark: SparkSession, table: String, granteeType: String,
      grantee: String, predicate: String): Unit =
    rowFilters.updateWith(sid(spark))(v => Some(v.getOrElse(Vector.empty) :+
      RowFilter(table.toLowerCase, granteeType.toUpperCase, grantee, predicate)))
  def setColumnMask(spark: SparkSession, table: String, column: String,
      granteeType: String, grantee: String, expression: String): Unit =
    columnMasks.updateWith(sid(spark))(v => Some(v.getOrElse(Vector.empty) :+
      ColumnMask(table.toLowerCase, column.toLowerCase,
        granteeType.toUpperCase, grantee, expression)))
  def clearPolicies(spark: SparkSession): Unit = {
    rowFilters.remove(sid(spark)); columnMasks.remove(sid(spark))
  }

  private def appliesTo(id: String, user: String, granteeType: String,
      grantee: String): Boolean =
    (granteeType == "USER" && grantee == user) ||
      (granteeType == "ROLE" && enabledRoles(id, user).contains(grantee))

  /** Apply the identity's row filters and column masks by SECURING THE
    * VIEW for the duration of one statement: every policied temp view is
    * re-registered as (filters conjunctively on the RAW relation, then
    * masks projected on top under their original names — row filters see
    * unmasked data, the reference's ViewExpression ordering), the
    * statement analyzes against the secured plan, and the returned
    * closure restores the original views. Applicability is NOT decided
    * from the statement text: every policied table is secured, and any
    * other temp view whose captured plan resolves to a policied table
    * (a view or CTE defined over it, then queried by its own name) is
    * re-registered with the policied subtree spliced out for the secured
    * plan — so indirect references can't bypass the policy, matching the
    * reference's scan-time ViewExpression splice regardless of nesting.
    * Over HTTP each request runs on a session clone, so the swap is
    * invisible to concurrent queries; on a directly shared session the
    * caller holds the statement scope. */
  def secureViews(spark: SparkSession, text: String): () => Unit = {
    val id = sid(spark)
    val user = currentUser(spark)
    val rf = rowFilters.getOrElse(id, Vector.empty)
      .filter(f => appliesTo(id, user, f.granteeType, f.grantee))
    val cm = columnMasks.getOrElse(id, Vector.empty)
      .filter(m => appliesTo(id, user, m.granteeType, m.grantee))
    if (rf.isEmpty && cm.isEmpty) return () => ()
    val policied = (rf.map(_.table) ++ cm.map(_.table)).distinct
      .filter(t => scala.util.Try(spark.catalog.tableExists(t)).getOrElse(false))
    if (policied.isEmpty) return () => ()
    val policiedSet = policied.toSet

    import org.apache.spark.sql.functions.{col, expr}
    /** Secured DataFrame for one policied table: filters below masks.
      * Each call yields fresh output exprIds (the trailing re-alias), so
      * splicing two occurrences into one plan can't collide. */
    def buildSecured(t: String): DataFrame = {
      val orig = spark.table(t)
      var sec = orig
      rf.filter(_.table == t).foreach(f => sec = sec.where(expr(f.predicate)))
      val masks = cm.filter(_.table == t)
      if (masks.nonEmpty) sec = sec.select(orig.columns.map { c =>
        masks.find(_.column == c.toLowerCase) match {
          case Some(m) => expr(m.expression).as(c)
          case None => col(c)
        }
      }: _*)
      sec.select(sec.columns.map(c => col(c).as(c)): _*)
    }

    // 1. re-register every policied table secured
    val policiedOriginals = policied.map { t =>
      val orig = spark.table(t)
      buildSecured(t).createOrReplaceTempView(t)
      t -> orig
    }

    // 2. re-register dependent views (captured plans resolve the policied
    //    table at definition time, so step 1 alone can't reach them)
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId}
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    val otherViews = scala.util.Try(
      spark.catalog.listTables().collect().map(_.name)
        .filterNot(v => policiedSet.contains(v.toLowerCase)).toSeq
    ).getOrElse(Seq.empty)
    val dependentOriginals = otherViews.flatMap { v =>
      scala.util.Try {
        val orig = spark.table(v)
        val plan = orig.queryExecution.analyzed
        var mapping = Map.empty[ExprId, Attribute]
        var changed = false
        val spliced = plan.transformUp {
          case s: SubqueryAlias
              if policiedSet.contains(s.identifier.name.toLowerCase) =>
            val secPlan =
              buildSecured(s.identifier.name.toLowerCase).queryExecution.analyzed
            val byName = secPlan.output.map(a => a.name.toLowerCase -> a).toMap
            if (s.output.forall(a => byName.contains(a.name.toLowerCase))) {
              s.output.foreach(a =>
                mapping += a.exprId -> byName(a.name.toLowerCase))
              changed = true
              SubqueryAlias(s.identifier, secPlan)
            } else s
        }
        if (!changed) None
        else {
          val remapped = spliced.transformAllExpressions {
            case a: AttributeReference if mapping.contains(a.exprId) =>
              val n = mapping(a.exprId)
              AttributeReference(a.name, n.dataType, n.nullable, a.metadata)(
                exprId = n.exprId, qualifier = a.qualifier)
          }
          org.apache.spark.sql.graftbridge.Bridge.dataFrame(spark, remapped)
            .createOrReplaceTempView(v)
          Some(v -> orig)
        }
      }.toOption.flatten
    }

    val originals = policiedOriginals ++ dependentOriginals
    () => originals.foreach { case (t, orig) => orig.createOrReplaceTempView(t) }
  }

  val BuiltinRoles: Set[String] = Set("admin", "public")
  private val Privileges = Seq("SELECT", "INSERT", "DELETE", "UPDATE")

  private def sid(spark: SparkSession) = DdlStatements.sessionId(spark)
  private def rolesOf(id: String) = roles.getOrElseUpdate(id, BuiltinRoles)

  def currentUser(spark: SparkSession): String =
    users.getOrElse(sid(spark), "graft")
  def setUser(spark: SparkSession, u: String): Unit = users.put(sid(spark), u)

  def enable(spark: SparkSession): Unit = enforce.put(sid(spark), true)
  def disable(spark: SparkSession): Unit = enforce.remove(sid(spark))

  def reset(spark: SparkSession): Unit = {
    val id = sid(spark)
    roles.remove(id); roleGrants.remove(id); privGrants.remove(id)
    users.remove(id); setRole.remove(id); enforce.remove(id)
    rowFilters.remove(id); columnMasks.remove(id)
  }

  /** Transitive closure of role grants from an identity (user + public). */
  private def applicableRoles(id: String, user: String): Set[String] = {
    val grants = roleGrants.getOrElse(id, Vector.empty)
    var acc = Set("public")
    var frontier: Set[(String, String)] = Set(("USER", user), ("ROLE", "public"))
    var done = Set.empty[(String, String)]
    while (frontier.nonEmpty) {
      done ++= frontier
      val next = grants.filter(g =>
        frontier.contains((g.granteeType, g.grantee))).map(_.role).toSet
      acc ++= next
      frontier = next.map(r => ("ROLE", r)).diff(done)
    }
    acc
  }

  private def enabledRoles(id: String, user: String): Set[String] = {
    val applicable = applicableRoles(id, user)
    setRole.getOrElse(id, None) match {
      case None => applicable // SET ROLE ALL (default)
      case Some(sel) => sel.intersect(applicable) + "public"
    }
  }

  /** SELECT check for one view name; raises the reference's message. */
  def checkSelect(spark: SparkSession, table: String): Unit = {
    val id = sid(spark)
    if (enforce.getOrElse(id, false)) {
      val user = currentUser(spark)
      val held = enabledRoles(id, user)
      val ok = held.contains("admin") ||
        privGrants.getOrElse(id, Vector.empty).exists { g =>
          g.table.equalsIgnoreCase(table) &&
            (g.privilege == "SELECT" || g.privilege == "ALL") &&
            ((g.granteeType == "USER" && g.grantee == user) ||
              (g.granteeType == "ROLE" && held.contains(g.grantee)))
        }
      if (!ok) throw new SecurityException(
        s"Access Denied: Cannot select from table $table")
    }
  }

  /** Check every view referenced by an analyzed plan. */
  def checkPlan(spark: SparkSession, df: DataFrame): DataFrame = {
    if (enforce.getOrElse(sid(spark), false)) {
      val names = df.queryExecution.analyzed.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
          s.identifier.name
      }
      val views = spark.catalog.listTables().collect().map(_.name.toLowerCase).toSet
      names.map(_.toLowerCase).distinct.filter(views.contains)
        .foreach(checkSelect(spark, _))
    }
    df
  }

  // ---- statement dispatch ------------------------------------------------

  private val CreateRole = """(?is)\ACREATE\s+ROLE\s+(\w+)(?:\s+WITH\s+ADMIN\s+(?:USER\s+|ROLE\s+)?(\w+))?\z""".r
  private val DropRole = """(?is)\ADROP\s+ROLE\s+(\w+)\z""".r
  private val GrantPriv = """(?is)\AGRANT\s+(.+?)\s+ON\s+(?:TABLE\s+)?(\w+)\s+TO\s+(?:(USER|ROLE)\s+)?(\w+)(\s+WITH\s+GRANT\s+OPTION)?\z""".r
  private val RevokePriv = """(?is)\AREVOKE\s+(?:GRANT\s+OPTION\s+FOR\s+)?(.+?)\s+ON\s+(?:TABLE\s+)?(\w+)\s+FROM\s+(?:(USER|ROLE)\s+)?(\w+)\z""".r
  private val GrantRoles = """(?is)\AGRANT\s+([\w\s,]+?)\s+TO\s+(?:(USER|ROLE)\s+)?(\w+)(\s+WITH\s+ADMIN\s+OPTION)?\z""".r
  private val RevokeRoles = """(?is)\AREVOKE\s+(?:ADMIN\s+OPTION\s+FOR\s+)?([\w\s,]+?)\s+FROM\s+(?:(USER|ROLE)\s+)?(\w+)\z""".r
  private val SetRoleSt = """(?is)\ASET\s+ROLE\s+(ALL|NONE|\w+)\z""".r
  private val ShowRoles = """(?is)\ASHOW\s+ROLES\z""".r
  private val ShowCurRoles = """(?is)\ASHOW\s+CURRENT\s+ROLES\z""".r
  private val ShowRoleGrants = """(?is)\ASHOW\s+ROLE\s+GRANTS\z""".r
  private val ShowGrants = """(?is)\ASHOW\s+GRANTS(?:\s+ON\s+(?:TABLE\s+)?(\w+))?\z""".r

  def dispatch(ses: SqlSession, text: String): Option[DataFrame] = {
    val spark = ses.spark
    val id = sid(spark)
    def missing(r: String) =
      throw new IllegalArgumentException(s"Role '$r' does not exist")
    def requireRoles(rs: Seq[String]): Unit =
      rs.find(r => !rolesOf(id).contains(r)).foreach(missing)
    text.trim.stripSuffix(";").trim match {
      case CreateRole(name, admin) =>
        val r = name.toLowerCase
        if (admin != null && !rolesOf(id).contains(admin.toLowerCase) &&
          admin.toLowerCase != currentUser(spark)) missing(admin.toLowerCase)
        roles.put(id, rolesOf(id) + r)
        if (admin != null)
          addRoleGrant(id, RoleGrant(r, admin.toLowerCase, "ROLE", adminOption = true))
        Some(status(spark, "CREATE ROLE"))
      case DropRole(name) =>
        val r = name.toLowerCase
        if (BuiltinRoles.contains(r))
          throw new IllegalArgumentException(s"Cannot drop role $r")
        if (!rolesOf(id).contains(r)) missing(r)
        roles.put(id, rolesOf(id) - r)
        roleGrants.updateWith(id)(_.map(_.filterNot(g =>
          g.role == r || (g.granteeType == "ROLE" && g.grantee == r))))
        Some(status(spark, "DROP ROLE"))
      case GrantPriv(privs, table, gType, grantee, withOpt) =>
        val ps = parsePrivileges(privs)
        if (ps.nonEmpty) {
          val gt = principalType(gType, grantee, id)
          if (gt == "ROLE") requireRoles(Seq(grantee.toLowerCase))
          val gn = grantee.toLowerCase
          ps.foreach { p =>
            addPrivGrant(id, PrivGrant(p, table.toLowerCase, gn, gt,
              withOpt != null, currentUser(spark)))
          }
          Some(status(spark, "GRANT"))
        } else None // not privilege keywords → let other dispatchers try
      case RevokePriv(privs, table, gType, grantee) =>
        val ps = parsePrivileges(privs)
        if (ps.nonEmpty) {
          val gt = principalType(gType, grantee, id)
          val gn = grantee.toLowerCase
          privGrants.updateWith(id)(_.map(_.filterNot(g =>
            ps.contains(g.privilege) && g.table == table.toLowerCase &&
              g.grantee == gn && g.granteeType == gt)))
          Some(status(spark, "REVOKE"))
        } else None
      case GrantRoles(rs, gType, grantee, withAdmin) =>
        val roleList = rs.split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
        if (roleList.forall(rolesOf(id).contains)) {
          val gt = principalType(gType, grantee, id)
          roleList.foreach(r => addRoleGrant(id,
            RoleGrant(r, grantee.toLowerCase, gt, withAdmin != null)))
          Some(status(spark, "GRANT ROLE"))
        } else if (gType != null || roleList.exists(rolesOf(id).contains)) {
          // clearly role-shaped (explicit USER/ROLE or a known role) → raise
          requireRoles(roleList); None
        } else None // unknown single name: likely a privilege-less GRANT typo
      case RevokeRoles(rs, gType, grantee) =>
        val roleList = rs.split(',').map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq
        if (roleList.forall(rolesOf(id).contains)) {
          val gt = principalType(gType, grantee, id)
          val gn = grantee.toLowerCase
          roleGrants.updateWith(id)(_.map(_.filterNot(g =>
            roleList.contains(g.role) && g.grantee == gn && g.granteeType == gt)))
          Some(status(spark, "REVOKE ROLE"))
        } else None
      case SetRoleSt(which) => which.toUpperCase match {
        case "ALL" => setRole.put(id, None); Some(status(spark, "SET ROLE"))
        case "NONE" =>
          setRole.put(id, Some(Set.empty)); Some(status(spark, "SET ROLE"))
        case _ =>
          val r = which.toLowerCase
          if (!applicableRoles(id, currentUser(spark)).contains(r))
            throw new IllegalArgumentException(s"Cannot set role $r")
          setRole.put(id, Some(Set(r)))
          Some(status(spark, "SET ROLE"))
      }
      case ShowRoles() =>
        Some(strings(spark, "role_name", rolesOf(id).toSeq.sorted))
      case ShowCurRoles() =>
        Some(strings(spark, "role_name",
          enabledRoles(id, currentUser(spark)).toSeq.sorted))
      case ShowRoleGrants() =>
        val user = currentUser(spark)
        Some(strings(spark, "role_name",
          ("public" +: roleGrants.getOrElse(id, Vector.empty)
            .filter(g => g.granteeType == "USER" && g.grantee == user)
            .map(_.role)).distinct.sorted))
      case ShowGrants(table) =>
        val rows = privGrants.getOrElse(id, Vector.empty)
          .filter(g => table == null || g.table == table.toLowerCase)
          .sortBy(g => (g.table, g.grantee, g.privilege))
          .map(g => Row(g.grantor, "USER", g.grantee, g.granteeType,
            "graft", "default", g.table, g.privilege,
            if (g.grantOption) "YES" else "NO", "NO"))
        val schema = StructType(Seq("Grantor", "Grantor Type", "Grantee",
          "Grantee Type", "Catalog", "Schema", "Table", "Privilege",
          "Grantable", "With Hierarchy")
          .map(StructField(_, StringType, nullable = true)))
        Some(spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema))
      case _ => None
    }
  }

  private def addRoleGrant(id: String, g: RoleGrant): Unit =
    roleGrants.updateWith(id) {
      case Some(v) if v.contains(g) => Some(v)
      case Some(v) => Some(v :+ g)
      case None => Some(Vector(g))
    }

  private def addPrivGrant(id: String, g: PrivGrant): Unit =
    privGrants.updateWith(id) {
      case Some(v) =>
        // re-grant replaces (grant option may change)
        Some(v.filterNot(o => o.privilege == g.privilege &&
          o.table == g.table && o.grantee == g.grantee &&
          o.granteeType == g.granteeType) :+ g)
      case None => Some(Vector(g))
    }

  /** "SELECT, INSERT" → Seq("SELECT","INSERT"); "ALL PRIVILEGES" →
    * Seq("ALL"); anything non-privilege → empty (→ role-grant path). */
  private def parsePrivileges(raw: String): Seq[String] = {
    val up = raw.trim.toUpperCase
    if (up == "ALL PRIVILEGES" || up == "ALL") Seq("ALL")
    else {
      val parts = up.split(',').map(_.trim).toSeq
      if (parts.forall(Privileges.contains)) parts else Seq.empty
    }
  }

  /** Explicit USER/ROLE keyword wins; otherwise a known role name is a
    * role, anything else a user (the reference's PrincipalSpecification
    * UNSPECIFIED resolution). */
  private def principalType(explicit: String, name: String, id: String): String =
    if (explicit != null) explicit.toUpperCase
    else if (rolesOf(id).contains(name.toLowerCase)) "ROLE"
    else "USER"

  private def strings(spark: SparkSession, col: String, vs: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(vs.map(Row(_)), 1),
      StructType(Seq(StructField(col, StringType, nullable = false))))

  private def status(spark: SparkSession, s: String): DataFrame =
    DdlStatements.statusResult(spark, s)
}
