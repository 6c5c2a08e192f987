package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.log.Compaction

/**
 * ACL store and authorizer (SURVEY §2.10: create/delete/describe ACLs).
 *
 * Reference: an ACL binding is a resource pattern plus an entry
 * (`security/acl.h` — principal, host, operation, permission; pattern
 * type literal or prefixed), stored and matched by
 * `security/acl_store.h`; the authorizer applies Kafka semantics
 * (`security/authorizer.h`): a request is DENIED if any matching deny
 * ACL exists (deny precedence), else ALLOWED if any matching allow ACL
 * exists, else default-denied. Wildcard `*` matches any principal/host;
 * operation `all` matches any operation; a prefixed pattern matches
 * every resource name it prefixes.
 *
 * Spark design: ACL create/delete is a compacted command log (the same
 * LWW-with-tombstones shape as topic configs — the reference stores
 * ACLs in the controller log the same way), and authorization is ONE
 * broadcast join of the tiny ACL set against the request stream plus a
 * per-request aggregate — the request side never shuffles, so the
 * authorizer runs at stream speed no matter the request volume.
 */
object Acls {

  /** Binding identity: the 7 fields that name an ACL. */
  private val BindingKey = Seq(
    "principal", "host", "resource_type", "pattern_type",
    "resource_name", "operation", "permission")

  /**
   * Live ACL set from the create/delete command log
   * (seq, <binding fields>, deleted): last write per binding wins,
   * tombstones drop the binding.
   */
  def currentAcls(aclLog: DataFrame): DataFrame =
    Compaction.compact(aclLog, BindingKey, "seq")
      .where(!col("deleted"))
      .drop("deleted", "seq")

  /** describe_acls: the live bindings for one resource type, optionally
    * filtered to patterns that could match `resourceName`. */
  def describeAcls(acls: DataFrame, resourceType: String,
      resourceName: Option[String] = None): DataFrame = {
    val base = acls.where(col("resource_type") === resourceType)
    resourceName.fold(base) { rn =>
      base.where(
        (col("pattern_type") === "literal" && col("resource_name") === rn) ||
          (col("pattern_type") === "prefixed" && lit(rn).startsWith(col("resource_name"))))
    }
  }

  /**
   * ACL binding filter (`security/acl.cc:496-527`
   * resource_pattern_filter::matches + acl_entry_filter): each absent
   * leg matches anything; a CONCRETE pattern filter ('literal' /
   * 'prefixed') requires the stored pattern type to equal it and then
   * compares names exactly; the 'match' filter evaluates the stored
   * pattern against the filter name — literal matches on equality OR a
   * stored wildcard '*', prefixed matches when the filter name starts
   * with the stored prefix. Entry legs (principal/host/op/perm) are
   * exact-match-or-absent. This is the shared evaluator behind
   * describe_acls and delete_acls. One codegen'd filter over the
   * broadcast-small live set.
   */
  def filterAcls(acls: DataFrame,
      resourceType: Option[String], nameFilter: Option[String],
      patternFilter: Option[String], principalFilter: Option[String],
      hostFilter: Option[String], opFilter: Option[String],
      permFilter: Option[String]): DataFrame = {
    def eq(c: String, v: Option[String]): Column =
      v.map(col(c) === _).getOrElse(lit(true))
    val patternOk: Column = patternFilter match {
      case None => lit(true)
      case Some("match") => lit(true) // name leg below decides
      case Some(p) => col("pattern_type") === p
    }
    val nameOk: Column = nameFilter match {
      case None => lit(true)
      case Some(n) if patternFilter.contains("match") =>
        (col("pattern_type") === "literal" &&
          (col("resource_name") === n || col("resource_name") === "*")) ||
          (col("pattern_type") === "prefixed" &&
            lit(n).startsWith(col("resource_name")))
      case Some(n) => col("resource_name") === n
    }
    acls.where(eq("resource_type", resourceType) && patternOk && nameOk &&
      eq("principal", principalFilter) && eq("host", hostFilter) &&
      eq("operation", opFilter) && eq("permission", permFilter))
  }

  /**
   * RBAC authorization (reference `security/role.h` / `role_store.h`:
   * roles are named principal sets; a binding may name
   * `Role:<name>` as its principal and then covers every member). Each
   * request authorizes under ALL its identities — the user principal
   * plus `Role:r` for every role r the user belongs to — with deny
   * precedence ACROSS identities: a user-level deny beats a role-level
   * allow and vice versa, exactly the flat-set semantics of evaluating
   * the union of matching bindings.
   *
   * The role membership table is control-plane-bounded: it aggregates
   * to one identity ARRAY per member and broadcast-joins once, so the
   * high-volume request stream is scanned a single time and expansion
   * is an explode of 1 + |roles(user)| identities per request.
   */
  def authorizeWithRoles(requests: DataFrame, acls: DataFrame,
      roles: DataFrame): DataFrame = {
    // Reserved-named join columns: a caller whose requests already carry
    // a `member` column must not collide with the membership table's key
    // (an ambiguous join condition would silently drop caller data).
    val mem = broadcast(roles
      .groupBy(col("member"))
      .agg(collect_list(concat(lit("Role:"), col("role"))).as("__roleIds"))
      .select(col("member").as("__member"), col("__roleIds")))
    val expanded = requests
      .join(mem, col("__member") === col("principal"), "left")
      .withColumn("__identity", explode(concat(
        array(col("principal")),
        coalesce(col("__roleIds"), array()))))
      .drop("__member", "__roleIds")
    authorizeIdentities(expanded, requests.columns, acls)
  }

  /**
   * Authorize a request set against the live ACLs. `requests` columns:
   * (principal, host, operation, resource_type, resource_name); the
   * result carries them plus a `decision` of 'allowed' | 'denied'.
   */
  def authorize(requests: DataFrame, acls: DataFrame): DataFrame =
    authorizeIdentities(requests.withColumn("__identity", col("principal")),
      requests.columns, acls)

  /** The authorizer fold over pre-expanded (request, identity) rows:
    * match bindings against each identity, then deny-precedence
    * aggregate per ORIGINAL request. */
  private def authorizeIdentities(expanded: DataFrame,
      requestCols: Seq[String], acls: DataFrame): DataFrame = {
    val a = broadcast(acls.select(
      col("principal").as("a_principal"), col("host").as("a_host"),
      col("resource_type").as("a_rtype"), col("pattern_type").as("a_ptype"),
      col("resource_name").as("a_rname"), col("operation").as("a_op"),
      col("permission").as("a_perm")))
    val matched = expanded.join(a,
      col("a_rtype") === col("resource_type") &&
        (col("a_principal") === col("__identity") || col("a_principal") === "*") &&
        (col("a_host") === col("host") || col("a_host") === "*") &&
        (col("a_op") === col("operation") || col("a_op") === "all") &&
        ((col("a_ptype") === "literal" && col("a_rname") === col("resource_name")) ||
          (col("a_ptype") === "prefixed" && col("resource_name").startsWith(col("a_rname")))),
      "left")
    matched.groupBy(requestCols.toIndexedSeq.map(col): _*)
      .agg(
        max((col("a_perm") === "deny").cast("int")).as("__deny"),
        max((col("a_perm") === "allow").cast("int")).as("__allow"))
      .withColumn("decision",
        when(col("__deny") === 1, "denied")
          .when(col("__allow") === 1, "allowed")
          .otherwise("denied"))
      .drop("__deny", "__allow")
  }
}
