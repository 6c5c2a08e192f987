package graft.security

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Kafka ACL semantics: deny precedence, wildcard/prefix matching,
  * tombstoned bindings, default deny (security/authorizer.h shapes). */
class AclsSpec extends SparkSpec {
  import spark.implicits._

  private def aclLog = Seq(
    (1L, "u", "*", "topic", "literal", "t", "read", "allow", false),
    (2L, "u", "*", "topic", "literal", "t", "read", "deny", false),
    (3L, "*", "*", "topic", "prefixed", "pre-", "all", "allow", false),
    (4L, "v", "*", "topic", "literal", "t", "write", "allow", false),
    (5L, "v", "*", "topic", "literal", "t", "write", "allow", true))
    .toDF("seq", "principal", "host", "resource_type", "pattern_type",
      "resource_name", "operation", "permission", "deleted")

  private def decide(reqs: Seq[(String, String, String, String, String)]): Map[String, String] =
    Acls.authorize(
        reqs.toDF("principal", "host", "operation", "resource_type", "resource_name"),
        Acls.currentAcls(aclLog))
      .select(concat_ws("/", col("principal"), col("operation"), col("resource_name")), col("decision"))
      .as[(String, String)].collect().toMap

  test("deny precedence, prefix wildcard, tombstone delete, default deny") {
    val d = decide(Seq(
      ("u", "h", "read", "topic", "t"),        // allow + deny coexist -> denied
      ("w", "h", "write", "topic", "pre-x"),   // wildcard principal, all-op, prefix
      ("v", "h", "write", "topic", "t"),       // binding tombstoned -> denied
      ("u", "h", "describe", "topic", "t")))   // no matching acl -> denied
    assert(d === Map(
      "u/read/t" -> "denied",
      "w/write/pre-x" -> "allowed",
      "v/write/t" -> "denied",
      "u/describe/t" -> "denied"))
  }

  test("role ACLs: role allows apply to members, deny precedence crosses identities") {
    val log = Seq(
      (1L, "Role:ops", "*", "topic", "literal", "t", "read", "allow", false),
      (2L, "m1", "*", "topic", "literal", "t", "read", "deny", false),
      (3L, "Role:ops", "*", "topic", "literal", "u", "write", "deny", false),
      (4L, "m2", "*", "topic", "literal", "u", "write", "allow", false))
      .toDF("seq", "principal", "host", "resource_type", "pattern_type",
        "resource_name", "operation", "permission", "deleted")
    val roles = Seq(("ops", "m1"), ("ops", "m2")).toDF("role", "member")
    val reqs = Seq(
      ("m1", "h", "read", "topic", "t"),   // role allow + USER deny -> denied
      ("m2", "h", "read", "topic", "t"),   // role allow -> allowed
      ("m2", "h", "write", "topic", "u"),  // user allow + ROLE deny -> denied
      ("x", "h", "read", "topic", "t"))    // not a member -> denied
      .toDF("principal", "host", "operation", "resource_type", "resource_name")
    val got = Acls.authorizeWithRoles(reqs, Acls.currentAcls(log), roles)
      .select("principal", "operation", "decision")
      .as[(String, String, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("m1", "read")) === "denied")
    assert(got(("m2", "read")) === "allowed")
    assert(got(("m2", "write")) === "denied")
    assert(got(("x", "read")) === "denied")
  }

  test("describe_acls filters by resource type and matching pattern") {
    val live = Acls.currentAcls(aclLog)
    assert(Acls.describeAcls(live, "topic").count() === 3)
    val forPre = Acls.describeAcls(live, "topic", Some("pre-abc"))
      .select("resource_name").as[String].collect().toSeq
    assert(forPre === Seq("pre-"))
  }
}
