package graft.security

import graft.SparkSpec
import graft.functions.WireHeaders.{AclEnums, CreateAcls, DeleteAcls, DescribeAcls}

/** ACL wire serde (api keys 29/30/31 at v3) and the binding-filter
  * evaluator behind describe/delete (acl.cc:496-527). */
class AclWireSpec extends SparkSpec {
  import spark.implicits._

  private def liveAcls = Acls.currentAcls(Seq(
    (0L, "User:alice", "*", "topic", "literal", "payments", "read", "allow", false),
    (1L, "User:bob", "*", "topic", "prefixed", "pay", "write", "allow", false),
    (2L, "User:bob", "*", "group", "literal", "analytics", "read", "deny", false),
    (3L, "User:*", "*", "topic", "literal", "*", "describe", "allow", false))
    .toDF("seq", "principal", "host", "resource_type", "pattern_type",
      "resource_name", "operation", "permission", "deleted"))

  test("MATCH filter: literal equality, stored wildcard, prefix evaluation") {
    val out = Acls.filterAcls(liveAcls, Some("topic"), Some("payments"),
        Some("match"), None, None, None, None)
      .select("principal").collect().map(_.getString(0)).sorted
    assert(out === Array("User:*", "User:alice", "User:bob"))
    // literal filter is exact: the prefixed binding and wildcard drop out
    val lit = Acls.filterAcls(liveAcls, Some("topic"), Some("payments"),
        Some("literal"), None, None, None, None)
      .select("principal").collect().map(_.getString(0))
    assert(lit === Array("User:alice"))
    // no name filter: pattern leg alone filters
    val pre = Acls.filterAcls(liveAcls, None, None, Some("prefixed"),
        None, None, None, None)
      .select("resource_name").collect().map(_.getString(0))
    assert(pre === Array("pay"))
  }

  test("entry legs are exact-or-absent") {
    val bob = Acls.filterAcls(liveAcls, None, None, None,
        Some("User:bob"), None, None, None)
      .select("resource_type").collect().map(_.getString(0)).sorted
    assert(bob === Array("group", "topic"))
    val deny = Acls.filterAcls(liveAcls, None, None, None, None, None,
        None, Some("deny")).count()
    assert(deny === 1)
  }

  test("CreateAcls v3 round-trips; conversion errors carry reference messages") {
    val req = CreateAcls.Request(Seq(
      CreateAcls.Acl(2, "payments", 3, "User:alice", "*", 3, 3),
      CreateAcls.Acl(99.toByte, "x", 3, "User:c", "*", 3, 3)))
    assert(CreateAcls.decodeRequest(CreateAcls.encodeRequest(req)) === req)
    val resp = CreateAcls.Response(0,
      Seq((0.toShort, None), (42.toShort, Some("Invalid resource type: 99"))))
    assert(CreateAcls.decodeResponse(CreateAcls.encodeResponse(resp)) === resp)

    assert(intercept[IllegalArgumentException] {
      AclEnums.resourceType(99.toByte)
    }.getMessage === "Invalid resource type: 99")
    assert(intercept[IllegalArgumentException] {
      AclEnums.validatePrincipal("alice")
    }.getMessage === "Invalid principal name: {alice}")
    assert(intercept[IllegalArgumentException] {
      AclEnums.validatePrincipal("RedpandaRole:*")
    }.getMessage === "Illegal wildcard role: {RedpandaRole:*}")
    assert(AclEnums.validatePrincipal("User:*") === "User:*")
    assert(AclEnums.validatePrincipal("RedpandaRole:ops") === "RedpandaRole:ops")
  }

  test("DescribeAcls v3 and DeleteAcls v3 round-trip nested resources") {
    val dreq = DescribeAcls.Request(2, Some("payments"), 2, None,
      Some("10.0.0.1"), 1, 1)
    assert(DescribeAcls.decodeRequest(DescribeAcls.encodeRequest(dreq)) === dreq)
    val dresp = DescribeAcls.Response(0, 0, None, Seq(
      DescribeAcls.Resource(2, "payments", 3, Seq(
        DescribeAcls.RespAcl("User:alice", "*", 3, 3),
        DescribeAcls.RespAcl("User:bob", "*", 4, 2)))))
    assert(DescribeAcls.decodeResponse(DescribeAcls.encodeResponse(dresp)) === dresp)

    val delReq = DeleteAcls.Request(Seq(
      DeleteAcls.Filter(1, None, 1, Some("User:bob"), None, 1, 1)))
    assert(DeleteAcls.decodeRequest(DeleteAcls.encodeRequest(delReq)) === delReq)
    val delResp = DeleteAcls.Response(0, Seq(
      DeleteAcls.FilterResult(0, None, Seq(
        DeleteAcls.MatchingAcl(0, None, 3, "analytics", 3, "User:bob", "*",
          3, 2))),
      DeleteAcls.FilterResult(42, Some("Invalid principal name: {bob}"), Nil)))
    assert(DeleteAcls.decodeResponse(DeleteAcls.encodeResponse(delResp)) === delResp)
  }
}
