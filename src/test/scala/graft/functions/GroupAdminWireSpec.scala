package graft.functions

import graft.SparkSpec
import graft.functions.WireHeaders.{ConsumerProtocol, DeleteGroups, DescribeGroups, ListGroups, OffsetDelete}

/** Serde round-trips for the group-admin keys (15/16/42/47) at the
  * reference's pinned versions. */
class GroupAdminWireSpec extends SparkSpec {

  test("ListGroups v4 round-trips states filter and per-group state") {
    val req = ListGroups.Request(Seq("Stable", "Empty"))
    assert(ListGroups.decodeRequest(ListGroups.encodeRequest(req)) === req)
    val resp = ListGroups.Response(0, 0, Seq(
      ListGroups.Group("g-stable", "consumer", "Stable"),
      ListGroups.Group("g-empty", "consumer", "Empty")))
    assert(ListGroups.decodeResponse(ListGroups.encodeResponse(resp)) === resp)
    val err = ListGroups.Response(0, 42, Nil)
    assert(ListGroups.decodeResponse(ListGroups.encodeResponse(err)) === err)
  }

  test("DescribeGroups v5 carries members with real subscription bytes") {
    val req = DescribeGroups.Request(Seq("g1", "g2"), includeAuthorizedOperations = true)
    assert(DescribeGroups.decodeRequest(DescribeGroups.encodeRequest(req)) === req)
    val sub = ConsumerProtocol.encodeSubscription(Seq("events", "orders"))
    val resp = DescribeGroups.Response(0, Seq(
      DescribeGroups.Group(0, "g1", "Stable", "consumer", "range", Seq(
        DescribeGroups.Member("m1", Some("inst-1"), "m1-client", "/10.0.0.1",
          sub, Array[Byte](1, 2))), -2147483648),
      DescribeGroups.Group(0, "ghost", "Dead", "", "", Nil, -2147483648)))
    val back = DescribeGroups.decodeResponse(DescribeGroups.encodeResponse(resp))
    assert(back.groups.map(_.groupId) === Seq("g1", "ghost"))
    val m = back.groups.head.members.head
    assert(m.memberId === "m1" && m.groupInstanceId === Some("inst-1"))
    assert(ConsumerProtocol.decodeSubscription(m.metadata) === Seq("events", "orders"))
    assert(m.assignment.toSeq === Seq[Byte](1, 2))
    assert(back.groups(1).groupState === "Dead" && back.groups(1).members.isEmpty)
  }

  test("DeleteGroups v2 and OffsetDelete v0 round-trip their error grids") {
    val del = DeleteGroups.Response(0, Seq(("g-stable", 68.toShort),
      ("g-empty", 0.toShort), ("ghost", 69.toShort)))
    assert(DeleteGroups.decodeResponse(DeleteGroups.encodeResponse(del)) === del)

    val odReq = OffsetDelete.Request("g-stable",
      Seq("events" -> Seq(0, 1), "other" -> Seq(2)))
    val odBytes = OffsetDelete.encodeRequest(odReq)
    assert(OffsetDelete.decodeRequest(odBytes) === odReq)
    // v0 is legacy: group(2+8) + int32 + per topic (2+len + int32 + 4*np)
    assert(odBytes.length === (2 + 8) + 4 + (2 + 6 + 4 + 8) + (2 + 5 + 4 + 4))
    val odResp = OffsetDelete.Response(0, 0, Seq(
      "events" -> Seq((0, 86.toShort), (1, 0.toShort))))
    assert(OffsetDelete.decodeResponse(OffsetDelete.encodeResponse(odResp)) === odResp)
    // the response error_code leads (schema field order)
    val groupErr = OffsetDelete.encodeResponse(OffsetDelete.Response(69, 0, Nil))
    assert(java.nio.ByteBuffer.wrap(groupErr).getShort === 69)
    intercept[Exception] {
      OffsetDelete.decodeRequest(odBytes.take(odBytes.length - 3))
    }
  }
}
