package graft.functions

import graft.functions.WireHeaders._

/**
 * Golden bytes + round-trips for the request/response framing layer
 * (`kafka/server/protocol_utils.cc:23-120`, ApiVersions schema in
 * `protocol/schemata/api_versions_response.json`).
 */
class WireHeadersSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("request frame golden bytes: flexible header with client id and empty tags") {
    val frame = encodeRequestFrame(
      RequestHeader(18, 3, 7, Some("cli")), Array.empty, flexible = true)
    // size=14 | key 0012 | ver 0003 | corr 00000007 | cid len 0003 "cli" | tags 00
    assert(hex(frame) === "0000000e" + "0012" + "0003" + "00000007" +
      "0003" + "636c69" + "00")
    val (h, payload) = decodeRequestFrame(frame, flexible = true)
    assert(h === RequestHeader(18, 3, 7, Some("cli")))
    assert(payload.isEmpty)
  }

  test("request header: null client id encodes length -1; negative length rejects") {
    val frame = encodeRequestFrame(
      RequestHeader(1, 11, -2, None), Array[Byte](9), flexible = false)
    assert(hex(frame).contains("ffff")) // the -1 legacy null marker
    val (h, p) = decodeRequestFrame(frame, flexible = false)
    assert(h.clientId.isEmpty && p.toSeq === Seq(9.toByte))
    // corrupt the length to -2: malformed, connection-shutdown error
    val bad = frame.clone()
    bad(12) = 0xff.toByte; bad(13) = 0xfe.toByte
    assertThrows[IllegalArgumentException](decodeRequestFrame(bad, flexible = false))
  }

  test("request header tags round-trip (parse_tags)") {
    val tags = Seq((0L, Array[Byte](1, 2)), (3L, Array[Byte](7)))
    val frame = encodeRequestFrame(
      RequestHeader(18, 3, 1, Some("x"), tags), Array.empty, flexible = true)
    val (h, _) = decodeRequestFrame(frame, flexible = true)
    assert(h.tags.map(_._1) === Seq(0L, 3L))
    assert(h.tags.map(_._2.toSeq) === tags.map(_._2.toSeq))
  }

  test("ApiVersions v3 golden bytes: compact array, tag buffers, trailing throttle") {
    val r = ApiVersionsResponse(0, Seq(ApiRange(0, 0, 9), ApiRange(18, 0, 3)), 0)
    val body = encodeApiVersions(r, 3)
    assert(hex(body) === "0000" + "03" +
      "0000" + "0000" + "0009" + "00" +
      "0012" + "0000" + "0003" + "00" +
      "00000000" + "00")
    assert(body.length === apiVersionsBodySize(3, 2))
    assert(decodeApiVersions(body, 3) === r)
  }

  test("ApiVersions v0 golden bytes: int32 array, no throttle field") {
    val r = ApiVersionsResponse(0, Seq(ApiRange(0, 0, 9), ApiRange(18, 0, 3)), 0)
    val body = encodeApiVersions(r, 0)
    assert(hex(body) === "0000" + "00000002" +
      "000000000009" + "001200000003")
    assert(body.length === apiVersionsBodySize(0, 2))
    assert(decodeApiVersions(body, 0) === r)
  }

  test("every serde version round-trips through the response frame") {
    val r = ApiVersionsResponse(35, (0 until 44).map(k =>
      ApiRange(k.toShort, 0, ((k % 7) + 1).toShort)), 12)
    (0 to 3).foreach { v =>
      val frame = encodeResponseFrame(99, encodeApiVersions(r, v))
      val (corr, body) = decodeResponseFrame(frame)
      assert(corr === 99)
      val dec = decodeApiVersions(body, v)
      // v0 has no throttle on the wire; it decodes as 0
      assert(dec === (if (v == 0) r.copy(throttleMs = 0) else r))
      assert(body.length === apiVersionsBodySize(v, 44))
    }
  }

  test("Metadata v9: flexible round trip with nullable rack/cluster_id") {
    import WireHeaders.Metadata._
    val req = Request(Seq("events", "logs"), allowAutoTopicCreation = true,
      includeClusterAuthorizedOps = false, includeTopicAuthorizedOps = true)
    assert(decodeRequest(encodeRequest(req)) === req)
    val resp = Response(5,
      Seq(Broker(0, "a", 9092, None), Broker(1, "b", 9093, Some("r1"))),
      Some("cid"), 1,
      Seq(Topic(0, "events", isInternal = false,
        Seq(Part(0, 0, 1, 3, Seq(0, 1), Seq(1), Nil),
          Part(0, 1, 0, 2, Seq(0), Seq(0), Seq(1))))))
    assert(decodeResponse(encodeResponse(resp)) === resp)
    // null cluster/rack leg
    val bare = Response(0, Seq(Broker(0, "h", 1, None)), None, 0, Nil)
    assert(decodeResponse(encodeResponse(bare)) === bare)
  }

  test("OffsetFetch v7: flexible round trip incl. missing-partition answers") {
    import WireHeaders.OffsetFetch._
    val req = Request("g0", Seq(("events", Seq(0, 1, 2))), requireStable = true)
    assert(decodeRequest(encodeRequest(req)) === req)
    val resp = Response(0, Seq(RespTopic("events", Seq(
      RespPart(0, 42L, 3, Some("m"), 0),
      RespPart(1, -1L, -1, None, 0)))), 0)
    assert(decodeResponse(encodeResponse(resp)) === resp)
  }

  test("Produce v8: legacy round trip with null records and record errors") {
    import WireHeaders.Produce._
    val req = Request(Some("tx-1"), -1, 30000, Seq(
      ("events", Seq((0, Some(Array[Byte](1, 2, 3))), (1, None)))))
    val back = decodeRequest(encodeRequest(req))
    assert(back.transactionalId === req.transactionalId)
    assert(back.acks === -1 && back.timeoutMs === 30000)
    assert(back.topics.head._1 === "events")
    assert(back.topics.head._2.map(_._1) === Seq(0, 1))
    assert(back.topics.head._2.head._2.get.toSeq === Seq[Byte](1, 2, 3))
    assert(back.topics.head._2(1)._2 === None)
    val resp = Response(Seq(("events", Seq(
      RespPart(0, 0, 42L, -1L, 0L, Nil, None),
      RespPart(1, 2, -1L, -1L, -1L, Seq((0, Some("bad crc"))), Some("boom"))))), 7)
    assert(decodeResponse(encodeResponse(resp)) === resp)
  }

  test("Fetch v11: legacy round trip with session fields, aborted txns, null records") {
    import WireHeaders.Fetch._
    val req = Request(-1, 500, 1, 52428800, 1, 77, 3,
      Seq(("events", Seq(ReqPart(0, -1, 100L, 0L, 1048576)))),
      Seq(("old", Seq(1, 2))), "rack-a")
    assert(decodeRequest(encodeRequest(req)) === req)
    val resp = Response(9, 0, 77, Seq(("events", Seq(
      RespPart(0, 0, 1000L, 990L, 0L,
        Some(Seq(Aborted(5L, 42L))), -1, Some(Array[Byte](9, 9))),
      RespPart(1, 6, -1L, -1L, -1L, None, -1, None)))))
    val back = decodeResponse(encodeResponse(resp))
    assert(back.copy(topics = Nil) === resp.copy(topics = Nil))
    val (p0, p1) = (back.topics.head._2.head, back.topics.head._2(1))
    assert(p0.aborted === Some(Seq(Aborted(5L, 42L))))
    assert(p0.records.get.toSeq === Seq[Byte](9, 9))
    assert(p1.aborted === None && p1.records === None && p1.errorCode === 6)
  }

  test("JoinGroup v6 / SyncGroup v4 / consumer protocol round trips") {
    import WireHeaders.{JoinGroup, SyncGroup, ConsumerProtocol}
    val sub = ConsumerProtocol.encodeSubscription(Seq("a", "b"))
    assert(ConsumerProtocol.decodeSubscription(sub) === Seq("a", "b"))
    val asg = ConsumerProtocol.encodeAssignment(Seq(("t", Seq(0, 2, 5))))
    assert(ConsumerProtocol.decodeAssignment(asg) === Seq(("t", Seq(0, 2, 5))))

    val jreq = JoinGroup.Request("g", 30000, 60000, "m1", Some("static-1"),
      "consumer", Seq(JoinGroup.Protocol("range", sub)))
    val jback = JoinGroup.decodeRequest(JoinGroup.encodeRequest(jreq))
    assert(jback.copy(protocols = Nil) === jreq.copy(protocols = Nil))
    assert(jback.protocols.head.name === "range")
    assert(jback.protocols.head.metadata.toSeq === sub.toSeq)

    val jresp = JoinGroup.Response(0, 0, 3, "range", "m1", "m2",
      Seq(JoinGroup.Member("m1", None, sub)))
    val jrback = JoinGroup.decodeResponse(JoinGroup.encodeResponse(jresp))
    assert(jrback.copy(members = Nil) === jresp.copy(members = Nil))
    assert(jrback.members.head.metadata.toSeq === sub.toSeq)

    val sreq = SyncGroup.Request("g", 3, "m1", None, Seq(("m2", asg)))
    val sback = SyncGroup.decodeRequest(SyncGroup.encodeRequest(sreq))
    assert(sback.copy(assignments = Nil) === sreq.copy(assignments = Nil))
    assert(sback.assignments.head._2.toSeq === asg.toSeq)
    val sresp = SyncGroup.decodeResponse(SyncGroup.encodeResponse(
      SyncGroup.Response(0, 0, asg)))
    assert(sresp.assignment.toSeq === asg.toSeq)
  }

  test("Heartbeat v4 / LeaveGroup v4 round trips") {
    import WireHeaders.{Heartbeat, LeaveGroup}
    val hb = Heartbeat.Request("g", 3, "m1", Some("inst"))
    assert(Heartbeat.decodeRequest(Heartbeat.encodeRequest(hb)) === hb)
    assert(Heartbeat.decodeResponse(Heartbeat.encodeResponse(
      Heartbeat.Response(5, 22))) === Heartbeat.Response(5, 22))
    val lv = LeaveGroup.Request("g", Seq(("m1", None), ("m2", Some("i2"))))
    assert(LeaveGroup.decodeRequest(LeaveGroup.encodeRequest(lv)) === lv)
    val resp = LeaveGroup.Response(0, 0, Seq(
      LeaveGroup.MemberResp("m1", None, 0),
      LeaveGroup.MemberResp("m2", Some("i2"), 25)))
    assert(LeaveGroup.decodeResponse(LeaveGroup.encodeResponse(resp)) === resp)
  }

  test("InitProducerId v3 / EndTxn v3 / DeleteRecords v2 round trips") {
    import WireHeaders.{InitProducerId, EndTxn, DeleteRecords}
    val ipi = InitProducerId.Request(Some("tx"), 60000, -1L, -1)
    assert(InitProducerId.decodeRequest(InitProducerId.encodeRequest(ipi)) === ipi)
    val ipiN = InitProducerId.Request(None, 60000, 5L, 2)
    assert(InitProducerId.decodeRequest(InitProducerId.encodeRequest(ipiN)) === ipiN)
    assert(InitProducerId.decodeResponse(InitProducerId.encodeResponse(
      InitProducerId.Response(0, 0, 42L, 3))) ===
      InitProducerId.Response(0, 0, 42L, 3))
    val et = EndTxn.Request("tx", 42L, 3, committed = true)
    assert(EndTxn.decodeRequest(EndTxn.encodeRequest(et)) === et)
    assert(EndTxn.decodeResponse(EndTxn.encodeResponse(EndTxn.Response(1, 47)))
      === EndTxn.Response(1, 47))
    val dr = DeleteRecords.Request(Seq(("t", Seq((0, 100L), (1, -1L)))), 30000)
    assert(DeleteRecords.decodeRequest(DeleteRecords.encodeRequest(dr)) === dr)
    val drr = DeleteRecords.Response(0, Seq(("t", Seq(
      DeleteRecords.RespPart(0, 100L, 0), DeleteRecords.RespPart(9, -1L, 3)))))
    assert(DeleteRecords.decodeResponse(DeleteRecords.encodeResponse(drr)) === drr)
  }

  test("CreateTopics v7: round trip incl. the tagged config-error field") {
    import WireHeaders.CreateTopics._
    val req = Request(Seq(
      ReqTopic("t1", 8, 3, Seq(("compression.type", Some("zstd")),
        ("x", None))),
      ReqTopic("t2", 1, 1, Nil)), 30000, validateOnly = true)
    assert(decodeRequest(encodeRequest(req)) === req)
    val resp = Response(7, Seq(
      RespTopic("t1", new Array[Byte](16), 0, None, 0, 8, 3,
        Some(Seq(("compression.type", Some("zstd"))))),
      RespTopic("t2", new Array[Byte](16), 40, Some("bad"), 40, -1, -1, None)))
    val back = decodeResponse(encodeResponse(resp))
    assert(back.throttleMs === 7)
    assert(back.topics.map(t => (t.name, t.errorCode, t.errorMessage,
      t.topicConfigErrorCode, t.numPartitions, t.replicationFactor, t.configs))
      === resp.topics.map(t => (t.name, t.errorCode, t.errorMessage,
        t.topicConfigErrorCode, t.numPartitions, t.replicationFactor, t.configs)))
  }

  test("compact decoders reject lengths a truncated frame cannot hold") {
    import java.nio.ByteBuffer
    // compact string claiming 200 bytes with 1 present
    val claim = ByteBuffer.allocate(8)
    WireHeaders.putUvarint(claim, 201L); claim.put('x'.toByte); claim.flip()
    val arr = new Array[Byte](claim.remaining()); claim.get(arr)
    assertThrows[IllegalArgumentException](
      WireHeaders.getCompactString(ByteBuffer.wrap(arr)))
    // compact array claiming 1000 elements in a 3-byte frame
    val arrB = ByteBuffer.allocate(8)
    WireHeaders.putUvarint(arrB, 1001L); arrB.put(0.toByte); arrB.flip()
    val arr2 = new Array[Byte](arrB.remaining()); arrB.get(arr2)
    assertThrows[IllegalArgumentException](
      WireHeaders.getCompactArrayLen(ByteBuffer.wrap(arr2)))
  }

  test("uvarint: boundaries and overlong rejection") {
    val b = java.nio.ByteBuffer.allocate(32)
    Seq(0L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong).foreach { v =>
      b.clear(); putUvarint(b, v); b.flip()
      assert(getUvarint(b) === v)
      assert(b.position() === uvarintSize(v))
    }
    val overlong = Array.fill[Byte](11)(0x80.toByte)
    assertThrows[IllegalArgumentException](
      getUvarint(java.nio.ByteBuffer.wrap(overlong)))
  }
}
