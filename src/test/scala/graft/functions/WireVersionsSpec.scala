package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import WireVersions._

/** The big-five request serdes across their full version ranges:
  * every version round-trips through bytes to the normalized request
  * with the schema's defaults filled for absent fields, and selected
  * versions' byte sizes match HAND-COMPUTED layout laws (independent
  * of the encoder's own size function). */
class WireVersionsSpec extends AnyFunSuite {

  private val recs = Array.tabulate(120)(_.toByte)

  private val produceReq = WireHeaders.Produce.Request(
    Some("txn-1"), acks = -1, timeoutMs = 30000,
    topics = Seq(("events", Seq((0, Some(recs)), (1, None)))))

  test("produce 0-8: round trip and the v3 transactional_id gate") {
    for (v <- ProduceV.ValidVersions) {
      val bytes = ProduceV.encode(v, produceReq)
      assert(bytes.length === ProduceV.size(v, produceReq), s"v$v size")
      val back = ProduceV.decode(v, bytes)
      assert(back.acks === -1); assert(back.timeoutMs === 30000)
      assert(back.transactionalId === (if (v >= 3) Some("txn-1") else None), s"v$v")
      assert(back.topics.head._2.head._2.get.toSeq === recs.toSeq)
      assert(back.topics.head._2(1)._2 === None)
    }
    // hand-computed: v0 = acks(2)+timeout(4)+n(4) + "events"(2+6)+np(4)
    //   + p0(4)+len(4)+120 + p1(4)+len(4) = 158; v3 adds tid 2+5
    assert(ProduceV.encode(0, produceReq).length === 158)
    assert(ProduceV.encode(3, produceReq).length === 165)
    assert(ProduceV.encode(8, produceReq).length === 165)
  }

  private val fetchReq = FetchV.Request(replicaId = -1, maxWaitMs = 500,
    minBytes = 1, maxBytes = 52428800, isolationLevel = 1,
    sessionId = 77, sessionEpoch = 3,
    topics = Seq(("events", Seq(
      FetchV.Part(0, 5, 42L, 7L, 1048576),
      FetchV.Part(1, 5, 100L, 7L, 1048576)))),
    forgotten = Seq(("stale", Seq(0, 1))), rackId = "rack-1")

  test("fetch 0-11: the field ladder appears exactly at its gate version") {
    for (v <- FetchV.ValidVersions) {
      val bytes = FetchV.encode(v, fetchReq)
      assert(bytes.length === FetchV.size(v, fetchReq), s"v$v size")
      val back = FetchV.decode(v, bytes)
      assert(back.replicaId === -1 && back.maxWaitMs === 500)
      assert(back.maxBytes === (if (v >= 3) 52428800 else Int.MaxValue), s"v$v")
      assert(back.isolationLevel === (if (v >= 4) 1 else 0).toByte, s"v$v")
      assert(back.sessionId === (if (v >= 7) 77 else 0), s"v$v")
      assert(back.sessionEpoch === (if (v >= 7) 3 else -1), s"v$v")
      val p0 = back.topics.head._2.head
      assert(p0.currentLeaderEpoch === (if (v >= 9) 5 else -1), s"v$v")
      assert(p0.fetchOffset === 42L)
      assert(p0.logStartOffset === (if (v >= 5) 7L else -1L), s"v$v")
      assert(back.forgotten === (if (v >= 7) fetchReq.forgotten else Nil), s"v$v")
      assert(back.rackId === (if (v >= 11) "rack-1" else ""), s"v$v")
    }
    // hand-computed v0: 3*4 + 4 + (2+6) + 4 + 2*(4+8+4) = 60
    assert(FetchV.encode(0, fetchReq).length === 60)
    // v4 adds maxBytes(4)+iso(1); v5 two 8-byte log-starts; v7 session 8
    // + forgotten 4+(2+5)+4+8=23; v9 two 4-byte epochs; v11 rack 2+6
    assert(FetchV.encode(4, fetchReq).length === 65)
    assert(FetchV.encode(7, fetchReq).length === 65 + 16 + 8 + 23)
    assert(FetchV.encode(11, fetchReq).length === 65 + 16 + 8 + 23 + 8 + 8)
  }

  private val listReq = ListOffsetsV.Request(-1, 1, Seq(("events", Seq(
    ListOffsetsV.Part(0, 5, -1L, 1), ListOffsetsV.Part(1, 5, -2L, 1)))))

  test("list_offsets 0-5: v0-only max_num_offsets and the later gates") {
    for (v <- ListOffsetsV.ValidVersions) {
      val bytes = ListOffsetsV.encode(v, listReq)
      assert(bytes.length === ListOffsetsV.size(v, listReq), s"v$v size")
      val back = ListOffsetsV.decode(v, bytes)
      assert(back.isolationLevel === (if (v >= 2) 1 else 0).toByte, s"v$v")
      val p0 = back.topics.head._2.head
      assert(p0.currentLeaderEpoch === (if (v >= 4) 5 else -1), s"v$v")
      assert(p0.timestamp === -1L)
      assert(p0.maxNumOffsets === (if (v == 0) 1 else 0), s"v$v")
    }
    // v0: 4 + 4 + (2+6) + 4 + 2*(4+8+4) = 52; v2: -2*4 maxNum +1 iso
    assert(ListOffsetsV.encode(0, listReq).length === 52)
    assert(ListOffsetsV.encode(2, listReq).length === 45)
    assert(ListOffsetsV.encode(5, listReq).length === 53) // +2*4 epochs
  }

  private val commitReq = OffsetCommitV.Request("cg", 7, "m-1", Some("inst-1"),
    86400000L, Seq(("events", Seq(
      OffsetCommitV.Part(0, 42L, 5, 1700000000000L, Some("m")),
      OffsetCommitV.Part(1, 43L, 5, 1700000000000L, None)))))

  test("offset_commit 0-8: retention window, v1-only timestamp, flexible v8") {
    for (v <- OffsetCommitV.ValidVersions) {
      val bytes = OffsetCommitV.encode(v, commitReq)
      assert(bytes.length === OffsetCommitV.size(v, commitReq), s"v$v size")
      val back = OffsetCommitV.decode(v, bytes)
      assert(back.groupId === "cg")
      assert(back.generationId === (if (v >= 1) 7 else -1), s"v$v")
      assert(back.memberId === (if (v >= 1) "m-1" else ""), s"v$v")
      assert(back.groupInstanceId ===
        (if (v >= 7) Some("inst-1") else None), s"v$v")
      assert(back.retentionTimeMs ===
        (if (v >= 2 && v <= 4) 86400000L else -1L), s"v$v")
      val p0 = back.topics.head._2.head
      assert(p0.committedOffset === 42L)
      assert(p0.committedLeaderEpoch === (if (v >= 6) 5 else -1), s"v$v")
      assert(p0.commitTimestamp === (if (v == 1) 1700000000000L else -1L), s"v$v")
      assert(p0.metadata === Some("m"))
      assert(back.topics.head._2(1).metadata === None)
    }
    // hand-computed v0: (2+2)+4 + (2+6)+4 + p0(4+8+2+1) + p1(4+8+2) = 49
    assert(OffsetCommitV.encode(0, commitReq).length === 49)
    // v1 adds gen(4)+member(2+3)+2*ts(8); v2 adds retention(8)
    assert(OffsetCommitV.encode(1, commitReq).length === 49 + 9 + 16)
    assert(OffsetCommitV.encode(2, commitReq).length === 49 + 9 + 8)
    // flexible v8 hand-computed: cg(1+2)+gen(4)+m-1(1+3)+inst-1(1+6)
    //  +arr(1)+events(1+6)+arr(1)+p0(4+8+4+(1+1)+tag1)+p1(4+8+4+1+tag1)
    //  +topicTag(1)+topTag(1) = 66
    assert(OffsetCommitV.encode(8, commitReq).length === 66)
  }

  private val joinReq = WireHeaders.JoinGroup.Request("cg", 30000, 60000, "",
    Some("inst-1"), "consumer",
    Seq(WireHeaders.JoinGroup.Protocol("range", Array.tabulate(10)(_.toByte)),
      WireHeaders.JoinGroup.Protocol("sticky", Array.tabulate(6)(_.toByte))))

  test("join_group 0-6: rebalance/instance gates and the flexible cutover") {
    for (v <- JoinGroupV.ValidVersions) {
      val bytes = JoinGroupV.encode(v, joinReq)
      assert(bytes.length === JoinGroupV.size(v, joinReq), s"v$v size")
      val back = JoinGroupV.decode(v, bytes)
      assert(back.groupId === "cg" && back.sessionTimeoutMs === 30000)
      assert(back.rebalanceTimeoutMs === (if (v >= 1) 60000 else -1), s"v$v")
      assert(back.groupInstanceId ===
        (if (v >= 5) Some("inst-1") else None), s"v$v")
      assert(back.protocolType === "consumer")
      assert(back.protocols.map(_.name) === Seq("range", "sticky"))
      assert(back.protocols.head.metadata.toSeq ===
        joinReq.protocols.head.metadata.toSeq)
    }
    // v0: cg(2+2)+session(4)+member(2)+consumer(2+8)+arr(4)
    //  +range(2+5)+len(4)+10 + sticky(2+6)+len(4)+6 = 63
    assert(JoinGroupV.encode(0, joinReq).length === 63)
    // v1 adds rebalance(4); v5 adds instance(2+6)
    assert(JoinGroupV.encode(1, joinReq).length === 67)
    assert(JoinGroupV.encode(5, joinReq).length === 75)
    // flexible v6: cg(1+2)+4+4+member(1)+inst(1+6)+consumer(1+8)+arr(1)
    //  +range(1+5)+meta(1+10)+tag + sticky(1+6)+meta(1+6)+tag + topTag = 63
    assert(JoinGroupV.encode(6, joinReq).length === 63)
  }

  private val produceResp = WireHeaders.Produce.Response(
    Seq(("events", Seq(WireHeaders.Produce.RespPart(0, 0, 42L, 1700000000000L,
      7L, Seq((2, Some("bad"))), Some("oops"))))), throttleMs = 5)

  test("produce response 0-8: append-time/log-start/record-errors gates") {
    for (v <- ProduceRespV.ValidVersions) {
      val bytes = ProduceRespV.encode(v, produceResp)
      assert(bytes.length === ProduceRespV.size(v, produceResp), s"v$v size")
      val back = ProduceRespV.decode(v, bytes)
      val p = back.responses.head._2.head
      assert(p.baseOffset === 42L)
      assert(p.logAppendTimeMs === (if (v >= 2) 1700000000000L else -1L), s"v$v")
      assert(p.logStartOffset === (if (v >= 5) 7L else -1L), s"v$v")
      assert(p.recordErrors === (if (v >= 8) Seq((2, Some("bad"))) else Nil), s"v$v")
      assert(p.errorMessage === (if (v >= 8) Some("oops") else None), s"v$v")
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
    }
    // v0: n(4)+events(2+6)+np(4)+p(4+2+8) = 30; v1 +throttle 4;
    // v2 +8; v5 +8; v8 + recErrs 4+(4+2+3) + errMsg (2+4)
    assert(ProduceRespV.encode(0, produceResp).length === 30)
    assert(ProduceRespV.encode(8, produceResp).length === 30 + 4 + 16 + 13 + 6)
  }

  private val fetchResp = FetchRespV.Response(5, 0, 77, Seq(("events", Seq(
    FetchRespV.Part(0, 0, 100L, 90L, 3L, Some(Seq((9L, 50L))), 2,
      Some(Array.tabulate(64)(_.toByte)))))))

  test("fetch response 0-11: lso/aborted/session/replica gates") {
    for (v <- FetchRespV.ValidVersions) {
      val bytes = FetchRespV.encode(v, fetchResp)
      assert(bytes.length === FetchRespV.size(v, fetchResp), s"v$v size")
      val back = FetchRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(back.sessionId === (if (v >= 7) 77 else 0), s"v$v")
      val p = back.topics.head._2.head
      assert(p.highWatermark === 100L)
      assert(p.lastStableOffset === (if (v >= 4) 90L else -1L), s"v$v")
      assert(p.logStartOffset === (if (v >= 5) 3L else -1L), s"v$v")
      assert(p.aborted === (if (v >= 4) Some(Seq((9L, 50L))) else None), s"v$v")
      assert(p.preferredReadReplica === (if (v >= 11) 2 else -1), s"v$v")
      assert(p.records.get.length === 64)
    }
    // v0: n(4)+events(8)+np(4)+p(4+2+8+reclen 4+64) = 98
    assert(FetchRespV.encode(0, fetchResp).length === 98)
    // v4 +throttle(4)+lso(8)+aborted(4+16); v5 +8; v7 +6; v11 +4
    assert(FetchRespV.encode(11, fetchResp).length === 98 + 4 + 8 + 20 + 8 + 6 + 4)
  }

  test("list_offsets response 0-5: v0 old-style offsets vs v1+ pair") {
    val resp = ListOffsetsRespV.Response(5, Seq(("events", Seq(
      ListOffsetsRespV.Part(0, 0, Seq(10L, 20L), 1700000000000L, 42L, 3)))))
    for (v <- ListOffsetsRespV.ValidVersions) {
      val bytes = ListOffsetsRespV.encode(v, resp)
      assert(bytes.length === ListOffsetsRespV.size(v, resp), s"v$v size")
      val back = ListOffsetsRespV.decode(v, bytes)
      val p = back.topics.head._2.head
      assert(p.oldStyleOffsets === (if (v == 0) Seq(10L, 20L) else Nil), s"v$v")
      assert(p.timestamp === (if (v >= 1) 1700000000000L else -1L), s"v$v")
      assert(p.offset === (if (v >= 1) 42L else -1L), s"v$v")
      assert(p.leaderEpoch === (if (v >= 4) 3 else -1), s"v$v")
      assert(back.throttleMs === (if (v >= 2) 5 else 0), s"v$v")
    }
  }

  test("offset_commit response 0-8 and join_group response 0-6") {
    val cResp = OffsetCommitRespV.Response(5,
      Seq(("events", Seq((0, 0.toShort), (1, 16.toShort)))))
    for (v <- OffsetCommitRespV.ValidVersions) {
      val bytes = OffsetCommitRespV.encode(v, cResp)
      assert(bytes.length === OffsetCommitRespV.size(v, cResp), s"v$v size")
      val back = OffsetCommitRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 3) 5 else 0), s"v$v")
      assert(back.topics.head._2 === Seq((0, 0.toShort), (1, 16.toShort)))
    }
    // flexible v8: throttle(4)+arr(1)+events(1+6)+arr(1)
    //  +2*(4+2+tag1)+topicTag(1)+topTag(1) = 29
    assert(OffsetCommitRespV.encode(8, cResp).length === 29)
    val jResp = WireHeaders.JoinGroup.Response(5, 0, 3, "range", "m-1", "m-2",
      Seq(WireHeaders.JoinGroup.Member("m-1", Some("inst-1"),
        Array.tabulate(8)(_.toByte))))
    for (v <- JoinGroupRespV.ValidVersions) {
      val bytes = JoinGroupRespV.encode(v, jResp)
      val back = JoinGroupRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 2) 5 else 0), s"v$v")
      assert(back.generationId === 3 && back.protocolName === "range")
      assert(back.members.head.groupInstanceId ===
        (if (v >= 5) Some("inst-1") else None), s"v$v")
      assert(back.members.head.metadata.length === 8)
      if (v < 6) assert(bytes.length === JoinGroupRespV.size(v, jResp), s"v$v size")
    }
  }

  test("metadata request/response 0-9: nullable topics, flexible cutover") {
    val named = MetadataV.Request(Some(Seq("events", "audit")),
      allowAutoTopicCreation = false,
      includeClusterAuthorizedOperations = true,
      includeTopicAuthorizedOperations = true)
    val allTopics = MetadataV.Request(None, allowAutoTopicCreation = true,
      includeClusterAuthorizedOperations = false,
      includeTopicAuthorizedOperations = false)
    for (v <- MetadataV.ValidVersions) {
      val bytes = MetadataV.encode(v, named)
      assert(bytes.length === MetadataV.size(v, named), s"v$v size")
      val back = MetadataV.decode(v, bytes)
      assert(back.topics === Some(Seq("events", "audit")))
      assert(back.allowAutoTopicCreation === (v < 4), s"v$v") // default true
      assert(back.includeClusterAuthorizedOperations === (v >= 8), s"v$v")
      // null topics = "all topics" from v1 (v0 degrades to empty list)
      val all = MetadataV.decode(v, MetadataV.encode(v, allTopics))
      assert(all.topics === (if (v >= 1) None else Some(Nil)), s"v$v")
    }
    // v0: n(4)+2 names(2+6, 2+5); v4 +1; v8 +2; flexible v9 compact
    assert(MetadataV.encode(0, named).length === 19)
    assert(MetadataV.encode(4, named).length === 20)
    assert(MetadataV.encode(8, named).length === 22)
    // v9: arr(1)+events(1+6+tag1)+audit(1+5+tag1)+flags(3)+tags(1) = 20
    assert(MetadataV.encode(9, named).length === 20)

    val resp = MetadataRespV.Response(5,
      Seq((0, "host-a", 9092, Some("r0")), (1, "host-b", 9092, None)),
      Some("cluster-1"), 0,
      Seq(MetadataRespV.Topic(0, "events", isInternal = false,
        Seq(MetadataRespV.Part(0, 0, 0, 3, Seq(0, 1), Seq(0, 1), Seq(2))),
        authorizedOps = 0x3fc)),
      clusterAuthorizedOps = 0x7fc)
    for (v <- MetadataRespV.ValidVersions) {
      val bytes = MetadataRespV.encode(v, resp)
      if (v < 9)
        assert(bytes.length === MetadataRespV.size(v, resp), s"v$v size")
      val back = MetadataRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 3) 5 else 0), s"v$v")
      assert(back.brokers.head._4 === (if (v >= 1) Some("r0") else None), s"v$v")
      assert(back.clusterId === (if (v >= 2) Some("cluster-1") else None), s"v$v")
      assert(back.controllerId === (if (v >= 1) 0 else -1), s"v$v")
      val p = back.topics.head.partitions.head
      assert(p.leaderEpoch === (if (v >= 7) 3 else -1), s"v$v")
      assert(p.offline === (if (v >= 5) Seq(2) else Nil), s"v$v")
      assert(p.replicas === Seq(0, 1) && p.isr === Seq(0, 1))
      assert(back.topics.head.authorizedOps ===
        (if (v >= 8) 0x3fc else Int.MinValue), s"v$v")
      assert(back.clusterAuthorizedOps ===
        (if (v >= 8) 0x7fc else Int.MinValue), s"v$v")
    }
  }

  // ------------------------------------------------------ tier-2 keys

  private val ofReq = OffsetFetchV.Request(
    Seq(OffsetFetchV.Group("cg", Some(Seq(("events", Seq(0, 1)))))),
    requireStable = true)

  test("offset_fetch 0-8: nullable topics v2+, require_stable v7+, batched v8") {
    for (v <- OffsetFetchV.ValidVersions) {
      val bytes = OffsetFetchV.encode(v, ofReq)
      assert(bytes.length === OffsetFetchV.size(v, ofReq), s"v$v size")
      val back = OffsetFetchV.decode(v, bytes)
      assert(back.groups.head.groupId === "cg")
      assert(back.groups.head.topics === ofReq.groups.head.topics, s"v$v")
      assert(back.requireStable === (v >= 7), s"v$v")
    }
    // hand-computed: v0 gid(2+2) + ntopics(4) + name(2+6) + nparts(4)
    //   + 2*4 = 28; v6 flex 3+1+(7+1+8+1)+1 = 22; v7 +stable = 23;
    //   v8 batched: 1+(3+1+17+1)+1+1 = 25
    assert(OffsetFetchV.encode(0, ofReq).length === 28)
    assert(OffsetFetchV.encode(6, ofReq).length === 22)
    assert(OffsetFetchV.encode(7, ofReq).length === 23)
    assert(OffsetFetchV.encode(8, ofReq).length === 25)
    // all-topics (null) form exists from v2: gid 4 + (-1) 4
    val allT = OffsetFetchV.Request(Seq(OffsetFetchV.Group("cg", None)), false)
    assert(OffsetFetchV.encode(2, allT).length === 8)
    assert(OffsetFetchV.decode(2, OffsetFetchV.encode(2, allT))
      .groups.head.topics === None)
    intercept[IllegalArgumentException] { OffsetFetchV.encode(1, allT) }
  }

  private val ofResp = OffsetFetchRespV.Response(5, Seq(OffsetFetchRespV.Group(
    "cg", Seq(("events", Seq(
      OffsetFetchRespV.Part(0, 42L, 3, Some("m"), 0)))), 0)))

  test("offset_fetch response 0-8: epoch v5+, top error v2+, groups v8") {
    for (v <- OffsetFetchRespV.ValidVersions) {
      val bytes = OffsetFetchRespV.encode(v, ofResp)
      assert(bytes.length === OffsetFetchRespV.size(v, ofResp), s"v$v size")
      val back = OffsetFetchRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 3) 5 else 0), s"v$v")
      val p = back.groups.head.topics.head._2.head
      assert(p.committedOffset === 42L)
      assert(p.committedLeaderEpoch === (if (v >= 5) 3 else -1), s"v$v")
      assert(p.metadata === Some("m"))
      assert(back.groups.head.groupId === (if (v >= 8) "cg" else ""), s"v$v")
    }
    // v0: 4+(2+6)+4+(4+8+3+2)=33; v2 +2; v3 +4; v5 +4; v6 flex 38; v8 43
    assert(OffsetFetchRespV.encode(0, ofResp).length === 33)
    assert(OffsetFetchRespV.encode(2, ofResp).length === 35)
    assert(OffsetFetchRespV.encode(3, ofResp).length === 39)
    assert(OffsetFetchRespV.encode(5, ofResp).length === 43)
    assert(OffsetFetchRespV.encode(6, ofResp).length === 38)
    assert(OffsetFetchRespV.encode(8, ofResp).length === 43)
  }

  test("find_coordinator 0-4: key_type v1+, flexible v3, batched keys v4") {
    val req = FindCoordinatorV.Request(1, Seq("cg"))
    for (v <- FindCoordinatorV.ValidVersions) {
      val bytes = FindCoordinatorV.encode(v, req)
      assert(bytes.length === FindCoordinatorV.size(v, req), s"v$v size")
      val back = FindCoordinatorV.decode(v, bytes)
      assert(back.keys === Seq("cg"))
      assert(back.keyType === (if (v >= 1) 1 else 0).toByte, s"v$v")
    }
    assert(FindCoordinatorV.encode(0, req).length === 4) // str(2+2)
    assert(FindCoordinatorV.encode(1, req).length === 5) // +type
    assert(FindCoordinatorV.encode(3, req).length === 5) // 3+1+tags
    assert(FindCoordinatorV.encode(4, req).length === 6) // 1+1+3+tags
    // v4 carries several keys at once (KIP-699)
    val multi = FindCoordinatorV.Request(0, Seq("a", "bb"))
    assert(FindCoordinatorV.decode(4,
      FindCoordinatorV.encode(4, multi)).keys === Seq("a", "bb"))
    val resp = FindCoordinatorRespV.Response(5, Seq(
      FindCoordinatorRespV.Coord("cg", 2, "host-a", 9092, 0, Some("ok"))))
    for (v <- FindCoordinatorRespV.ValidVersions) {
      val bytes = FindCoordinatorRespV.encode(v, resp)
      assert(bytes.length === FindCoordinatorRespV.size(v, resp), s"v$v size")
      val back = FindCoordinatorRespV.decode(v, bytes)
      val c = back.coordinators.head
      assert(c.nodeId === 2 && c.host === "host-a" && c.port === 9092)
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(c.errorMessage === (if (v >= 1) Some("ok") else None), s"v$v")
      assert(c.key === (if (v >= 4) "cg" else ""), s"v$v")
    }
    assert(FindCoordinatorRespV.encode(0, resp).length === 18)
    assert(FindCoordinatorRespV.encode(1, resp).length === 26)
    assert(FindCoordinatorRespV.encode(3, resp).length === 25)
    assert(FindCoordinatorRespV.encode(4, resp).length === 30)
  }

  private val sgReq = SyncGroupV.Request("cg", 7, "m-1", Some("inst-1"),
    Some("consumer"), Some("range"), Seq(("m-1", Array.tabulate(8)(_.toByte))))

  test("sync_group 0-5: instance v3+, flexible v4, protocol pair v5") {
    for (v <- SyncGroupV.ValidVersions) {
      val bytes = SyncGroupV.encode(v, sgReq)
      assert(bytes.length === SyncGroupV.size(v, sgReq), s"v$v size")
      val back = SyncGroupV.decode(v, bytes)
      assert(back.groupId === "cg" && back.generationId === 7)
      assert(back.groupInstanceId === (if (v >= 3) Some("inst-1") else None), s"v$v")
      assert(back.protocolType === (if (v >= 5) Some("consumer") else None), s"v$v")
      assert(back.protocolName === (if (v >= 5) Some("range") else None), s"v$v")
      assert(back.assignments.head._2.toSeq === sgReq.assignments.head._2.toSeq)
    }
    assert(SyncGroupV.encode(0, sgReq).length === 34)
    assert(SyncGroupV.encode(3, sgReq).length === 42)
    assert(SyncGroupV.encode(4, sgReq).length === 34)
    assert(SyncGroupV.encode(5, sgReq).length === 49)
    val resp = SyncGroupRespV.Response(5, 0, Some("consumer"), Some("range"),
      Array.tabulate(8)(_.toByte))
    for (v <- SyncGroupRespV.ValidVersions) {
      val bytes = SyncGroupRespV.encode(v, resp)
      assert(bytes.length === SyncGroupRespV.size(v, resp), s"v$v size")
      val back = SyncGroupRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(back.protocolName === (if (v >= 5) Some("range") else None), s"v$v")
      assert(back.assignment.toSeq === resp.assignment.toSeq)
    }
    assert(SyncGroupRespV.encode(0, resp).length === 14)
    assert(SyncGroupRespV.encode(1, resp).length === 18)
    assert(SyncGroupRespV.encode(4, resp).length === 16)
    assert(SyncGroupRespV.encode(5, resp).length === 31)
  }

  test("heartbeat 0-4 and leave_group 0-5: instance gates, batched members") {
    val hb = HeartbeatV.Request("cg", 7, "m-1", Some("inst-1"))
    for (v <- HeartbeatV.ValidVersions) {
      val bytes = HeartbeatV.encode(v, hb)
      assert(bytes.length === HeartbeatV.size(v, hb), s"v$v size")
      val back = HeartbeatV.decode(v, bytes)
      assert(back.generationId === 7 && back.memberId === "m-1")
      assert(back.groupInstanceId === (if (v >= 3) Some("inst-1") else None), s"v$v")
    }
    assert(HeartbeatV.encode(0, hb).length === 13)
    assert(HeartbeatV.encode(3, hb).length === 21)
    assert(HeartbeatV.encode(4, hb).length === 19)
    val lg = LeaveGroupV.Request("cg", Seq(
      LeaveGroupV.Member("m-1", Some("inst-1"), Some("bye"))))
    for (v <- LeaveGroupV.ValidVersions) {
      val bytes = LeaveGroupV.encode(v, lg)
      assert(bytes.length === LeaveGroupV.size(v, lg), s"v$v size")
      val back = LeaveGroupV.decode(v, bytes)
      assert(back.groupId === "cg")
      val mem = back.members.head
      assert(mem.memberId === "m-1")
      assert(mem.groupInstanceId === (if (v >= 3) Some("inst-1") else None), s"v$v")
      assert(mem.reason === (if (v >= 5) Some("bye") else None), s"v$v")
    }
    assert(LeaveGroupV.encode(0, lg).length === 9)
    assert(LeaveGroupV.encode(3, lg).length === 21)
    assert(LeaveGroupV.encode(4, lg).length === 17)
    assert(LeaveGroupV.encode(5, lg).length === 21)
    val lgr = LeaveGroupRespV.Response(5, 0, Seq(
      LeaveGroupRespV.MemberResp("m-1", Some("inst-1"), 0)))
    for (v <- LeaveGroupRespV.ValidVersions) {
      val bytes = LeaveGroupRespV.encode(v, lgr)
      assert(bytes.length === LeaveGroupRespV.size(v, lgr), s"v$v size")
      val back = LeaveGroupRespV.decode(v, bytes)
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(back.members === (if (v >= 3) lgr.members else Nil), s"v$v")
    }
    assert(LeaveGroupRespV.encode(0, lgr).length === 2)
    assert(LeaveGroupRespV.encode(1, lgr).length === 6)
    assert(LeaveGroupRespV.encode(3, lgr).length === 25)
    assert(LeaveGroupRespV.encode(4, lgr).length === 22)
  }

  // ------------------------------------------------------ tier-3 keys

  test("init_producer_id 0-5: KIP-360 identity at v3, flexible cutover at v2") {
    val req = WireHeaders.InitProducerId.Request(Some("txn-1"), 60000, 9L, 1)
    for (v <- InitProducerIdV.ValidVersions) {
      val bytes = InitProducerIdV.encode(v, req)
      assert(bytes.length === InitProducerIdV.size(v, req), s"v$v size")
      val back = InitProducerIdV.decode(v, bytes)
      assert(back.transactionalId === Some("txn-1"))
      assert(back.producerId === (if (v >= 3) 9L else -1L), s"v$v")
      assert(back.producerEpoch === (if (v >= 3) 1 else -1).toShort, s"v$v")
    }
    assert(InitProducerIdV.encode(0, req).length === 11) // nstr(7)+4
    assert(InitProducerIdV.encode(2, req).length === 11) // 6+4+tags
    assert(InitProducerIdV.encode(3, req).length === 21) // +pid/epoch
    val resp = WireHeaders.InitProducerId.Response(5, 0, 9L, 1)
    for (v <- InitProducerIdV.ValidVersions) {
      val bytes = InitProducerIdV.encodeResp(v, resp)
      assert(bytes.length === InitProducerIdV.sizeResp(v), s"v$v size")
      assert(InitProducerIdV.decodeResp(v, bytes) === resp)
    }
    assert(InitProducerIdV.encodeResp(0, resp).length === 16)
    assert(InitProducerIdV.encodeResp(2, resp).length === 17)
  }

  test("add_partitions_to_txn 0-5: KIP-890 batched transactions at v4") {
    val txn = AddPartitionsToTxnV.Txn("txn-1", 9L, 1, verifyOnly = true,
      Seq(("events", Seq(0, 1))))
    val req = AddPartitionsToTxnV.Request(Seq(txn))
    for (v <- AddPartitionsToTxnV.ValidVersions) {
      val bytes = AddPartitionsToTxnV.encode(v, req)
      assert(bytes.length === AddPartitionsToTxnV.size(v, req), s"v$v size")
      val back = AddPartitionsToTxnV.decode(v, bytes)
      val t = back.transactions.head
      assert(t.transactionalId === "txn-1" && t.producerId === 9L)
      assert(t.topics === txn.topics)
      assert(t.verifyOnly === (v >= 4), s"v$v") // field exists only batched
    }
    assert(AddPartitionsToTxnV.encode(0, req).length === 41)
    assert(AddPartitionsToTxnV.encode(3, req).length === 35)
    assert(AddPartitionsToTxnV.encode(4, req).length === 38)
    val resp = AddPartitionsToTxnV.Response(5, 0, Seq(
      AddPartitionsToTxnV.RespTxn("txn-1",
        Seq(("events", Seq((0, 0.toShort), (1, 16.toShort)))))))
    for (v <- AddPartitionsToTxnV.ValidVersions) {
      val bytes = AddPartitionsToTxnV.encodeResp(v, resp)
      assert(bytes.length === AddPartitionsToTxnV.sizeResp(v, resp), s"v$v size")
      val back = AddPartitionsToTxnV.decodeResp(v, bytes)
      assert(back.transactions.head.results === resp.transactions.head.results)
      assert(back.transactions.head.transactionalId ===
        (if (v >= 4) "txn-1" else ""), s"v$v")
    }
    assert(AddPartitionsToTxnV.encodeResp(0, resp).length === 32)
    assert(AddPartitionsToTxnV.encodeResp(3, resp).length === 29)
    assert(AddPartitionsToTxnV.encodeResp(4, resp).length === 39)
  }

  test("add_offsets/end_txn 0-4 and txn_offset_commit 0-4 gates") {
    val ao = WireHeaders.AddOffsetsToTxn.Request("txn-1", 9L, 1, "cg")
    for (v <- AddOffsetsToTxnV.ValidVersions) {
      val bytes = AddOffsetsToTxnV.encode(v, ao)
      assert(bytes.length === AddOffsetsToTxnV.size(v, ao), s"v$v size")
      assert(AddOffsetsToTxnV.decode(v, bytes) === ao)
    }
    assert(AddOffsetsToTxnV.encode(0, ao).length === 21)
    assert(AddOffsetsToTxnV.encode(3, ao).length === 20)
    val et = WireHeaders.EndTxn.Request("txn-1", 9L, 1, committed = true)
    for (v <- EndTxnV.ValidVersions) {
      val bytes = EndTxnV.encode(v, et)
      assert(bytes.length === EndTxnV.size(v, et), s"v$v size")
      assert(EndTxnV.decode(v, bytes) === et)
    }
    assert(EndTxnV.encode(0, et).length === 18)
    assert(EndTxnV.encode(3, et).length === 18)
    assert(EndTxnV.encodeResp(0, WireHeaders.EndTxn.Response(5, 0)).length === 6)
    assert(EndTxnV.encodeResp(3, WireHeaders.EndTxn.Response(5, 0)).length === 7)
    val toc = TxnOffsetCommitV.Request("txn-1", "cg", 9L, 1, 7, "m-1",
      Some("inst-1"), Seq(("events",
        Seq(TxnOffsetCommitV.Part(0, 42L, 5, Some("m"))))))
    for (v <- TxnOffsetCommitV.ValidVersions) {
      val bytes = TxnOffsetCommitV.encode(v, toc)
      assert(bytes.length === TxnOffsetCommitV.size(v, toc), s"v$v size")
      val back = TxnOffsetCommitV.decode(v, bytes)
      assert(back.generationId === (if (v >= 3) 7 else -1), s"v$v")
      assert(back.memberId === (if (v >= 3) "m-1" else ""), s"v$v")
      assert(back.groupInstanceId ===
        (if (v >= 3) Some("inst-1") else None), s"v$v")
      val p = back.topics.head._2.head
      assert(p.offset === 42L)
      assert(p.leaderEpoch === (if (v >= 2) 5 else -1), s"v$v")
      assert(p.metadata === Some("m"))
    }
    assert(TxnOffsetCommitV.encode(0, toc).length === 52)
    assert(TxnOffsetCommitV.encode(2, toc).length === 56)
    assert(TxnOffsetCommitV.encode(3, toc).length === 64)
    val tocResp = TxnOffsetCommitV.Response(5,
      Seq(("events", Seq((0, 0.toShort)))))
    for (v <- TxnOffsetCommitV.ValidVersions) {
      val bytes = TxnOffsetCommitV.encodeResp(v, tocResp)
      assert(bytes.length === TxnOffsetCommitV.sizeResp(v, tocResp), s"v$v size")
      assert(TxnOffsetCommitV.decodeResp(v, bytes) === tocResp)
    }
    assert(TxnOffsetCommitV.encodeResp(0, tocResp).length === 26)
    assert(TxnOffsetCommitV.encodeResp(3, tocResp).length === 22)
  }

  test("delete_records 0-2 and the SASL pair ranges") {
    val dr = DeleteRecordsV.Request(
      Seq(("events", Seq((0, 42L), (1, 7L)))), 30000)
    for (v <- DeleteRecordsV.ValidVersions) {
      val bytes = DeleteRecordsV.encode(v, dr)
      assert(bytes.length === DeleteRecordsV.size(v, dr), s"v$v size")
      assert(DeleteRecordsV.decode(v, bytes) === dr)
    }
    assert(DeleteRecordsV.encode(0, dr).length === 44)
    assert(DeleteRecordsV.encode(2, dr).length === 41)
    val drResp = DeleteRecordsV.Response(5,
      Seq(("events", Seq((0, 10L, 0.toShort)))))
    for (v <- DeleteRecordsV.ValidVersions) {
      val bytes = DeleteRecordsV.encodeResp(v, drResp)
      assert(bytes.length === DeleteRecordsV.sizeResp(v, drResp), s"v$v size")
      assert(DeleteRecordsV.decodeResp(v, bytes) === drResp)
    }
    assert(DeleteRecordsV.encodeResp(0, drResp).length === 34)
    assert(DeleteRecordsV.encodeResp(2, drResp).length === 30)
    // SASL: handshake is NEVER flexible; authenticate cuts over at 2
    for (v <- SaslHandshakeV.ValidVersions) {
      val bytes = SaslHandshakeV.encode(v, "SCRAM-SHA-256")
      assert(bytes.length === 15, s"v$v")
      assert(SaslHandshakeV.decode(v, bytes) === "SCRAM-SHA-256")
      val rb = SaslHandshakeV.encodeResp(v, 0, Seq("PLAIN", "SCRAM-SHA-256"))
      assert(rb.length === SaslHandshakeV.sizeResp(v, Seq("PLAIN", "SCRAM-SHA-256")))
      assert(rb.length === 28)
      assert(SaslHandshakeV.decodeResp(v, rb) ===
        ((0.toShort, Seq("PLAIN", "SCRAM-SHA-256"))))
    }
    val auth = Array.tabulate(16)(_.toByte)
    for (v <- SaslAuthenticateV.ValidVersions) {
      val bytes = SaslAuthenticateV.encode(v, auth)
      assert(bytes.length === SaslAuthenticateV.size(v, auth), s"v$v size")
      assert(SaslAuthenticateV.decode(v, bytes).toSeq === auth.toSeq)
    }
    assert(SaslAuthenticateV.encode(0, auth).length === 20)
    assert(SaslAuthenticateV.encode(2, auth).length === 18)
    val ar = SaslAuthenticateV.Response(0, Some("ok"),
      Array.tabulate(8)(_.toByte), 3600000L)
    for (v <- SaslAuthenticateV.ValidVersions) {
      val bytes = SaslAuthenticateV.encodeResp(v, ar)
      assert(bytes.length === SaslAuthenticateV.sizeResp(v, ar), s"v$v size")
      val back = SaslAuthenticateV.decodeResp(v, bytes)
      assert(back.errorMessage === Some("ok"))
      assert(back.authBytes.toSeq === ar.authBytes.toSeq)
      assert(back.sessionLifetimeMs === (if (v >= 1) 3600000L else 0L), s"v$v")
    }
    assert(SaslAuthenticateV.encodeResp(0, ar).length === 18)
    assert(SaslAuthenticateV.encodeResp(1, ar).length === 26)
    assert(SaslAuthenticateV.encodeResp(2, ar).length === 23)
  }

  // ------------------------------------------------------ tier-4 keys

  test("create_topics 0-7: validate_only v1, config report v5, topic_id v7") {
    val req = WireHeaders.CreateTopics.Request(Seq(
      WireHeaders.CreateTopics.ReqTopic("events", 8, 3,
        Seq(("retention.ms", Some("604800000"))))), 30000, validateOnly = true)
    for (v <- CreateTopicsV.ValidVersions) {
      val bytes = CreateTopicsV.encode(v, req)
      assert(bytes.length === CreateTopicsV.size(v, req), s"v$v size")
      val back = CreateTopicsV.decode(v, bytes)
      assert(back.topics.head.name === "events")
      assert(back.topics.head.configs === req.topics.head.configs)
      assert(back.validateOnly === (v >= 1), s"v$v")
    }
    assert(CreateTopicsV.encode(0, req).length === 55)
    assert(CreateTopicsV.encode(1, req).length === 56)
    assert(CreateTopicsV.encode(5, req).length === 47)
    assert(CreateTopicsV.encode(7, req).length === 47)
    val uuid = Array.tabulate(16)(_.toByte)
    val resp = WireHeaders.CreateTopics.Response(5, Seq(
      WireHeaders.CreateTopics.RespTopic("events", uuid, 0, Some("ok"), 7,
        8, 3, Some(Seq(("retention.ms", Some("604800000")))))))
    for (v <- CreateTopicsV.ValidVersions) {
      val bytes = CreateTopicsV.encodeResp(v, resp)
      assert(bytes.length === CreateTopicsV.sizeResp(v, resp), s"v$v size")
      val back = CreateTopicsV.decodeResp(v, bytes)
      val t = back.topics.head
      assert(back.throttleMs === (if (v >= 2) 5 else 0), s"v$v")
      assert(t.errorMessage === (if (v >= 1) Some("ok") else None), s"v$v")
      assert(t.numPartitions === (if (v >= 5) 8 else -1), s"v$v")
      assert(t.topicConfigErrorCode === (if (v >= 5) 7 else 0).toShort, s"v$v")
      assert(t.configs.isDefined === (v >= 5), s"v$v")
      assert(t.topicId.toSeq === (if (v >= 7) uuid.toSeq
        else WireHeaders.DeleteTopics.ZeroUuid.toSeq), s"v$v")
    }
    assert(CreateTopicsV.encodeResp(0, resp).length === 14)
    assert(CreateTopicsV.encodeResp(1, resp).length === 18)
    assert(CreateTopicsV.encodeResp(2, resp).length === 22)
    assert(CreateTopicsV.encodeResp(5, resp).length === 57) // incl top tags
    assert(CreateTopicsV.encodeResp(7, resp).length === 73) // + uuid 16
  }

  test("delete_topics 0-6: flexible v4, KIP-516 name-or-id states at v6") {
    val uuid = Array.tabulate(16)(_.toByte)
    val req = WireHeaders.DeleteTopics.Request(Seq(
      WireHeaders.DeleteTopics.ReqTopic(Some("events"), uuid)), 30000)
    for (v <- DeleteTopicsV.ValidVersions) {
      val bytes = DeleteTopicsV.encode(v, req)
      assert(bytes.length === DeleteTopicsV.size(v, req), s"v$v size")
      val back = DeleteTopicsV.decode(v, bytes)
      assert(back.topics.head.name === Some("events"))
      assert(back.topics.head.topicId.toSeq === (if (v >= 6) uuid.toSeq
        else WireHeaders.DeleteTopics.ZeroUuid.toSeq), s"v$v")
    }
    assert(DeleteTopicsV.encode(0, req).length === 16)
    assert(DeleteTopicsV.encode(4, req).length === 13)
    assert(DeleteTopicsV.encode(6, req).length === 30)
    val resp = WireHeaders.DeleteTopics.Response(5, Seq(
      WireHeaders.DeleteTopics.Result(Some("events"), uuid, 0, Some("gone"))))
    for (v <- DeleteTopicsV.ValidVersions) {
      val bytes = DeleteTopicsV.encodeResp(v, resp)
      assert(bytes.length === DeleteTopicsV.sizeResp(v, resp), s"v$v size")
      val back = DeleteTopicsV.decodeResp(v, bytes)
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(back.responses.head.errorMessage ===
        (if (v >= 5) Some("gone") else None), s"v$v")
    }
    assert(DeleteTopicsV.encodeResp(0, resp).length === 14)
    assert(DeleteTopicsV.encodeResp(1, resp).length === 18)
    assert(DeleteTopicsV.encodeResp(4, resp).length === 16) // incl result tags
    assert(DeleteTopicsV.encodeResp(5, resp).length === 21)
    assert(DeleteTopicsV.encodeResp(6, resp).length === 37)
  }

  test("create_partitions 0-3 and delete_groups 0-2 ranges") {
    val req = WireHeaders.CreatePartitions.Request(Seq(
      WireHeaders.CreatePartitions.ReqTopic("events", 16, Some(Seq(Seq(0, 1))))),
      30000, validateOnly = false)
    for (v <- CreatePartitionsV.ValidVersions) {
      val bytes = CreatePartitionsV.encode(v, req)
      assert(bytes.length === CreatePartitionsV.size(v, req), s"v$v size")
      val back = CreatePartitionsV.decode(v, bytes)
      assert(back.topics.head.count === 16)
      assert(back.topics.head.assignments === Some(Seq(Seq(0, 1))))
    }
    assert(CreatePartitionsV.encode(0, req).length === 37)
    assert(CreatePartitionsV.encode(2, req).length === 30)
    val resp = WireHeaders.CreatePartitions.Response(5, Seq(
      WireHeaders.CreatePartitions.Result("events", 0, None)))
    for (v <- CreatePartitionsV.ValidVersions) {
      val bytes = CreatePartitionsV.encodeResp(v, resp)
      assert(bytes.length === CreatePartitionsV.sizeResp(v, resp), s"v$v size")
      assert(CreatePartitionsV.decodeResp(v, bytes) === resp)
    }
    assert(CreatePartitionsV.encodeResp(0, resp).length === 20)
    assert(CreatePartitionsV.encodeResp(2, resp).length === 17)
    val groups = Seq("cg1", "cg2")
    for (v <- DeleteGroupsV.ValidVersions) {
      val bytes = DeleteGroupsV.encode(v, groups)
      assert(bytes.length === DeleteGroupsV.size(v, groups), s"v$v size")
      assert(DeleteGroupsV.decode(v, bytes) === groups)
      val rb = DeleteGroupsV.encodeResp(v, 5,
        Seq(("cg1", 0.toShort), ("cg2", 16.toShort)))
      assert(rb.length === DeleteGroupsV.sizeResp(v,
        Seq(("cg1", 0.toShort), ("cg2", 16.toShort))), s"v$v size")
      val (throttle, rs) = DeleteGroupsV.decodeResp(v, rb)
      assert(throttle === 5 && rs.map(_._2) === Seq(0, 16))
    }
    assert(DeleteGroupsV.encode(0, groups).length === 14)
    assert(DeleteGroupsV.encode(2, groups).length === 10)
  }

  test("describe_groups 0-5 and list_groups 0-4 gates") {
    val req = WireHeaders.DescribeGroups.Request(Seq("cg"),
      includeAuthorizedOperations = true)
    for (v <- DescribeGroupsV.ValidVersions) {
      val bytes = DescribeGroupsV.encode(v, req)
      assert(bytes.length === DescribeGroupsV.size(v, req), s"v$v size")
      val back = DescribeGroupsV.decode(v, bytes)
      assert(back.groups === Seq("cg"))
      assert(back.includeAuthorizedOperations === (v >= 3), s"v$v")
    }
    assert(DescribeGroupsV.encode(0, req).length === 8)
    assert(DescribeGroupsV.encode(3, req).length === 9)
    assert(DescribeGroupsV.encode(5, req).length === 6)
    val resp = WireHeaders.DescribeGroups.Response(5, Seq(
      WireHeaders.DescribeGroups.Group(0, "cg", "Stable", "consumer", "range",
        Seq(WireHeaders.DescribeGroups.Member("m-1", Some("inst-1"), "cli",
          "host-a", Array.tabulate(8)(_.toByte), Array.tabulate(4)(_.toByte))),
        1020)))
    for (v <- DescribeGroupsV.ValidVersions) {
      val bytes = DescribeGroupsV.encodeResp(v, resp)
      assert(bytes.length === DescribeGroupsV.sizeResp(v, resp), s"v$v size")
      val back = DescribeGroupsV.decodeResp(v, bytes)
      val g = back.groups.head
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(g.members.head.groupInstanceId ===
        (if (v >= 4) Some("inst-1") else None), s"v$v")
      assert(g.authorizedOperations ===
        (if (v >= 3) 1020 else Int.MinValue), s"v$v")
      assert(g.members.head.metadata.length === 8)
    }
    assert(DescribeGroupsV.encodeResp(0, resp).length === 77)
    assert(DescribeGroupsV.encodeResp(1, resp).length === 81)
    assert(DescribeGroupsV.encodeResp(3, resp).length === 85)
    assert(DescribeGroupsV.encodeResp(4, resp).length === 93)
    assert(DescribeGroupsV.encodeResp(5, resp).length === 76)
    val lreq = WireHeaders.ListGroups.Request(Seq("Stable"))
    for (v <- ListGroupsV.ValidVersions) {
      val bytes = ListGroupsV.encode(v, lreq)
      assert(bytes.length === ListGroupsV.size(v, lreq), s"v$v size")
      assert(ListGroupsV.decode(v, bytes).statesFilter ===
        (if (v >= 4) Seq("Stable") else Nil), s"v$v")
    }
    assert(ListGroupsV.encode(0, lreq).length === 0)
    assert(ListGroupsV.encode(3, lreq).length === 1)
    assert(ListGroupsV.encode(4, lreq).length === 9)
    val lresp = WireHeaders.ListGroups.Response(5, 0, Seq(
      WireHeaders.ListGroups.Group("cg", "consumer", "Stable")))
    for (v <- ListGroupsV.ValidVersions) {
      val bytes = ListGroupsV.encodeResp(v, lresp)
      assert(bytes.length === ListGroupsV.sizeResp(v, lresp), s"v$v size")
      val back = ListGroupsV.decodeResp(v, bytes)
      assert(back.throttleMs === (if (v >= 1) 5 else 0), s"v$v")
      assert(back.groups.head.groupState ===
        (if (v >= 4) "Stable" else ""), s"v$v")
    }
    assert(ListGroupsV.encodeResp(0, lresp).length === 20)
    assert(ListGroupsV.encodeResp(1, lresp).length === 24)
    assert(ListGroupsV.encodeResp(3, lresp).length === 21)
    assert(ListGroupsV.encodeResp(4, lresp).length === 28)
  }

  // ------------------------------------------------------ tier-5 keys

  test("offset_for_leader_epoch 0-4: current epoch v2, replica v3, flexible v4") {
    val req = WireHeaders.OffsetForLeaderEpoch.Request(-2, Seq(("events",
      Seq(WireHeaders.OffsetForLeaderEpoch.ReqPartition(0, 5, 3)))))
    for (v <- OffsetForLeaderEpochV.ValidVersions) {
      val bytes = OffsetForLeaderEpochV.encode(v, req)
      assert(bytes.length === OffsetForLeaderEpochV.size(v, req), s"v$v size")
      val back = OffsetForLeaderEpochV.decode(v, bytes)
      val p = back.topics.head._2.head
      assert(p.leaderEpoch === 3)
      assert(p.currentLeaderEpoch === (if (v >= 2) 5 else -1), s"v$v")
      assert(back.replicaId === -2) // default matches the fixture
    }
    assert(OffsetForLeaderEpochV.encode(0, req).length === 24)
    assert(OffsetForLeaderEpochV.encode(2, req).length === 28)
    assert(OffsetForLeaderEpochV.encode(3, req).length === 32)
    assert(OffsetForLeaderEpochV.encode(4, req).length === 28)
    val resp = WireHeaders.OffsetForLeaderEpoch.Response(5, Seq(("events",
      Seq(WireHeaders.OffsetForLeaderEpoch.RespPartition(0, 0, 5, 42L)))))
    for (v <- OffsetForLeaderEpochV.ValidVersions) {
      val bytes = OffsetForLeaderEpochV.encodeResp(v, resp)
      assert(bytes.length === OffsetForLeaderEpochV.sizeResp(v, resp), s"v$v size")
      val back = OffsetForLeaderEpochV.decodeResp(v, bytes)
      assert(back.throttleMs === (if (v >= 2) 5 else 0), s"v$v")
      assert(back.topics.head._2.head.leaderEpoch ===
        (if (v >= 1) 5 else -1), s"v$v")
      assert(back.topics.head._2.head.endOffset === 42L)
    }
    assert(OffsetForLeaderEpochV.encodeResp(0, resp).length === 30)
    assert(OffsetForLeaderEpochV.encodeResp(1, resp).length === 34)
    assert(OffsetForLeaderEpochV.encodeResp(2, resp).length === 38)
    assert(OffsetForLeaderEpochV.encodeResp(4, resp).length === 34)
  }

  test("describe/alter/incremental configs version ladders") {
    val dcReq = WireHeaders.DescribeConfigs.Request(Seq(
      WireHeaders.DescribeConfigs.ReqResource(2, "events",
        Some(Seq("retention.ms")))), includeSynonyms = true,
      includeDocumentation = true)
    for (v <- DescribeConfigsV.ValidVersions) {
      val bytes = DescribeConfigsV.encode(v, dcReq)
      assert(bytes.length === DescribeConfigsV.size(v, dcReq), s"v$v size")
      val back = DescribeConfigsV.decode(v, bytes)
      assert(back.resources.head.configurationKeys === Some(Seq("retention.ms")))
      assert(back.includeSynonyms === (v >= 1), s"v$v")
      assert(back.includeDocumentation === (v >= 3), s"v$v")
    }
    assert(DescribeConfigsV.encode(0, dcReq).length === 31)
    assert(DescribeConfigsV.encode(1, dcReq).length === 32)
    assert(DescribeConfigsV.encode(3, dcReq).length === 33)
    assert(DescribeConfigsV.encode(4, dcReq).length === 27)
    val dcResp = WireHeaders.DescribeConfigs.Response(5, Seq(
      WireHeaders.DescribeConfigs.Result(0, None, 2, "events", Seq(
        WireHeaders.DescribeConfigs.Config("retention.ms", Some("604800000"),
          readOnly = false, configSource = 5, isSensitive = false,
          configType = 5, Some("docs"))))))
    for (v <- DescribeConfigsV.ValidVersions) {
      val bytes = DescribeConfigsV.encodeResp(v, dcResp)
      assert(bytes.length === DescribeConfigsV.sizeResp(v, dcResp), s"v$v size")
      val back = DescribeConfigsV.decodeResp(v, bytes)
      val c = back.results.head.configs.head
      assert(c.value === Some("604800000"))
      assert(c.configSource === 5) // v0 round-trips through is_default
      assert(c.configType === (if (v >= 3) 5 else 0).toByte, s"v$v")
      assert(c.documentation === (if (v >= 3) Some("docs") else None), s"v$v")
    }
    assert(DescribeConfigsV.encodeResp(0, dcResp).length === 53)
    assert(DescribeConfigsV.encodeResp(1, dcResp).length === 57)
    assert(DescribeConfigsV.encodeResp(3, dcResp).length === 64)
    assert(DescribeConfigsV.encodeResp(4, dcResp).length === 53)
    val acReq = WireHeaders.AlterConfigs.Request(Seq(
      WireHeaders.AlterConfigs.ReqResource(2, "events",
        Seq(("retention.ms", Some("604800000"))))), validateOnly = true)
    for (v <- AlterConfigsV.ValidVersions) {
      val bytes = AlterConfigsV.encode(v, acReq)
      assert(bytes.length === AlterConfigsV.size(v, acReq), s"v$v size")
      assert(AlterConfigsV.decode(v, bytes) === acReq)
    }
    assert(AlterConfigsV.encode(0, acReq).length === 43)
    assert(AlterConfigsV.encode(2, acReq).length === 37)
    val acResp = WireHeaders.AlterConfigs.Response(5, Seq(
      WireHeaders.AlterConfigs.RespResource(0, None, 2, "events")))
    for (v <- AlterConfigsV.ValidVersions) {
      val bytes = AlterConfigsV.encodeResp(v, acResp)
      assert(bytes.length === AlterConfigsV.sizeResp(v, acResp), s"v$v size")
      assert(AlterConfigsV.decodeResp(v, bytes) === acResp)
    }
    assert(AlterConfigsV.encodeResp(0, acResp).length === 21)
    assert(AlterConfigsV.encodeResp(2, acResp).length === 18)
    val iaReq = WireHeaders.IncrementalAlterConfigs.Request(Seq(
      WireHeaders.IncrementalAlterConfigs.ReqResource(2, "events", Seq(
        WireHeaders.IncrementalAlterConfigs.ReqConfig("retention.ms", 0,
          Some("604800000"))))), validateOnly = false)
    for (v <- IncrementalAlterConfigsV.ValidVersions) {
      val bytes = IncrementalAlterConfigsV.encode(v, iaReq)
      assert(bytes.length === IncrementalAlterConfigsV.size(v, iaReq), s"v$v size")
      assert(IncrementalAlterConfigsV.decode(v, bytes) === iaReq)
    }
    assert(IncrementalAlterConfigsV.encode(0, iaReq).length === 44)
    assert(IncrementalAlterConfigsV.encode(1, iaReq).length === 38)
  }

  test("ACL trio 0-3: pattern types at v1, flexible at v2") {
    val dReq = WireHeaders.DescribeAcls.Request(2, Some("events"), 3,
      Some("User:alice"), None, 3, 3)
    for (v <- DescribeAclsV.ValidVersions) {
      val bytes = DescribeAclsV.encode(v, dReq)
      assert(bytes.length === DescribeAclsV.size(v, dReq), s"v$v size")
      assert(DescribeAclsV.decode(v, bytes) === dReq)
    }
    assert(DescribeAclsV.encode(0, dReq).length === 25)
    assert(DescribeAclsV.encode(1, dReq).length === 26)
    assert(DescribeAclsV.encode(2, dReq).length === 24)
    val dResp = WireHeaders.DescribeAcls.Response(5, 0, None, Seq(
      WireHeaders.DescribeAcls.Resource(2, "events", 3, Seq(
        WireHeaders.DescribeAcls.RespAcl("User:alice", "*", 3, 3)))))
    for (v <- DescribeAclsV.ValidVersions) {
      val bytes = DescribeAclsV.encodeResp(v, dResp)
      assert(bytes.length === DescribeAclsV.sizeResp(v, dResp), s"v$v size")
      val back = DescribeAclsV.decodeResp(v, bytes)
      assert(back.resources.head.acls.head.principal === "User:alice")
      assert(back.resources.head.patternType === 3)
    }
    assert(DescribeAclsV.encodeResp(0, dResp).length === 42)
    assert(DescribeAclsV.encodeResp(1, dResp).length === 43)
    assert(DescribeAclsV.encodeResp(2, dResp).length === 36)
    val cReq = WireHeaders.CreateAcls.Request(Seq(
      WireHeaders.CreateAcls.Acl(2, "events", 3, "User:alice", "*", 3, 3)))
    for (v <- CreateAclsV.ValidVersions) {
      val bytes = CreateAclsV.encode(v, cReq)
      assert(bytes.length === CreateAclsV.size(v, cReq), s"v$v size")
      assert(CreateAclsV.decode(v, bytes) === cReq)
    }
    assert(CreateAclsV.encode(0, cReq).length === 30)
    assert(CreateAclsV.encode(1, cReq).length === 31)
    assert(CreateAclsV.encode(2, cReq).length === 27)
    val cResp = WireHeaders.CreateAcls.Response(5, Seq((0.toShort, None)))
    for (v <- CreateAclsV.ValidVersions) {
      val bytes = CreateAclsV.encodeResp(v, cResp)
      assert(bytes.length === CreateAclsV.sizeResp(v, cResp), s"v$v size")
      assert(CreateAclsV.decodeResp(v, bytes) === cResp)
    }
    assert(CreateAclsV.encodeResp(0, cResp).length === 12)
    assert(CreateAclsV.encodeResp(2, cResp).length === 10)
    val delReq = WireHeaders.DeleteAcls.Request(Seq(
      WireHeaders.DeleteAcls.Filter(2, Some("events"), 3, None, None, 3, 3)))
    for (v <- DeleteAclsV.ValidVersions) {
      val bytes = DeleteAclsV.encode(v, delReq)
      assert(bytes.length === DeleteAclsV.size(v, delReq), s"v$v size")
      assert(DeleteAclsV.decode(v, bytes) === delReq)
    }
    assert(DeleteAclsV.encode(0, delReq).length === 19)
    assert(DeleteAclsV.encode(1, delReq).length === 20)
    assert(DeleteAclsV.encode(2, delReq).length === 16)
    val delResp = WireHeaders.DeleteAcls.Response(5, Seq(
      WireHeaders.DeleteAcls.FilterResult(0, None, Seq(
        WireHeaders.DeleteAcls.MatchingAcl(0, None, 2, "events", 3,
          "User:alice", "*", 3, 3)))))
    for (v <- DeleteAclsV.ValidVersions) {
      val bytes = DeleteAclsV.encodeResp(v, delResp)
      assert(bytes.length === DeleteAclsV.sizeResp(v, delResp), s"v$v size")
      val back = DeleteAclsV.decodeResp(v, bytes)
      assert(back.results.head.matchingAcls.head.principal === "User:alice")
    }
    assert(DeleteAclsV.encodeResp(0, delResp).length === 46)
    assert(DeleteAclsV.encodeResp(1, delResp).length === 47)
    assert(DeleteAclsV.encodeResp(2, delResp).length === 39)
  }

  // ------------------------------------------------------ tier-6 keys

  test("describe_log_dirs 0-4: top error at v3, dir byte gauges at v4") {
    val req = WireHeaders.DescribeLogDirs.Request(Some(Seq(("events", Seq(0, 1)))))
    for (v <- DescribeLogDirsV.ValidVersions) {
      val bytes = DescribeLogDirsV.encode(v, req)
      assert(bytes.length === DescribeLogDirsV.size(v, req), s"v$v size")
      assert(DescribeLogDirsV.decode(v, bytes) === req)
    }
    // v0: topics 4 + name(2+6) + nparts 4 + 8 = 24; v2 flex: 1+7+1+8+1+1 = 19
    assert(DescribeLogDirsV.encode(0, req).length === 24)
    assert(DescribeLogDirsV.encode(2, req).length === 19)
    // null topics (all dirs) round-trips at every version
    val allT = WireHeaders.DescribeLogDirs.Request(None)
    for (v <- DescribeLogDirsV.ValidVersions)
      assert(DescribeLogDirsV.decode(v, DescribeLogDirsV.encode(v, allT)) === allT)
    val resp = WireHeaders.DescribeLogDirs.Response(5, 0, Seq(
      WireHeaders.DescribeLogDirs.DirResult(0, "/var/lib/d0", Seq(("events",
        Seq(WireHeaders.DescribeLogDirs.Partition(0, 4096L, 10L,
          isFutureKey = false)))), 1000000L, 900000L)))
    for (v <- DescribeLogDirsV.ValidVersions) {
      val bytes = DescribeLogDirsV.encodeResp(v, resp)
      assert(bytes.length === DescribeLogDirsV.sizeResp(v, resp), s"v$v size")
      val back = DescribeLogDirsV.decodeResp(v, bytes)
      val d = back.results.head
      assert(d.logDir === "/var/lib/d0")
      assert(d.topics.head._2.head.partitionSize === 4096L)
      assert(d.totalBytes === (if (v >= 4) 1000000L else -1L), s"v$v")
      assert(d.usableBytes === (if (v >= 4) 900000L else -1L), s"v$v")
    }
    // v0: 4 + 4 + (2 + (2+11) + 4 + (2+6) + 4 + 21) = 60
    assert(DescribeLogDirsV.encodeResp(0, resp).length === 60)
    assert(DescribeLogDirsV.encodeResp(3, resp).length === 55) // flex + error_code
    // v4 flex: 4+2+1+(2+12+1+7+1+22+1+16+1)+1 = 71
    assert(DescribeLogDirsV.encodeResp(4, resp).length === 71)
  }

  test("client quotas describe/alter 0-1: flexible cutover at v1") {
    val dReq = WireHeaders.ClientQuotas.DescribeRequest(Seq(
      WireHeaders.ClientQuotas.DescribeComponent("client-id", 0, Some("cli"))),
      strict = true)
    for (v <- ClientQuotasV.ValidVersions) {
      val bytes = ClientQuotasV.encodeDescribe(v, dReq)
      assert(bytes.length === ClientQuotasV.sizeDescribe(v, dReq), s"v$v size")
      assert(ClientQuotasV.decodeDescribe(v, bytes) === dReq)
    }
    // v0: comps 4 + ((2+9) + 1 + (2+3)) + strict 1 = 22
    assert(ClientQuotasV.encodeDescribe(0, dReq).length === 22)
    assert(ClientQuotasV.encodeDescribe(1, dReq).length === 19)
    val dResp = WireHeaders.ClientQuotas.DescribeResponse(5, 0, None, Seq(
      WireHeaders.ClientQuotas.Entry(
        Seq(WireHeaders.ClientQuotas.Entity("client-id", Some("cli"))),
        Seq(("producer_byte_rate", 1024.0)))))
    for (v <- ClientQuotasV.ValidVersions) {
      val bytes = ClientQuotasV.encodeDescribeResp(v, dResp)
      assert(bytes.length === ClientQuotasV.sizeDescribeResp(v, dResp), s"v$v size")
      val back = ClientQuotasV.decodeDescribeResp(v, bytes)
      assert(back.entries.head.values === Seq(("producer_byte_rate", 1024.0)))
    }
    // v0: 4+2+2 + 4 + (entity 4+(11+5) + values 4+((2+18)+8)) = 64
    assert(ClientQuotasV.encodeDescribeResp(0, dResp).length === 64)
    val aReq = WireHeaders.ClientQuotas.AlterRequest(Seq(
      WireHeaders.ClientQuotas.AlterEntry(
        Seq(WireHeaders.ClientQuotas.Entity("client-id", Some("cli"))),
        Seq(WireHeaders.ClientQuotas.Op("producer_byte_rate", 2048.0,
          remove = false)))), validateOnly = false)
    for (v <- ClientQuotasV.ValidVersions) {
      val bytes = ClientQuotasV.encodeAlter(v, aReq)
      assert(bytes.length === ClientQuotasV.sizeAlter(v, aReq), s"v$v size")
      assert(ClientQuotasV.decodeAlter(v, bytes) === aReq)
    }
    // v0: 4 + (entity 4+16 + ops 4+(20+8+1)) + 1 = 58
    assert(ClientQuotasV.encodeAlter(0, aReq).length === 58)
    val aResp = WireHeaders.ClientQuotas.AlterResponse(5, Seq(
      WireHeaders.ClientQuotas.AlterResult(0, None,
        Seq(WireHeaders.ClientQuotas.Entity("client-id", Some("cli"))))))
    for (v <- ClientQuotasV.ValidVersions) {
      val bytes = ClientQuotasV.encodeAlterResp(v, aResp)
      assert(bytes.length === ClientQuotasV.sizeAlterResp(v, aResp), s"v$v size")
      assert(ClientQuotasV.decodeAlterResp(v, bytes) === aResp)
    }
    // v0: 4 + 4 + (2 + 2 + entity 4+16) = 32
    assert(ClientQuotasV.encodeAlterResp(0, aResp).length === 32)
  }

  test("api_versions request 0-3: empty legacy bodies, KIP-511 pair at v3") {
    val req = ApiVersionsReqV.Request("rpk", "v25.1")
    for (v <- ApiVersionsReqV.ValidVersions) {
      val bytes = ApiVersionsReqV.encode(v, req)
      assert(bytes.length === ApiVersionsReqV.size(v, req), s"v$v size")
      val back = ApiVersionsReqV.decode(v, bytes)
      assert(back.clientSoftwareName === (if (v >= 3) "rpk" else ""), s"v$v")
    }
    assert(ApiVersionsReqV.encode(0, req).length === 0)
    assert(ApiVersionsReqV.encode(2, req).length === 0)
    assert(ApiVersionsReqV.encode(3, req).length === 11) // 4+6+tags
  }

  test("corrupt frames are rejected cleanly across versions") {
    val bytes = FetchV.encode(11, fetchReq)
    // trailing garbage
    intercept[IllegalArgumentException] {
      FetchV.decode(11, bytes ++ Array[Byte](0))
    }
    // decoding at the WRONG version mis-frames and must error, not
    // fabricate a request
    intercept[Exception] { ProduceV.decode(0,
      ProduceV.encode(8, produceReq)) }
    intercept[Exception] { OffsetCommitV.decode(8,
      OffsetCommitV.encode(0, commitReq)) }
    // truncated frame
    intercept[Exception] { ListOffsetsV.decode(5,
      java.util.Arrays.copyOf(ListOffsetsV.encode(5, listReq), 20)) }
  }
}
