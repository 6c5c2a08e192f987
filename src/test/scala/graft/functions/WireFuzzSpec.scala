package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-trip fuzz over the wire serdes: random requests/responses with
 * generators biased to the varint/compact-encoding boundaries (0, 127,
 * 128, 16383, 16384, negatives, empty and multi-byte UTF-8 strings,
 * null vs empty arrays) must decode back exactly. The size-law oracle
 * (`p6_wire_versions`) pins layouts of fixed examples; this fleet
 * catches value-dependent encoding bugs those examples can't reach —
 * compact-length thresholds, sign handling, nullable-field flags.
 */
class WireFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(420)

  // varint-boundary-biased generators
  private def anyInt(): Int = rnd.nextInt(8) match {
    case 0 => 0
    case 1 => rnd.nextInt(3) - 1          // -1, 0, 1
    case 2 => 127 + rnd.nextInt(3) - 1    // around 1-byte/2-byte edge
    case 3 => 16384 + rnd.nextInt(3) - 1  // around 2-byte/3-byte edge
    case 4 => Int.MaxValue - rnd.nextInt(2)
    case 5 => -(1 + rnd.nextInt(1000))
    case _ => rnd.nextInt()
  }
  private def anyLong(): Long = rnd.nextInt(6) match {
    case 0 => 0L
    case 1 => -1L
    case 2 => Long.MaxValue - rnd.nextInt(2)
    case 3 => (1L << (7 * (1 + rnd.nextInt(8)))) + rnd.nextInt(3) - 1
    case _ => rnd.nextLong()
  }
  private def anyStr(): String = rnd.nextInt(6) match {
    case 0 => ""
    case 1 => "x" * (127 + rnd.nextInt(3)) // compact-length edge
    case 2 => "évént-δ-" + rnd.nextInt(100) // multi-byte UTF-8
    case _ => "t" + rnd.nextInt(1000)
  }
  private def anyBytes(): Array[Byte] = {
    val n = rnd.nextInt(5) match {
      case 0 => 0
      case 1 => 127 + rnd.nextInt(3)
      case _ => rnd.nextInt(40)
    }
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }
  private def opt[A](a: => A): Option[A] =
    if (rnd.nextBoolean()) Some(a) else None
  private def seqOf[A](max: Int)(a: => A): Seq[A] =
    Seq.fill(rnd.nextInt(max + 1))(a)

  test("Metadata v9 request/response round-trip under fuzz") {
    import WireHeaders.Metadata._
    for (_ <- 0 until 200) {
      val req = Request(seqOf(4)(anyStr()), rnd.nextBoolean(),
        rnd.nextBoolean(), rnd.nextBoolean())
      assert(decodeRequest(encodeRequest(req)) === req)
      val resp = Response(anyInt(),
        seqOf(3)(Broker(anyInt(), anyStr(), anyInt(), opt(anyStr()))),
        opt(anyStr()), anyInt(),
        seqOf(3)(Topic(anyInt().toShort, anyStr(), rnd.nextBoolean(),
          seqOf(3)(Part(anyInt().toShort, anyInt(), anyInt(), anyInt(),
            seqOf(3)(anyInt()), seqOf(3)(anyInt()), seqOf(2)(anyInt()))))))
      assert(decodeResponse(encodeResponse(resp)) === resp)
    }
  }

  test("OffsetFetch v7 round-trip under fuzz") {
    import WireHeaders.OffsetFetch._
    for (_ <- 0 until 200) {
      val req = Request(anyStr(),
        seqOf(3)((anyStr(), seqOf(4)(anyInt()))), rnd.nextBoolean())
      assert(decodeRequest(encodeRequest(req)) === req)
      val resp = Response(anyInt(), seqOf(3)(RespTopic(anyStr(),
        seqOf(3)(RespPart(anyInt(), anyLong(), anyInt(),
          opt(anyStr()), anyInt().toShort)))), anyInt().toShort)
      assert(decodeResponse(encodeResponse(resp)) === resp)
    }
  }

  test("Produce v8 round-trip under fuzz (nullable records preserved)") {
    import WireHeaders.Produce._
    def normReq(r: Request) = (r.transactionalId, r.acks, r.timeoutMs,
      r.topics.map { case (t, ps) =>
        (t, ps.map { case (p, w) => (p, w.map(_.toSeq)) }) })
    for (_ <- 0 until 200) {
      val req = Request(opt(anyStr()), anyInt().toShort, anyInt(),
        seqOf(3)((anyStr(), seqOf(3)((anyInt(), opt(anyBytes()))))))
      assert(normReq(decodeRequest(encodeRequest(req))) === normReq(req))
      val resp = Response(seqOf(3)((anyStr(), seqOf(3)(
        RespPart(anyInt(), anyInt().toShort, anyLong(), anyLong(), anyLong(),
          seqOf(2)((anyInt(), opt(anyStr()))), opt(anyStr()))))), anyInt())
      assert(decodeResponse(encodeResponse(resp)) === resp)
    }
  }

  test("Fetch v11 round-trip under fuzz (null vs empty envelopes)") {
    import WireHeaders.Fetch._
    def normResp(r: Response) = (r.throttleMs, r.errorCode, r.sessionId,
      r.topics.map { case (t, ps) => (t, ps.map(p =>
        (p.partitionIndex, p.errorCode, p.highWatermark, p.lastStableOffset,
          p.logStartOffset, p.aborted, p.preferredReadReplica,
          p.records.map(_.toSeq)))) })
    for (_ <- 0 until 200) {
      val req = Request(anyInt(), anyInt(), anyInt(), anyInt(),
        anyInt().toByte, anyInt(), anyInt(),
        seqOf(3)((anyStr(), seqOf(3)(ReqPart(anyInt(), anyInt(),
          anyLong(), anyLong(), anyInt())))),
        seqOf(2)((anyStr(), seqOf(3)(anyInt()))), anyStr())
      assert(decodeRequest(encodeRequest(req)) === req)
      val resp = Response(anyInt(), anyInt().toShort, anyInt(),
        seqOf(3)((anyStr(), seqOf(3)(RespPart(anyInt(), anyInt().toShort,
          anyLong(), anyLong(), anyLong(),
          opt(seqOf(2)(Aborted(anyLong(), anyLong()))), anyInt(),
          opt(anyBytes()))))))
      assert(normResp(decodeResponse(encodeResponse(resp))) === normResp(resp))
    }
  }

  test("JoinGroup v6 flexible round-trip under fuzz") {
    import WireHeaders.JoinGroup._
    def normReq(r: Request) = (r.groupId, r.sessionTimeoutMs,
      r.rebalanceTimeoutMs, r.memberId, r.groupInstanceId, r.protocolType,
      r.protocols.map(p => (p.name, p.metadata.toSeq)))
    def normResp(r: Response) = (r.throttleMs, r.errorCode, r.generationId,
      r.protocolName, r.leader, r.memberId,
      r.members.map(m => (m.memberId, m.groupInstanceId, m.metadata.toSeq)))
    for (_ <- 0 until 200) {
      val req = Request(anyStr(), anyInt(), anyInt(), anyStr(),
        opt(anyStr()), anyStr(),
        seqOf(3)(Protocol(anyStr(), anyBytes())))
      assert(normReq(decodeRequest(encodeRequest(req))) === normReq(req))
      val resp = Response(anyInt(), anyInt().toShort, anyInt(), anyStr(),
        anyStr(), anyStr(),
        seqOf(3)(Member(anyStr(), opt(anyStr()), anyBytes())))
      assert(normResp(decodeResponse(encodeResponse(resp))) === normResp(resp))
    }
  }

  test("request/response frame headers round-trip under fuzz") {
    import WireHeaders._
    for (_ <- 0 until 300) {
      val flexible = rnd.nextBoolean()
      val hdr = RequestHeader(anyInt().toShort, anyInt().toShort,
        anyInt(), opt(anyStr()))
      val body = anyBytes()
      val frame = encodeRequestFrame(hdr, body, flexible)
      val (back, backBody) = decodeRequestFrame(frame, flexible)
      assert(back === hdr)
      assert(backBody.toSeq === body.toSeq)
      val corr = anyInt()
      val rframe = encodeResponseFrame(corr, body, flexibleHeader = flexible)
      val (backCorr, rBody) = decodeResponseFrame(rframe, flexibleHeader = flexible)
      assert(backCorr === corr)
      assert(rBody.toSeq === body.toSeq)
    }
  }
}
