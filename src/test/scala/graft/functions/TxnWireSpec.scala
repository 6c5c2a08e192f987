package graft.functions

import graft.SparkSpec
import graft.functions.WireHeaders.{AddOffsetsToTxn, AddPartitionsToTxn, TxnOffsetCommit}

/** Serde round-trips for the transactional trio (api keys 24/25/28) at
  * the reference's pinned versions, including the size laws the
  * g3_wire_txn_offsets oracle recomputes. */
class TxnWireSpec extends SparkSpec {

  test("AddPartitionsToTxn v3 round-trips and obeys the size law") {
    val req = AddPartitionsToTxn.Request("tx-a", 10L, 2,
      Seq("events" -> Seq(0, 1)))
    val bytes = AddPartitionsToTxn.encodeRequest(req)
    val back = AddPartitionsToTxn.decodeRequest(bytes)
    assert(back === req)
    // body = 26 + 4*np with a 4-char tid and 6-char topic
    assert(bytes.length === 26 + 4 * 2)

    val resp = AddPartitionsToTxn.Response(0,
      Seq("events" -> Seq(0 -> 0.toShort, 1 -> 47.toShort)))
    val rb = AddPartitionsToTxn.encodeResponse(resp)
    assert(AddPartitionsToTxn.decodeResponse(rb) === resp)
    assert(rb.length === 15 + 7 * 2)
  }

  test("AddOffsetsToTxn v1 is legacy-encoded (no tag buffers)") {
    val req = AddOffsetsToTxn.Request("tx-a", 10L, 2, "g-wire")
    val bytes = AddOffsetsToTxn.encodeRequest(req)
    assert(AddOffsetsToTxn.decodeRequest(bytes) === req)
    // 2+4 tid + 8 pid + 2 epoch + 2+6 group — not a tag byte anywhere
    assert(bytes.length === 24)
    val resp = AddOffsetsToTxn.encodeResponse(AddOffsetsToTxn.Response(5, 49))
    assert(resp.length === 6)
    val back = AddOffsetsToTxn.decodeResponse(resp)
    assert(back.throttleMs === 5 && back.errorCode === 49)
  }

  test("TxnOffsetCommit v3 carries the KIP-447 fencing fields through bytes") {
    val req = TxnOffsetCommit.Request("tx-b", "g-wire", 11L, 0, 7, "m-1",
      Some("inst-1"), Seq("events" -> Seq(
        TxnOffsetCommit.ReqPartition(0, 555L, -1, None),
        TxnOffsetCommit.ReqPartition(1, 650L, 3, Some("note")))))
    val back = TxnOffsetCommit.decodeRequest(TxnOffsetCommit.encodeRequest(req))
    assert(back === req)
    assert(back.generationId === 7 && back.memberId === "m-1")
    assert(back.groupInstanceId === Some("inst-1"))
    assert(back.topics.head._2(1).metadata === Some("note"))

    // null instance id and metadata hit the oracle's 62+18*np frame law
    val slim = TxnOffsetCommit.Request("tx-a", "g-wire", 10L, 2, 7, "m-1",
      None, Seq("events" -> Seq(TxnOffsetCommit.ReqPartition(0, 100L, -1, None))))
    assert(TxnOffsetCommit.encodeRequest(slim).length === 42 + 18 * 1)

    val resp = TxnOffsetCommit.Response(0,
      Seq("events" -> Seq(0 -> 0.toShort, 1 -> 22.toShort)))
    val rb = TxnOffsetCommit.encodeResponse(resp)
    assert(TxnOffsetCommit.decodeResponse(rb) === resp)
    assert(rb.length === 15 + 7 * 2)
  }

  test("truncated txn frames are rejected cleanly") {
    val bytes = AddPartitionsToTxn.encodeRequest(
      AddPartitionsToTxn.Request("tx-a", 10L, 2, Seq("events" -> Seq(0, 1))))
    intercept[Exception] {
      AddPartitionsToTxn.decodeRequest(bytes.take(bytes.length - 6))
    }
    val toc = TxnOffsetCommit.encodeRequest(
      TxnOffsetCommit.Request("tx-a", "g", 1L, 0, 1, "m", None,
        Seq("t" -> Seq(TxnOffsetCommit.ReqPartition(0, 1L, -1, None)))))
    intercept[Exception] {
      TxnOffsetCommit.decodeRequest(toc.take(toc.length - 4))
    }
  }
}
