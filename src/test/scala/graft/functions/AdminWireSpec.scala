package graft.functions

import graft.SparkSpec
import graft.functions.WireHeaders.{ClientQuotas, DescribeLogDirs, DescribeProducers, DescribeTransactions, ListTransactions, PartitionReassignments}

/** Serde round-trips for the final admin keys (48/49/35/45/46 and the
  * KIP-664 trio 61/65/66) — with these, every request schema the
  * reference ships round-trips through bytes. */
class AdminWireSpec extends SparkSpec {

  test("ClientQuotas v1: describe matches and alter ops round-trip") {
    val dreq = ClientQuotas.DescribeRequest(Seq(
      ClientQuotas.DescribeComponent("client-id", 0, Some("etl-1")),
      ClientQuotas.DescribeComponent("client-id", 1, None)), strict = true)
    assert(ClientQuotas.decodeDescribeRequest(
      ClientQuotas.encodeDescribeRequest(dreq)) === dreq)

    val dresp = ClientQuotas.DescribeResponse(0, 0, None, Seq(
      ClientQuotas.Entry(Seq(ClientQuotas.Entity("client-id", None)),
        Seq(("producer_byte_rate", 1048576.0)))))
    assert(ClientQuotas.decodeDescribeResponse(
      ClientQuotas.encodeDescribeResponse(dresp)) === dresp)

    val areq = ClientQuotas.AlterRequest(Seq(
      ClientQuotas.AlterEntry(Seq(ClientQuotas.Entity("client-id", Some("x"))),
        Seq(ClientQuotas.Op("producer_byte_rate", 5.5, remove = false),
          ClientQuotas.Op("consumer_byte_rate", 0.0, remove = true)))),
      validateOnly = false)
    assert(ClientQuotas.decodeAlterRequest(
      ClientQuotas.encodeAlterRequest(areq)) === areq)
    val aresp = ClientQuotas.AlterResponse(0, Seq(
      ClientQuotas.AlterResult(35, Some("Entity type 'user' not yet supported"),
        Seq(ClientQuotas.Entity("user", Some("alice"))))))
    assert(ClientQuotas.decodeAlterResponse(
      ClientQuotas.encodeAlterResponse(aresp)) === aresp)
  }

  test("PartitionReassignments v0: null replicas encode as a cancel") {
    val areq = PartitionReassignments.AlterRequest(60000, Seq(
      "events" -> Seq(
        PartitionReassignments.AlterPartition(0, Some(Seq(1, 2, 3))),
        PartitionReassignments.AlterPartition(2, None))))
    val back = PartitionReassignments.decodeAlterRequest(
      PartitionReassignments.encodeAlterRequest(areq))
    assert(back === areq)
    assert(back.topics.head._2(1).replicas === None)

    val lresp = PartitionReassignments.ListResponse(0, 0, None, Seq(
      "events" -> Seq(PartitionReassignments.Ongoing(1,
        Seq(0, 1, 2), Seq(3, 4, 5), Seq(0, 1, 2)))))
    assert(PartitionReassignments.decodeListResponse(
      PartitionReassignments.encodeListResponse(lresp)) === lresp)
    val nullList = PartitionReassignments.ListRequest(60000, None)
    assert(PartitionReassignments.decodeListRequest(
      PartitionReassignments.encodeListRequest(nullList)) === nullList)
  }

  test("DescribeLogDirs v4 carries the dir rollup") {
    val resp = DescribeLogDirs.Response(0, 0, Seq(
      DescribeLogDirs.DirResult(0, "/var/lib/graft/data", Seq(
        "events" -> Seq(DescribeLogDirs.Partition(0, 1234L, 0L,
          isFutureKey = false))), 1234L, -1L)))
    assert(DescribeLogDirs.decodeResponse(
      DescribeLogDirs.encodeResponse(resp)) === resp)
  }

  test("KIP-664 trio round-trips states, topics and producer detail") {
    val lt = ListTransactions.Response(0, 0, Seq("Retrying"), Seq(
      ListTransactions.TxnState("tx-10", 10L, "Ongoing")))
    assert(ListTransactions.decodeResponse(
      ListTransactions.encodeResponse(lt)) === lt)

    val dx = DescribeTransactions.Response(0, Seq(
      DescribeTransactions.TxnState(0, "tx-10", "Ongoing", 60000, -1L, 10L,
        0, Seq("events" -> Seq(0, 1))),
      DescribeTransactions.TxnState(105, "tx-99", "", 0, -1L, -1L, -1, Nil)))
    assert(DescribeTransactions.decodeResponse(
      DescribeTransactions.encodeResponse(dx)) === dx)

    val dp = DescribeProducers.Response(0, Seq(
      "events" -> Seq(DescribeProducers.RespPartition(0, 0, None, Seq(
        DescribeProducers.Producer(10L, 0, -1, -1L, 0, 0L))))))
    assert(DescribeProducers.decodeResponse(
      DescribeProducers.encodeResponse(dp)) === dp)
  }
}
