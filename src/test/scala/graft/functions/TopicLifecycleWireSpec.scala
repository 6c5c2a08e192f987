package graft.functions

import graft.SparkSpec
import graft.functions.WireHeaders.{CreatePartitions, DeleteTopics}

/** Serde round-trips for CreatePartitions v3 and DeleteTopics v6. */
class TopicLifecycleWireSpec extends SparkSpec {

  test("CreatePartitions v3 round-trips null and custom assignments") {
    val req = CreatePartitions.Request(Seq(
      CreatePartitions.ReqTopic("t1", 12, None),
      CreatePartitions.ReqTopic("t4", 4, Some(Seq(Seq(1, 2), Seq(2, 3))))),
      timeoutMs = 30000, validateOnly = true)
    val back = CreatePartitions.decodeRequest(CreatePartitions.encodeRequest(req))
    assert(back === req)
    assert(back.topics(1).assignments === Some(Seq(Seq(1, 2), Seq(2, 3))))
    assert(back.validateOnly)

    val resp = CreatePartitions.Response(0, Seq(
      CreatePartitions.Result("t1", 42,
        Some("request contains duplicated topics")),
      CreatePartitions.Result("t5", 0, None)))
    assert(CreatePartitions.decodeResponse(
      CreatePartitions.encodeResponse(resp)) === resp)
  }

  test("DeleteTopics v6 round-trips name-or-id states") {
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest("t4".getBytes("UTF-8"))
    val req = DeleteTopics.Request(Seq(
      DeleteTopics.ReqTopic(Some("t3"), DeleteTopics.ZeroUuid),
      DeleteTopics.ReqTopic(None, id)), timeoutMs = 5000)
    val back = DeleteTopics.decodeRequest(DeleteTopics.encodeRequest(req))
    assert(back.topics(0).name === Some("t3"))
    assert(back.topics(1).name === None)
    assert(back.topics(1).topicId.toSeq === id.toSeq)
    assert(back.timeoutMs === 5000)

    val resp = DeleteTopics.Response(0, Seq(
      DeleteTopics.Result(Some("t3"), id, 0, None),
      DeleteTopics.Result(None, id, 100, Some("unknown topic id"))))
    val rback = DeleteTopics.decodeResponse(DeleteTopics.encodeResponse(resp))
    assert(rback.responses(0).name === Some("t3"))
    assert(rback.responses(1).errorCode === 100)
    assert(rback.responses(1).errorMessage === Some("unknown topic id"))
    assert(rback.responses(1).topicId.toSeq === id.toSeq)
  }
}
