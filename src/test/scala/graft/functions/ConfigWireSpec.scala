package graft.functions

import graft.SparkSpec
import graft.functions.WireHeaders.{DescribeConfigs, IncrementalAlterConfigs}

/** Serde round-trips for DescribeConfigs v4 and
  * IncrementalAlterConfigs v1. */
class ConfigWireSpec extends SparkSpec {

  test("DescribeConfigs v4 round-trips null and concrete key filters") {
    val req = DescribeConfigs.Request(Seq(
      DescribeConfigs.ReqResource(2, "events", None),
      DescribeConfigs.ReqResource(2, "metrics", Some(Seq("retention.ms", "x"))),
      DescribeConfigs.ReqResource(8, "kafka", Some(Nil))),
      includeSynonyms = true, includeDocumentation = false)
    val back = DescribeConfigs.decodeRequest(DescribeConfigs.encodeRequest(req))
    assert(back === req)
    assert(back.resources(0).configurationKeys === None)
    assert(back.resources(2).configurationKeys === Some(Nil))

    val resp = DescribeConfigs.Response(0, Seq(
      DescribeConfigs.Result(0, None, 2, "events", Seq(
        DescribeConfigs.Config("cleanup.policy", Some("compact"),
          readOnly = false, 1, isSensitive = false, 0, None),
        DescribeConfigs.Config("sasl.jaas", None, readOnly = true, 5,
          isSensitive = true, 0, Some("docs")))),
      DescribeConfigs.Result(3, Some("unknown"), 2, "ghost", Nil)))
    val rback = DescribeConfigs.decodeResponse(DescribeConfigs.encodeResponse(resp))
    assert(rback === resp)
    assert(rback.results.head.configs(1).isSensitive)
  }

  test("IncrementalAlterConfigs v1 round-trips op codes and null values") {
    val req = IncrementalAlterConfigs.Request(Seq(
      IncrementalAlterConfigs.ReqResource(2, "events", Seq(
        IncrementalAlterConfigs.ReqConfig("retention.ms", 0, Some("1000")),
        IncrementalAlterConfigs.ReqConfig("retention.ms", 1, None),
        IncrementalAlterConfigs.ReqConfig("acl", 3, Some("z"))))),
      validateOnly = true)
    val back = IncrementalAlterConfigs.decodeRequest(
      IncrementalAlterConfigs.encodeRequest(req))
    assert(back === req)
    assert(back.validateOnly)

    val resp = IncrementalAlterConfigs.Response(0, Seq(
      IncrementalAlterConfigs.RespResource(40,
        Some("invalid operation code 7"), 2, "events"),
      IncrementalAlterConfigs.RespResource(0, None, 2, "metrics")))
    assert(IncrementalAlterConfigs.decodeResponse(
      IncrementalAlterConfigs.encodeResponse(resp)) === resp)
    // op name table matches protocol/types.h:243 (set/remove/append/subtract)
    assert(IncrementalAlterConfigs.OpNames(1.toByte) === "remove")
  }
}
