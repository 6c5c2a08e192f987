package graft.proxy

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** REST proxy protocol contract (pandaproxy/rest/handlers.h routes,
  * the json request/response header shapes, v2 embedded formats). */
class RestProxySpec extends AnyFunSuite {

  private val m = new ObjectMapper()
  private def b64(s: String) = java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("binary_v2 produce/fetch round trip with partitioner routing") {
    val srv = new RestProxy.Server(nPartitions = 3)
    srv.createTopic("t")
    val resp = srv.handle("POST", "/topics/t", Some(
      s"""{"records":[
         |{"partition":1,"key":"${b64("k1")}","value":"${b64("v1")}"},
         |{"partition":1,"value":"${b64("v2")}"},
         |{"key":"${b64("route-me")}","value":"${b64("v3")}"},
         |{"partition":9,"value":"${b64("nope")}"}]}""".stripMargin))
    assert(resp.status === 200)
    val offs = m.readTree(resp.body).get("offsets")
    assert(offs.get(0).get("partition").asInt() === 1)
    assert(offs.get(0).get("offset").asLong() === 0L)
    assert(offs.get(1).get("offset").asLong() === 1L)
    // partitionless: murmur2(key) % 3, deterministic
    val routed = offs.get(2).get("partition").asInt()
    assert((0 until 3).contains(routed))
    assert(offs.get(3).get("error_code").asInt() === 40402)
    // read partition 1 back from offset 1
    val got = m.readTree(srv.handle("GET",
      "/topics/t/partitions/1/records?offset=1").body)
    assert(got.size() === 1)
    assert(got.get(0).get("key").isNull)
    assert(got.get(0).get("value").asText() === b64("v2"))
    assert(got.get(0).get("offset").asLong() === 1L)
    assert(got.get(0).get("topic").asText() === "t")
    // unknown topic / partition
    assert(m.readTree(srv.handle("GET", "/topics/zz/partitions/0/records").body)
      .get("error_code").asInt() === 40401)
    assert(m.readTree(srv.handle("GET", "/topics/t/partitions/7/records").body)
      .get("error_code").asInt() === 40402)
  }

  test("json_v2 carries raw JSON values both ways") {
    val srv = new RestProxy.Server(nPartitions = 1)
    srv.createTopic("j")
    srv.handle("POST", "/topics/j",
      Some("""{"records":[{"partition":0,"key":{"k":1},"value":[1,2,3]}]}"""),
      format = "json")
    val got = m.readTree(srv.handle("GET",
      "/topics/j/partitions/0/records", format = "json").body)
    assert(got.get(0).get("key").get("k").asInt() === 1)
    assert(got.get(0).get("value").get(2).asInt() === 3)
  }

  test("consumer lifecycle: create, subscribe, fetch, commit, fetch offsets, remove") {
    val srv = new RestProxy.Server(nPartitions = 1)
    srv.createTopic("t")
    srv.handle("POST", "/topics/t", Some(
      s"""{"records":[{"partition":0,"value":"${b64("a")}"},{"partition":0,"value":"${b64("b")}"}]}"""))
    val created = m.readTree(srv.handle("POST", "/consumers/g1",
      Some("""{"name":"c1","format":"binary"}""")).body)
    assert(created.get("instance_id").asText() === "c1")
    assert(created.get("base_uri").asText().endsWith("/consumers/g1/instances/c1"))
    assert(srv.handle("POST", "/consumers/g1/instances/c1/subscription",
      Some("""{"topics":["t"]}""")).status === 204)
    val r1 = m.readTree(srv.handle("GET", "/consumers/g1/instances/c1/records").body)
    assert(r1.size() === 2)
    // position advanced: next fetch is empty
    assert(m.readTree(srv.handle("GET",
      "/consumers/g1/instances/c1/records").body).size() === 0)
    assert(srv.handle("POST", "/consumers/g1/instances/c1/offsets",
      Some("""{"partitions":[{"topic":"t","partition":0,"offset":2}]}""")).status === 204)
    val offs = m.readTree(srv.handle("GET", "/consumers/g1/instances/c1/offsets",
      Some("""{"partitions":[{"topic":"t","partition":0}]}""")).body)
    assert(offs.get("offsets").get(0).get("offset").asLong() === 2L)
    assert(offs.get("offsets").get(0).get("metadata").asText() === "")
    assert(srv.handle("DELETE", "/consumers/g1/instances/c1").status === 204)
    assert(m.readTree(srv.handle("GET",
      "/consumers/g1/instances/c1/records").body).get("error_code").asInt() === 40403)
    // subscribe to a missing topic 404s
    val c2 = m.readTree(srv.handle("POST", "/consumers/g1", Some("""{}""")).body)
    assert(srv.handle("POST",
      s"/consumers/g1/instances/${c2.get("instance_id").asText()}/subscription",
      Some("""{"topics":["zz"]}""")).status === 404)
  }
}
