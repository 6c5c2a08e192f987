package graft.registry

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Route/shape/error contract of the SR REST surface, pinned to
  * pandaproxy/schema_registry/handlers.cc + error.cc semantics. */
class RestApiSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val v1 =
    """{"type":"record","name":"Ev","fields":[{"name":"a","type":"string"}]}"""
  private val v2 =
    """{"type":"record","name":"Ev","fields":[{"name":"a","type":"string"},{"name":"b","type":"int","default":0}]}"""
  private val bad =
    """{"type":"record","name":"Ev","fields":[{"name":"a","type":"int"}]}"""
  private def post(s: String) = Some(s"""{"schema":${mapper.writeValueAsString(mapper.getNodeFactory.textNode(s))}}""")

  test("register: global ids, re-registration, conflict, empty schema") {
    val srv = new RestApi.Server()
    assert(srv.handle("POST", "/subjects/ev/versions", post(v1)) ===
      RestApi.Resp(200, """{"id":1}"""))
    // identical schema: same id, no new version
    assert(srv.handle("POST", "/subjects/ev/versions", post(v1)).body ===
      """{"id":1}""")
    assert(srv.handle("POST", "/subjects/ev/versions", post(v2)).body ===
      """{"id":2}""")
    // same definition under ANOTHER subject shares the global id
    assert(srv.handle("POST", "/subjects/other/versions", post(v1)).body ===
      """{"id":1}""")
    val conflict = srv.handle("POST", "/subjects/ev/versions", post(bad))
    assert(conflict.status === 409)
    assert(mapper.readTree(conflict.body).get("error_code").asInt() === 409)
    val empty = srv.handle("POST", "/subjects/ev/versions", Some("""{"schema":""}"""))
    assert(empty.status === 422)
    assert(mapper.readTree(empty.body).get("error_code").asInt() === 42201)
    assert(srv.handle("GET", "/subjects/ev/versions").body === "[1,2]")
  }

  test("reads: versions, latest, by id, unknown subject/version/id") {
    val srv = new RestApi.Server()
    srv.handle("POST", "/subjects/ev/versions", post(v1))
    srv.handle("POST", "/subjects/ev/versions", post(v2))
    val latest = mapper.readTree(srv.handle("GET", "/subjects/ev/versions/latest").body)
    assert(latest.get("subject").asText() === "ev")
    assert(latest.get("version").asInt() === 2)
    assert(latest.get("id").asInt() === 2)
    assert(latest.get("schema").asText() === v2)
    val v1resp = mapper.readTree(srv.handle("GET", "/subjects/ev/versions/1").body)
    assert(v1resp.get("id").asInt() === 1)
    val byId = mapper.readTree(srv.handle("GET", "/schemas/ids/1").body)
    assert(byId.get("schema").asText() === AvroCanonical.sanitize(v1))
    assert(mapper.readTree(srv.handle("GET", "/subjects/nope/versions").body)
      .get("error_code").asInt() === 40401)
    assert(mapper.readTree(srv.handle("GET", "/subjects/ev/versions/9").body)
      .get("error_code").asInt() === 40402)
    assert(mapper.readTree(srv.handle("GET", "/schemas/ids/99").body)
      .get("error_code").asInt() === 40403)
  }

  test("delete: soft then permanent, double-delete errors, listing hides") {
    val srv = new RestApi.Server()
    srv.handle("POST", "/subjects/ev/versions", post(v1))
    srv.handle("POST", "/subjects/gone/versions", post(v1))
    assert(srv.handle("GET", "/subjects").body === """["ev","gone"]""")
    // permanent before soft: 40405
    assert(mapper.readTree(
      srv.handle("DELETE", "/subjects/gone?permanent=true").body)
      .get("error_code").asInt() === 40405)
    assert(srv.handle("DELETE", "/subjects/gone").body === "[1]")
    assert(srv.handle("GET", "/subjects").body === """["ev"]""")
    assert(srv.handle("GET", "/subjects?deleted=true").body === """["ev","gone"]""")
    assert(mapper.readTree(srv.handle("DELETE", "/subjects/gone").body)
      .get("error_code").asInt() === 40404)
    assert(srv.handle("DELETE", "/subjects/gone?permanent=true").body === "[1]")
    assert(srv.handle("GET", "/subjects?deleted=true").body === """["ev"]""")
  }

  test("compatibility probe") {
    val srv = new RestApi.Server()
    srv.handle("POST", "/subjects/ev/versions", post(v1))
    assert(srv.handle("POST", "/compatibility/subjects/ev/versions/latest",
      post(v2)).body === """{"is_compatible":true}""")
    assert(srv.handle("POST", "/compatibility/subjects/ev/versions/latest",
      post(bad)).body === """{"is_compatible":false}""")
  }
}
