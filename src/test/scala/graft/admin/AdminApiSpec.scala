package graft.admin

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

import AdminApi.{Server, Resp}

/** The Admin HTTP API protocol layer: route grammar, reference JSON
  * field names, status codes, and the throw_on_error ladders — all as
  * pure request→response assertions over the deterministic model. */
class AdminApiSpec extends AnyFunSuite {

  private val m = new ObjectMapper()

  private def freshServer(): Server = {
    val s = new Server(nodeIds = Seq(0, 1, 2))
    s.addPartition("kafka", "events", 0, leader = 0, replicas = Seq(0, 1, 2))
    s.addPartition("kafka", "events", 1, leader = 1, replicas = Seq(0, 1, 2))
    s.addPartition("kafka", "audit", 0, leader = 2, replicas = Seq(2))
    s
  }

  test("brokers: listing carries the get_brokers field set") {
    val s = freshServer()
    val r = s.handle("GET", "/v1/brokers")
    assert(r.status === 200)
    val a = m.readTree(r.body)
    assert(a.size() === 3)
    val b0 = a.get(0)
    assert(b0.get("node_id").asInt() === 0)
    assert(b0.get("num_cores").asInt() === 32)
    assert(b0.get("membership_status").asText() === "active")
    assert(b0.get("is_alive").asBoolean())
    assert(!b0.get("maintenance_status").get("draining").asBoolean())
    assert(b0.get("disk_space").get(0).has("path"))
    assert(b0.get("disk_space").get(0).get("total").asLong() > 0)
    // single broker + unknown id
    assert(s.handle("GET", "/v1/brokers/1").status === 200)
    val nf = s.handle("GET", "/v1/brokers/9")
    assert(nf.status === 404)
    assert(m.readTree(nf.body).get("message").asText().contains("broker with id 9"))
  }

  test("maintenance and decommission follow the state-transition ladder") {
    val s = freshServer()
    assert(s.handle("PUT", "/v1/brokers/1/maintenance").status === 200)
    val b1 = m.readTree(s.handle("GET", "/v1/brokers/1").body)
    val ms = b1.get("maintenance_status")
    assert(ms.get("draining").asBoolean())
    assert(ms.get("finished").asBoolean())
    assert(ms.get("partitions").asInt() === 2) // replica of events/0, events/1
    assert(s.handle("DELETE", "/v1/brokers/1/maintenance").status === 200)
    // decommission: active -> draining; double-decommission is invalid
    assert(s.handle("PUT", "/v1/brokers/2/decommission").status === 200)
    assert(m.readTree(s.handle("GET", "/v1/brokers/2").body)
      .get("membership_status").asText() === "draining")
    val dbl = s.handle("PUT", "/v1/brokers/2/decommission")
    assert(dbl.status === 400)
    assert(m.readTree(dbl.body).get("message").asText()
      .contains("invalid state transition"))
    // recommission restores active; recommission of an active broker 400s
    assert(s.handle("PUT", "/v1/brokers/2/recommission").status === 200)
    assert(s.handle("PUT", "/v1/brokers/2/recommission").status === 400)
    // maintenance on a decommissioning broker is an invalid transition
    s.handle("PUT", "/v1/brokers/2/decommission")
    assert(s.handle("PUT", "/v1/brokers/2/maintenance").status === 400)
    assert(s.handle("PUT", "/v1/brokers/9/decommission").status === 404)
  }

  test("health_overview reflects down nodes and leaderless partitions") {
    val s = freshServer()
    val healthy = m.readTree(s.handle("GET", "/v1/cluster/health_overview").body)
    assert(healthy.get("is_healthy").asBoolean())
    assert(healthy.get("all_nodes").size() === 3)
    assert(healthy.get("leaderless_count").asInt() === 0)
    s.setAlive(2, alive = false)
    val sick = m.readTree(s.handle("GET", "/v1/cluster/health_overview").body)
    assert(!sick.get("is_healthy").asBoolean())
    assert(sick.get("nodes_down").get(0).asInt() === 2)
    assert(sick.get("leaderless_count").asInt() === 1) // audit/0 led by 2
    assert(sick.get("leaderless_partitions").get(0).asText() === "kafka/audit/0")
    assert(sick.get("unhealthy_reasons").toString.contains("nodes_down"))
  }

  test("cluster_config: get, schema, status, and patch semantics") {
    val s = freshServer()
    val cfg = m.readTree(s.handle("GET", "/v1/cluster_config").body)
    assert(cfg.get("log_segment_size").asLong() === 134217728L)
    val schema = m.readTree(s.handle("GET", "/v1/cluster_config/schema").body)
    val prop = schema.get("properties").get("cloud_storage_enabled")
    assert(prop.get("type").asText() === "boolean")
    assert(prop.get("needs_restart").asBoolean())
    val st0 = m.readTree(s.handle("GET", "/v1/cluster_config/status").body)
    assert(st0.size() === 3)
    assert(st0.get(0).get("config_version").asLong() === 1L)
    assert(!st0.get(0).get("restart").asBoolean())

    // a valid patch bumps the version on every node's status row
    val ok = s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"log_segment_size":268435456},"remove":[]}"""))
    assert(ok.status === 200)
    assert(m.readTree(ok.body).get("config_version").asLong() === 2L)
    assert(m.readTree(s.handle("GET", "/v1/cluster_config").body)
      .get("log_segment_size").asLong() === 268435456L)

    // per-key validation errors come back as the 400 JSON map
    val bad = s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"nope_prop":1,"enable_rack_awareness":"yes"},"remove":["also_nope"]}"""))
    assert(bad.status === 400)
    val errs = m.readTree(bad.body)
    assert(errs.get("nope_prop").asText() === "Unknown property")
    assert(errs.get("enable_rack_awareness").asText() === "expected type boolean")
    assert(errs.get("also_nope").asText() === "Unknown property")

    // out-of-range int32 and dry_run
    val oor = s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"kafka_batch_max_bytes":99999999999},"remove":[]}"""))
    assert(oor.status === 400)
    assert(m.readTree(oor.body).get("kafka_batch_max_bytes").asText()
      === "out of range: '99999999999'")
    val dry = s.handle("PUT", "/v1/cluster_config?dry_run=true",
      Some("""{"upsert":{"default_topic_replications":3},"remove":[]}"""))
    assert(m.readTree(dry.body).get("config_version").asLong() === 2L) // unchanged
    // force skips validation
    assert(s.handle("PUT", "/v1/cluster_config?force=true",
      Some("""{"upsert":{"nope_prop":1},"remove":[]}""")).status === 200)
    // restart-needing property flips the status flag
    s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"cloud_storage_enabled":true},"remove":[]}"""))
    val st1 = m.readTree(s.handle("GET", "/v1/cluster_config/status").body)
    assert(st1.get(0).get("restart").asBoolean())
  }

  test("features: listing and state transitions") {
    val s = freshServer()
    val f = m.readTree(s.handle("GET", "/v1/features").body)
    assert(f.get("cluster_version").asLong() === 13L)
    val byName = (0 until f.get("features").size())
      .map(i => f.get("features").get(i))
      .map(n => n.get("name").asText() -> n).toMap
    assert(byName("datalake_iceberg").get("state").asText() === "available")
    assert(!byName("datalake_iceberg").get("was_active").asBoolean())
    assert(s.handle("PUT", "/v1/features/datalake_iceberg",
      Some("""{"state":"active"}""")).status === 200)
    val f2 = m.readTree(s.handle("GET", "/v1/features").body)
    val row = (0 until f2.get("features").size())
      .map(i => f2.get("features").get(i))
      .find(_.get("name").asText() == "datalake_iceberg").get
    assert(row.get("state").asText() === "active")
    assert(row.get("was_active").asBoolean())
    assert(s.handle("PUT", "/v1/features/nope",
      Some("""{"state":"active"}""")).status === 404)
    assert(s.handle("PUT", "/v1/features/rbac",
      Some("""{"state":"bogus"}""")).status === 400)
  }

  test("partitions: listing, detail, and leadership transfer ladder") {
    val s = freshServer()
    val all = m.readTree(s.handle("GET", "/v1/partitions").body)
    assert(all.size() === 3)
    val one = m.readTree(s.handle("GET", "/v1/partitions/kafka/events/1").body)
    assert(one.get("leader_id").asInt() === 1)
    assert(one.get("replicas").size() === 3)
    assert(one.get("ns").asText() === "kafka")
    assert(s.handle("GET", "/v1/partitions/kafka/nope/0").status === 404)
    // transfer to an explicit target
    assert(s.handle("POST",
      "/v1/partitions/kafka/events/1/transfer_leadership?target=2").status === 200)
    assert(m.readTree(s.handle("GET", "/v1/partitions/kafka/events/1").body)
      .get("leader_id").asInt() === 2)
    // ladder: non-integer, negative, non-replica targets
    assert(s.handle("POST",
      "/v1/partitions/kafka/events/1/transfer_leadership?target=abc").status === 400)
    assert(s.handle("POST",
      "/v1/partitions/kafka/events/1/transfer_leadership?target=-1").status === 400)
    assert(s.handle("POST",
      "/v1/partitions/kafka/audit/0/transfer_leadership?target=1").status === 400)
    // no target: deterministic next replica
    assert(s.handle("POST",
      "/v1/partitions/kafka/events/1/transfer_leadership").status === 200)
    assert(m.readTree(s.handle("GET", "/v1/partitions/kafka/events/1").body)
      .get("leader_id").asInt() === 0)
  }

  test("self test: start/status/stop lifecycle with node reports") {
    val s = freshServer()
    val idle = m.readTree(s.handle("GET", "/v1/debug/self_test/status").body)
    assert(idle.size() === 3)
    assert(idle.get(0).get("status").asText() === "idle")
    val start = s.handle("POST", "/v1/debug/self_test/start",
      Some("""{"tests":[{"type":"disk"},{"type":"network"}]}"""))
    assert(start.status === 200)
    val id = m.readTree(start.body).asText()
    assert(id.endsWith("000001"))
    val running = m.readTree(s.handle("GET", "/v1/debug/self_test/status").body)
    assert(running.get(0).get("status").asText() === "running")
    assert(running.get(0).get("stage").asText() === "disk")
    assert(s.handle("POST", "/v1/debug/self_test/stop").status === 200)
    val done = m.readTree(s.handle("GET", "/v1/debug/self_test/status").body)
    assert(done.get(0).get("status").asText() === "idle")
    val results = done.get(0).get("results")
    assert(results.size() === 2)
    assert(results.get(0).get("test_type").asText() === "disk")
    assert(results.get(0).get("test_id").asText() === id)
    assert(results.get(0).get("p99").asLong() === 400L)
    // bad test type rejected up front
    assert(s.handle("POST", "/v1/debug/self_test/start",
      Some("""{"tests":[{"type":"quantum"}]}""")).status === 400)
  }

  test("debug bundle: start/status/conflict/cancel ladder") {
    val s = freshServer()
    val start = s.handle("POST", "/v1/debug_bundle")
    assert(start.status === 200)
    val job = m.readTree(start.body).get("job_id").asText()
    // conflicting second start
    val conflict = s.handle("POST", "/v1/debug_bundle")
    assert(conflict.status === 409)
    assert(m.readTree(conflict.body).get("code").asInt() === 409)
    val st = m.readTree(s.handle("GET", s"/v1/debug_bundle/$job").body)
    assert(st.get("status").asText() === "running")
    assert(st.get("created").asLong() > 0)
    // finish -> success with file metadata
    assert(s.handle("PUT", s"/v1/debug_bundle/$job/finish").status === 200)
    val ok = m.readTree(s.handle("GET", s"/v1/debug_bundle/$job").body)
    assert(ok.get("status").asText() === "success")
    assert(ok.get("filename").asText() === s"$job.zip")
    // cancelling a finished job conflicts; unknown job 404s
    assert(s.handle("DELETE", s"/v1/debug_bundle/$job").status === 409)
    assert(s.handle("GET", "/v1/debug_bundle/nope").status === 404)
    // a new bundle can start once the old one is terminal, and cancel works
    val j2 = m.readTree(s.handle("POST", "/v1/debug_bundle").body)
      .get("job_id").asText()
    assert(s.handle("DELETE", s"/v1/debug_bundle/$j2").status === 204)
    assert(m.readTree(s.handle("GET", s"/v1/debug_bundle/$j2").body)
      .get("status").asText() === "error")
  }

  test("transactions and usage render the engine providers' state") {
    val s = new Server(nodeIds = Seq(0),
      transactions = () => Seq(
        AdminApi.TxnSummary("tx-10", 10L, 2, 3L, "Ongoing", 60000L,
          Seq(("kafka", "events", 0), ("kafka", "events", 1))),
        AdminApi.TxnSummary("tx-11", 11L, 0, 1L, "CompleteCommit", 60000L, Nil)),
      usage = () => Seq(
        AdminApi.UsageWindow(1700000000000L, 1700003600000L, open = false, 300L, 280L),
        AdminApi.UsageWindow(1700003600000L, 1700007200000L, open = true, 500L, 450L)))
    // param required per transaction.cc:48-61 (ladder tested below)
    assert(m.readTree(s.handle("GET", "/v1/transactions").body)
      .get("message").asText() === "Partition must be an integer: ")
    assert(m.readTree(
      s.handle("GET", "/v1/transactions?coordinator_partition_id=-1").body)
      .get("message").asText() === "Invalid coordinator partition -1")
    val txns = m.readTree(s.handle(
      "GET", "/v1/transactions?coordinator_partition_id=0").body)
    assert(txns.size() === 2)
    val t0 = txns.get(0)
    assert(t0.get("transactional_id").asText() === "tx-10")
    assert(t0.get("pid").get("id").asLong() === 10L)
    assert(t0.get("pid").get("epoch").asInt() === 2)
    assert(t0.get("status").asText() === "Ongoing")
    assert(t0.get("partitions").size() === 2)
    assert(t0.get("partitions").get(0).get("topic").asText() === "events")
    assert(txns.get(1).get("status").asText() === "CompleteCommit")
    // usage is gated on enable_usage (admin/usage.cc:51-53)
    assert(m.readTree(s.handle("GET", "/v1/usage").body)
      .get("message").asText() === "Usage tracking is not enabled")
    s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"enable_usage":true},"remove":[]}"""))
    // default excludes the open bucket; include_open_bucket adds it
    // back with its zero end timestamp replaced by the model clock
    val usage = m.readTree(s.handle("GET", "/v1/usage").body)
    assert(usage.size() === 1)
    val w0 = usage.get(0)
    assert(w0.get("begin_timestamp").asLong() === 1700000000L) // seconds
    assert(!w0.get("open").asBoolean())
    assert(w0.get("kafka_bytes_sent_count").asLong() === 300L)
    assert(w0.get("kafka_bytes_received_count").asLong() === 280L)
    assert(w0.get("cloud_storage_bytes_gauge").asLong() === -1L)
    val all = m.readTree(
      s.handle("GET", "/v1/usage?include_open_bucket=true").body)
    assert(all.size() === 2)
    assert(all.get(1).get("open").asBoolean())
    assert(all.get(1).get("end_timestamp").asLong() === 1700009999L)
  }

  test("cluster uuid, readiness, and unknown routes") {
    val s = freshServer()
    assert(m.readTree(s.handle("GET", "/v1/cluster/uuid").body)
      .get("cluster_uuid").asText().nonEmpty)
    assert(s.handle("GET", "/v1/status/ready").status === 200)
    val nf: Resp = s.handle("GET", "/v1/nope")
    assert(nf.status === 404)
    assert(m.readTree(nf.body).get("code").asInt() === 404)
  }

  test("security users: create/list/update/delete with the reference ladder") {
    val s = freshServer()
    def create(b: String) = s.handle("POST", "/v1/security/users", Some(b))
    // validation order matches parse_scram_credential: algorithm first,
    // then password (with the reference's "smissing" typo), then username
    assert(m.readTree(create("""{"username":"u"}""").body)
      .get("message").asText() === "String algo missing")
    assert(m.readTree(create("""{"algorithm":"SCRAM-SHA-256"}""").body)
      .get("message").asText() === "String password smissing")
    assert(m.readTree(create(
      """{"algorithm":"SCRAM-SHA-1","password":"p"}""").body)
      .get("message").asText() === "Unknown scram algorithm: SCRAM-SHA-1")
    assert(m.readTree(create(
      """{"algorithm":"SCRAM-SHA-256","password":"p"}""").body)
      .get("message").asText() === "String username missing")
    val badName = create(
      """{"algorithm":"SCRAM-SHA-256","password":"p","username":"a,b"}""")
    assert(badName.status === 400)
    assert(m.readTree(badName.body).get("message").asText() ===
      "Invalid SCRAM username {a,b}")
    // create, idempotent re-create, conflicting re-create
    assert(create(
      """{"algorithm":"SCRAM-SHA-256","password":"pw1","username":"alice"}""")
      .status === 200)
    assert(create(
      """{"algorithm":"SCRAM-SHA-256","password":"pw1","username":"alice"}""")
      .status === 200)
    val conflict = create(
      """{"algorithm":"SCRAM-SHA-256","password":"OTHER","username":"alice"}""")
    assert(conflict.status === 500)
    assert(m.readTree(conflict.body).get("message").asText() ===
      "Unexpected cluster error: User already exists")
    assert(create(
      """{"algorithm":"SCRAM-SHA-512","password":"pw2","username":"bob"}""")
      .status === 200)
    val list = m.readTree(s.handle("GET", "/v1/security/users").body)
    assert((0 until list.size()).map(list.get(_).asText()) === Seq("alice", "bob"))
    // update: no-op, real change, unknown user
    assert(s.handle("PUT", "/v1/security/users/alice",
      Some("""{"algorithm":"SCRAM-SHA-256","password":"pw1"}""")).status === 200)
    assert(s.handle("PUT", "/v1/security/users/alice",
      Some("""{"algorithm":"SCRAM-SHA-256","password":"pw9"}""")).status === 200)
    val missing = s.handle("PUT", "/v1/security/users/nobody",
      Some("""{"algorithm":"SCRAM-SHA-256","password":"x"}"""))
    assert(missing.status === 500)
    assert(m.readTree(missing.body).get("message").asText() ===
      "Unexpected cluster error: User does not exist")
    // delete is idempotent
    assert(s.handle("DELETE", "/v1/security/users/bob").status === 200)
    assert(s.handle("DELETE", "/v1/security/users/bob").status === 200)
    val after = m.readTree(s.handle("GET", "/v1/security/users").body)
    assert(after.size() === 1)
  }

  test("security roles: CRUD, membership diff, and the role_errc ladder") {
    val s = freshServer()
    // create: 201 with {role}; idempotent while empty; malformed bodies
    val created = s.handle("POST", "/v1/security/roles", Some("""{"role":"ops"}"""))
    assert(created.status === 201)
    assert(m.readTree(created.body).get("role").asText() === "ops")
    assert(s.handle("POST", "/v1/security/roles", Some("""{"role":"ops"}"""))
      .status === 201)
    val noRole = s.handle("POST", "/v1/security/roles", Some("""{"x":1}"""))
    assert(noRole.status === 400)
    assert(m.readTree(noRole.body).get("code").asInt() === 40001)
    assert(m.readTree(noRole.body).get("message").asText() ===
      "Malformed request: Missing string field 'role'")
    val badName = s.handle("POST", "/v1/security/roles", Some("""{"role":"a=b"}"""))
    assert(badName.status === 400)
    assert(m.readTree(badName.body).get("code").asInt() === 40002)
    // membership update: add two, diff reported, conflict rejected
    val upd = s.handle("POST", "/v1/security/roles/ops/members",
      Some("""{"add":[{"name":"alice","principal_type":"User"},
               {"name":"bob","principal_type":"User"}]}"""))
    assert(upd.status === 200)
    val uj = m.readTree(upd.body)
    assert(uj.get("added").size() === 2 && uj.get("removed").size() === 0)
    assert(!uj.get("created").asBoolean())
    // re-adding an existing member reports an empty diff
    val noop = m.readTree(s.handle("POST", "/v1/security/roles/ops/members",
      Some("""{"add":[{"name":"alice","principal_type":"User"}]}""")).body)
    assert(noop.get("added").size() === 0)
    val conflict = s.handle("POST", "/v1/security/roles/ops/members",
      Some("""{"add":[{"name":"x","principal_type":"User"}],
               "remove":[{"name":"x","principal_type":"User"}]}"""))
    assert(conflict.status === 400)
    assert(m.readTree(conflict.body).get("code").asInt() === 40004)
    val badPrincipal = s.handle("POST", "/v1/security/roles/ops/members",
      Some("""{"add":[{"name":"g1","principal_type":"Group"}]}"""))
    assert(badPrincipal.status === 400)
    assert(m.readTree(badPrincipal.body).get("message").asText() ===
      "Malformed request: Role membership reserved for user principals, got {Group:g1}")
    // unknown role 40401 unless ?create=true
    assert(m.readTree(s.handle("POST", "/v1/security/roles/new1/members",
      Some("""{"add":[]}""")).body).get("code").asInt() === 40401)
    val createdVia = m.readTree(s.handle("POST",
      "/v1/security/roles/new1/members?create=true",
      Some("""{"add":[{"name":"carol","principal_type":"User"}]}""")).body)
    assert(createdVia.get("created").asBoolean())
    // get / members / list with filters
    val got = m.readTree(s.handle("GET", "/v1/security/roles/ops").body)
    assert(got.get("name").asText() === "ops")
    assert(got.get("members").size() === 2)
    assert(got.get("members").get(0).get("principal_type").asText() === "User")
    assert(m.readTree(s.handle("GET", "/v1/security/roles/ops/members").body)
      .get("members").size() === 2)
    assert(s.handle("GET", "/v1/security/roles/nope").status === 404)
    val all = m.readTree(s.handle("GET", "/v1/security/roles").body)
    assert(all.get("roles").size() === 2)
    assert(m.readTree(s.handle("GET", "/v1/security/roles?principal=carol").body)
      .get("roles").size() === 1)
    assert(m.readTree(s.handle(
      "GET", "/v1/security/roles?principal_type=Group").body)
      .get("code").asInt() === 40001)
    // the authenticated principal's own roles
    assert(m.readTree(s.handle("GET", "/v1/security/users/roles", None,
      principal = "alice").body).get("roles").size() === 1)
    // delete: 204, idempotent
    assert(s.handle("DELETE", "/v1/security/roles/ops").status === 204)
    assert(s.handle("DELETE", "/v1/security/roles/ops").status === 204)
    assert(s.handle("GET", "/v1/security/roles/ops").status === 404)
  }

  test("partition replica moves: validation ladder, reconfigurations, cancel") {
    val s = freshServer()
    def setReplicas(p: String, body: String) =
      s.handle("POST", s"/v1/partitions/kafka/events/$p/replicas", Some(body))
    // validation ladder (partition.cc:384 validate_set_replicas)
    assert(m.readTree(s.handle("POST",
      "/v1/partitions/redpanda/controller/0/replicas", Some("[]")).body)
      .get("message").asText() === "Can't reconfigure a controller")
    assert(m.readTree(setReplicas("0", """{"x":1}""").body)
      .get("message").asText() === "Expected array")
    assert(m.readTree(setReplicas("0",
      """[{"node_id":"a","core":0}]""").body)
      .get("message").asText() === "`node_id` and `core` must be integers")
    assert(m.readTree(setReplicas("0",
      """[{"node_id":9,"core":0}]""").body).get("message").asText() ===
      "Replica set refers to non-existent node/shard (node 9 shard 0)")
    assert(m.readTree(setReplicas("0",
      """[{"node_id":0,"core":0},{"node_id":0,"core":1}]""").body)
      .get("message").asText() ===
      "All the replicas must be placed on separate nodes. Requested " +
        "replica set contains node: 0 more than once")
    // no-op change short-circuits; a real move registers a reconfiguration
    assert(setReplicas("0",
      """[{"node_id":0,"core":0},{"node_id":1,"core":0},{"node_id":2,"core":0}]""")
      .status === 200)
    assert(m.readTree(s.handle("GET", "/v1/partitions/reconfigurations").body)
      .size() === 0) // no-op did not register
    assert(setReplicas("0",
      """[{"node_id":0,"core":0},{"node_id":1,"core":0}]""").status === 200)
    val rec = m.readTree(s.handle("GET", "/v1/partitions/reconfigurations").body)
    assert(rec.size() === 1)
    assert(rec.get(0).get("previous_replicas").size() === 3)
    assert(rec.get(0).get("current_replicas").size() === 2)
    assert(rec.get(0).get("reconfiguration_policy").asText() ===
      "full_local_retention")
    assert(rec.get(0).get("bytes_left_to_move").asLong() ===
      rec.get(0).get("partition_size").asLong())
    // topic listing reflects the new assignment and in-progress status
    val tp = m.readTree(s.handle("GET", "/v1/partitions/kafka/events").body)
    assert(tp.size() === 2)
    assert(tp.get(0).get("replicas").size() === 2)
    assert(tp.get(0).get("status").asText() === "in_progress")
    assert(tp.get(1).get("status").asText() === "done")
    assert(s.handle("GET", "/v1/partitions/kafka/nope").status === 404)
    // local summary counts the in-flight move as under-replication
    val sum = m.readTree(s.handle("GET", "/v1/partitions/local_summary").body)
    assert(sum.get("count").asInt() === 3)
    assert(sum.get("leaderless").asInt() === 0)
    assert(sum.get("under_replicated").asInt() === 1)
    // cancel restores the previous assignment; a second cancel 400s
    assert(s.handle("POST",
      "/v1/partitions/kafka/events/0/cancel_reconfiguration").status === 200)
    assert(m.readTree(s.handle("GET", "/v1/partitions/kafka/events").body)
      .get(0).get("replicas").size() === 3)
    assert(m.readTree(s.handle("POST",
      "/v1/partitions/kafka/events/0/cancel_reconfiguration").body)
      .get("message").asText() ===
      "Cannot cancel partition move operation as there is no move in progress")
    // finish path: backend completion keeps the target
    assert(setReplicas("1", """[{"node_id":2,"core":0}]""").status === 200)
    s.finishReconfiguration("kafka", "events", 1)
    assert(m.readTree(s.handle("GET", "/v1/partitions/reconfigurations").body)
      .size() === 0)
    assert(m.readTree(s.handle("GET", "/v1/partitions/kafka/events").body)
      .get(1).get("replicas").size() === 1)
    // unclean abort: in-progress required, controller refused
    assert(setReplicas("1", """[{"node_id":0,"core":0}]""").status === 200)
    assert(s.handle("POST",
      "/v1/partitions/kafka/events/1/unclean_abort_reconfiguration")
      .status === 200)
    assert(m.readTree(s.handle("POST",
      "/v1/partitions/redpanda/controller/0/unclean_abort_reconfiguration")
      .body).get("message").asText() ===
      "Can't unclean abort controller reconfiguration")
    assert(s.handle("POST", "/v1/partitions/rebalance").status === 200)
  }

  test("data migrations: FSM ladder, mount/unmount, mountable listing") {
    val s = new AdminApi.Server(nodeIds = Seq(0, 1, 2),
      mountableTopics = () => Seq(
        ("kafka", "orders", "orders/00000000-0000-4000-8000-000000000001/21")))
    // creation is gated on cloud storage (data_migration_table.cc:231)
    val gated = s.handle("PUT", "/v1/migrations", Some(
      """{"migration_type":"outbound","topics":[{"topic":"events"}],
         "consumer_groups":[]}"""))
    assert(gated.status === 400)
    assert(m.readTree(gated.body).get("message").asText() ===
      "Data migrations are disabled for this cluster")
    assert(s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"cloud_storage_enabled":true},"remove":[]}"""))
      .status === 200)
    // add: schema validation then id assignment
    val bad = s.handle("PUT", "/v1/migrations", Some("""{"migration_type":"x"}"""))
    assert(bad.status === 400)
    assert(m.readTree(bad.body).get("message").asText()
      .startsWith("JSON request body does not conform to schema"))
    val created = s.handle("PUT", "/v1/migrations", Some(
      """{"migration_type":"outbound","topics":[{"topic":"events"}],
         "consumer_groups":["cg1"]}"""))
    assert(created.status === 200)
    val id = m.readTree(created.body).get("id").asLong()
    // get: full state shape
    val got = m.readTree(s.handle("GET", s"/v1/migrations/$id").body)
    assert(got.get("state").asText() === "planned")
    assert(got.get("migration").get("migration_type").asText() === "outbound")
    assert(got.get("migration").get("topics").get(0).get("topic").asText() === "events")
    assert(got.get("migration").get("consumer_groups").get(0).asText() === "cg1")
    assert(!got.get("migration").get("auto_advance").asBoolean())
    assert(got.get("created_timestamp").asLong() > 0)
    assert(!got.has("completed_timestamp"))
    // the action ladder: only valid FSM moves are accepted
    def act(a: String) = s.handle("POST", s"/v1/migrations/$id?action=$a")
    assert(m.readTree(act("execute").body).get("message").asText() ===
      "Invalid data migration state transition requested") // planned !> executing
    assert(act("prepare").status === 200)                  // planned > preparing
    s.advanceMigration(id)                                 // backend: prepared
    assert(m.readTree(s.handle("GET", s"/v1/migrations/$id").body)
      .get("state").asText() === "prepared")
    assert(act("execute").status === 200)
    s.advanceMigration(id)                                 // executed
    assert(act("finish").status === 200)                   // executed > cut_over
    // delete refused while non-terminal; allowed once finished
    assert(s.handle("DELETE", s"/v1/migrations/$id").status === 400)
    s.advanceMigration(id)                                 // finished
    val fin = m.readTree(s.handle("GET", s"/v1/migrations/$id").body)
    assert(fin.get("state").asText() === "finished")
    assert(fin.has("completed_timestamp"))
    assert(s.handle("DELETE", s"/v1/migrations/$id").status === 200)
    assert(s.handle("GET", s"/v1/migrations/$id").status === 404)
    // unknown action / bad id
    assert(m.readTree(s.handle("POST", "/v1/migrations/1?action=jump").body)
      .get("message").asText() === "unknown data migration action: jump")
    assert(s.handle("GET", "/v1/migrations/zap").status === 400)
    // topic mount/unmount ride auto-advancing migrations
    val mnt = s.handle("POST", "/v1/topics/mount", Some(
      """{"topics":[{"source_topic_reference":{"topic":"orders"},
         "alias":{"topic":"orders2"}}]}"""))
    assert(mnt.status === 200)
    val mid = m.readTree(mnt.body).get("id").asLong()
    val mMig = m.readTree(s.handle("GET", s"/v1/migrations/$mid").body)
    assert(mMig.get("migration").get("migration_type").asText() === "inbound")
    assert(mMig.get("migration").get("auto_advance").asBoolean())
    assert(mMig.get("migration").get("topics").get(0)
      .get("source_topic_reference").get("topic").asText() === "orders")
    assert(mMig.get("migration").get("topics").get(0)
      .get("alias").get("topic").asText() === "orders2")
    val umnt = s.handle("POST", "/v1/topics/unmount", Some(
      """{"topics":[{"topic":"orders2","ns":"kafka"}]}"""))
    assert(umnt.status === 200)
    // cancel path: planned > preparing > canceling > cancelled
    val c = m.readTree(s.handle("PUT", "/v1/migrations", Some(
      """{"migration_type":"outbound","topics":[{"topic":"t2"}],
         "consumer_groups":[]}""")).body).get("id").asLong()
    assert(s.handle("POST", s"/v1/migrations/$c?action=prepare").status === 200)
    assert(s.handle("POST", s"/v1/migrations/$c?action=cancel").status === 200)
    s.advanceMigration(c)
    assert(m.readTree(s.handle("GET", s"/v1/migrations/$c").body)
      .get("state").asText() === "cancelled")
    // mountable listing renders manifest-path rows
    val mtbl = m.readTree(s.handle("GET", "/v1/topics/mountable").body)
    assert(mtbl.get("topics").size() === 1)
    assert(mtbl.get("topics").get(0).get("topic_location").asText() ===
      "orders/00000000-0000-4000-8000-000000000001/21")
    // list carries every live migration
    assert(m.readTree(s.handle("GET", "/v1/migrations").body).size() === 3)
  }

  test("transforms: enable gate, deploy validation, list/patch/delete, offsets") {
    val s = freshServer()
    // every transform route is gated until data_transforms_enabled
    val gated = s.handle("GET", "/v1/transform")
    assert(gated.status === 400)
    assert(m.readTree(gated.body).get("message").asText() ===
      "data transforms disabled - use `rpk cluster config set " +
        "data_transforms_enabled true` to enable")
    assert(s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"data_transforms_enabled":true},"remove":[]}"""))
      .status === 200)
    // deploy: metadata JSON immediately followed by the wasm binary
    val meta = """{"name":"mirror","input_topic":"events",""" +
      """"output_topics":["events_out"],""" +
      """"environment":[{"key":"MODE","value":"upper"}],"compression":"lz4"}"""
    assert(s.handle("POST", "/v1/transform/deploy",
      Some(meta + "\u0000asm-binary-bytes")).status === 200)
    // validation ladder
    assert(m.readTree(s.handle("POST", "/v1/transform/deploy",
      Some("""{"name":"x","input_topic":"t"}""")).body)
      .get("message").asText()
      .startsWith("invalid JSON request body"))     // missing output_topics
    assert(m.readTree(s.handle("POST", "/v1/transform/deploy",
      Some("""{"name":"x","input_topic":"t","output_topics":["o"],"nope":1}x"""))
      .body).get("message").asText()
      .startsWith("invalid JSON request body"))     // additionalProperties
    val badOff = s.handle("POST", "/v1/transform/deploy",
      Some("""{"name":"x","input_topic":"t","output_topics":["o"],""" +
        """"offset":{"format":"from_start","value":-3}}bin"""))
    assert(m.readTree(badOff.body).get("message").asText() ===
      "Bad offset: expected value >= 0, got -3")
    // list: transform_metadata shape with per-partition status rows
    val listed = m.readTree(s.handle("GET", "/v1/transform").body)
    assert(listed.size() === 1)
    val t0 = listed.get(0)
    assert(t0.get("name").asText() === "mirror")
    assert(t0.get("input_topic").asText() === "events")
    assert(t0.get("output_topics").get(0).asText() === "events_out")
    assert(t0.get("environment").get(0).get("key").asText() === "MODE")
    assert(t0.get("compression").asText() === "lz4")
    assert(t0.get("status").size() === 2) // events has 2 partitions
    assert(t0.get("status").get(0).get("status").asText() === "running")
    // patch: pause flips status; empty patch is a no-op even for unknown
    assert(s.handle("PUT", "/v1/transform/mirror/meta",
      Some("""{"is_paused":true}""")).status === 200)
    assert(m.readTree(s.handle("GET", "/v1/transform").body)
      .get(0).get("status").get(0).get("status").asText() === "inactive")
    assert(s.handle("PUT", "/v1/transform/ghost/meta", Some("{}")).status === 200)
    val ghostPatch = s.handle("PUT", "/v1/transform/ghost/meta",
      Some("""{"is_paused":true}"""))
    assert(ghostPatch.status === 400)
    assert(m.readTree(ghostPatch.body).get("message").asText() ===
      "Transform does not exist")
    // committed offsets: hidden for deleted transforms unless show_unknown
    s.commitTransformOffset("mirror", 0, 41L)
    s.commitTransformOffset("mirror", 1, 7L)
    val offs = m.readTree(s.handle(
      "GET", "/v1/transform/debug/committed_offsets").body)
    assert(offs.size() === 2)
    assert(offs.get(0).get("transform_name").asText() === "mirror")
    assert(offs.get(0).get("offset").asLong() === 41L)
    assert(s.handle("DELETE", "/v1/transform/mirror").status === 200)
    assert(m.readTree(s.handle("DELETE", "/v1/transform/mirror").body)
      .get("message").asText() === "Transform does not exist")
    assert(m.readTree(s.handle(
      "GET", "/v1/transform/debug/committed_offsets").body).size() === 0)
    assert(m.readTree(s.handle(
      "GET", "/v1/transform/debug/committed_offsets?show_unknown=true").body)
      .size() === 2)
    assert(s.handle("POST",
      "/v1/transform/debug/committed_offsets/garbage_collect").status === 200)
    assert(m.readTree(s.handle(
      "GET", "/v1/transform/debug/committed_offsets?show_unknown=true").body)
      .size() === 0)
  }

  test("debug: stress-fiber validation ladder in reference order") {
    val s = freshServer()
    def msg(r: Resp) = m.readTree(r.body).get("message").asText()
    val r1 = s.handle("PUT",
      "/v1/debug/stress_fiber_start?min_spins_per_scheduling_point=10")
    assert(r1.status === 400)
    assert(msg(r1) === "Expected 'max_spins_per_scheduling_point' set " +
      "with 'min_spins_per_scheduling_point'")
    val r2 = s.handle("PUT", "/v1/debug/stress_fiber_start")
    assert(msg(r2) === "Expected either spins or delay to be defined")
    val r3 = s.handle("PUT", "/v1/debug/stress_fiber_start" +
      "?min_spins_per_scheduling_point=9&max_spins_per_scheduling_point=3")
    assert(msg(r3) ===
      "Invalid parameter 'max_spins_per_scheduling_point' value is too low: 3 < 9")
    val r4 = s.handle("PUT", "/v1/debug/stress_fiber_start" +
      "?min_ms_per_scheduling_point=z&max_ms_per_scheduling_point=5")
    assert(msg(r4) === "Invalid parameter 'min_ms_per_scheduling_point' value {z}")
    assert(s.handle("PUT", "/v1/debug/stress_fiber_start" +
      "?min_ms_per_scheduling_point=1&max_ms_per_scheduling_point=5")
      .status === 200)
    assert(s.handle("PUT", "/v1/debug/stress_fiber_stop").status === 200)
  }

  test("debug: leaders table tracks transfers and reset clears hints") {
    val s = freshServer()
    val before = m.readTree(
      s.handle("GET", "/v1/debug/partition_leaders_table").body)
    assert(before.size() === 3)
    assert(before.get(0).get("previous_leader").asInt() === -1)
    s.handle("POST", "/v1/partitions/kafka/events/0/transfer_leadership?target=2")
    val after = m.readTree(
      s.handle("GET", "/v1/debug/partition_leaders_table").body)
    assert(after.get(0).get("leader").asInt() === 2)
    assert(after.get(0).get("previous_leader").asInt() === 0)
    assert(after.get(0).get("update_term").asLong() === 2L)
    s.handle("POST", "/v1/debug/reset_leaders")
    assert(m.readTree(s.handle("GET", "/v1/debug/partition_leaders_table").body)
      .get(0).get("previous_leader").asInt() === -1)
  }

  test("debug: peer status, isolation, controller status") {
    val s = freshServer()
    assert(m.readTree(s.handle("GET", "/v1/debug/peer_status/abc").body)
      .get("message").asText() === "Broker id: abc, must be an integer")
    assert(m.readTree(s.handle("GET", "/v1/debug/peer_status/7").body)
      .get("message").asText() === "Unknown node with id 7")
    assert(m.readTree(s.handle("GET", "/v1/debug/peer_status/2").body)
      .get("since_last_status").asLong() === 102L)
    assert(s.handle("GET", "/v1/debug/is_node_isolated").body === "false")
    val cs = m.readTree(s.handle("GET", "/v1/debug/controller_status").body)
    assert(cs.get("start_offset").asLong() === 0L)
    assert(cs.get("last_applied_offset").asLong() ===
      cs.get("committed_index").asLong())
  }

  test("debug: profiles validate shard ids; disk stats apply overrides") {
    val s = freshServer()
    assert(m.readTree(
      s.handle("GET", "/v1/debug/sampled_memory_profile?shard=9").body)
      .get("message").asText() === "Shard id too high, max shard id is 1")
    assert(m.readTree(
      s.handle("GET", "/v1/debug/sampled_memory_profile").body).size() === 2)
    assert(m.readTree(
      s.handle("GET", "/v1/debug/cpu_profile?wait_ms=990000").body)
      .get("message").asText() === "wait_ms must be between 1ms and 15min")
    assert(m.readTree(s.handle("GET", "/v1/debug/cpu_profile?shard=1").body)
      .get(0).get("shard_id").asInt() === 1)
    assert(m.readTree(s.handle("GET", "/v1/debug/storage/disk_stat/ssd").body)
      .get("message").asText() === "Unknown disk type: ssd")
    val before = m.readTree(
      s.handle("GET", "/v1/debug/storage/disk_stat/cache").body)
    assert(before.get("total_bytes").asLong() > 0)
    assert(s.handle("PUT", "/v1/debug/storage/disk_stat/cache",
      Some("""{"free_bytes":123,"free_bytes_delta":7}""")).status === 200)
    val after = m.readTree(
      s.handle("GET", "/v1/debug/storage/disk_stat/cache").body)
    assert(after.get("free_bytes").asLong() === 130L)
    // schema: unexpected field rejected before the type resolves
    val bad = s.handle("PUT", "/v1/debug/storage/disk_stat/ssd",
      Some("""{"fs":"ext4"}"""))
    assert(bad.status === 400)
    assert(m.readTree(bad.body).get("message").asText()
      .startsWith("JSON request body does not conform to schema"))
  }

  test("debug: offset translator ladder routes through the hook") {
    val table = Map(3L -> 1L, 4L -> 2L) // rp -> kafka
    val inv = table.map(_.swap)
    val s = new Server(nodeIds = Seq(0),
      offsetTranslator = (ns, topic, p) =>
        if (ns == "kafka" && topic == "t" && p == 0)
          Some((off, toKafka) =>
            if (toKafka) table.get(off).map(k => (k, off))
            else inv.get(off).map(rp => (off, rp)))
        else None)
    def msg(r: Resp) = m.readTree(r.body).get("message").asText()
    assert(msg(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/t/0?translate_to=x",
      Some("[1]"))) ===
      "'translate_to' parameter must be one of either kafka or redpanda")
    assert(msg(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/ghost/0", Some("[1]"))) ===
      "ntp {kafka/ghost/0} could not be found on the node")
    assert(msg(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/t/0", Some("17"))) ===
      "Request body must be JSON array of integers")
    assert(msg(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/t/0", Some("[1.5]"))) ===
      "Offsets must all be integers")
    val ok = m.readTree(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/t/0", Some("[3,4]")).body)
    assert(ok.get(0).get("kafka_offset").asLong() === 1L)
    assert(ok.get(1).get("rp_offset").asLong() === 4L)
    val rev = m.readTree(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/t/0?translate_to=redpanda",
      Some("[2]")).body)
    assert(rev.get(0).get("rp_offset").asLong() === 4L)
    assert(msg(s.handle("GET",
      "/v1/debug/storage/offset_translator/kafka/t/0", Some("[99]"))) ===
      "Offset provided 99 was out of offset translator range")
  }

  test("debug: broker uuid override gates on the current uuid") {
    val s = freshServer()
    val cur = m.readTree(s.handle("GET", "/v1/debug/broker_uuid").body)
    assert(cur.get("node_id").asInt() === 0)
    val uuid = cur.get("node_uuid").asText()
    val mismatch = s.handle("PUT", "/v1/debug/broker_uuid", Some(
      s"""{"current_node_uuid":"99999999-9999-4999-8999-999999999999",""" +
        s""""new_node_uuid":"22222222-2222-4222-8222-000000000002","new_node_id":4}"""))
    assert(mismatch.status === 400)
    assert(m.readTree(mismatch.body).get("message").asText() ===
      s"Requested current node UUID: $uuid does not match node UUID: " +
        "99999999-9999-4999-8999-999999999999")
    val neg = s.handle("PUT", "/v1/debug/broker_uuid", Some(
      s"""{"current_node_uuid":"$uuid","new_node_uuid":""" +
        s""""22222222-2222-4222-8222-000000000002","new_node_id":-2}"""))
    assert(m.readTree(neg.body).get("message").asText() ===
      "node_id must not be negative")
    assert(s.handle("PUT", "/v1/debug/broker_uuid", Some(
      s"""{"current_node_uuid":"$uuid","new_node_uuid":""" +
        s""""22222222-2222-4222-8222-000000000002","new_node_id":4}"""))
      .status === 200)
    val after = m.readTree(s.handle("GET", "/v1/debug/broker_uuid").body)
    assert(after.get("node_uuid").asText() ===
      "22222222-2222-4222-8222-000000000002")
    assert(after.get("node_id").asInt() === 4)
  }

  test("recovery: routes only exist in recovery mode; migrate flips status") {
    val normal = new Server(nodeIds = Seq(0))
    assert(normal.handle("GET", "/v1/recovery/migrate_tx_manager").status === 404)
    val s = new Server(nodeIds = Seq(0), recoveryMode = true)
    val st = m.readTree(s.handle("GET", "/v1/recovery/migrate_tx_manager").body)
    assert(st.get("required").asBoolean())
    assert(!st.get("in_progress").asBoolean())
    s.setTxMigratorError(Some("no quorum"))
    val fail = s.handle("POST", "/v1/recovery/migrate_tx_manager")
    assert(fail.status === 503)
    assert(m.readTree(fail.body).get("message").asText() ===
      "Migration error: no quorum")
    s.setTxMigratorError(None)
    assert(s.handle("POST", "/v1/recovery/migrate_tx_manager").status === 200)
    assert(!m.readTree(s.handle("GET", "/v1/recovery/migrate_tx_manager").body)
      .get("required").asBoolean())
  }

  test("transactions: gate + coordinator partition ladder") {
    val off = new Server(nodeIds = Seq(0), transactionsEnabled = false)
    assert(m.readTree(off.handle("GET",
      "/v1/transactions?coordinator_partition_id=0").body)
      .get("message").asText() === "Transaction are disabled")
    val s = freshServer()
    val fc = m.readTree(
      s.handle("GET", "/v1/transaction/my-tx/find_coordinator").body)
    assert(fc.get("ec").asInt() === 0)
    assert(fc.get("ntp").get("ns").asText() === "kafka_internal")
    assert(fc.get("ntp").get("topic").asText() === "tx")
    assert(m.readTree(s.handle("POST",
      "/v1/transaction/my-tx/delete_partition?etag=zz").body)
      .get("message").asText() === "Etag must be an integer: zz")
    assert(m.readTree(s.handle("POST",
      "/v1/partitions/kafka/events/0/mark_transaction_expired?id=1&epoch=zz")
      .body).get("message").asText() === "Invalid producer epoch: zz")
  }

  test("cluster extras: cancel moves restore assignments; majority lost") {
    val s = freshServer()
    s.handle("POST", "/v1/partitions/kafka/events/0/replicas",
      Some("""[{"node_id":0,"core":0},{"node_id":1,"core":0}]"""))
    val res = m.readTree(
      s.handle("POST", "/v1/brokers/2/cancel_partition_moves").body)
    assert(res.size() === 1)
    assert(res.get(0).get("result").asText() === "Success")
    assert(m.readTree(s.handle("GET", "/v1/partitions/kafka/events").body)
      .get(0).get("replicas").size() === 3)
    val lost = m.readTree(
      s.handle("GET", "/v1/partitions/majority_lost?dead_nodes=2").body)
    // only audit/0 (replicas = [2]) loses its majority to node 2 alone
    assert(lost.size() === 1)
    assert(lost.get(0).get("ntp").get("topic").asText() === "audit")
    val uuids = m.readTree(s.handle("GET", "/v1/broker_uuids").body)
    assert(uuids.size() === 3)
    assert(m.readTree(s.handle("GET", "/v1/cluster_view").body)
      .get("brokers").size() === 3)
  }

  test("license: put ladder, read-back, enterprise violation flip") {
    val s = freshServer()
    assert(!m.readTree(s.handle("GET", "/v1/features/license").body)
      .get("loaded").asBoolean())
    assert(m.readTree(s.handle("PUT", "/v1/features/license", Some("")).body)
      .get("message").asText() === "Missing redpanda license from request body")
    assert(m.readTree(s.handle("PUT", "/v1/features/license", Some("junk")).body)
      .get("message").asText() === "License is malformed: junk")
    s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"cloud_storage_enabled":true},"remove":[]}"""))
    val before = m.readTree(s.handle("GET", "/v1/features/enterprise").body)
    assert(before.get("license_status").asText() === "not_present")
    assert(before.get("violation").asBoolean())
    assert(s.handle("PUT", "/v1/features/license",
      Some("acme:enterprise:1800000000")).status === 200)
    val lic = m.readTree(s.handle("GET", "/v1/features/license").body)
    assert(lic.get("loaded").asBoolean())
    assert(lic.get("license").get("org").asText() === "acme")
    assert(lic.get("license").get("sha256").asText().length === 64)
    val after = m.readTree(s.handle("GET", "/v1/features/enterprise").body)
    assert(after.get("license_status").asText() === "valid")
    assert(!after.get("violation").asBoolean())
    // feature list carries the full license_required_feature set
    assert(after.get("features").size() === 11)
  }

  test("cloud storage: recovery gates, lifecycle, hooks route through") {
    var trimArgs: (Option[Long], Option[Long]) = (None, None)
    val s = new Server(nodeIds = Seq(0, 1),
      cloudManifest = (t, p) =>
        if (t == "logs" && p == 0) Some("""{"segments":[]}""") else None,
      cloudAnomalies = (_, t, _) =>
        if (t == "logs") Some(Map("missing_segments" -> 2L)) else None,
      cacheTrim = (b, o) => { trimArgs = (b, o); (100L, 5L) })
    s.addPartition("kafka", "logs", 0, leader = 0, replicas = Seq(0, 1))
    assert(m.readTree(
      s.handle("POST", "/v1/cloud_storage/topic_recovery").body)
      .get("message").asText() ===
      "Topic recovery is not available. is cloud storage enabled?")
    s.handle("PUT", "/v1/cluster_config",
      Some("""{"upsert":{"cloud_storage_enabled":true},"remove":[]}"""))
    assert(s.handle("POST", "/v1/cloud_storage/topic_recovery").status === 202)
    assert(s.handle("POST", "/v1/cloud_storage/topic_recovery").status === 409)
    assert(s.handle("POST", "/v1/cloud_storage/automated_recovery").status === 202)
    assert(m.readTree(
      s.handle("GET", "/v1/cloud_storage/automated_recovery").body)
      .get("state").asText() === "recovery_stage::initialized")
    assert(s.handle("GET", "/v1/cloud_storage/manifest/logs/0").body ===
      """{"segments":[]}""")
    assert(m.readTree(
      s.handle("GET", "/v1/cloud_storage/manifest/logs/1").body)
      .get("code").asInt() === 404)
    s.addLifecycleMarker("kafka", "gone", 9L)
    assert(m.readTree(s.handle("GET", "/v1/cloud_storage/lifecycle").body)
      .get("markers").size() === 1)
    assert(s.handle("DELETE", "/v1/cloud_storage/lifecycle/gone/9").status === 200)
    assert(m.readTree(s.handle("GET", "/v1/cloud_storage/lifecycle").body)
      .get("markers").size() === 0)
    s.handle("POST", "/v1/cloud_storage/cache/trim?bytes=50&objects=7")
    assert(trimArgs === (Some(50L), Some(7L)))
    val anom = m.readTree(
      s.handle("GET", "/v1/cloud_storage/anomalies/kafka/logs/0").body)
    assert(anom.get("missing_segments").size() === 2)
  }
}
