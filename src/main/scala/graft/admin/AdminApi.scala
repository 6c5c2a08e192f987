package graft.admin

import scala.collection.mutable
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * The broker Admin HTTP API protocol (`redpanda/admin/server.cc`
 * routes, `admin/api-doc` JSON shapes) as a pure request→response
 * function over a deterministic cluster model — the same testable
 * façade pattern as [[graft.proxy.RestProxy]] (no HTTP listener in
 * the dependency budget; the route grammar, JSON field names, status
 * codes, and error ladders are the contract an operator's tooling
 * sees).
 *
 * Covered surface (the routes rpk and operators hit daily):
 *  - brokers: list/get, maintenance enter/exit, decommission/
 *    recommission with the `throw_on_error` ladder (404 unknown
 *    broker, 400 invalid state transition — `server.cc:1040-1055`);
 *    broker JSON per `get_brokers` (`server.cc:933-1010`): node_id,
 *    num_cores, rack, membership_status, is_alive,
 *    maintenance_status{draining,finished,errors,partitions,…},
 *    version, disk_space[{path,free,total}].
 *  - cluster: health_overview (`server.cc:3619-3662` field set),
 *    cluster uuid.
 *  - cluster_config: GET (live values), GET /status (per-node
 *    config_version/restart/invalid), GET /schema (properties meta),
 *    PUT patch with upsert/remove — per-key validation errors
 *    ("Unknown property", "expected type …", "out of range: '…'")
 *    returned as a 400 JSON map exactly like
 *    `patch_cluster_config_handler` (`server.cc:1811-1989`), plus
 *    dry_run/force query params and no-op upsert version semantics.
 *  - features: GET (cluster_version + feature_state rows per
 *    `features.json`), PUT /features/{name} state transitions.
 *  - partitions: list/get (`partition.json` shapes), leadership
 *    transfer with target validation (`server.cc` raft transfer
 *    ladder: 400 non-integer/invalid target, 404 unknown).
 *  - debug/self_test: start (uuid, test selection per the start
 *    validator `server.cc:2876-2904`), stop, status node reports
 *    (status/stage strings from `self_test_rpc_types.cc:21-53`).
 *  - debug_bundle: start/status/cancel with the 409-conflict and
 *    404/410 ladder (`admin/debug_bundle.cc:73-99`,
 *    `debug_bundle/types.h:122-131` status strings).
 */
object AdminApi {

  final case class Resp(status: Int, body: String)

  private val mapper = new ObjectMapper()

  /** seastar `base_exception` JSON shape: {"message": …, "code": n}. */
  private def err(status: Int, message: String): Resp = {
    val o = mapper.createObjectNode()
    o.put("message", message); o.put("code", status)
    Resp(status, mapper.writeValueAsString(o))
  }

  /** One cluster-config property's schema row (type names are the
    * reference's `property::type_name()` strings). */
  final case class PropMeta(typeName: String, description: String,
      needsRestart: Boolean, nullable: Boolean, visibility: String)

  /** One coordinator-visible transaction (`transaction_summary` in
    * `api-doc/transaction.json`). */
  final case class TxnSummary(transactionalId: String, producerId: Long,
      producerEpoch: Short, txSeq: Long, status: String, timeoutMs: Long,
      partitions: Seq[(String, String, Int)])

  /** One metering window (`usage_response` in `api-doc/usage.json`). */
  final case class UsageWindow(beginTs: Long, endTs: Long, open: Boolean,
      bytesSent: Long, bytesReceived: Long)

  final class Server(nodeIds: Seq[Int] = Seq(0, 1, 2), clusterUuid: String =
      "00000000-0000-4000-8000-000000000001",
      // ENGINE-backed listings: the route layer renders whatever the
      // transaction coordinator / usage-metering engines currently hold
      // (bounded control-plane reads, one row per txn / window)
      transactions: () => Seq[TxnSummary] = () => Nil,
      usage: () => Seq[UsageWindow] = () => Nil) {

    // ------------------------------------------------------------ model

    private final class Broker(val id: Int, val cores: Int, val rack: String) {
      var membership: String = "active" // active | draining (decommission)
      var alive: Boolean = true
      var maintenanceDraining: Boolean = false
      val version = "v25.1.1"
      var diskFree = 750L * 1024 * 1024 * 1024
      val diskTotal = 1024L * 1024 * 1024 * 1024
    }
    private val brokers = mutable.LinkedHashMap(
      nodeIds.map(id => id -> new Broker(id, 32, s"rack-${id % 2}")): _*)

    private final case class PartitionRow(ns: String, topic: String,
        partition: Int, var leader: Int, replicas: Seq[Int])
    private val partitions = mutable.ArrayBuffer.empty[PartitionRow]

    def addPartition(ns: String, topic: String, partition: Int, leader: Int,
        replicas: Seq[Int]): Unit =
      partitions += PartitionRow(ns, topic, partition, leader, replicas)

    def setAlive(id: Int, alive: Boolean): Unit =
      brokers.get(id).foreach(_.alive = alive)

    // cluster config: schema + current values + version
    private val schema = mutable.LinkedHashMap[String, PropMeta](
      "log_retention_ms" -> PropMeta("integer",
        "Delete segments older than this age.", needsRestart = false,
        nullable = true, "user"),
      "log_segment_size" -> PropMeta("integer",
        "Default log segment size in bytes for topics.",
        needsRestart = false, nullable = false, "tunable"),
      "default_topic_replications" -> PropMeta("integer",
        "Default replication factor for new topics.", needsRestart = false,
        nullable = false, "user"),
      "enable_rack_awareness" -> PropMeta("boolean",
        "Enables rack-aware replica assignment.", needsRestart = false,
        nullable = false, "user"),
      "cloud_storage_enabled" -> PropMeta("boolean",
        "Enable archival storage.", needsRestart = true,
        nullable = false, "user"),
      "kafka_batch_max_bytes" -> PropMeta("integer",
        "Maximum size of a batch processed by the server.",
        needsRestart = false, nullable = false, "user"),
      "superusers" -> PropMeta("array",
        "List of superuser usernames.", needsRestart = false,
        nullable = false, "user"))
    private val config = mutable.LinkedHashMap[String, JsonNode](
      "log_retention_ms" -> mapper.getNodeFactory.numberNode(604800000L),
      "log_segment_size" -> mapper.getNodeFactory.numberNode(134217728L),
      "default_topic_replications" -> mapper.getNodeFactory.numberNode(1),
      "enable_rack_awareness" -> mapper.getNodeFactory.booleanNode(false),
      "cloud_storage_enabled" -> mapper.getNodeFactory.booleanNode(false),
      "kafka_batch_max_bytes" -> mapper.getNodeFactory.numberNode(1048576),
      "superusers" -> mapper.createArrayNode())
    private var configVersion = 1L
    private var pendingRestart = false

    // features (feature_state.h high-level states)
    private val features = mutable.LinkedHashMap(
      "rbac" -> ("active", true),
      "datalake_iceberg" -> ("available", false),
      "license" -> ("active", true))

    // self test
    private var selfTestJob: Option[String] = None
    private var selfTestSeq = 0
    private var selfTestTests: Seq[String] = Nil
    private var selfTestResults = Map.empty[Int, Seq[ObjectNode]]

    // debug bundle
    private var bundleJob: Option[(String, String, Long)] = None // id, status, created
    private var bundleSeq = 0

    // ---------------------------------------------------------- helpers

    private def brokerJson(b: Broker): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("node_id", b.id)
      o.put("num_cores", b.cores)
      o.put("rack", b.rack)
      o.put("membership_status", b.membership)
      o.put("is_alive", b.alive)
      val ms = o.putObject("maintenance_status")
      ms.put("draining", b.maintenanceDraining)
      if (b.maintenanceDraining) {
        val mine = partitions.count(_.leader == b.id)
        ms.put("finished", true); ms.put("errors", false)
        ms.put("partitions", partitions.count(_.replicas.contains(b.id)))
        ms.put("transferring", 0); ms.put("eligible", mine); ms.put("failed", 0)
      }
      o.put("version", b.version)
      val ds = o.putArray("disk_space")
      val d = ds.addObject()
      d.put("path", "/var/lib/redpanda/data")
      d.put("free", b.diskFree); d.put("total", b.diskTotal)
      o
    }

    private def partitionJson(p: PartitionRow): ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("ns", p.ns); o.put("topic", p.topic)
      o.put("partition_id", p.partition)
      o.put("status", "done")
      o.put("leader_id", p.leader)
      o.put("raft_group_id", partitions.indexOf(p) + 1)
      val rs = o.putArray("replicas")
      p.replicas.foreach { r =>
        val ro = rs.addObject(); ro.put("node_id", r); ro.put("core", 0)
      }
      o
    }

    /** The patch handler's early-validation pass (`server.cc:1849-1989`):
      * returns per-key error messages with the reference's wording. */
    private def validateUpsert(name: String, v: JsonNode): Option[String] =
      schema.get(name) match {
        case None => Some("Unknown property")
        case Some(meta) => meta.typeName match {
          case "integer" =>
            if (v.isNull && meta.nullable) None
            else if (!v.isNumber && !(v.isTextual && v.asText().forall(c =>
              c.isDigit || c == '-'))) Some("expected type integer")
            else {
              val n = if (v.isNumber) v.asLong() else v.asText().toLong
              // int32-sized knobs reject out-of-range values with the
              // reference's magic-string message
              if (name != "log_retention_ms" && name != "log_segment_size" &&
                  (n > Int.MaxValue || n < Int.MinValue))
                Some(s"out of range: '$n'")
              else None
            }
          case "boolean" =>
            if (v.isBoolean) None else Some("expected type boolean")
          case "array" =>
            if (v.isArray) None else Some("expected type array")
          case _ => None
        }
      }

    // ------------------------------------------------------------ routes

    def handle(method: String, path: String, body: Option[String] = None): Resp = {
      val parts = path.stripPrefix("/").split("\\?")(0).split("/").toList
      val query = if (path.contains("?")) path.split("\\?")(1) else ""
      def qp(name: String): Option[String] =
        query.split("&").find(_.startsWith(name + "="))
          .map(_.substring(name.length + 1))
      def qflag(name: String): Boolean = qp(name).contains("true")

      (method, parts) match {
        // ------------------------------------------------------- brokers
        case ("GET", "v1" :: "brokers" :: Nil) =>
          val a = mapper.createArrayNode()
          brokers.values.foreach(b => a.add(brokerJson(b)))
          Resp(200, mapper.writeValueAsString(a))

        case ("GET", "v1" :: "brokers" :: id :: Nil) =>
          brokers.get(id.toInt) match {
            case None => err(404, s"broker with id $id not found")
            case Some(b) => Resp(200, mapper.writeValueAsString(brokerJson(b)))
          }

        case ("PUT", "v1" :: "brokers" :: id :: "maintenance" :: Nil) =>
          brokers.get(id.toInt) match {
            case None => err(404, s"broker with id $id not found")
            case Some(b) if b.membership != "active" =>
              err(400, s"can not update broker $id state, invalid state transition")
            case Some(b) => b.maintenanceDraining = true; Resp(200, "{}")
          }

        case ("DELETE", "v1" :: "brokers" :: id :: "maintenance" :: Nil) =>
          brokers.get(id.toInt) match {
            case None => err(404, s"broker with id $id not found")
            case Some(b) => b.maintenanceDraining = false; Resp(200, "{}")
          }

        case ("PUT", "v1" :: "brokers" :: id :: "decommission" :: Nil) =>
          brokers.get(id.toInt) match {
            case None => err(404, s"broker with id $id not found")
            case Some(b) if b.membership == "draining" =>
              err(400, s"can not update broker $id state, invalid state transition")
            case Some(b) => b.membership = "draining"; Resp(200, "{}")
          }

        case ("PUT", "v1" :: "brokers" :: id :: "recommission" :: Nil) =>
          brokers.get(id.toInt) match {
            case None => err(404, s"broker with id $id not found")
            case Some(b) if b.membership != "draining" =>
              err(400, s"can not update broker $id state, invalid state transition")
            case Some(b) => b.membership = "active"; Resp(200, "{}")
          }

        // ------------------------------------------------------- cluster
        case ("GET", "v1" :: "cluster" :: "health_overview" :: Nil) =>
          val down = brokers.values.filter(!_.alive).map(_.id).toSeq
          val leaderless = partitions.filter(p => down.contains(p.leader))
          val o = mapper.createObjectNode()
          o.put("is_healthy", down.isEmpty && leaderless.isEmpty)
          val reasons = o.putArray("unhealthy_reasons")
          if (down.nonEmpty) reasons.add("nodes_down")
          if (leaderless.nonEmpty) reasons.add("leaderless_partitions")
          o.put("controller_id", brokers.values.find(_.alive).map(_.id).getOrElse(-1))
          val all = o.putArray("all_nodes"); brokers.keys.foreach(all.add)
          val nd = o.putArray("nodes_down"); down.foreach(nd.add)
          o.putArray("nodes_in_recovery_mode")
          o.put("leaderless_count", leaderless.size)
          o.put("under_replicated_count", 0)
          val lp = o.putArray("leaderless_partitions")
          leaderless.foreach(p => lp.add(s"${p.ns}/${p.topic}/${p.partition}"))
          o.putArray("under_replicated_partitions")
          Resp(200, mapper.writeValueAsString(o))

        case ("GET", "v1" :: "cluster" :: "uuid" :: Nil) =>
          val o = mapper.createObjectNode()
          o.put("cluster_uuid", clusterUuid)
          Resp(200, mapper.writeValueAsString(o))

        // ------------------------------------------------ cluster config
        case ("GET", "v1" :: "cluster_config" :: Nil) =>
          val o = mapper.createObjectNode()
          config.foreach { case (k, v) => o.set[JsonNode](k, v) }
          Resp(200, mapper.writeValueAsString(o))

        case ("GET", "v1" :: "cluster_config" :: "status" :: Nil) =>
          val a = mapper.createArrayNode()
          brokers.keys.foreach { id =>
            val o = a.addObject()
            o.put("node_id", id)
            o.put("restart", pendingRestart)
            o.put("config_version", configVersion)
            o.putArray("invalid"); o.putArray("unknown")
          }
          Resp(200, mapper.writeValueAsString(a))

        case ("GET", "v1" :: "cluster_config" :: "schema" :: Nil) =>
          val o = mapper.createObjectNode()
          val props = o.putObject("properties")
          schema.foreach { case (name, m) =>
            val p = props.putObject(name)
            p.put("type", m.typeName)
            p.put("description", m.description)
            p.put("needs_restart", m.needsRestart)
            p.put("nullable", m.nullable)
            p.put("visibility", m.visibility)
          }
          Resp(200, mapper.writeValueAsString(o))

        case ("PUT", "v1" :: "cluster_config" :: Nil) =>
          val doc = mapper.readTree(body.getOrElse("{}"))
          val upsert = Option(doc.get("upsert")).filter(_.isObject)
          val remove = Option(doc.get("remove")).filter(_.isArray)
          if (upsert.isEmpty || remove.isEmpty)
            return err(400, "expected 'upsert' and 'remove' fields")
          val errors = mutable.LinkedHashMap.empty[String, String]
          val noOps = mutable.Set.empty[String]
          if (!qflag("force")) {
            upsert.get.fields().forEachRemaining { e =>
              validateUpsert(e.getKey, e.getValue) match {
                case Some(msg) => errors(e.getKey) = msg
                case None =>
                  if (config.get(e.getKey).contains(e.getValue)) noOps += e.getKey
              }
            }
            remove.get.forEach { k =>
              if (!schema.contains(k.asText())) errors(k.asText()) = "Unknown property"
            }
          }
          if (errors.nonEmpty) {
            // the reference returns the raw per-key error map as the
            // 400 body (base_exception with "json" content)
            val o = mapper.createObjectNode()
            errors.foreach { case (k, v) => o.put(k, v) }
            return Resp(400, mapper.writeValueAsString(o))
          }
          def result(v: Long): Resp = {
            val o = mapper.createObjectNode(); o.put("config_version", v)
            Resp(200, mapper.writeValueAsString(o))
          }
          if (qflag("dry_run")) return result(configVersion)
          val upsertCount = upsert.get.size()
          if (upsertCount == noOps.size && remove.get.size() == 0)
            return result(configVersion) // all no-ops: version unchanged
          upsert.get.fields().forEachRemaining { e =>
            if (schema.contains(e.getKey)) {
              config(e.getKey) = e.getValue
              if (schema(e.getKey).needsRestart) pendingRestart = true
            }
          }
          remove.get.forEach { k =>
            // reset to the built-in default (a fresh Server's value)
            config.remove(k.asText())
          }
          configVersion += 1
          result(configVersion)

        // ------------------------------------------------------ features
        case ("GET", "v1" :: "features" :: Nil) =>
          val o = mapper.createObjectNode()
          o.put("cluster_version", 13)
          o.put("original_cluster_version", 11)
          o.put("node_earliest_version", 11)
          o.put("node_latest_version", 13)
          val fs = o.putArray("features")
          features.foreach { case (name, (state, wasActive)) =>
            val f = fs.addObject()
            f.put("name", name); f.put("state", state)
            f.put("was_active", wasActive)
          }
          Resp(200, mapper.writeValueAsString(o))

        case ("PUT", "v1" :: "features" :: name :: Nil) =>
          features.get(name) match {
            case None => err(404, s"Unknown feature '$name'")
            case Some((_, wasActive)) =>
              Option(mapper.readTree(body.getOrElse("{}")).get("state"))
                .map(_.asText()) match {
                case Some("active") =>
                  features(name) = ("active", true); Resp(200, "{}")
                case Some("disabled") =>
                  features(name) = ("disabled", wasActive); Resp(200, "{}")
                case _ => err(400, "State must be 'active' or 'disabled'")
              }
          }

        // ---------------------------------------------------- partitions
        case ("GET", "v1" :: "partitions" :: Nil) =>
          val a = mapper.createArrayNode()
          partitions.foreach(p => a.add(partitionJson(p)))
          Resp(200, mapper.writeValueAsString(a))

        case ("GET", "v1" :: "partitions" :: ns :: topic :: pStr :: Nil) =>
          partitions.find(p => p.ns == ns && p.topic == topic &&
              p.partition == pStr.toInt) match {
            case None => err(404, s"Could not find ntp: {$ns/$topic/$pStr}")
            case Some(p) => Resp(200, mapper.writeValueAsString(partitionJson(p)))
          }

        case ("POST", "v1" :: "partitions" :: ns :: topic :: pStr ::
            "transfer_leadership" :: Nil) =>
          partitions.find(p => p.ns == ns && p.topic == topic &&
              p.partition == pStr.toInt) match {
            case None => err(404, s"Could not find ntp: {$ns/$topic/$pStr}")
            case Some(p) =>
              qp("target") match {
                case Some(t) if t.toIntOption.isEmpty =>
                  err(400, s"Target node id must be an integer: $t")
                case Some(t) if t.toInt < 0 =>
                  err(400, s"Invalid target node id ${t.toInt}")
                case Some(t) if !p.replicas.contains(t.toInt) =>
                  err(400, s"Node ${t.toInt} is not a replica of the partition")
                case Some(t) => p.leader = t.toInt; Resp(200, "{}")
                case None =>
                  // no target: pick the next replica deterministically
                  val others = p.replicas.filter(_ != p.leader)
                  if (others.nonEmpty) p.leader = others.min
                  Resp(200, "{}")
              }
          }

        // ----------------------------------------------------- self test
        case ("POST", "v1" :: "debug" :: "self_test" :: "start" :: Nil) =>
          val doc = mapper.readTree(body.getOrElse("null"))
          val tests =
            if (doc == null || doc.isNull || doc.get("tests") == null)
              Seq("disk", "network", "cloud") // the default run set
            else {
              val ts = doc.get("tests")
              if (!ts.isArray) return err(400, "expected tests array")
              (0 until ts.size()).map { i =>
                val t = ts.get(i).get("type")
                if (t == null) return err(400, "test entry missing 'type'")
                t.asText()
              }
            }
          val unknown = tests.filterNot(Set("disk", "network", "cloud"))
          if (unknown.nonEmpty)
            return err(400, s"unknown test type: ${unknown.head}")
          selfTestSeq += 1
          val id = f"00000000-0000-4000-8000-${selfTestSeq}%012d"
          selfTestJob = Some(id)
          selfTestTests = tests
          selfTestResults = Map.empty
          Resp(200, "\"" + id + "\"")

        case ("POST", "v1" :: "debug" :: "self_test" :: "stop" :: Nil) =>
          // stopping completes the run: deterministic per-node results
          selfTestResults = brokers.keys.map { id =>
            id -> selfTestTests.zipWithIndex.map { case (t, i) =>
              val r = mapper.createObjectNode()
              r.put("test_id", selfTestJob.getOrElse(""))
              r.put("name", s"$t check")
              r.put("test_type", t)
              r.put("duration", 5000L)
              r.put("timeouts", 0)
              r.put("p50", 100L + i); r.put("p90", 200L + i)
              r.put("p99", 400L + i); r.put("p999", 800L + i)
              r.put("max_latency", 1000L + i)
              r.put("rps", 10000L); r.put("bps", 104857600L)
              r
            }
          }.toMap
          selfTestJob = None
          Resp(200, "{}")

        case ("GET", "v1" :: "debug" :: "self_test" :: "status" :: Nil) =>
          val a = mapper.createArrayNode()
          brokers.keys.foreach { id =>
            val o = a.addObject()
            o.put("node_id", id)
            o.put("status", if (selfTestJob.isDefined) "running" else "idle")
            o.put("stage", if (selfTestJob.isDefined)
              selfTestTests.headOption.map {
                case "network" => "net"; case other => other
              }.getOrElse("idle") else "idle")
            val rs = o.putArray("results")
            selfTestResults.getOrElse(id, Nil).foreach(rs.add)
          }
          Resp(200, mapper.writeValueAsString(a))

        // -------------------------------------------------- debug bundle
        case ("POST", "v1" :: "debug_bundle" :: Nil) =>
          bundleJob match {
            case Some((_, "running", _)) =>
              val o = mapper.createObjectNode()
              o.put("code", 409)
              o.put("message", "A debug bundle process is already running")
              Resp(409, mapper.writeValueAsString(o))
            case _ =>
              bundleSeq += 1
              val id = f"10000000-0000-4000-8000-${bundleSeq}%012d"
              bundleJob = Some((id, "running", 1700000000000L + bundleSeq))
              val o = mapper.createObjectNode(); o.put("job_id", id)
              Resp(200, mapper.writeValueAsString(o))
          }

        case ("GET", "v1" :: "debug_bundle" :: job :: Nil) =>
          bundleJob match {
            case Some((id, status, created)) if id == job =>
              val o = mapper.createObjectNode()
              o.put("job_id", id); o.put("status", status)
              o.put("created", created)
              if (status == "success") {
                o.put("filename", s"$id.zip")
                o.put("file_size", 1048576L)
              }
              Resp(200, mapper.writeValueAsString(o))
            case _ =>
              val o = mapper.createObjectNode()
              o.put("code", 404)
              o.put("message", s"Job $job not found")
              Resp(404, mapper.writeValueAsString(o))
          }

        case ("DELETE", "v1" :: "debug_bundle" :: job :: Nil) =>
          bundleJob match {
            case Some((id, "running", created)) if id == job =>
              bundleJob = Some((id, "error", created)) // cancelled
              Resp(204, "")
            case Some((id, _, _)) if id == job =>
              val o = mapper.createObjectNode()
              o.put("code", 409)
              o.put("message", s"Job $job is not running")
              Resp(409, mapper.writeValueAsString(o))
            case _ =>
              val o = mapper.createObjectNode()
              o.put("code", 404)
              o.put("message", s"Job $job not found")
              Resp(404, mapper.writeValueAsString(o))
          }

        /** Marks a running bundle finished — the deterministic stand-in
          * for the external rpk process completing. */
        case ("PUT", "v1" :: "debug_bundle" :: job :: "finish" :: Nil) =>
          bundleJob match {
            case Some((id, "running", created)) if id == job =>
              bundleJob = Some((id, "success", created)); Resp(200, "{}")
            case _ => err(404, s"Job $job not running")
          }

        // -------------------------------------------- engine listings
        case ("GET", "v1" :: "transactions" :: Nil) =>
          // transaction_summary rows (api-doc/transaction.json) straight
          // from the coordinator's state table
          val a = mapper.createArrayNode()
          transactions().foreach { t =>
            val o = a.addObject()
            o.put("transactional_id", t.transactionalId)
            val pid = o.putObject("pid")
            pid.put("id", t.producerId); pid.put("epoch", t.producerEpoch.toInt)
            o.put("tx_seq", t.txSeq)
            o.put("etag", 0)
            o.put("status", t.status)
            o.put("timeout_ms", t.timeoutMs)
            o.put("staleness_ms", 0L)
            val ps = o.putArray("partitions")
            t.partitions.foreach { case (ns, topic, p) =>
              val po = ps.addObject()
              po.put("ns", ns); po.put("topic", topic)
              po.put("partition_id", p); po.put("etag", 0)
            }
            o.putArray("groups")
          }
          Resp(200, mapper.writeValueAsString(a))

        case ("GET", "v1" :: "usage" :: Nil) =>
          // usage_response windows (api-doc/usage.json), newest first —
          // the metering engine's ring in the shape rpk reads
          val a = mapper.createArrayNode()
          usage().foreach { w =>
            val o = a.addObject()
            o.put("begin_timestamp", w.beginTs / 1000) // seconds on the wire
            o.put("end_timestamp", w.endTs / 1000)
            o.put("open", w.open)
            o.put("kafka_bytes_sent_count", w.bytesSent)
            o.put("kafka_bytes_received_count", w.bytesReceived)
            o.put("cloud_storage_bytes_gauge", 0L)
          }
          Resp(200, mapper.writeValueAsString(a))

        // -------------------------------------------------------- status
        case ("GET", "v1" :: "status" :: "ready" :: Nil) =>
          Resp(200, """{"status":"ready"}""")

        case _ => err(404, s"no route for $method $path")
      }
    }
  }
}
