package graft.streaming

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.SparkSession

/**
 * The Iceberg REST catalog protocol (`iceberg/rest_catalog.cc`,
 * `iceberg/rest_client/catalog_client.cc`; route and body shapes from
 * the public Iceberg REST OpenAPI spec) as a pure request→response
 * server over the existing filesystem-table machinery
 * ([[IcebergFormat]]): namespaces, table create/load/drop, and the
 * commit conversation with REQUIREMENTS — the reference submits every
 * transaction as `commit_table_request{identifier, requirements,
 * updates}` (`rest_catalog.cc:170-182`, requirement JSON names from
 * `table_requirement_json.cc`) and maps HTTP statuses onto catalog
 * errors (`rest_catalog.cc:23-52`: 404 → not_found, 409 →
 * already_exists/commit conflict).
 *
 * Commit semantics: requirements are checked against the CURRENT
 * metadata; `assert-ref-snapshot-id` failing returns the 409
 * CommitFailedException the OCC loop keys on — the client reloads the
 * table and retries with fresh requirements, and the retry publishes
 * via [[IcebergFormat.commitStagedMany]]'s metadata-only rebase (data
 * files are never rewritten). Error bodies use the spec's
 * `{"error":{"message","type","code"}}` envelope.
 *
 * The `add-snapshot` update carries the engine's staged-append
 * descriptor (stage dir + file list) — in-process stand-in for the
 * client having already written data and manifest files to shared
 * storage, which is exactly the division of labor the REST protocol
 * assumes.
 */
object IcebergRestCatalog {

  final case class Resp(status: Int, body: String)

  private val mapper = new ObjectMapper()

  private def err(status: Int, tpe: String, message: String): Resp = {
    val o = mapper.createObjectNode()
    val e = o.putObject("error")
    e.put("message", message); e.put("type", tpe); e.put("code", status)
    Resp(status, mapper.writeValueAsString(o))
  }

  final class Server(spark: SparkSession, root: String) {

    private val namespaces = mutable.LinkedHashMap.empty[String, Map[String, String]]
    private val tables = mutable.LinkedHashSet.empty[(String, String)]

    private def pathOf(ns: String, table: String) = s"$root/$ns/$table"

    private def loadResult(ns: String, table: String): ObjectNode = {
      val path = pathOf(ns, table)
      val fs = IcebergFormat.fsOf(spark, path)
      val v = IcebergFormat.currentVersion(fs, path).get
      val json = IcebergFormat.readMetadataJson(fs, path, v)
      val snaps = IcebergFormat.parseSnapshots(json)
      val o = mapper.createObjectNode()
      o.put("metadata-location", s"$path/metadata/v$v.metadata.json")
      val md = o.putObject("metadata")
      md.put("format-version", 2)
      md.put("table-uuid",
        IcebergFormat.jsonStrField(json, "table-uuid").getOrElse(""))
      md.put("location", path)
      md.put("current-snapshot-id",
        snaps.lastOption.map(_.snapshotId).getOrElse(-1L))
      val sa = md.putArray("snapshots")
      snaps.foreach { s =>
        val sn = sa.addObject()
        sn.put("snapshot-id", s.snapshotId)
        sn.put("sequence-number", s.sequenceNumber)
        sn.put("manifest-list", s.manifestList)
      }
      val refs = md.putObject("refs")
      snaps.lastOption.foreach { s =>
        val main = refs.putObject("main")
        main.put("snapshot-id", s.snapshotId); main.put("type", "branch")
      }
      o
    }

    /** `assert-*` requirement check per `table_requirement.h:19-52`;
      * returns the CommitFailedException message on failure. */
    private def checkRequirement(ns: String, table: String,
        req: JsonNode): Option[String] = {
      val path = pathOf(ns, table)
      val fs = IcebergFormat.fsOf(spark, path)
      val cur = IcebergFormat.currentVersion(fs, path)
      req.get("type").asText() match {
        case "assert-create" =>
          if (cur.isEmpty) None
          else Some(s"Requirement failed: table already exists")
        case "assert-table-uuid" =>
          val want = req.get("uuid").asText()
          val got = cur.map(v => IcebergFormat.jsonStrField(
            IcebergFormat.readMetadataJson(fs, path, v), "table-uuid").getOrElse(""))
          if (got.contains(want)) None
          else Some(s"Requirement failed: UUID does not match: expected $want")
        case "assert-ref-snapshot-id" =>
          val ref = req.get("ref").asText()
          val want = Option(req.get("snapshot-id")).filter(!_.isNull).map(_.asLong())
          val got = cur.flatMap { v =>
            val json = IcebergFormat.readMetadataJson(fs, path, v)
            if (ref == "main")
              IcebergFormat.parseSnapshots(json).lastOption.map(_.snapshotId)
            else IcebergFormat.parseExtraRefs(json)
              .find(_.name == ref).map(_.snapshotId)
          }
          (want, got) match {
            case (w, g) if w == g => None
            case (None, Some(_)) =>
              Some(s"Requirement failed: branch $ref was created concurrently")
            case (Some(_), None) =>
              Some(s"Requirement failed: branch $ref is missing")
            case (Some(w), Some(g)) =>
              Some(s"Requirement failed: branch $ref has changed: expected id $w != $g")
          }
        case other => Some(s"Requirement failed: unsupported requirement $other")
      }
    }

    def handle(method: String, path: String, body: Option[String] = None): Resp = {
      val parts = path.stripPrefix("/").split("\\?")(0).split("/").toList
      (method, parts) match {
        case ("GET", "v1" :: "config" :: Nil) =>
          Resp(200, """{"defaults":{},"overrides":{}}""")

        // ---------------------------------------------------- namespaces
        case ("GET", "v1" :: "namespaces" :: Nil) =>
          val o = mapper.createObjectNode()
          val a = o.putArray("namespaces")
          namespaces.keys.foreach(n => a.addArray().add(n))
          Resp(200, mapper.writeValueAsString(o))

        case ("POST", "v1" :: "namespaces" :: Nil) =>
          val doc = mapper.readTree(body.getOrElse("{}"))
          val nsArr = doc.get("namespace")
          if (nsArr == null || !nsArr.isArray || nsArr.size() == 0)
            return err(400, "BadRequestException", "namespace field required")
          val ns = nsArr.get(0).asText()
          if (namespaces.contains(ns))
            return err(409, "AlreadyExistsException",
              s"Namespace already exists: $ns")
          namespaces(ns) = Map.empty
          val o = mapper.createObjectNode()
          o.putArray("namespace").add(ns)
          o.putObject("properties")
          Resp(200, mapper.writeValueAsString(o))

        case ("GET", "v1" :: "namespaces" :: ns :: Nil) =>
          if (!namespaces.contains(ns))
            err(404, "NoSuchNamespaceException", s"Namespace does not exist: $ns")
          else {
            val o = mapper.createObjectNode()
            o.putArray("namespace").add(ns)
            o.putObject("properties")
            Resp(200, mapper.writeValueAsString(o))
          }

        // -------------------------------------------------------- tables
        case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: Nil) =>
          if (!namespaces.contains(ns))
            err(404, "NoSuchNamespaceException", s"Namespace does not exist: $ns")
          else {
            val o = mapper.createObjectNode()
            val a = o.putArray("identifiers")
            tables.filter(_._1 == ns).foreach { case (_, t) =>
              val id = a.addObject()
              id.putArray("namespace").add(ns); id.put("name", t)
            }
            Resp(200, mapper.writeValueAsString(o))
          }

        case ("POST", "v1" :: "namespaces" :: ns :: "tables" :: Nil) =>
          if (!namespaces.contains(ns))
            return err(404, "NoSuchNamespaceException",
              s"Namespace does not exist: $ns")
          val doc = mapper.readTree(body.getOrElse("{}"))
          val name = Option(doc.get("name")).map(_.asText()).getOrElse(
            return err(400, "BadRequestException", "name field required"))
          if (tables.contains((ns, name)))
            return err(409, "AlreadyExistsException",
              s"Table already exists: $ns.$name")
          // schema: [[name, type], ...] — the engine-side carrier of the
          // translated schema (datalake/catalog_schema_manager.cc ensure)
          val fieldsNode = doc.get("schema")
          val fields = (0 until fieldsNode.size()).map { i =>
            val f = fieldsNode.get(i)
            org.apache.spark.sql.types.StructField(f.get(0).asText(),
              f.get(1).asText() match {
                case "long" => org.apache.spark.sql.types.LongType
                case "string" => org.apache.spark.sql.types.StringType
                case "double" => org.apache.spark.sql.types.DoubleType
                case "timestamp" => org.apache.spark.sql.types.TimestampType
                case other => throw new IllegalArgumentException(other)
              })
          }
          IcebergFormat.ensureTable(spark, pathOf(ns, name),
            org.apache.spark.sql.types.StructType(fields), fields.head.name)
          tables += ((ns, name))
          Resp(200, mapper.writeValueAsString(loadResult(ns, name)))

        case ("GET", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          if (!tables.contains((ns, t)))
            err(404, "NoSuchTableException", s"Table does not exist: $ns.$t")
          else Resp(200, mapper.writeValueAsString(loadResult(ns, t)))

        case ("DELETE", "v1" :: "namespaces" :: ns :: "tables" :: t :: Nil) =>
          if (!tables.contains((ns, t)))
            err(404, "NoSuchTableException", s"Table does not exist: $ns.$t")
          else { tables -= ((ns, t)); Resp(204, "") }

        // ------------------------------------------------------- commits
        case ("POST", "v1" :: "namespaces" :: ns :: "tables" :: t ::
            "commit" :: Nil) =>
          // spec shape: POST to the table path carries the commit; the
          // explicit /commit suffix disambiguates from create in this
          // in-process router
          if (!tables.contains((ns, t)))
            return err(404, "NoSuchTableException", s"Table does not exist: $ns.$t")
          val doc = mapper.readTree(body.getOrElse("{}"))
          val reqs = Option(doc.get("requirements")).filter(_.isArray)
            .getOrElse(return err(400, "BadRequestException",
              "requirements field required"))
          var failure: Option[String] = None
          reqs.forEach { r =>
            if (failure.isEmpty) failure = checkRequirement(ns, t, r)
          }
          failure match {
            case Some(msg) => err(409, "CommitFailedException", msg)
            case None =>
              val updates = Option(doc.get("updates")).filter(_.isArray)
                .getOrElse(return err(400, "BadRequestException",
                  "updates field required"))
              var staged = Seq.empty[IcebergFormat.StagedAppend]
              var properties = Map.empty[String, String]
              updates.forEach { u =>
                u.get("action").asText() match {
                  case "add-snapshot" =>
                    val sn = u.get("snapshot")
                    val files = sn.get("files")
                    staged = staged :+ IcebergFormat.StagedAppend(
                      sn.get("stage-dir").asText(),
                      sn.get("base-version").asInt(),
                      (0 until files.size()).map { i =>
                        val f = files.get(i)
                        (f.get(0).asText(), f.get(1).asText(), f.get(2).asLong())
                      })
                  case "set-properties" =>
                    u.get("updates").properties().forEach { e =>
                      properties += e.getKey -> e.getValue.asText()
                    }
                  case other =>
                    return err(400, "BadRequestException",
                      s"unsupported update action: $other")
                }
              }
              if (staged.isEmpty)
                return err(400, "BadRequestException", "no add-snapshot update")
              val (snapId, _) = IcebergFormat.commitStagedMany(
                spark, pathOf(ns, t), staged, properties)
              val result = loadResult(ns, t)
              result.putObject("commit").put("snapshot-id", snapId)
              Resp(200, mapper.writeValueAsString(result))
          }

        case _ => err(404, "NoSuchRouteException", s"no route for $method $path")
      }
    }
  }
}
