package graft.registry

import scala.collection.mutable
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema

/**
 * The schema registry's REST surface — the Confluent-compatible JSON
 * protocol the reference serves from
 * `pandaproxy/schema_registry/handlers.cc`, here as a pure
 * request→response function over the engine's SR algebra (sanitize +
 * global ids [[AvroCanonical]], compatibility [[SchemaRegistry]]).
 * This is how a reference user actually TALKS to the registry, so the
 * route/shape/error contract is part of the user-visible surface:
 *
 *  - `POST /subjects/{s}/versions` `{"schema": …}` → `{"id": N}` —
 *    one global id per sanitized definition across subjects
 *    (`sharded_store.cc:135`); re-registering an existing subject
 *    schema returns its existing id with no new version; an
 *    incompatible schema is `409` conflict, an empty one `42201`
 *    (`error.cc:112,124`).
 *  - `GET /subjects` → `[names]` (soft-deleted hidden without
 *    `?deleted=true`, store.h soft-delete semantics).
 *  - `GET /subjects/{s}/versions` → `[versions]`;
 *    `/versions/{n|latest}` → `{subject, version, id, schema}`;
 *    unknown subject `40401`, unknown version `40402`
 *    (`error.cc:88-90`).
 *  - `GET /schemas/ids/{id}` → `{"schema": …}`; unknown `40403`.
 *  - `DELETE /subjects/{s}` → `[versions]` soft delete; twice `40404`
 *    (`subject_soft_deleted`); `?permanent=true` requires the soft
 *    delete first (`40405 subject_not_deleted`).
 *  - `POST /compatibility/subjects/{s}/versions/latest` →
 *    `{"is_compatible": b}`.
 *
 * Error bodies follow the reference's reply shape:
 * `{"error_code": NNNNN, "message": "…"}`.
 */
object RestApi {

  final case class Resp(status: Int, body: String)

  private val mapper = new ObjectMapper()

  private def err(restCode: Int, errorCode: Int, message: String): Resp = {
    val o = mapper.createObjectNode()
    o.put("error_code", errorCode); o.put("message", message)
    Resp(restCode, mapper.writeValueAsString(o))
  }

  /** In-memory registry node: the compacted `_schemas` state a broker
    * folds at startup, served through the REST contract. */
  final class Server(
      level: SchemaRegistry.CompatibilityLevel = SchemaRegistry.Backward) {

    private final case class Version(version: Int, id: Int, schema: String)
    private val idsByCanonical = mutable.LinkedHashMap.empty[String, Int]
    private val schemasById = mutable.LinkedHashMap.empty[Int, String]
    private val subjects = mutable.LinkedHashMap.empty[String, Vector[Version]]
    private val softDeleted = mutable.Set.empty[String]

    private def parseBody(body: Option[String]): Either[Resp, String] = {
      val node = body.map(mapper.readTree)
      val schema = node.flatMap(n => Option(n.get("schema"))).map(_.asText(""))
      schema match {
        case None | Some("") => Left(err(422, 42201, "Empty schema"))
        case Some(s) => Right(s)
      }
    }

    private def parseAvro(s: String): Either[Resp, (Schema, String)] =
      try Right((new Schema.Parser().parse(s), AvroCanonical.sanitize(s)))
      catch { case e: Exception =>
        Left(err(422, 42201, s"Invalid schema: ${e.getMessage}"))
      }

    private def live(subject: String): Option[Vector[Version]] =
      if (softDeleted(subject)) None else subjects.get(subject)

    def handle(method: String, path: String, body: Option[String] = None): Resp = {
      val parts = path.stripPrefix("/").split("\\?")(0).split("/").toList
      val query = if (path.contains("?")) path.split("\\?")(1) else ""
      (method, parts) match {
        case ("POST", "subjects" :: subject :: "versions" :: Nil) =>
          parseBody(body).flatMap(s => parseAvro(s).map { case (av, canon) =>
            (s, av, canon) }).fold(identity, {
            case (raw, schema, canonical) =>
              val versions = live(subject).getOrElse(Vector.empty)
              versions.find(v => AvroCanonical.sanitize(v.schema) == canonical) match {
                case Some(v) => // same schema again: existing id, no new version
                  Resp(200, s"""{"id":${v.id}}""")
                case None =>
                  val prior = versions.map(v => new Schema.Parser().parse(v.schema))
                  if (!SchemaRegistry.isCompatible(schema, prior, level))
                    err(409, 409, "Schema being registered is incompatible with an earlier schema")
                  else {
                    val id = idsByCanonical.getOrElseUpdate(canonical, {
                      val next = idsByCanonical.size + 1
                      schemasById(next) = canonical
                      next
                    })
                    val next = Version(versions.map(_.version).maxOption.getOrElse(0) + 1,
                      id, raw)
                    subjects(subject) = versions :+ next
                    softDeleted -= subject
                    Resp(200, s"""{"id":$id}""")
                  }
              }
          })

        case ("GET", "subjects" :: Nil) =>
          val showDeleted = query.contains("deleted=true")
          val names = subjects.keys.filter(s => showDeleted || !softDeleted(s))
          val a: ArrayNode = mapper.createArrayNode()
          names.foreach(a.add)
          Resp(200, mapper.writeValueAsString(a))

        case ("GET", "subjects" :: subject :: "versions" :: Nil) =>
          live(subject) match {
            case None => err(404, 40401, s"Subject '$subject' not found.")
            case Some(vs) =>
              Resp(200, vs.map(_.version).mkString("[", ",", "]"))
          }

        case ("GET", "subjects" :: subject :: "versions" :: which :: Nil) =>
          live(subject) match {
            case None => err(404, 40401, s"Subject '$subject' not found.")
            case Some(vs) =>
              val hit = if (which == "latest") vs.lastOption
                        else vs.find(_.version == which.toInt)
              hit match {
                case None =>
                  err(404, 40402, s"Version $which not found.")
                case Some(v) =>
                  val o: ObjectNode = mapper.createObjectNode()
                  o.put("subject", subject); o.put("version", v.version)
                  o.put("id", v.id); o.put("schema", v.schema)
                  Resp(200, mapper.writeValueAsString(o))
              }
          }

        case ("GET", "schemas" :: "ids" :: id :: Nil) =>
          schemasById.get(id.toInt) match {
            case None => err(404, 40403, "Schema not found")
            case Some(s) =>
              val o = mapper.createObjectNode(); o.put("schema", s)
              Resp(200, mapper.writeValueAsString(o))
          }

        case ("DELETE", "subjects" :: subject :: Nil) =>
          val permanent = query.contains("permanent=true")
          subjects.get(subject) match {
            case None => err(404, 40401, s"Subject '$subject' not found.")
            case Some(vs) if permanent =>
              if (!softDeleted(subject))
                err(404, 40405,
                  s"Subject '$subject' was not deleted first before being permanently deleted")
              else {
                subjects.remove(subject); softDeleted -= subject
                Resp(200, vs.map(_.version).mkString("[", ",", "]"))
              }
            case Some(vs) =>
              if (softDeleted(subject))
                err(404, 40404, s"Subject '$subject' was soft deleted.")
              else {
                softDeleted += subject
                Resp(200, vs.map(_.version).mkString("[", ",", "]"))
              }
          }

        case ("POST", "compatibility" :: "subjects" :: subject :: "versions" :: "latest" :: Nil) =>
          parseBody(body).flatMap(parseAvro).fold(identity, {
            case (schema, _) =>
              live(subject) match {
                case None => err(404, 40401, s"Subject '$subject' not found.")
                case Some(vs) =>
                  val prior = Seq(new Schema.Parser().parse(vs.last.schema))
                  val ok = SchemaRegistry.isCompatible(schema, prior, level)
                  Resp(200, s"""{"is_compatible":$ok}""")
              }
          })

        case _ => err(404, 404, s"no route for $method $path")
      }
    }
  }
}
