package graft.proxy

import scala.collection.mutable
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.util.Base64

/**
 * The HTTP REST proxy protocol (`pandaproxy/rest/handlers.h:22-52`) as
 * a pure request→response function — the S5 façade's testable
 * contract: route grammar, the v2 embedded formats, JSON body shapes,
 * and the 404xx error ladder, without an HTTP listener (no server
 * framework in the dependency budget).
 *
 * Embedded formats (`pandaproxy/json/types.h` serialization_format):
 * `binary_v2` carries key/value as base64 strings, `json_v2` as raw
 * JSON values (`json/requests/produce.h` state machine). Responses
 * follow the reference serializers key-for-key:
 *  - produce (`post_topics_name`): `{"offsets":[{"partition",…
 *    ["error_code"], "offset"}]}` (`produce.h:273-288`);
 *  - records (`get_topics_records` / `consumer_fetch`): array of
 *    `{"topic","key","value","partition","offset"}` (`fetch.h:44-74`);
 *  - consumer lifecycle (`create_consumer.h:101-136`):
 *    `{"instance_id","base_uri"}`, subscribe/commit reply 204;
 *  - offsets (`offset_fetch.h:49-65`):
 *    `{"offsets":[{"topic","partition","offset","metadata"}]}`.
 *
 * Partitionless produce records route by unsigned murmur2 of the key,
 * the same partitioner as the engine's find_coordinator leg.
 */
object RestProxy {

  final case class Resp(status: Int, body: String)

  private val mapper = new ObjectMapper()
  private val b64 = Base64.getEncoder
  private val b64d = Base64.getDecoder

  private def err(status: Int, code: Int, message: String): Resp = {
    val o = mapper.createObjectNode()
    o.put("error_code", code); o.put("message", message)
    Resp(status, mapper.writeValueAsString(o))
  }

  final class Server(nPartitions: Int = 3) {

    private final case class Rec(offset: Long, key: Array[Byte], value: Array[Byte])
    // topic -> partition -> records (dense offsets from 0)
    private val topics = mutable.LinkedHashMap.empty[String, Array[mutable.ArrayBuffer[Rec]]]
    private final case class Consumer(group: String, name: String,
        var subscription: Seq[String],
        committed: mutable.Map[(String, Int), Long],
        position: mutable.Map[(String, Int), Long])
    private val consumers = mutable.LinkedHashMap.empty[(String, String), Consumer]
    private var nextInstance = 0

    def createTopic(name: String): Unit =
      topics.getOrElseUpdate(name, Array.fill(nPartitions)(mutable.ArrayBuffer.empty[Rec]))

    // ---- embedded format handling

    private def decodeField(fmt: String, n: JsonNode): Array[Byte] =
      if (n == null || n.isNull) null
      else if (fmt == "binary") b64d.decode(n.asText())
      else mapper.writeValueAsBytes(n) // json_v2: the raw JSON value

    private def encodeField(fmt: String, bytes: Array[Byte], w: ObjectNode,
        field: String): Unit =
      if (bytes == null) w.putNull(field)
      else if (fmt == "binary") w.put(field, b64.encodeToString(bytes))
      else w.set(field, mapper.readTree(bytes))

    private def recordsJson(fmt: String, topic: String,
        recs: Seq[(Int, Rec)]): String = {
      val a: ArrayNode = mapper.createArrayNode()
      recs.foreach { case (p, r) =>
        val o = a.addObject()
        o.put("topic", topic)
        encodeField(fmt, r.key, o, "key")
        encodeField(fmt, r.value, o, "value")
        o.put("partition", p)
        o.put("offset", r.offset)
      }
      mapper.writeValueAsString(a)
    }

    def handle(method: String, path: String, body: Option[String] = None,
        format: String = "binary"): Resp = {
      val parts = path.stripPrefix("/").split("\\?")(0).split("/").toList
      val query = if (path.contains("?")) path.split("\\?")(1) else ""
      def qp(name: String): Option[String] =
        query.split("&").find(_.startsWith(name + "="))
          .map(_.substring(name.length + 1))

      (method, parts) match {
        case ("GET", "brokers" :: Nil) =>
          Resp(200, """{"brokers":[0]}""")

        case ("GET", "topics" :: Nil) =>
          val a = mapper.createArrayNode(); topics.keys.foreach(a.add)
          Resp(200, mapper.writeValueAsString(a))

        case ("POST", "topics" :: topic :: Nil) =>
          topics.get(topic) match {
            case None => err(404, 40401, "Not found")
            case Some(store) =>
              val recs = mapper.readTree(body.getOrElse("{}")).get("records")
              if (recs == null || !recs.isArray)
                return err(422, 42201, "Expected records array")
              val offsets = mapper.createObjectNode()
              val arr = offsets.putArray("offsets")
              recs.forEach { r =>
                val key = decodeField(format, r.get("key"))
                val value = decodeField(format, r.get("value"))
                val p = Option(r.get("partition")).map(_.asInt()).getOrElse(
                  if (key == null) 0
                  else ((graft.functions.Murmur2.hash(key).toLong & 0xffffffffL)
                    % nPartitions).toInt)
                val o = arr.addObject()
                if (p < 0 || p >= nPartitions) {
                  o.put("partition", p); o.put("error_code", 40402)
                  o.put("offset", -1L)
                } else {
                  val q = store(p)
                  val off = q.size.toLong
                  q += Rec(off, key, value)
                  o.put("partition", p); o.put("offset", off)
                }
              }
              Resp(200, mapper.writeValueAsString(offsets))
          }

        case ("GET", "topics" :: topic :: "partitions" :: pStr :: "records" :: Nil) =>
          topics.get(topic) match {
            case None => err(404, 40401, "Not found")
            case Some(store) =>
              val p = pStr.toInt
              if (p < 0 || p >= nPartitions) err(404, 40402, "Not found")
              else {
                val from = qp("offset").map(_.toLong).getOrElse(0L)
                val max = qp("max_records").map(_.toInt).getOrElse(Int.MaxValue)
                val recs = store(p).dropWhile(_.offset < from).take(max)
                  .map(r => (p, r)).toSeq
                Resp(200, recordsJson(format, topic, recs))
              }
          }

        case ("POST", "consumers" :: group :: Nil) =>
          val name = Option(mapper.readTree(body.getOrElse("{}")).get("name"))
            .map(_.asText()).filter(_.nonEmpty).getOrElse {
              nextInstance += 1; s"i$nextInstance"
            }
          consumers.getOrElseUpdate((group, name),
            Consumer(group, name, Nil, mutable.Map.empty, mutable.Map.empty))
          val o = mapper.createObjectNode()
          o.put("instance_id", name)
          o.put("base_uri", s"http://proxy/consumers/$group/instances/$name")
          Resp(200, mapper.writeValueAsString(o))

        case (m2, "consumers" :: group :: "instances" :: inst :: rest) =>
          consumers.get((group, inst)) match {
            case None => err(404, 40403, "Not found")
            case Some(c) => (m2, rest) match {
              case ("DELETE", Nil) =>
                consumers.remove((group, inst)); Resp(204, "")
              case ("POST", "subscription" :: Nil) =>
                val ts = mapper.readTree(body.getOrElse("{}")).get("topics")
                if (ts == null || !ts.isArray)
                  err(422, 42201, "Expected topics array")
                else {
                  val names = (0 until ts.size()).map(ts.get(_).asText())
                  names.find(t => !topics.contains(t)) match {
                    case Some(t) => err(404, 40401, s"Topic '$t' not found")
                    case None => c.subscription = names; Resp(204, "")
                  }
                }
              case ("GET", "records" :: Nil) =>
                val max = qp("max_records").map(_.toInt).getOrElse(Int.MaxValue)
                val out = mutable.ArrayBuffer.empty[(String, Int, Rec)]
                c.subscription.foreach { t =>
                  val store = topics(t)
                  (0 until nPartitions).foreach { p =>
                    val pos = c.position.getOrElse((t, p),
                      c.committed.getOrElse((t, p), 0L))
                    val recs = store(p).dropWhile(_.offset < pos)
                    recs.foreach(r => out += ((t, p, r)))
                    if (recs.nonEmpty)
                      c.position((t, p)) = recs.last.offset + 1
                  }
                }
                val limited = out.take(max)
                val a = mapper.createArrayNode()
                limited.foreach { case (t, p, r) =>
                  val o = a.addObject()
                  o.put("topic", t)
                  encodeField(format, r.key, o, "key")
                  encodeField(format, r.value, o, "value")
                  o.put("partition", p)
                  o.put("offset", r.offset)
                }
                Resp(200, mapper.writeValueAsString(a))
              case ("POST", "offsets" :: Nil) =>
                val ps = mapper.readTree(body.getOrElse("{}")).get("partitions")
                if (ps == null || !ps.isArray)
                  err(422, 42201, "Expected partitions array")
                else {
                  ps.forEach { pn =>
                    c.committed((pn.get("topic").asText(),
                      pn.get("partition").asInt())) = pn.get("offset").asLong()
                  }
                  Resp(204, "")
                }
              case ("GET", "offsets" :: Nil) =>
                val ps = mapper.readTree(body.getOrElse("{}")).get("partitions")
                val wanted: Seq[(String, Int)] =
                  if (ps == null) c.committed.keys.toSeq.sorted
                  else (0 until ps.size()).map { i =>
                    (ps.get(i).get("topic").asText(), ps.get(i).get("partition").asInt())
                  }
                val o = mapper.createObjectNode()
                val arr = o.putArray("offsets")
                wanted.foreach { case (t, p) =>
                  val e = arr.addObject()
                  e.put("topic", t); e.put("partition", p)
                  e.put("offset", c.committed.getOrElse((t, p), -1L))
                  e.put("metadata", "")
                }
                Resp(200, mapper.writeValueAsString(o))
              case _ => err(404, 404, s"no route for $m2 $path")
            }
          }

        case ("GET", "status" :: "ready" :: Nil) => Resp(200, """{}""")

        case _ => err(404, 404, s"no route for $method $path")
      }
    }
  }
}
