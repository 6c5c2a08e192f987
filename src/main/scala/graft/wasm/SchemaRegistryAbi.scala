package graft.wasm

import scala.collection.mutable.ArrayBuffer
import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.RecordBatchCodec.{zigzag, unzigzag}
import WasmInterp.{HostFunc, Instance}

/**
 * The `redpanda_schema_registry` guest module
 * (`wasm/schema_registry_module.h:35-60`, `.cc:24-101`): schema
 * lookups and registration exposed to transforms, backed here by the
 * same registry node that serves the REST surface
 * ([[graft.registry.RestApi.Server]]) — guest ABI and HTTP clients see
 * one store.
 *
 * Encoded schema wire form (`write_encoded_schema_def`, `.cc:55-66`):
 * vint type (avro 0 / protobuf 1 / json 2), vint-sized raw definition,
 * vint ref count, then per ref vint-sized name/subject + vint version.
 * `get_subject_schema` prepends vint id + vint version
 * (`write_encoded_schema_subject`, `.cc:91-97` — subject omitted, the
 * caller already has it). Return codes: SUCCESS 0,
 * SCHEMA_REGISTRY_NOT_ENABLED -1, SCHEMA_REGISTRY_ERROR -2
 * (`.cc:99-101`); the definition getters return bytes written.
 */
object SchemaRegistryAbi {

  val Success = 0
  val NotEnabled = -1
  val Error = -2

  private val mapper = new ObjectMapper()

  private def putVarint(out: ArrayBuffer[Byte], v: Long): Unit = {
    var u = zigzag(v)
    do {
      var b = (u & 0x7f).toInt
      u >>>= 7
      if (u != 0) b |= 0x80
      out += b.toByte
    } while (u != 0)
  }
  private def putSized(out: ArrayBuffer[Byte], bytes: Array[Byte]): Unit = {
    putVarint(out, bytes.length.toLong); out ++= bytes
  }

  /** `write_encoded_schema_def` over a raw AVRO definition (refs empty —
    * the RestApi store carries none). */
  def encodeDef(raw: String): Array[Byte] = {
    val out = new ArrayBuffer[Byte](raw.length + 8)
    putVarint(out, 0L)                   // type avro
    putSized(out, raw.getBytes("UTF-8"))
    putVarint(out, 0L)                   // no references
    out.toArray
  }

  def encodeSubjectSchema(id: Int, version: Int, raw: String): Array[Byte] = {
    val out = new ArrayBuffer[Byte](raw.length + 12)
    putVarint(out, id.toLong); putVarint(out, version.toLong)
    out.toArray ++ encodeDef(raw)
  }

  /** `read_encoded_schema_def` (`.cc:68-89`): vint type + sized raw +
    * refs; returns the raw definition (refs skipped — unused by the
    * avro-backed store). None on truncation or unknown type. */
  def parseEncodedDef(bytes: Array[Byte]): Option[String] = {
    var pos = 0
    def varint(): Long = {
      var u = 0L; var shift = 0; var b = 0
      do {
        if (pos >= bytes.length) throw new IndexOutOfBoundsException
        b = bytes(pos) & 0xff; pos += 1
        if (shift < 64) u |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      unzigzag(u)
    }
    try {
      val tpe = varint()
      if (tpe < 0 || tpe > 2) return None
      val n = varint()
      if (n < 0 || n > bytes.length - pos) return None
      val raw = new String(bytes, pos, n.toInt, "UTF-8")
      Some(raw)
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Host function set over the shared registry node. */
  def hostFuncs(server: graft.registry.RestApi.Server)
      : Map[(String, String), HostFunc] = {

    def hf(f: (Instance, Array[Long]) => Array[Long]): HostFunc =
      new HostFunc {
        def invoke(inst: Instance, args: Array[Long]): Array[Long] =
          f(inst, args)
      }

    def schemaById(id: Int): Option[String] = {
      val r = server.handle("GET", s"/schemas/ids/$id")
      if (r.status != 200) None
      else Some(mapper.readTree(r.body).get("schema").asText())
    }
    def schemaBySubject(inst: Instance, subPtr: Long, subLen: Long,
        version: Int): Option[(Int, Int, String)] = {
      val sub = new String(inst.memory.readBytes(subPtr, subLen.toInt), "UTF-8")
      val which = if (version < 0) "latest" else version.toString
      val r = server.handle("GET", s"/subjects/$sub/versions/$which")
      if (r.status != 200) None
      else {
        val n = mapper.readTree(r.body)
        Some((n.get("id").asInt(), n.get("version").asInt(),
          n.get("schema").asText()))
      }
    }

    Map(
      ("redpanda_schema_registry", "check_abi_version_0") ->
        hf((_, _) => Array.empty),
      ("redpanda_schema_registry", "get_schema_definition_len") -> hf { (inst, a) =>
        schemaById(a(0).toInt) match {
          case None => Array(Error.toLong)
          case Some(raw) =>
            inst.memory.writeN(a(1), 4, encodeDef(raw).length.toLong)
            Array(Success.toLong)
        }
      },
      ("redpanda_schema_registry", "get_schema_definition") -> hf { (inst, a) =>
        schemaById(a(0).toInt) match {
          case None => Array(Error.toLong)
          case Some(raw) =>
            val bytes = encodeDef(raw)
            if (a(2) < bytes.length) Array(Error.toLong)
            else { inst.memory.writeBytes(a(1), bytes); Array(bytes.length.toLong) }
        }
      },
      ("redpanda_schema_registry", "get_subject_schema_len") -> hf { (inst, a) =>
        schemaBySubject(inst, a(0), a(1), a(2).toInt) match {
          case None => Array(Error.toLong)
          case Some((id, v, raw)) =>
            inst.memory.writeN(a(3), 4,
              encodeSubjectSchema(id, v, raw).length.toLong)
            Array(Success.toLong)
        }
      },
      ("redpanda_schema_registry", "get_subject_schema") -> hf { (inst, a) =>
        schemaBySubject(inst, a(0), a(1), a(2).toInt) match {
          case None => Array(Error.toLong)
          case Some((id, v, raw)) =>
            val bytes = encodeSubjectSchema(id, v, raw)
            if (a(4) < bytes.length) Array(Error.toLong)
            else { inst.memory.writeBytes(a(3), bytes); Array(bytes.length.toLong) }
        }
      },
      ("redpanda_schema_registry", "create_subject_schema") -> hf { (inst, a) =>
        // read_encoded_schema_def then register through the store
        val sub = new String(inst.memory.readBytes(a(0), a(1).toInt), "UTF-8")
        val enc = inst.memory.readBytes(a(2), a(3).toInt)
        parseEncodedDef(enc) match {
          case None => Array(Error.toLong)
          case Some(raw) =>
            val body = mapper.createObjectNode()
            body.put("schema", raw)
            val r = server.handle("POST", s"/subjects/$sub/versions",
              Some(mapper.writeValueAsString(body)))
            if (r.status != 200) Array(Error.toLong)
            else {
              inst.memory.writeN(a(4), 4,
                mapper.readTree(r.body).get("id").asInt().toLong)
              Array(Success.toLong)
            }
        }
      })
  }
}
