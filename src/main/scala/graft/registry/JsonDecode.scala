package graft.registry

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Registry-driven typed JSON decode — the third leg of the reference's
 * schema triangle (§1.3): Avro and Protobuf payloads decode via
 * resolver/descriptor (`AvroDecode`, `ProtobufDecode`); JSON-schema
 * subjects (`pandaproxy/schema_registry/json.cc`) carry self-describing
 * payloads, so decoding needs only the READER schema — the registry id
 * in the wire frame exists to validate the subject and drive
 * compatibility, not to locate a writer schema.
 *
 * Spark design: this is the one decode path that needs NO custom kernel.
 * The reader JSON Schema (draft-7 subset) converts to a `StructType`
 * once on the driver, and decoding is `from_json` over the unframed
 * payload — a codegen'd Catalyst builtin, so the whole decode stays
 * inside whole-stage codegen (unlike Avro/Protobuf, whose resolving
 * readers need a `mapPartitions` kernel). Schema evolution falls out of
 * JSON's self-description: fields the writer lacked surface as null,
 * writer extras are dropped by the reader struct.
 *
 * Failure semantics match the other decoders: bad magic or an
 * unregistered id yields a null `decoded` struct, and `from_json`
 * yields null on malformed payload bytes.
 */
object JsonDecode {

  private val mapper = new ObjectMapper()

  /** JSON Schema (draft-7 subset: object/properties, string/integer/
    * number/boolean, nested objects, arrays-with-items) → Spark type.
    * Property declaration order is preserved. */
  def schemaToDataType(schemaJson: String): DataType =
    toDataType(mapper.readTree(schemaJson))

  private def toDataType(n: JsonNode): DataType = {
    val t = Option(n.get("type")).map(_.asText()).getOrElse("object")
    t match {
      case "string"  => StringType
      case "integer" => LongType
      case "number"  => DoubleType
      case "boolean" => BooleanType
      case "array" =>
        val items = n.get("items")
        require(items != null, "array schema requires items in the supported subset")
        ArrayType(toDataType(items))
      case "object" =>
        val p = n.get("properties")
        val fields =
          if (p == null) Seq.empty
          else p.fieldNames().asScala.toSeq.map(k => StructField(k, toDataType(p.get(k))))
        StructType(fields)
      case other =>
        throw new IllegalArgumentException(s"unsupported JSON-schema type: $other")
    }
  }

  /** Frame a JSON projection of `cols` with the registry wire format
    * (magic 0x00 + int32 BE id) — the producer side, for tests and
    * scenario logs. */
  def encode(df: DataFrame, outCol: String, schemaId: Int, cols: Column*): DataFrame = {
    val frame = Array[Byte](0,
      (schemaId >> 24).toByte, (schemaId >> 16).toByte,
      (schemaId >> 8).toByte, schemaId.toByte)
    df.withColumn(outCol, concat(lit(frame),
      org.apache.spark.sql.functions.encode(to_json(struct(cols: _*)), "UTF-8")))
  }

  /**
   * Decode wire-framed JSON payloads to a typed `decoded` struct using
   * the reader schema; `schema_id` carries the validated registry id
   * (null on bad magic / unknown id, and then `decoded` is null too).
   */
  def decode(df: DataFrame, valueCol: String, registeredIds: Seq[Int],
      readerSchemaJson: String): DataFrame = {
    val reader = schemaToDataType(readerSchemaJson)
    val id = Ingest.schemaIdOf(col(valueCol))
    val ok = Ingest.magicOf(col(valueCol)) === lit(Array[Byte](0)) &&
      id.isin(registeredIds: _*)
    df.withColumn("schema_id", when(ok, id))
      .withColumn("decoded",
        when(col("schema_id").isNotNull,
          from_json(Ingest.payloadOf(col(valueCol)).cast("string"), reader)))
  }
}
