package graft.registry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ingest-side record validation (SURVEY §2.2 P5/P6).
 *
 * P5 schema-id validation: producers tag payloads with the registry wire
 * format — magic byte 0x00 + 4-byte big-endian schema id + payload
 * (`pandaproxy/schema_registry/schema_id_validation.h`); the produce path
 * rejects batches whose id fails the subject strategy
 * (`kafka/server/handlers/produce.cc:417` maybe_validate_schema_id).
 *
 * P6 record CRC validation: the broker verifies the record-batch CRC
 * before append (`kafka/protocol/kafka_batch_adapter.h:54-75` valid_crc /
 * verify_crc).
 *
 * Spark design: both are narrow row-local expressions (substring / conv /
 * crc32 — all codegen'd built-ins) producing a `route` column; the caller
 * splits valid rows from the dead-letter route inside one scan (no
 * shuffle, no second pass over the data).
 */
object Ingest {

  /** Wire-format accessors: [magic 0x00][int32 BE schema id][payload]. */
  def magicOf(value: Column): Column = substring(value, 1, 1)

  def schemaIdOf(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("int")

  def payloadOf(value: Column): Column =
    substring(value, 6, Int.MaxValue)

  /**
   * P5: annotate each row with its parsed schema id and a route —
   * 'valid', 'invalid_magic', or 'invalid_schema_id' (unregistered id).
   */
  def validateSchemaIds(df: DataFrame, valueCol: Column, registered: Seq[Int]): DataFrame =
    df.withColumn("schema_id",
        when(magicOf(valueCol) === lit(Array[Byte](0)), schemaIdOf(valueCol)))
      .withColumn("route",
        when(col("schema_id").isNull, "invalid_magic")
          .when(col("schema_id").isin(registered: _*), "valid")
          .otherwise("invalid_schema_id"))

  /**
   * P6: recompute the payload CRC-32 and route mismatches to the
   * dead-letter output.
   */
  def validateCrc(df: DataFrame, valueCol: Column, storedCrcCol: Column): DataFrame =
    df.withColumn("route",
      when(crc32(valueCol) === storedCrcCol, "valid").otherwise("corrupt"))

  /** The surviving ingest stream (the produce path appends only these). */
  def accepted(routed: DataFrame): DataFrame = routed.where(col("route") === "valid")

  /** Dead-letter stream for rejected records. */
  def rejected(routed: DataFrame): DataFrame = routed.where(col("route") =!= "valid")
}
