package graft.model

import org.apache.spark.sql.types._

/**
 * Canonical data model of the engine: the partitioned, offset-indexed record
 * log, re-expressed as a Spark schema.
 *
 * Mirrors the reference's record abstraction (`src/v/model/record.h:151`:
 * nullable key/value, headers, varint-encoded timestamp/offset deltas) and,
 * deliberately, the exact column set of the default Iceberg table the
 * reference itself materializes topics into
 * (`src/v/datalake/table_definition.cc:20-45`). The record *batch*
 * (`record.h:716`) dissolves in Spark: rows carry batch-derived columns and
 * Parquet/Tungsten provide the physical batching + CRC + compression.
 */
object RecordSchema {
  val headerType: DataType =
    ArrayType(StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType))), containsNull = false)

  /** Schemaless ("key_value") topic table layout. */
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),  // table_definition.cc:20
    StructField("offset", LongType, nullable = false),        // table_definition.cc:22
    StructField("timestamp", TimestampType, nullable = false),// table_definition.cc:24
    StructField("headers", headerType, nullable = true),      // table_definition.cc:26-35
    StructField("key", BinaryType, nullable = true),          // table_definition.cc:38
    StructField("value", BinaryType, nullable = true)))       // null value == tombstone (record.h:255)
}

/**
 * Per-topic configuration knobs, from the reference's
 * `cluster/topic_properties.h:123-128+` (compression, cleanup policy,
 * retention, segment sizing, timestamp type) exposed via
 * describe/alter-configs (`kafka/server/handlers/handlers.h`).
 */
final case class TopicProperties(
    partitions: Int = 1,
    cleanupPolicy: String = "delete",          // "delete" | "compact" | "compact,delete"
    retentionMs: Option[Long] = None,
    retentionBytes: Option[Long] = None,
    deleteRetentionMs: Long = 86400000L,       // tombstone retention, topic_properties.h:78
    timestampType: String = "CreateTime",      // model/timestamp.h:30
    compression: String = "zstd")              // model/compression.h:36
