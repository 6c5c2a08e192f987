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
    StructField("value", BinaryType, nullable = true),        // null value == tombstone (record.h:255)
    StructField("batch_type", IntegerType, nullable = false), // record_batch_types.h:20-61
    StructField("is_control", BooleanType, nullable = false)))// record.h:319-322 control bit
}

/**
 * Batch-type tags carried on every log row
 * (`model/record_batch_types.h:20-61`). User data is `raft_data`;
 * transaction fences are `tx_fence`; commit/abort end-markers are
 * raft_data records with the control bit set (`model/record.h:319-322`),
 * i.e. `batch_type = RaftData` + `is_control = true`.
 */
object BatchType {
  final val RaftData = 1     // record_batch_types.h:21
  final val IdAllocator = 8  // record_batch_types.h:28 (PID allocation log)
  final val TxFence = 10     // record_batch_types.h:30
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
