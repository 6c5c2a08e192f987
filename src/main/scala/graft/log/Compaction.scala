package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Key compaction — the reference's core "group-by" (SURVEY §2.4 A1–A3).
 *
 * Reference semantics: per key keep only the record with the highest
 * offset; a key whose latest record is a tombstone (null value,
 * `model/record.h:255`) stays visible until `delete_retention_ms` after
 * the clean time, then disappears
 * (`storage/compaction_reducers.h:39,120`, windowed pass
 * `storage/segment_deduplication_utils.h:42-52`).
 *
 * Spark design: one window (or equivalently max_by aggregation) per
 * partition+key. The reference's bounded-memory multi-pass machinery
 * (`storage/key_offset_map.h:77-142`, spill_key_index) is unnecessary —
 * Spark's shuffle spills. At 100 TB this is a single hash shuffle on
 * (partition, key); AQE handles skewed keys.
 */
object Compaction {

  /**
   * A1 last-write-wins dedup: latest record per (partition, key).
   * Keys are compared as raw bytes (the reference compares iobuf keys).
   */
  def compact(log: DataFrame, keyCols: Seq[String], offsetCol: String = "offset"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(offsetCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * A1 + A2: compaction followed by tombstone GC. `isTombstone` marks
   * delete markers; a surviving tombstone is dropped once
   * `tsCol < tombstoneCutoff` (i.e. `delete_retention_ms` has elapsed,
   * `cluster/topic_properties.h:78`). Two-phase on purpose: a plain
   * dropDuplicates would delete keys whose *latest* write is a tombstone
   * that must remain visible until the retention window closes.
   */
  def compactWithTombstones(
      log: DataFrame,
      keyCols: Seq[String],
      isTombstone: Column,
      tsCol: Column,
      tombstoneCutoff: Column): DataFrame = {
    compact(log, keyCols)
      .where(!(isTombstone && tsCol < tombstoneCutoff))
  }

  /**
   * A3 transactional-marker compaction: during a compaction rewrite, data
   * records of aborted transactions and obsolete control markers are
   * removed (`storage/compaction_reducers.h:217-231` tx_reducer). Here as
   * composition: strip aborted ranges (see [[Transactions.readCommitted]])
   * then compact.
   */
  def compactCommitted(
      log: DataFrame,
      abortedRanges: DataFrame,
      keyCols: Seq[String]): DataFrame =
    compact(Transactions.filterAborted(log, abortedRanges), keyCols)
}
