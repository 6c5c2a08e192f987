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
   * A1b sliding-window compaction — ONE round of the reference's
   * memory-bounded dedup (`storage/disk_log_impl.cc:560`
   * `sliding_window_compact`, `segment_deduplication_utils.cc:94`
   * `build_offset_map`, `storage/key_offset_map.h` capacity): the
   * key→latest-offset map builds from the NEWEST segment backwards
   * until `maxKeys` is exhausted; `idx_start` is the oldest FULLY
   * indexed segment. The rewrite then keeps, for every mapped key,
   * only the map's (latest) record — across the whole range — while
   * keys that did not fit the map keep one record per segment
   * (self-compaction, `self_compact_segment`, ran first) and fully
   * dedupe only in a later round once the window slides back.
   * [[compact]] is this process's converged fixpoint; a single
   * capacity-limited round is the observable state between rounds.
   *
   * Declarative map-capacity rule: a key occupies the map iff its
   * LAST segment is ≥ idx_start, so the map size at candidate start s
   * is the reverse-cumulative count of keys grouped by last segment —
   * a tiny (partition × segment) table; no fold, no driver state.
   * Everything else is two hash aggregates and a broadcast-joined
   * per-partition boundary.
   *
   * Returns (compacted, stats): stats = one row per partition with
   * `idx_start_seg`, `n_keys_indexed`, `window_complete` (the round
   * reached the range base — the reference then resets the window
   * start, `disk_log_impl.cc:681-692`).
   */
  def slidingWindowCompact(log: DataFrame, partitionCol: Column,
      offsetCol: Column, keyCol: Column, segSize: Long,
      maxKeys: Long): (DataFrame, DataFrame) = {
    require(segSize > 0 && maxKeys > 0)
    val tagged = log.withColumn("__p", partitionCol)
      .withColumn("__o", offsetCol.cast("long"))
      .withColumn("__k", keyCol)
      .withColumn("__seg", floor(offsetCol.cast("long") / segSize))
    val lastSeg = tagged.groupBy("__p", "__k")
      .agg(max("__seg").as("__lseg"), max("__o").as("__maxo"))
    // map occupancy per candidate start segment: keys with __lseg >= s.
    // The backwards scan stops at the newest segment whose inclusion
    // OVERFLOWS the map; idx_start is the segment above it (segments
    // holding no last-occurrences extend the window for free, exactly
    // like the reference's no-new-keys put_entry passes).
    val occ = lastSeg.groupBy("__p", "__lseg").agg(count(lit(1)).as("__n"))
      .withColumn("__suffix", sum("__n").over(
        Window.partitionBy("__p").orderBy(col("__lseg").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
    val bad = occ.where(col("__suffix") > maxKeys)
      .groupBy("__p").agg(max("__lseg").as("__maxbad"))
    val rangeBase = tagged.groupBy("__p").agg(min("__seg").as("__base"))
    val bounds = rangeBase.join(bad, Seq("__p"), "left")
      .withColumn("__start",
        when(col("__maxbad").isNull, col("__base")).otherwise(col("__maxbad") + 1))
      .select("__p", "__base", "__start")
    val nKeys = lastSeg.join(broadcast(bounds), Seq("__p"))
      .where(col("__lseg") >= col("__start"))
      .groupBy("__p").agg(count(lit(1)).as("n_keys_indexed"))
    val stats = bounds.join(nKeys, Seq("__p"), "left")
      .select(col("__p").as("partition"), col("__start").as("idx_start_seg"),
        coalesce(col("n_keys_indexed"), lit(0L)).as("n_keys_indexed"),
        (col("__start") <= col("__base")).as("window_complete"))
    // mapped keys: last segment inside the indexed suffix → LWW across
    // the whole range; unmapped keys → per-segment LWW (self-compaction)
    val withMap = tagged
      .join(broadcast(bounds.select(col("__p"), col("__start"))), Seq("__p"))
      .join(lastSeg.select(col("__p"), col("__k"), col("__lseg"), col("__maxo")),
        Seq("__p", "__k"))
      .withColumn("__mapped", col("__lseg") >= col("__start"))
    val segW = Window.partitionBy("__p", "__seg", "__k").orderBy(col("__o").desc)
    val compacted = withMap
      .withColumn("__segrn", row_number().over(segW))
      .where(when(col("__mapped"), col("__o") === col("__maxo"))
        .otherwise(col("__segrn") === 1))
      .drop("__p", "__o", "__k", "__seg", "__start", "__lseg", "__maxo",
        "__mapped", "__segrn")
    (compacted, stats)
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
