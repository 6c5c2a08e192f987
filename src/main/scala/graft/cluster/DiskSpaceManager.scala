package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Disk-space management (reference `resource_mgmt/storage.{h,cc}`):
 * when log storage exceeds the configured target, the space manager
 * builds an EVICTION SCHEDULE over per-partition reclaimable segments,
 * walking four policy levels in order — local-retention overshoot,
 * low-space without local-retention hints, low-space with hints, and
 * finally down to each partition's active segment — and within each
 * level marking segments ROUND-ROBIN across partitions (balanced, one
 * segment per visit, oldest first per partition) until the target
 * excess is covered (`eviction_policy::evict_balanced_from_level`,
 * `storage.cc:364-451`; phase chaining `storage.cc:600-640`).
 *
 * Spark design: the schedule is pure metadata — (partition × segment)
 * rows — and the sequential mark-until-covered walk collapses into ONE
 * running sum: global order = (level rank, round, partition) is
 * exactly the reference's visit order, and a segment is marked iff the
 * exclusive prefix of marked bytes has not yet covered the target
 * (the reference stops only AFTER the running total exceeds it). The
 * cross-level chaining needs no special handling — the stop condition
 * composes into the same global prefix rule. (Divergence notes: when a
 * level total equals the target to the exact byte the reference skips
 * the next level while the prefix rule admits one more segment; and
 * within the BOUNDARY round of each level the reference's schedule
 * cursor carries over from the previous level — `sched.current()` in
 * `manage_data_disk` persists across the chained `evict_*_from_level`
 * calls — so it may mark a different same-total subset of that round's
 * equal-candidate segments than this partition-ascending prefix rule:
 * marked byte totals agree; the specific segments of the one boundary
 * round may not. Real byte totals never hit either boundary exactly.)
 */
object DiskSpaceManager {

  val Levels: Seq[String] = Seq("local_retention", "low_space_non_hinted",
    "low_space_hinted", "active_segment")

  /**
   * `update_target_size` (`storage.cc:132-168`): percent-of-usable and
   * absolute-bytes targets compose as min when both set; the bytes
   * target clamps to the usable (non-reserved) disk; zero means
   * disabled. Truncating double arithmetic, exactly as the reference.
   */
  def targetSize(diskSize: Long, reservationPercent: Double,
      targetPercent: Option[Double], targetBytes: Option[Long]): Long = {
    val reservation = (diskSize * (reservationPercent / 100.0)).toLong
    val usable = diskSize - reservation
    val pct = (usable * (targetPercent.getOrElse(0.0) / 100.0)).toLong
    val bytes = math.min(targetBytes.getOrElse(0L), usable)
    if (pct > 0 && bytes == 0) pct
    else if (pct == 0 && bytes > 0) bytes
    else if (pct > 0 && bytes > 0) math.min(pct, bytes)
    else 0L
  }

  /**
   * The control-loop trigger (`manage_data_disk`, `storage.cc:489-564`):
   * no reclaim while the overage is within one segment size (avoids
   * evicting a 100 MB segment over a 10 KB overage); past it, the
   * excess is scaled by the overage coefficient to over-reclaim in
   * anticipation of the next tick's arrivals.
   */
  def adjustedExcess(usageTotal: Long, targetSize: Long, segmentSize: Long,
      overageCoeff: Double): Long = {
    val real = math.max(0L, usageTotal - targetSize)
    if (real <= segmentSize) 0L else (real * overageCoeff).toLong
  }

  /**
   * Build the eviction schedule. `segments` columns: partition, level
   * (one of [[Levels]]), seg (ordering within the partition — oldest
   * first), size. Adds `rr_round` (the segment's position in its
   * partition's level list), `bytes_before` (marked bytes scheduled
   * ahead of it in visit order), and `marked`.
   */
  def evictionSchedule(segments: DataFrame, targetExcess: Long): DataFrame = {
    val lvlRank = Levels.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (n, i)) => when(col("level") === n, i).otherwise(acc)
    }
    val idxW = Window.partitionBy("partition", "level").orderBy("seg")
    // Two-phase chunked prefix sum (the repo's offset-translation /
    // L0-packing shape): visit order is (level, round, partition), so
    // chunk = (level, round) — packed into one long key. Phase 1
    // aggregates per-chunk byte totals (a tiny levels × rounds table;
    // only IT flows through an ordered prefix) and broadcasts the
    // exclusive chunk bases back; phase 2 ranks only INSIDE each chunk
    // by partition. No task ever sorts the whole (partition × segment)
    // schedule — the one global sort touches the ≤rounds×4-row base
    // table.
    val tagged = segments.withColumn("__lvl", lvlRank)
      .withColumn("__idx", row_number().over(idxW))
      .withColumn("__chunk",
        col("__lvl").cast("long") * 4294967296L + col("__idx"))
    val chunkAgg = tagged.groupBy("__chunk").agg(sum("size").as("__n"))
    val baseW = Window.orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = chunkAgg
      .withColumn("__base", coalesce(sum("__n").over(baseW), lit(0L)))
      .select("__chunk", "__base")
    val localW = Window.partitionBy("__chunk").orderBy("partition")
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged.join(broadcast(bases), Seq("__chunk"))
      .withColumn("bytes_before",
        col("__base") + coalesce(sum("size").over(localW), lit(0L)))
      .withColumn("marked", lit(targetExcess) > 0 && col("bytes_before") <= targetExcess)
      .withColumn("rr_round", col("__idx"))
      .drop("__lvl", "__idx", "__chunk", "__base")
  }

  /** Per-level reclaim estimate — the probe figures
    * (`reclaim_local` / `low_non_hinted` / `low_hinted` / `active`). */
  def levelEstimates(schedule: DataFrame): DataFrame =
    schedule.groupBy("level")
      .agg(sum(when(col("marked"), col("size")).otherwise(0L)).as("bytes_marked"),
        sum(col("marked").cast("long")).as("n_marked"),
        count(lit(1)).as("n_candidates"))
}
