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
 * composes into the same global prefix rule. (Divergence note: when a
 * level total equals the target to the exact byte the reference skips
 * the next level while the prefix rule admits one more segment; real
 * byte totals never hit the boundary exactly.)
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
    // global metadata-sized window: the schedule is (partition × segment)
    // rows, the same bounded table the reference walks on the controller
    val rrW = Window.orderBy(col("__lvl"), col("__idx"), col("partition"))
      .rowsBetween(Window.unboundedPreceding, -1)
    segments.withColumn("__lvl", lvlRank)
      .withColumn("__idx", row_number().over(idxW))
      .withColumn("bytes_before", coalesce(sum("size").over(rrW), lit(0L)))
      .withColumn("marked", lit(targetExcess) > 0 && col("bytes_before") <= targetExcess)
      .withColumn("rr_round", col("__idx"))
      .drop("__lvl", "__idx")
  }

  /** Per-level reclaim estimate — the probe figures
    * (`reclaim_local` / `low_non_hinted` / `low_hinted` / `active`). */
  def levelEstimates(schedule: DataFrame): DataFrame =
    schedule.groupBy("level")
      .agg(sum(when(col("marked"), col("size")).otherwise(0L)).as("bytes_marked"),
        sum(col("marked").cast("long")).as("n_marked"),
        count(lit(1)).as("n_candidates"))
}
