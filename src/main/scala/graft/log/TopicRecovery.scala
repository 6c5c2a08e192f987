package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Topic recovery from cloud storage (reference
 * `cluster/partition_recovery_manager.cc`, `topic_recovery_service.cc`):
 * disaster recovery rebuilds a partition's local log from its uploaded
 * manifest, bounded by the retention policy in force
 * (`get_retention_policy`, `partition_recovery_manager.cc:261-289`):
 * a size bound (min of retention.bytes and local target bytes), else a
 * time bound (min of retention.ms and local target ms), else the full
 * log.
 *
 * The downloader walks the offset map NEWEST → OLDEST
 * (`download_log_with_capped_size:435-456` /
 * `_with_capped_time:520-553`) staging segments until the bound trips:
 *  - size: stop at the first segment where the running total would
 *    reach `max_size`;
 *  - time: stop at the first segment whose max timestamp is missing or
 *    older than the threshold;
 * and everything newer than the stop point restores. `start_delta`
 * propagates the oldest staged delta-offset that is actually set; a
 * download with offset gaps inside the staged range is not "clean"
 * (`clean_download = !missing_offsets`). When remote fetch (tiered
 * reads) is enabled the recovery is SHALLOW — metadata only, no
 * segment downloads (`:438-440`).
 *
 * Spark design: the walk-until-stop is a per-partition suffix
 * condition over bounded manifest metadata — a descending running
 * sum (size) or running violation flag (time), never a data-plane
 * scan; the restored bytes themselves move through the ordinary
 * tiered read path. Manifest windows are partition-scoped metadata,
 * the same class as [[Scrubber]].
 */
object TopicRecovery {

  private val desc_ = Window.partitionBy("partition").orderBy(col("base_offset").desc)
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Stage the recovery set under a SIZE bound: the maximal manifest
    * suffix whose running total stays strictly under `maxSizeBytes`. */
  private def stageSize(manifest: DataFrame, maxSizeBytes: Long): DataFrame =
    manifest.withColumn("__staged",
      sum("size_bytes").over(desc_) < maxSizeBytes)

  /** Stage the recovery set under a TIME bound: newer-than-threshold
    * segments until the first missing-or-older max timestamp. */
  private def stageTime(manifest: DataFrame, threshold: Column): DataFrame =
    manifest.withColumn("__staged",
      max(when(col("max_ts").isNull || col("max_ts") < threshold, 1)
        .otherwise(0)).over(desc_) === 0)

  /** No bound: everything stages (the monostate policy). */
  private def stageAll(manifest: DataFrame): DataFrame =
    manifest.withColumn("__staged", lit(true))

  /**
   * One recovery run over the uploaded manifest `(partition,
   * base_offset, committed_offset, size_bytes, delta_offset nullable,
   * max_ts nullable)`. Returns one row per partition: `(partition,
   * policy, start_offset, last_offset, n_segments, total_bytes,
   * start_delta, clean_download)`. `policy` ∈ `size | time | none |
   * shallow`; shallow (remote fetch enabled) stages nothing.
   */
  def recover(manifest: DataFrame, policy: String,
      maxSizeBytes: Long = Long.MaxValue, timeThreshold: Column = lit(null),
      remoteFetchEnabled: Boolean = false): DataFrame = {
    val effective = if (remoteFetchEnabled) "shallow" else policy
    val staged = effective match {
      case "size" => stageSize(manifest, maxSizeBytes)
      case "time" => stageTime(manifest, timeThreshold)
      case "none" => stageAll(manifest)
      case "shallow" => manifest.withColumn("__staged", lit(false))
      case other => throw new IllegalArgumentException(s"unknown policy: $other")
    }
    // Contiguity inside the staged range: a gap between consecutive
    // staged segments spoils clean_download.
    val asc = Window.partitionBy("partition").orderBy("base_offset")
    val gaps = staged.where(col("__staged"))
      .withColumn("__prev_committed", lag("committed_offset", 1).over(asc))
      .withColumn("__gap",
        col("__prev_committed").isNotNull &&
          col("__prev_committed") + 1 =!= col("base_offset"))
    val perPart = gaps.groupBy("partition").agg(
      min("base_offset").as("start_offset"),
      max("committed_offset").as("last_offset"),
      count(lit(1)).as("n_segments"),
      sum("size_bytes").as("total_bytes"),
      // delta of the OLDEST staged segment with a delta actually set
      // (the loop's last assignment) — min over a null-skipping struct
      min(when(col("delta_offset").isNotNull,
        struct(col("base_offset"), col("delta_offset"))))
        .getField("delta_offset").as("start_delta"),
      (sum(col("__gap").cast("int")) === 0).as("clean_download"))
    manifest.select("partition").distinct()
      .join(perPart, Seq("partition"), "left")
      .select(col("partition"), lit(effective).as("policy"),
        col("start_offset"), col("last_offset"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("total_bytes"), lit(0L)).as("total_bytes"),
        coalesce(col("start_delta"), lit(0L)).as("start_delta"),
        coalesce(col("clean_download"), lit(false)).as("clean_download"))
  }
}
