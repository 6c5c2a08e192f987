package graft.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Topic purger (reference `cluster/archival/purger.cc` +
 * `cloud_storage/lifecycle_marker.h`): a housekeeping job that erases
 * the uploaded objects of DELETED topics. The controller leaves a
 * lifecycle marker per deleted topic; each run walks the markers under
 * an operation quota (`run_quota_t`) and, per topic:
 *
 *  - a marker whose config does not require remote erase
 *    (`remote_delete=false`, `purger.cc:367-377`) is dropped
 *    immediately — the topic stays offloaded, nothing is deleted;
 *  - a marker younger than the purge grace period is skipped this run
 *    (`purger.cc:381-394`, anti-race with `finalize`);
 *  - otherwise partitions purge in order. Each partition's manifests
 *    are erased in reverse collection order (`purger.cc:100-141`):
 *    a manifest that fails to download retryably ABORTS the partition
 *    and the whole run (`purge_status::retryable_failure` — cloud
 *    back-off); a manifest that is already gone counts as a permanent
 *    failure but the walk continues, and a partition with only
 *    permanent failures still "succeeds" so tombstone cleanup is never
 *    wedged by lost objects (`purger.cc:474-479`). Deleting a
 *    manifest's segments is estimated at `max(segments/1000, 1)`
 *    plural-delete operations (`purger.cc:292-297`);
 *  - BEFORE each partition the remaining quota is checked; an
 *    exhausted quota returns immediately, leaving this topic purging
 *    and every later marker untouched (`purger.cc:453-457`);
 *  - a topic whose partitions all completed has its topic manifest
 *    and controller tombstone removed — status purged.
 *
 * Spark design: markers × partitions × manifests are bounded
 * control-plane metadata (same class as `cluster/DataMigrations`), so
 * the sequential run is replayed declaratively — per-partition
 * manifest walks are one reverse-ranked aggregate, and the
 * quota/abort prefix cut is a running sum over the (marker, partition)
 * order: a row is processed iff the ops of all prior rows stay under
 * quota and no prior row aborted retryably. No data-plane rows are
 * touched; the object deletes themselves are storage-side effects the
 * engine only accounts.
 */
object Purger {

  /**
   * One purger run. `markers`: `(topic, revision, partition_count,
   * remote_delete, read_replica, marker_ts_ms)` — one row per
   * lifecycle marker, walked in topic order. `manifests`: `(topic, partition, m,
   * n_segments, state)` with `state` in `ok | missing | unreadable`
   * and `m` the collection order. Returns one row per marker:
   * `(topic, outcome, ops_consumed, partitions_purged, n_permanent)`
   * with outcome in `marker_dropped | grace_skip | purged |
   * retry_pending | quota_exhausted | not_reached`.
   */
  def run(markers: DataFrame, manifests: DataFrame, quota: Long,
      nowMs: Long, graceMs: Long): DataFrame = {
    // Marker walk order — bounded control-plane window (marker list).
    val idxd = markers.withColumn("__idx",
      row_number().over(Window.orderBy("topic", "revision")))
      .withColumn("__grace",
        col("marker_ts_ms").isNotNull && lit(nowMs) - col("marker_ts_ms") < lit(graceMs))
    val eligible = idxd.where(col("remote_delete") && !col("__grace"))

    // Per-(topic, partition) manifest walk, reverse collection order:
    // ops accumulate until the first retryable download failure; missing
    // manifests count permanent and contribute no ops.
    val mwin = Window.partitionBy("topic", "partition").orderBy(col("m").desc)
    val ranked = manifests.withColumn("__rk", row_number().over(mwin))
    val firstBad = ranked.where(col("state") === "unreadable")
      .groupBy("topic", "partition").agg(min("__rk").as("__u"))
    val perPart = ranked
      .join(firstBad, Seq("topic", "partition"), "left")
      .withColumn("__before_cut", col("__u").isNull || col("__rk") < col("__u"))
      .groupBy("topic", "partition")
      .agg(
        sum(when(col("__before_cut") && col("state") === "ok",
          greatest(floor(col("n_segments") / 1000), lit(1)).cast("long"))
          .otherwise(0L)).as("ops"),
        count(when(col("__before_cut") && col("state") === "missing", lit(1)))
          .as("n_permanent"),
        max(col("__u").isNotNull).as("retryable"))

    // The global (marker, partition) sequence with the prefix cut. A
    // read-replica marker is the reference's paranoia branch
    // (purger.cc:63-72): never delete, report success — partitions
    // contribute nothing and the tombstone still clears.
    val rows = eligible
      .select(col("__idx"), col("topic"), col("read_replica"),
        explode(sequence(lit(0), col("partition_count") - 1)).as("partition"))
      .join(perPart, Seq("topic", "partition"), "left")
      .select(col("__idx"), col("topic"), col("partition"),
        when(col("read_replica"), 0L)
          .otherwise(coalesce(col("ops"), lit(0L))).as("ops"),
        when(col("read_replica"), 0L)
          .otherwise(coalesce(col("n_permanent"), lit(0L))).as("n_permanent"),
        (!col("read_replica") && coalesce(col("retryable"), lit(false)))
          .as("retryable"))
    val rwin = Window.orderBy("__idx", "partition")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cut = rows
      .withColumn("__prior_ops", coalesce(sum("ops").over(rwin), lit(0L)))
      .withColumn("__prior_retry",
        coalesce(max(col("retryable").cast("int")).over(rwin), lit(0)) > 0)
      .withColumn("processed",
        col("__prior_ops") < quota && !col("__prior_retry"))

    // The run's first unprocessed row marks the quota-exhausted topic;
    // strictly later topics were never reached.
    val firstCut = cut.agg(min(when(!col("processed"), col("__idx"))).as("__cut_idx"))
    val perTopic = cut.groupBy("__idx", "topic")
      .agg(count(when(col("processed"), lit(1))).as("n_processed"),
        sum(when(col("processed"), col("ops")).otherwise(0L)).as("ops_consumed"),
        sum(when(col("processed"), col("n_permanent")).otherwise(0L)).as("n_permanent"),
        max(col("processed") && col("retryable")).as("has_retry"),
        count(when(col("processed") && !col("retryable"), lit(1)))
          .as("partitions_purged"))

    idxd.join(perTopic.drop("topic"), Seq("__idx"), "left")
      .crossJoin(broadcast(firstCut))
      .select(col("topic"),
        when(!col("remote_delete"), lit("marker_dropped"))
          .when(col("__grace"), lit("grace_skip"))
          .when(coalesce(col("has_retry"), lit(false)), lit("retry_pending"))
          .when(col("n_processed") === col("partition_count"), lit("purged"))
          .when(coalesce(col("n_processed"), lit(0L)) > 0, lit("quota_exhausted"))
          .when(col("__cut_idx").isNotNull && col("__idx") === col("__cut_idx"),
            lit("quota_exhausted"))
          .otherwise(lit("not_reached")).as("outcome"),
        coalesce(col("ops_consumed"), lit(0L)).as("ops_consumed"),
        coalesce(col("partitions_purged"), lit(0L)).as("partitions_purged"),
        coalesce(col("n_permanent"), lit(0L)).as("n_permanent"))
  }
}
