package graft.log

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * S4 tiered storage (SURVEY §2.1 S4; reference `cloud_storage/`, 52k LoC):
 * aged log segments move to the remote tier; reads stay Kafka-transparent —
 * one logical log spanning both tiers (`cloud_storage::remote_partition::
 * make_reader`, `cloud_storage/remote_partition.h:80`; tiered timequery
 * `:87-92`; the archiver upload loop in `cluster/archival/`).
 *
 * Spark design: a tier is a parquet directory (an object-store prefix in
 * production — Spark scans are location-transparent, which is why the
 * survey marked the READ side free). What is modeled here is the part
 * that is not free — the movement contract and its query semantics:
 *
 *  - [[archive]] relocates the log prefix older than a cutoff to the
 *    archive tier and returns the per-partition offset-range manifest of
 *    both tiers (the reference's partition manifest,
 *    `cloud_storage/partition_manifest.h`) — local retention advances
 *    while archived data stays queryable;
 *  - [[read]] unions archive + local into ONE log. Offset/time
 *    predicates reach BOTH scans as pushed filters, so a hot-tail fetch
 *    prunes every archive file via parquet min/max stats without reading
 *    cold bytes — the Spark analogue of "offset < local start ⇒ go
 *    remote, else never touch S3";
 *  - a timequery over the union is ordinary Q3; results fall in
 *    whichever tier holds the range (`remote_partition.h:87-92`).
 *
 * Scale: archive is one predicate-split rewrite (no shuffle — tier files
 * inherit the log's partitioning); the manifest is bounded metadata
 * (partitions × tiers rows). Nothing lists the cold tier on hot reads.
 */
object TieredStorage {

  /**
   * Split `log` at `cutoff` (rows strictly older go to the archive tier)
   * and write both tiers partitioned by the topic partition. Returns the
   * tier manifest: (tier, partition, base_offset, last_offset, n_records).
   */
  /** Per-partition offset-range manifest of one tier — the oracle-pinned
    * contract shape shared by [[archive]] and [[archiveRetention]]. */
  private def manifest(df: DataFrame, tier: String): DataFrame =
    df.groupBy("partition").agg(
      min("offset").as("base_offset"), max("offset").as("last_offset"),
      count(lit(1)).as("n_records"))
      .withColumn("tier", lit(tier))
      .select("tier", "partition", "base_offset", "last_offset", "n_records")

  def archive(log: DataFrame, tsCol: Column, cutoff: Column,
      localDir: String, archiveDir: String): DataFrame = {
    val cold = log.where(tsCol < cutoff)
    val hot = log.where(tsCol >= cutoff)
    cold.write.mode("overwrite").partitionBy("partition").parquet(archiveDir)
    hot.write.mode("overwrite").partitionBy("partition").parquet(localDir)
    manifest(cold, "archive").unionByName(manifest(hot, "local"))
  }

  /**
   * The tier-spanning log: archive ∪ local read as one DataFrame.
   * Predicates push into both scans; a fetch bounded to the hot tail
   * never decodes archive bytes (row-group stats prune them).
   */
  def read(spark: SparkSession, localDir: String, archiveDir: String): DataFrame =
    spark.read.parquet(archiveDir).unionByName(spark.read.parquet(localDir))

  /**
   * D7 cloud-retention sweep (`cluster/archival/` retention: the
   * ntp_archiver truncates the partition manifest and advances the
   * archive start offset): drop archived rows older than `retainAfter`,
   * write the surviving cold tier to `sweptDir` (a NEW prefix — object
   * stores version by writing fresh manifests, never in place), and
   * return the post-sweep manifest of both tiers. A partition whose
   * archive empties entirely leaves the archive manifest — its log now
   * starts in the local tier. One predicate rewrite of the cold tier
   * only; the hot tier is untouched and unlisted.
   */
  def archiveRetention(spark: SparkSession, localDir: String,
      archiveDir: String, tsCol: Column, retainAfter: Column,
      sweptDir: String): DataFrame = {
    val kept = spark.read.parquet(archiveDir).where(tsCol >= retainAfter)
    kept.write.mode("overwrite").partitionBy("partition").parquet(sweptDir)
    // read back with the known schema: a fully-aged cold tier (zero rows
    // kept anywhere) writes no data files, and schema inference on the
    // empty directory would throw — the natural end state of retention
    // must yield an archive-less manifest, not an error
    manifest(spark.read.schema(kept.schema).parquet(sweptDir), "archive")
      .unionByName(manifest(spark.read.parquet(localDir), "local"))
  }

  /**
   * Read-replica topic surface (reference `cluster/topic_properties.h:
   * 132-133` read_replica/read_replica_bucket,
   * `cluster/remote_topic_properties.h`; partition read-replica mode):
   * this cluster materializes ANOTHER cluster's topic read-only from
   * the origin's uploaded tier. Offsets are the ORIGIN's (identity via
   * the uploaded manifest — no re-sequencing), the replica HWM is the
   * last uploaded offset + 1 — the origin's hot tail, which never
   * reached the bucket, does not exist here — and produce is refused
   * (`adjacent_segment_merger.cc:70` asserts the mode; the create path
   * rejects writes with invalid_topic).
   */
  def readReplicaSurface(spark: SparkSession, archiveDir: String): DataFrame =
    spark.read.parquet(archiveDir)
      .groupBy("partition")
      .agg(min("offset").as("base_offset"),
        (max("offset") + 1).as("hwm"),
        count(lit(1)).as("n_records"))

  /** The produce guard on a read-replica topic: every record of the
    * batch is refused with `invalid_topic` — one literal projection,
    * no data movement. */
  def refuseProduce(batch: DataFrame): DataFrame =
    batch.withColumn("admitted", lit(false))
      .withColumn("error", lit("invalid_topic_read_replica"))
}
