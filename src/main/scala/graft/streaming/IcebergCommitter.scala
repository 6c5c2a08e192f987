package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * The datalake Iceberg file committer — the end-to-end seam between the
 * coordinator's exactly-once pending-file ledger and the Iceberg table
 * (reference `datalake/coordinator/iceberg_file_committer.cc:101-258`,
 * property codec `commit_offset_metadata.cc`).
 *
 * One committer pass per topic:
 *
 *  1. Read the table's committed coordinator offset back from the
 *     snapshot-property chain (`redpanda.commit-metadata`, a JSON
 *     `{"offset": N}` — `iceberg_file_committer.cc:59-96`). This is the
 *     crash-recovery dedup marker: it survives in the table even when
 *     the coordinator's `mark_files_committed` updates were lost.
 *  2. Every pending entry contributes its end offset to the
 *     per-partition `mark_files_committed` update REGARDLESS of dedup
 *     (`:152-158,203-216` — "intentionally collect the pending commit
 *     ... so we can replicate the fact that it was committed
 *     previously").
 *  3. Entries with `added_pending_at <=` the table's offset are
 *     DEDUP-SKIPPED (`:158-175`); the rest APPEND — all appended
 *     entries' files ride ONE merge-append transaction stamped with the
 *     new property value, the max appended `added_pending_at`
 *     (`:176-178,228-244`).
 *  4. When every file deduplicated, the catalog is not touched at all
 *     (`:218-226`) — the retry is metadata-reads only.
 *
 * The pending set is coordinator control-plane state (bounded by live
 * pending entries per topic, not by data volume), so the pass is a
 * driver-side fold like the reference's per-topic loop; the DATA path
 * (writing the parquet files) already ran distributed in the
 * multiplexer ([[IcebergFormat.stageAppend]]).
 */
object IcebergCommitter {

  /** Snapshot-summary key of the committed-offset marker
    * (`iceberg_file_committer.cc:59` `commit_meta_prop`). */
  val CommitMetaProp = "redpanda.commit-metadata"

  /** `to_json_str` (commit_offset_metadata.cc:49-64): `{"offset": N}`. */
  def offsetToJson(offset: Long): String = s"""{"offset": $offset}"""

  /** `parse_commit_offset_json` (commit_offset_metadata.cc:21-47):
    * object with an int64 `offset` member; anything else is a parse
    * error (None). */
  def parseOffsetJson(s: String): Option[Long] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      val doc = mapper.readTree(s)
      val off = doc.path("offset")
      if (doc.isObject && off.isIntegralNumber) Some(off.asLong) else None
    } catch { case _: java.io.IOException => None }
  }

  /** The table's committed coordinator offset, from the current
    * snapshot or its most recent ancestor (`:61-96`). */
  def committedOffset(spark: SparkSession, table: String): Option[Long] =
    IcebergFormat.snapshotProperty(spark, table, CommitMetaProp)
      .flatMap(parseOffsetJson)

  /** One pending file entry with its staged data files: the coordinator
    * ledger row (`state.h:24-36` — `added_pending_at` is the control-log
    * offset the add was admitted at, `entry_end` the range's last Kafka
    * offset) joined to the multiplexer's staged output. */
  final case class PendingFiles(partition: Int, addedAt: Long, entryEnd: Long,
      staged: IcebergFormat.StagedAppend)

  /** The committer's result: per-partition `mark_files_committed`
    * updates (partition → new committed offset), whether an Iceberg
    * transaction ran, the snapshot it produced, and the dedup split. */
  final case class CommitterPass(updates: Seq[(Int, Long)], icebergTxn: Boolean,
      snapshotId: Option[Long], appended: Int, dedupSkipped: Int)

  /**
   * `commit_topic_files_to_catalog` (`:101-258`) for one topic. No
   * pending entries → no updates, no transaction. Otherwise: dedup
   * against the table's property offset, one merge-append of every
   * surviving entry's files with the new property, and the full update
   * set. Crash-retry safe: re-running the same pass after the Iceberg
   * commit landed (but before the coordinator applied the updates)
   * dedups everything and leaves the table untouched.
   */
  def commitTopicFiles(spark: SparkSession, table: String,
      pending: Seq[PendingFiles]): CommitterPass = {
    if (pending.isEmpty) return CommitterPass(Nil, icebergTxn = false, None, 0, 0)
    val tableOffset = committedOffset(spark, table)
    // pending_commits: EVERY entry's end offset, appended or not (:152-158)
    val updates = pending.groupBy(_.partition).view
      .mapValues(_.map(_.entryEnd).max).toSeq.sortBy(_._1)
    val (skipped, appendable) =
      pending.partition(e => tableOffset.exists(e.addedAt <= _))
    if (appendable.isEmpty)
      CommitterPass(updates, icebergTxn = false, None, 0, skipped.size)
    else {
      val newOffset = appendable.map(_.addedAt).max
      val (snapId, _) = IcebergFormat.commitStagedMany(spark, table,
        appendable.sortBy(e => (e.partition, e.addedAt)).map(_.staged),
        Map(CommitMetaProp -> offsetToJson(newOffset)))
      CommitterPass(updates, icebergTxn = true, Some(snapId),
        appendable.size, skipped.size)
    }
  }
}
