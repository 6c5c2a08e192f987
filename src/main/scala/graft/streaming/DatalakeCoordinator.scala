package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Datalake coordinator exactly-once file-admission FSM (reference
 * `datalake/coordinator/state.h:24-114`, `state_update.cc:30-285`):
 * the mechanism behind exactly-once topic→Iceberg delivery. Per Kafka
 * partition the coordinator tracks a deque of PENDING file entries
 * (translated offset ranges not yet committed to the catalog) plus the
 * last committed Kafka offset; per topic it tracks a revision and a
 * lifecycle state (live → closed → purged).
 *
 * Update validation (first failing rule wins, reference order):
 *
 *  - `add_files` (`state_update.cc:47-98`): empty entry set →
 *    `no_entries`; unregistered topic → `not_registered`; revision
 *    mismatch → `revision_mismatch`; lifecycle != live →
 *    `topic_closed`; then the exactly-once ladder — a partition with no
 *    state at all accepts any start, otherwise the new range must start
 *    exactly at `next_offset(last_added)` where `last_added` is the
 *    last pending entry's end (or `last_committed` when nothing is
 *    pending); any gap OR overlap → `not_contiguous` (a retried
 *    duplicate add re-sends an already-tracked start, so the same rule
 *    is what dedups retries). Only the FIRST entry's start is checked —
 *    intra-batch contiguity is the builder's invariant, as in the
 *    reference (`:86`).
 *  - `mark_files_committed` (`state_update.cc:147-189`): unregistered →
 *    `not_registered`; revision mismatch → `revision_mismatch`; no
 *    partition state or no pending entries → `no_files`;
 *    `last_committed >= new_committed` → `stale_commit`; the offset
 *    must equal some pending entry's end → else `no_entry_boundary`.
 *    NOTE: no lifecycle check — a closed topic still commits its
 *    already-accepted files (`state.h:92-94`). Apply drops the
 *    committed prefix (`:200-207`) and advances `last_committed`.
 *  - `topic_lifecycle_update` (`state_update.cc:211-285`): unknown
 *    topic registers directly; `revision < current` →
 *    `obsolete_revision`; `revision > current` requires the old
 *    revision purged → else `not_purged`; same-revision backward
 *    transition → `invalid_transition`; purge with pending entries →
 *    `has_pending`; same state → `noop`. A successful purge clears all
 *    partition state (`:280-283`).
 *
 * Spark design: the control log is one raft partition per coordinator
 * in the reference; here the fold repartitions by topic (commands for
 * different topics are independent) and runs a single sorted pass per
 * topic with O(pending entries) state — the same one-pass control-log
 * fold shape as [[graft.cluster.DataMigrations]]. Everything
 * downstream (the final per-partition state table) is declarative over
 * the outcome log.
 */
object DatalakeCoordinator {

  final case class Cmd(seq: Long, op: String, topic: String, partition: Int,
      revision: Long, target: String, add_start: Long, entry_ends: Seq[Long],
      new_committed: Long)

  /** One row per command: the errc and the affected partition's state
    * after it (topic lifecycle/revision after, for lifecycle rows). */
  final case class Outcome(seq: Long, op: String, topic: String, partition: Int,
      errc: String, lifecycle: String, revision: Long,
      last_committed: java.lang.Long, pending_count: Int,
      pending_last: java.lang.Long)

  private final class PartState {
    var lastCommitted: java.lang.Long = null
    val pendingEnds = scala.collection.mutable.ArrayDeque[Long]()
  }
  private final class TopicState(var revision: Long, var lifecycle: String) {
    val parts = scala.collection.mutable.LinkedHashMap[Int, PartState]()
  }

  private val LifecycleRank = Map("live" -> 0, "closed" -> 1, "purged" -> 2)

  /**
   * Replay the coordinator control log `(seq, op, topic, partition,
   * revision, target, add_start, entry_ends, new_committed)` where op ∈
   * {lifecycle, add_files, mark_committed}. Emits one [[Outcome]] row
   * per command. Commands of distinct topics are independent, so the
   * fold shuffles once on topic and sorts each partition by (topic,
   * seq) — no driver collect, state bounded by live pending entries.
   */
  def outcomes(controlLog: DataFrame): DataFrame = {
    val spark = controlLog.sparkSession
    import spark.implicits._
    controlLog.select(col("seq").cast("long"), col("op"), col("topic"),
        col("partition").cast("int"), col("revision").cast("long"),
        col("target"), col("add_start").cast("long"),
        col("entry_ends").cast("array<long>"), col("new_committed").cast("long"))
      .as[Cmd]
      .repartition(col("topic"))
      .sortWithinPartitions("topic", "seq")
      .mapPartitions { it =>
        val topics = scala.collection.mutable.HashMap[String, TopicState]()
        def out(c: Cmd, errc: String, t: Option[TopicState]): Outcome = {
          val ts = t.orNull
          val ps = if (ts == null) null else ts.parts.get(c.partition).orNull
          Outcome(c.seq, c.op, c.topic, c.partition, errc,
            if (ts == null) "unregistered" else ts.lifecycle,
            if (ts == null) -1L else ts.revision,
            if (ps == null) null else ps.lastCommitted,
            if (ps == null) 0 else ps.pendingEnds.size,
            if (ps == null || ps.pendingEnds.isEmpty) null
            else java.lang.Long.valueOf(ps.pendingEnds.last))
        }
        it.map { c =>
          val cur = topics.get(c.topic)
          c.op match {
            case "add_files" =>
              // Ladder per add_files_update::can_apply (state_update.cc:47-98).
              if (c.entry_ends == null || c.entry_ends.isEmpty) out(c, "no_entries", cur)
              else cur match {
                case None => out(c, "not_registered", None)
                case Some(ts) if c.revision != ts.revision => out(c, "revision_mismatch", cur)
                case Some(ts) if ts.lifecycle != "live" => out(c, "topic_closed", cur)
                case Some(ts) =>
                  val ps = ts.parts.getOrElseUpdate(c.partition, new PartState)
                  val lastAdded: java.lang.Long =
                    if (ps.pendingEnds.nonEmpty) ps.pendingEnds.last else ps.lastCommitted
                  if (lastAdded == null || lastAdded + 1L == c.add_start) {
                    ps.pendingEnds ++= c.entry_ends
                    out(c, "success", cur)
                  } else out(c, "not_contiguous", cur)
              }
            case "mark_committed" =>
              // Ladder per mark_files_committed_update::can_apply (:147-189);
              // deliberately no lifecycle check — closed topics still commit.
              cur match {
                case None => out(c, "not_registered", None)
                case Some(ts) if c.revision != ts.revision => out(c, "revision_mismatch", cur)
                case Some(ts) =>
                  ts.parts.get(c.partition) match {
                    case None => out(c, "no_files", cur)
                    case Some(ps) if ps.pendingEnds.isEmpty => out(c, "no_files", cur)
                    case Some(ps) if ps.lastCommitted != null &&
                        ps.lastCommitted >= c.new_committed => out(c, "stale_commit", cur)
                    case Some(ps) if !ps.pendingEnds.contains(c.new_committed) =>
                      out(c, "no_entry_boundary", cur)
                    case Some(ps) =>
                      // Prefix drop of entries entirely below the new
                      // committed offset (state_update.cc:200-207).
                      while (ps.pendingEnds.nonEmpty && ps.pendingEnds.head <= c.new_committed)
                        ps.pendingEnds.removeHead()
                      ps.lastCommitted = c.new_committed
                      out(c, "success", cur)
                  }
              }
            case "lifecycle" =>
              // Ladder per topic_lifecycle_update::can_apply (:211-266).
              // An unparseable target (the reference's enum decode step)
              // is a graceful outcome row, not a thrown executor task.
              if (!LifecycleRank.contains(c.target)) out(c, "unknown_target", cur)
              else cur match {
                case None =>
                  val ts = new TopicState(c.revision, c.target)
                  topics(c.topic) = ts
                  out(c, "success", Some(ts))
                case Some(ts) if c.revision < ts.revision => out(c, "obsolete_revision", cur)
                case Some(ts) if c.revision > ts.revision =>
                  if (ts.lifecycle != "purged") out(c, "not_purged", cur)
                  else {
                    ts.revision = c.revision; ts.lifecycle = c.target
                    out(c, "success", cur)
                  }
                case Some(ts) if LifecycleRank(c.target) < LifecycleRank(ts.lifecycle) =>
                  out(c, "invalid_transition", cur)
                case Some(ts) if LifecycleRank(c.target) > LifecycleRank(ts.lifecycle) =>
                  if (c.target == "purged" && ts.parts.values.exists(_.pendingEnds.nonEmpty))
                    out(c, "has_pending", cur)
                  else {
                    ts.lifecycle = c.target
                    if (c.target == "purged") ts.parts.clear() // :280-283
                    out(c, "success", cur)
                  }
                case _ => out(c, "noop", cur)
              }
            case other => out(c, s"unknown_command:$other", cur)
          }
        }
      }
      .toDF()
  }

  /**
   * Surviving pending ENTRIES (entry-level, with their
   * `added_pending_at` control-log offsets — `state.h:24-36`),
   * declarative over the control log + outcome log: a pending entry is
   * a successfully-admitted add that post-dates the topic's last purge
   * and whose end offset is above the partition's final
   * `last_committed` (commits prefix-drop, purges clear —
   * `state_update.cc:200-207,280-283`).
   */
  def pendingEntries(controlLog: DataFrame, outcomesDf: DataFrame): DataFrame = {
    val okAdds = outcomesDf
      .where(col("op") === "add_files" && col("errc") === "success")
      .select(col("seq"), col("topic"), col("partition"), col("revision"))
    val lastPurge = outcomesDf
      .where(col("op") === "lifecycle" && col("errc") === "success" &&
        col("lifecycle") === "purged")
      .groupBy("topic").agg(max(col("seq")).as("purge_seq"))
    val finals = finalState(outcomesDf)
      .select(col("topic"), col("partition"),
        coalesce(col("last_committed"), lit(-1L)).as("final_committed"))
    controlLog
      .select(col("seq").cast("long"), col("topic"),
        col("partition").cast("int"),
        explode(col("entry_ends").cast("array<long>")).as("entry_end"))
      .join(okAdds, Seq("seq", "topic", "partition"))
      .join(lastPurge, Seq("topic"), "left")
      .where(col("purge_seq").isNull || col("seq") > col("purge_seq"))
      .join(finals, Seq("topic", "partition"))
      .where(col("entry_end") > col("final_committed"))
      .select(col("topic"), col("partition"), col("revision"),
        col("seq").as("added_at"), col("entry_end"))
  }

  /**
   * The Iceberg file-committer decision pass
   * (`iceberg_file_committer.cc:101-258`): given each topic's committed
   * coordinator offset read back from the table's snapshot-property
   * chain (`redpanda.commit-metadata`, `:59-95` — the crash-recovery
   * dedup marker), decide per pending entry whether its files APPEND to
   * the table or are DEDUP-SKIPPED (`added_pending_at <=` the table's
   * offset means a previous run already committed them, `:152-175`);
   * every pending entry still contributes its end offset to the
   * per-partition `mark_files_committed` update (`:147,203-216`), and
   * the table transaction is skipped entirely when every file
   * deduplicated (`:218-226`). The new property value is the max
   * `added_pending_at` among appended entries (`:176-178,230`).
   *
   * `tableCommitted`: one `(topic, committed_at)` row per topic that
   * has the property (absent topic = no property yet).
   */
  def commitDecisions(pending: DataFrame, tableCommitted: DataFrame): DataFrame =
    pending
      .join(broadcast(tableCommitted), Seq("topic"), "left")
      .withColumn("action",
        when(col("committed_at").isNotNull && col("added_at") <= col("committed_at"),
          "dedup_skip").otherwise("append"))
      .select(col("topic"), col("partition"), col("added_at"),
        col("entry_end"), col("action"))

  /** The per-partition `mark_files_committed` updates + per-topic txn
    * outcome the committer returns: every partition with pending
    * entries commits at its LAST pending end; `iceberg_txn` is false
    * when all files deduplicated; `new_property` stamps the appended
    * max `added_pending_at` into the next snapshot (null = table
    * untouched). */
  def commitUpdates(decisions: DataFrame): DataFrame = {
    val perTopic = decisions.groupBy("topic").agg(
      max(when(col("action") === "append", col("added_at"))).as("new_property"),
      (count(when(col("action") === "append", 1)) > 0).as("iceberg_txn"))
    decisions.groupBy("topic", "partition")
      .agg(max(col("entry_end")).as("new_committed"))
      .join(perTopic, Seq("topic"))
      .select(col("topic"), col("partition"), col("new_committed"),
        col("iceberg_txn"), col("new_property"))
  }

  /** Final per-partition coordinator state, declarative over the
    * outcome log: the last outcome row touching each (topic, partition)
    * already carries the state after it; a later successful purge of
    * the topic clears the partition (pid_to_pending_files reset,
    * state_update.cc:280-283), so partitions whose last touch precedes
    * such a purge drop out, and lifecycle/revision come from the last
    * lifecycle row of the topic. */
  def finalState(outcomesDf: DataFrame): DataFrame = {
    val dataRows = outcomesDf
      .where(col("op").isin("add_files", "mark_committed") && col("errc") === "success")
    // Join back on the winning seq rather than max_by per column:
    // max_by skips NULL values (and DuckDB's does too), which would
    // resurrect a stale pending_last after a draining commit.
    val lastSeq = dataRows.groupBy("topic", "partition")
      .agg(max(col("seq")).as("seq"))
    val lastPerPart = dataRows
      .join(lastSeq, Seq("topic", "partition", "seq"))
      .select(col("topic"), col("partition"), col("seq").as("last_seq"),
        col("last_committed"), col("pending_count"), col("pending_last"))
    val lastLifecycle = outcomesDf
      .where(col("op") === "lifecycle" && col("errc").isin("success", "noop"))
      .groupBy("topic").agg(
        max_by(col("lifecycle"), col("seq")).as("lifecycle"),
        max_by(col("revision"), col("seq")).as("revision"))
    val lastPurge = outcomesDf
      .where(col("op") === "lifecycle" && col("errc") === "success" &&
        col("lifecycle") === "purged")
      .groupBy("topic").agg(max(col("seq")).as("purge_seq"))
    lastPerPart
      .join(lastPurge, Seq("topic"), "left")
      .where(col("purge_seq").isNull || col("last_seq") > col("purge_seq"))
      .join(lastLifecycle, Seq("topic"), "left")
      .select(col("topic"), col("partition"), col("lifecycle"), col("revision"),
        col("last_committed"), col("pending_count"), col("pending_last"))
  }
}
