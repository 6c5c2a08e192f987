package graft.groups

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.log.Compaction

/**
 * Consumer-group offset store + idempotent-producer dedup (SURVEY §2.5).
 *
 * G2: the reference persists per-(group, topic, partition) committed
 * offsets in the compacted `__consumer_offsets` topic
 * (`kafka/server/group.cc:2163` store_offsets, `model/namespace.h:40-43`);
 * offset_fetch returns the latest commit per key (`group.cc:2449`).
 * In Spark the store is exactly a compacted table: commit = append,
 * fetch = last-write-wins per key — the same operator as log compaction.
 *
 * G5: idempotent producers are deduplicated on (producer_id, sequence):
 * the first accepted write wins and later duplicates/reorders are dropped
 * (`cluster/producer_state.h:126,143`).
 */
object ConsumerGroups {

  /**
   * G2 offset_fetch over a commit log: latest committed offset per
   * (group, topic, partition). `commitLog` columns: group, topic,
   * partition, committed_offset, commit_seq (arrival order).
   */
  def fetchOffsets(commitLog: DataFrame): DataFrame =
    Compaction.compact(commitLog, Seq("group", "topic", "partition"), "commit_seq")

  /**
   * offset_delete (`kafka/server/handlers/offset_delete.cc`): remove a
   * group's committed offsets for given topic-partitions. On the
   * compacted store this is a tombstone append — the delete supersedes
   * earlier commits for its key, and a LATER commit resurrects the key —
   * exactly the reference's compacted `__consumer_offsets` semantics.
   * `deletes` columns: group, topic, partition, commit_seq. Returns the
   * post-delete fetch view.
   */
  def deleteOffsets(commitLog: DataFrame, deletes: DataFrame): DataFrame = {
    val commits = commitLog.withColumn("__deleted", lit(false))
    val tombs = deletes
      .withColumn("committed_offset", lit(null).cast("long"))
      .withColumn("__deleted", lit(true))
      .select(commits.columns.toIndexedSeq.map(col): _*)
    Compaction.compact(commits.unionByName(tombs), Seq("group", "topic", "partition"), "commit_seq")
      .where(!col("__deleted"))
      .drop("__deleted")
  }

  /**
   * delete_groups (`kafka/server/handlers/delete_groups.cc`): drop an
   * entire group — every offset key the group committed up to the
   * deletion dies with it, while commits sequenced AFTER the deletion
   * resurrect the group as a fresh incarnation (the compacted
   * `__consumer_offsets` behavior: the deletion is a group-wide
   * tombstone, not a key-by-key one). `deletions` columns: group,
   * commit_seq. The deletion set is admin-command-sized, so its
   * per-group max folds to a broadcast and the commit log is filtered
   * in one narrow pass before the usual LWW fetch view.
   */
  def deleteGroups(commitLog: DataFrame, deletions: DataFrame): DataFrame = {
    val delSeq = deletions.groupBy("group").agg(max("commit_seq").as("__del_seq"))
    val surviving = commitLog.join(broadcast(delSeq), Seq("group"), "left")
      .where(col("__del_seq").isNull || col("commit_seq") > col("__del_seq"))
      .drop("__del_seq")
    fetchOffsets(surviving)
  }

  /**
   * G5 idempotent-producer dedup: the first accepted write per
   * (producer_id, sequence) survives with all its payload columns —
   * exactly the reference's producer_state behavior, which keeps the first
   * record and rejects later duplicates/reorders
   * (`cluster/producer_state.h:126,143`). `attempts` counts how many
   * writes raced for the slot. One shuffle on the composite key; the
   * reference's per-pid sliding sequence window (`producer_state.h:56-86`)
   * is subsumed by exact grouping (Spark spills; no bounded-memory window
   * needed).
   */
  def dedupProducer(log: DataFrame, pidCol: String, seqCol: String, arrivalCol: String): DataFrame = {
    val key = Window.partitionBy(col(pidCol), col(seqCol))
    log.withColumn("__rn", row_number().over(key.orderBy(col(arrivalCol))))
      .withColumn("attempts", count(lit(1)).over(key))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Producer epoch fencing (`cluster/producer_state.h:143`): writes from a
   * stale epoch of a producer id are rejected once a higher epoch has been
   * seen. Batch semantics: keep only rows at each pid's maximum epoch.
   */
  def fenceStaleEpochs(log: DataFrame, pidCol: String, epochCol: String): DataFrame = {
    val maxEpoch = max(col(epochCol)).over(Window.partitionBy(col(pidCol)))
    log.withColumn("__me", maxEpoch).where(col(epochCol) === col("__me")).drop("__me")
  }

  final case class SeqRec(pid: Long, epoch: Int, seq: Long, arrival: Long)
  final case class SeqStatus(pid: Long, epoch: Int, seq: Long, arrival: Long, status: String)

  /**
   * G5 sequence validation — the replay of the reference's
   * `is_valid_sequence` admission (`cluster/producer_state.h:126`):
   * within a (pid, epoch) the next accepted sequence must be exactly
   * lastSeq+1 (0 for a fresh epoch); `seq <= last` is an idempotent
   * duplicate, `seq > last+1` is an out-of-order gap (rejected, state
   * unchanged); an epoch bump resets the expectation to 0 and any write
   * from an older epoch is fenced. One shuffle keyed by pid; per-pid
   * state is a pair of longs, so the fold scales to any producer count.
   */
  def validateSequences(log: DataFrame): DataFrame = {
    val spark = log.sparkSession
    import spark.implicits._
    // Secondary sort (repartition by pid + in-partition (pid, arrival)
    // order) so the admission fold streams each pid's history — a hot
    // producer never buffers its full command log in one task's heap.
    log.select(col("pid").cast("long"), col("epoch").cast("int"),
        col("seq").cast("long"), col("arrival").cast("long"))
      .as[SeqRec]
      .repartition(col("pid"))
      .sortWithinPartitions(col("pid"), col("arrival"))
      .mapPartitions { it =>
        var curPid = Long.MinValue
        var curEpoch = Int.MinValue
        var next = 0L
        it.map { r =>
          if (r.pid != curPid) { curPid = r.pid; curEpoch = Int.MinValue; next = 0L }
          val status =
            if (r.epoch < curEpoch) "fenced_epoch"
            else {
              if (r.epoch > curEpoch) { curEpoch = r.epoch; next = 0L }
              if (r.seq == next) { next += 1; "ok" }
              else if (r.seq < next) "duplicate_sequence"
              else "out_of_order_sequence"
            }
          SeqStatus(r.pid, r.epoch, r.seq, r.arrival, status)
        }
      }
      .toDF()
  }

  /**
   * Offset retention / expiry (KIP-211; `group.cc:3432-3589`
   * `filter_expired_offsets` / `get_expired_offsets` /
   * `delete_expired_offsets`): mark each committed offset expired or
   * retained under the per-state policy —
   *
   *  - consumer group, Stable: expire offsets of topics NOT in the
   *    group's live subscription once `retention` has passed since the
   *    offset's `commit_ts`; subscribed topics never expire.
   *  - consumer group, Empty: expire everything once `retention` has
   *    passed since the group BECAME empty (`state_ts`; falls back to
   *    `commit_ts` for old metadata with no state timestamp).
   *  - consumer group mid-rebalance (any other state): expire nothing.
   *  - no protocol type (standalone offset-storage client): expire on
   *    `commit_ts` alone.
   *
   * `non_reclaimable` offsets are always retained (the reference's
   * per-offset opt-out). Group metadata and subscriptions are
   * control-plane-sized and broadcast; the offsets table maps through
   * one narrow filter — no shuffle at any corpus size.
   *
   * `offsets`: (group, topic, partition, committed_offset, commit_ts,
   * non_reclaimable); `groupMeta`: (group, protocol_type nullable,
   * state, state_ts nullable); `subscriptions`: (group, topic) live
   * subscription pairs. Timestamps are epoch millis. Returns the
   * offsets with an `expired` flag (the reference's
   * delete_expired_offsets erases the true rows).
   */
  def expireOffsets(offsets: DataFrame, groupMeta: DataFrame,
      subscriptions: DataFrame, nowMs: Long, retentionMs: Long): DataFrame = {
    val subs = subscriptions.select(col("group"), col("topic"), lit(true).as("__sub"))
    val meta = groupMeta.select(col("group"), col("protocol_type"),
      col("state"), col("state_ts"))
    offsets
      .join(broadcast(meta), Seq("group"), "left")
      .join(broadcast(subs), Seq("group", "topic"), "left")
      .withColumn("__eligible",
        !col("non_reclaimable") &&
          (col("protocol_type").isNull ||
            col("state") === "Empty" ||
            (col("state") === "Stable" && coalesce(col("__sub"), lit(false)) === false)))
      .withColumn("__basis",
        when(col("protocol_type").isNull || col("state") === "Stable", col("commit_ts"))
          .when(col("state") === "Empty", coalesce(col("state_ts"), col("commit_ts"))))
      .withColumn("expired",
        col("__eligible") && col("__basis").isNotNull &&
          lit(nowMs) - col("__basis") >= lit(retentionMs))
      .select((offsets.columns.toIndexedSeq.map(col) :+ col("expired")): _*)
  }

  /**
   * The companion dead-group sweep (`group.cc:3584-3586`): an Empty
   * group whose offsets have all expired transitions to Dead. One tiny
   * aggregate over the post-expiry view joined back to the group table.
   */
  def deadGroups(expiryView: DataFrame, groupMeta: DataFrame): DataFrame = {
    val surviving = expiryView.where(!col("expired"))
      .groupBy("group").agg(count(lit(1)).as("__n"))
    groupMeta.join(surviving, Seq("group"), "left")
      .select(col("group"),
        when(col("state") === "Empty" && coalesce(col("__n"), lit(0L)) === 0, "Dead")
          .otherwise(col("state")).as("state"))
  }
}
