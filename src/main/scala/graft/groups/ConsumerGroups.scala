package graft.groups

import org.apache.spark.sql.DataFrame
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
   * G5 idempotent-producer dedup: first write per (producer_id, sequence)
   * is kept, subsequent duplicates are dropped. One shuffle on the
   * composite key; the reference's per-pid sliding sequence window
   * (`producer_state.h:56-86`) is subsumed by exact grouping (Spark
   * spills; no bounded-memory window needed).
   */
  def dedupProducer(log: DataFrame, pidCol: String, seqCol: String, arrivalCol: String): DataFrame =
    log.groupBy(col(pidCol), col(seqCol))
      .agg(min(arrivalCol).as("first_arrival"), count(lit(1)).as("attempts"))
}
