package graft.groups

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * G4 partition-assignment strategies (SURVEY §2.5): the plans a consumer
 * group's leader computes when the FSM (G1) has negotiated a protocol.
 *
 * Reference: the client ships `range` — per topic, partitions split into
 * contiguous runs of `len = P / M` with the first `P % M` members taking
 * one extra (`kafka/client/assignment_plans.cc:60-86`); the broker's
 * group FSM transports member metadata/assignments opaquely and only
 * selects the protocol name (`kafka/server/group.h:499-530`), so
 * round-robin and sticky follow the public Kafka assignor semantics the
 * wire protocol names.
 *
 * Spark design: inputs are control-plane tables — `members(member_id)`,
 * `topics(topic, n_partitions)`, for sticky also the prior
 * `assignment(topic, partition, member_id)` — bounded by cluster
 * metadata size (members × topics), NOT by data volume, so the global
 * orderings below (single-partition windows, a driver-side member
 * count) are bounded metadata operations, the same scale class as the
 * reference leader computing the plan in memory. Output is always
 * `(topic, partition, member_id)`.
 */
object Assignment {

  /** Deterministic member index: Kafka assignors sort member ids; the
    * reference's range plan walks the member list in order. */
  private def ranked(members: DataFrame): DataFrame =
    members.select(col("member_id")).distinct()
      .withColumn("__m_idx",
        (row_number().over(Window.orderBy("member_id")) - 1).cast("int"))

  /** (topic, partition) rows for every partition of every topic. */
  private def partitionsOf(topics: DataFrame): DataFrame =
    topics.where(col("n_partitions") > 0)
      .select(col("topic"), col("n_partitions").cast("long").as("__n"),
        explode(sequence(lit(0L), col("n_partitions").cast("long") - 1)).as("partition"))

  /**
   * `range`: per topic, member i takes the i-th contiguous run
   * (`assignment_plans.cc:60-86`). Closed-form per partition: with
   * `len = P / M`, `rem = P % M`, partition p belongs to member
   * `p / (len+1)` while p sits in the first `rem` long runs, else
   * `rem + (p - rem*(len+1)) / len`. Members beyond P get nothing.
   */
  def rangeAssign(members: DataFrame, topics: DataFrame): DataFrame = {
    val m = ranked(members)
    val mc = m.count()
    val len = floor(col("__n") / mc)
    val rem = col("__n") % mc
    val split = rem * (len + 1)
    val idx = when(col("partition") < split, floor(col("partition") / (len + 1)))
      // greatest() only guards the 0-division Spark would raise eagerly
      // under ANSI; when len = 0 every partition sits below `split`, so
      // this branch is never taken with the guarded value.
      .otherwise(rem + floor((col("partition") - split) / greatest(len, lit(1L))))
    partitionsOf(topics).withColumn("__m_idx", idx.cast("int"))
      .join(broadcast(m), "__m_idx")
      .select("topic", "partition", "member_id")
  }

  /**
   * `roundrobin` (public Kafka assignor): all topic-partitions in
   * (topic, partition) order dealt cyclically over the sorted members.
   */
  def roundRobinAssign(members: DataFrame, topics: DataFrame): DataFrame = {
    val m = ranked(members)
    val mc = m.count()
    val w = Window.orderBy("topic", "partition")
    partitionsOf(topics)
      .withColumn("__m_idx", ((row_number().over(w) - 1) % mc).cast("int"))
      .join(broadcast(m), "__m_idx")
      .select("topic", "partition", "member_id")
  }

  /**
   * `sticky` (KIP-54 objective, deterministic one-shot form): every
   * prior-assignment row whose member is still in the group and whose
   * partition still exists is kept UP TO the balance target
   * `target = ceil(total / M)` — a member holding more than target
   * (e.g. after new members join) REVOKES its excess, highest
   * (topic, partition) rows first, into the orphan pool. Orphaned
   * partitions (departed owners, new partitions, revocations) then fill
   * members up to target capacity, least-loaded member first.
   * Concretely: each member with `deficit = target - kept_load > 0`
   * contributes that many slots; slots order by (round, kept_load,
   * member_id) so each "round" gives one slot to every member that
   * still has room — exactly iterative least-loaded assignment,
   * expressed as one join; orphans in (topic, partition) order take
   * slots in order. Stickiness (kept rows never move) is subordinate to
   * balance (no member exceeds target), as in KIP-54; both hold by
   * construction.
   */
  def stickyAssign(prior: DataFrame, members: DataFrame, topics: DataFrame): DataFrame = {
    val m = ranked(members)
    val mc = m.count()
    val parts = partitionsOf(topics).select("topic", "partition")
    val total = parts.count()
    val target = (total + mc - 1) / mc
    // revoke excess above target: the per-member rank window is bounded
    // by that member's prior load, never the corpus
    val keptW = Window.partitionBy("member_id").orderBy("topic", "partition")
    val kept = parts.join(
        prior.join(m.select("member_id"), Seq("member_id"))
          .select("topic", "partition", "member_id"),
        Seq("topic", "partition"))
      .withColumn("__rk", row_number().over(keptW))
      .where(col("__rk") <= target)
      .drop("__rk")
    val orphans = parts.join(kept.select("topic", "partition"),
      Seq("topic", "partition"), "left_anti")
    val loads = m.select(col("member_id"))
      .join(kept.groupBy("member_id").agg(count(lit(1)).as("__load")), Seq("member_id"), "left")
      .withColumn("__load", coalesce(col("__load"), lit(0L)))
    val slots = loads
      .withColumn("__deficit", greatest(lit(target) - col("__load"), lit(0L)))
      .where(col("__deficit") > 0)
      .select(col("member_id"), col("__load"),
        explode(sequence(lit(0L), col("__deficit") - 1)).as("__round"))
    val slotW = Window.orderBy(col("__round"), col("__load"), col("member_id"))
    val rankedSlots = slots
      .withColumn("__slot", (row_number().over(slotW) - 1).cast("long"))
      .select("member_id", "__slot")
    val ow = Window.orderBy("topic", "partition")
    val filled = orphans
      .withColumn("__slot", (row_number().over(ow) - 1).cast("long"))
      .join(broadcast(rankedSlots), "__slot")
      .select("topic", "partition", "member_id")
    kept.unionByName(filled)
  }
}
