package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * KIP-392 rack-aware replica selection for fetch-from-follower
 * (`kafka/server/handlers/fetch/replica_selector.h:41,49`,
 * `fetch.cc:1841` rack_aware_replica_selector::select_replica): a
 * consumer that announces a rack id may be steered to a same-rack
 * replica instead of the leader, cutting cross-AZ egress.
 *
 * Semantics preserved:
 *  - a consumer without a rack id always reads the leader
 *    (select_leader_replica, `fetch.cc:1843`);
 *  - only alive replicas on known, non-maintenance nodes are
 *    candidates (`fetch.cc:1854-1868`);
 *  - a candidate must be caught up to the consumer
 *    (log_end_offset >= fetch_offset, `fetch.cc:1872`) and the pick
 *    maximizes high_watermark (`fetch.cc:1873`); where the reference
 *    random-chooses among equal-HW replicas (`fetch.cc:1885`) this
 *    engine breaks the tie on the LOWEST node id — deterministic, so
 *    any engine re-derives the decision;
 *  - no eligible same-rack replica -> no preferred replica; the
 *    consumer stays on the leader.
 *
 * Shape: replica and node tables are control-plane bounded, so both
 * broadcast; the decision is one per-consumer aggregate over the
 * broadcast join — the consumer stream never shuffles.
 */
object ReplicaSelector {

  /**
   * `consumers`: (client, topic, partition, fetch_offset, rack) with
   * nullable rack. `replicas`: (topic, partition, node_id, is_leader,
   * high_watermark, log_end_offset, is_alive). `nodes`: (node_id, rack,
   * maintenance). Returns one row per consumer with `preferred_replica`
   * (nullable) and `selected_by` ('leader' | 'rack' | 'none').
   */
  def selectPreferredReplicas(consumers: DataFrame, replicas: DataFrame,
      nodes: DataFrame): DataFrame = {
    val reps = replicas.join(broadcast(nodes), Seq("node_id"))
      .select(col("topic"), col("partition"), col("node_id"),
        col("is_leader"), col("high_watermark"), col("log_end_offset"),
        col("is_alive"), col("rack").as("replica_rack"), col("maintenance"))
    val leaders = reps.where(col("is_leader"))
      .select(col("topic"), col("partition"), col("node_id").as("leader_id"))
    val joined = consumers
      .join(broadcast(reps), Seq("topic", "partition"), "left")
      .withColumn("eligible",
        col("rack").isNotNull && col("is_alive") && !col("maintenance") &&
          col("replica_rack") === col("rack") &&
          col("log_end_offset") >= col("fetch_offset"))
    // max HW, lowest-node tie-break: max over (hw, -node_id)
    val picked = joined
      .groupBy("client", "topic", "partition")
      .agg(max(when(col("eligible"),
        struct(col("high_watermark"), (-col("node_id")).as("neg_node")))).as("best"))
      .select(col("client"), col("topic"), col("partition"),
        (-col("best.neg_node")).as("rack_pick"))
    consumers
      .join(picked, Seq("client", "topic", "partition"), "left")
      .join(broadcast(leaders), Seq("topic", "partition"), "left")
      .select(col("client"), col("topic"), col("partition"), col("fetch_offset"),
        col("rack"),
        when(col("rack").isNull, col("leader_id"))
          .otherwise(col("rack_pick")).as("preferred_replica"),
        when(col("rack").isNull, "leader")
          .when(col("rack_pick").isNotNull, "rack")
          .otherwise("none").as("selected_by"))
  }
}
