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
    // Fold each partition's replica set (bounded by the replication
    // factor) into ONE broadcast row, so the decision is a single
    // projection on the consumer side: broadcast join + array filter +
    // array max. The consumer stream itself never shuffles and never
    // aggregates — a billion consumers resolve at scan speed.
    val repSets = replicas.join(broadcast(nodes), Seq("node_id"))
      .groupBy("topic", "partition")
      .agg(
        collect_list(struct(
          col("node_id"), col("high_watermark"), col("log_end_offset"),
          col("is_alive"), col("rack").as("replica_rack"),
          col("maintenance"))).as("reps"),
        max(when(col("is_leader"), col("node_id"))).as("leader_id"))
    // max HW, lowest-node tie-break: array_max over (hw, -node_id)
    val best = array_max(transform(
      filter(col("reps"), r =>
        r("is_alive") && !r("maintenance") &&
          r("replica_rack") === col("rack") &&
          r("log_end_offset") >= col("fetch_offset")),
      r => struct(r("high_watermark").as("hw"), (-r("node_id")).as("neg_node"))))
    consumers
      .join(broadcast(repSets), Seq("topic", "partition"), "left")
      .withColumn("__best", best)
      .select(col("client"), col("topic"), col("partition"), col("fetch_offset"),
        col("rack"),
        when(col("rack").isNull, col("leader_id"))
          .otherwise(-col("__best.neg_node")).as("preferred_replica"),
        when(col("rack").isNull, "leader")
          .when(col("__best").isNotNull, "rack")
          .otherwise("none").as("selected_by"))
  }
}
