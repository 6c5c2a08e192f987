package graft.admin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Partition balancer planner (reference
 * `cluster/partition_balancer_planner.h:65` / `.cc`, types in
 * `partition_balancer_types.h`): given the cluster health report —
 * per-node disk totals/usage, availability, decommission flags, rack
 * labels, and the partition replica map with sizes — detect violations
 * and plan replica moves, in the reference's priority order
 * (`change_reason`, planner.h:81-87):
 *
 *   1. `node_decommissioning` — drain every replica off nodes leaving;
 *   2. `node_unavailable`     — repair replicas on dead nodes;
 *   3. `rack_constraint_repair` — a partition with two replicas in one
 *      rack moves one to an unrepresented rack;
 *   4. `disk_full` — nodes over the soft max disk ratio
 *      (planner_config `soft_max_disk_usage_ratio`, types.h:37) shed
 *      their largest partitions until under.
 *
 * (The backend's steady-state partition-COUNT rebalancing loop is the
 * remaining reason; it only runs when no violation pends and is not
 * modeled here.)
 *
 * Spark shape: violation DETECTION is declarative DataFrame work over
 * the health-report tables (bounded control-plane metadata — even a
 * 100k-partition cluster's replica map is a few hundred thousand
 * rows). The PLAN itself is a deterministic greedy fold on the driver,
 * exactly like the reference: its planner is a single control-plane
 * loop over the collected health report, not a data-plane job. Every
 * choice ties are broken on (size desc, topic, partition, node id), so
 * any engine re-derives the identical plan.
 *
 * Allocation rule (the `partition_allocator` constraint set): a target
 * must be alive, not decommissioning, not already hold a replica of
 * the partition, and — preferred — sit in a rack the partition does
 * not yet occupy (rack-aware placement; falls back to any non-replica
 * node when no rack-diverse one fits); among valid targets the most
 * FREE bytes wins (after planned moves), ties to the lowest node id.
 * A move with no valid target is counted, not planned
 * (`failed_actions_count`).
 *
 * Inputs:
 *  - `nodes`: (node_id int, rack string, total_bytes long,
 *     used_bytes long, available boolean, decommissioning boolean)
 *  - `replicas`: (topic string, partition int, node_id int,
 *     size_bytes long)
 */
object Balancer {

  /**
   * Violation report (`partition_balancer_violations`): one row per
   * finding — `kind` ∈ node_unavailable | node_decommissioning (node
   * scope, partition/topic null) | rack_constraint | disk_full. Pure
   * DataFrame detection, no fold.
   */
  def violations(nodes: DataFrame, replicas: DataFrame,
      softMaxDiskRatio: Double): DataFrame = {
    val nodeViol = nodes
      .where(!col("available") || col("decommissioning") ||
        col("used_bytes").cast("double") > col("total_bytes") * softMaxDiskRatio)
      .select(
        when(!col("available"), "node_unavailable")
          .when(col("decommissioning"), "node_decommissioning")
          .otherwise("disk_full").as("kind"),
        col("node_id"),
        lit(null).cast("string").as("topic"),
        lit(null).cast("int").as("partition"))
    val rackViol = replicas.join(nodes.select("node_id", "rack"), "node_id")
      .groupBy("topic", "partition")
      .agg(count(lit(1)).as("__n"), countDistinct("rack").as("__nracks"))
      .where(col("__nracks") < col("__n"))
      .select(lit("rack_constraint").as("kind"),
        lit(null).cast("int").as("node_id"), col("topic"), col("partition"))
    nodeViol.unionByName(rackViol)
  }

  private final case class N(id: Int, rack: String, total: Long,
      var used: Long, available: Boolean, decommissioning: Boolean)

  /**
   * Plan ONE round of replica moves (the backend replans every tick, so
   * e.g. a rack holding three replicas of one partition repairs one
   * replica per round). Returns one row per action in plan order:
   * `(ord, topic, partition, from_node, to_node, reason)`; a move with
   * no valid target keeps its row with `to_node = -1, reason =
   * 'failed'` (the planner's `failed_actions_count`).
   */
  def planActions(nodes: DataFrame, replicas: DataFrame,
      softMaxDiskRatio: Double): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val ns = nodes.select("node_id", "rack", "total_bytes", "used_bytes",
        "available", "decommissioning")
      .collect().map(r => N(r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .map(n => n.id -> n).toMap
    // replica map: (topic, partition) -> mutable set of (node, size)
    val reps = scala.collection.mutable.Map.empty[(String, Int),
      scala.collection.mutable.Map[Int, Long]]
    replicas.select("topic", "partition", "node_id", "size_bytes").collect()
      .foreach { r =>
        reps.getOrElseUpdate((r.getString(0), r.getInt(1)),
          scala.collection.mutable.Map.empty)(r.getInt(2)) = r.getLong(3)
      }
    val plan = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Int, Int, Int, String)]
    var ord = 0

    def freeOf(n: N): Long = n.total - n.used
    def allocate(tp: (String, Int), size: Long, from: Int): Option[Int] = {
      val occupied = reps(tp).keySet
      val racksHeld = (occupied - from).flatMap(ns.get).map(_.rack)
      // a target must stay UNDER the soft disk ratio after the move —
      // the allocator's full-node soft constraint (the planner never
      // creates the violation it exists to repair)
      val candidates = ns.values.toSeq
        .filter(n => n.available && !n.decommissioning && !occupied.contains(n.id))
        .filter(n => freeOf(n) >= size &&
          (n.used + size).toDouble <= n.total * softMaxDiskRatio)
      val rackDiverse = candidates.filterNot(n => racksHeld.contains(n.rack))
      val pool = if (rackDiverse.nonEmpty) rackDiverse else candidates
      // most free bytes after planned moves; ties to the lowest id
      pool.sortBy(n => (-freeOf(n), n.id)).headOption.map(_.id)
    }
    def move(tp: (String, Int), from: Int, size: Long, reason: String): Unit = {
      allocate(tp, size, from) match {
        case Some(to) =>
          plan += ((ord, tp._1, tp._2, from, to, reason))
          reps(tp) -= from
          reps(tp)(to) = size
          ns(from).used -= size
          ns(to).used += size
        case None =>
          plan += ((ord, tp._1, tp._2, from, -1, "failed"))
      }
      ord += 1
    }

    // 1+2: drain decommissioning, then repair unavailable — per node in
    // id order, partitions in (topic, partition) order
    for (reason <- Seq("node_decommissioning", "node_unavailable")) {
      val bad = ns.values.toSeq
        .filter(n => if (reason == "node_decommissioning") n.decommissioning
          else !n.available && !n.decommissioning)
        .sortBy(_.id)
      bad.foreach { n =>
        reps.toSeq.filter(_._2.contains(n.id)).map(_._1).sorted.foreach { tp =>
          move(tp, n.id, reps(tp)(n.id), reason)
        }
      }
    }
    // 3: rack constraint — move the duplicate-rack replica sitting on
    // the fullest node (ratio desc, ties to higher id)
    reps.keys.toSeq.sorted.foreach { tp =>
      val byRack = reps(tp).keys.toSeq.flatMap(ns.get).groupBy(_.rack)
      byRack.toSeq.sortBy(_._1).foreach { case (_, dup) =>
        if (dup.length > 1) {
          val victim = dup.sortBy(n =>
            (-(n.used.toDouble / n.total), -n.id)).head
          move(tp, victim.id, reps(tp)(victim.id), "rack_constraint_repair")
        }
      }
    }
    // 4: disk full — nodes over the soft ratio shed largest first
    ns.values.toSeq.sortBy(_.id).foreach { n =>
      var shed = reps.toSeq.filter(_._2.contains(n.id))
        .map { case (tp, m) => (tp, m(n.id)) }
        .sortBy { case (tp, sz) => (-sz, tp) }
      while (n.used.toDouble > n.total * softMaxDiskRatio && shed.nonEmpty) {
        val (tp, sz) = shed.head
        shed = shed.tail
        if (reps(tp).contains(n.id)) move(tp, n.id, sz, "disk_full")
      }
    }
    plan.toSeq.toDF("ord", "topic", "partition", "from_node", "to_node", "reason")
  }

  /**
   * Leadership balancer (`cluster/scheduling/leader_balancer.h` +
   * `leader_balancer_constraints.cc`): leadership — not replicas —
   * moves between a partition's existing replica holders to even out
   * load. Two squared-error objectives, evaluated hierarchically
   * exactly as `find_movement` does (shard load first, per-topic
   * distribution as the tie-breaker, each behind an `error_jitter`
   * threshold):
   *
   *  - even shard load: Σ over nodes of (leaders − total/n_nodes)²
   *    (`even_shard_load_constraint::adjusted_error`);
   *  - even topic distribution: per topic, Σ over nodes of
   *    (topic_leaders − topic_total/n_nodes)²
   *    (`even_topic_distribution_constraint`).
   *
   * The reference's production strategy samples random candidate moves;
   * this engine's plan must be reproducible, so each round takes the
   * BEST candidate (largest shard-error reduction, then largest topic
   * reduction, then smallest (topic, partition, to_node)) until no move
   * improves either objective. The reference balances per CORE
   * (broker_shard); Spark has no per-core leadership, so the shard here
   * is the node. Control-plane fold on the driver, like the reference's
   * balancer fiber.
   *
   * `replicas` columns: (topic, partition, node_id, is_leader).
   * Returns (ord, topic, partition, from_node, to_node).
   */
  def leaderPlan(replicas: DataFrame, maxMoves: Int = 1000): DataFrame = {
    val spark = replicas.sparkSession
    import spark.implicits._
    val jitter = 1e-6
    val rows = replicas.select("topic", "partition", "node_id", "is_leader")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    val nodes = rows.map(_._3).distinct.sorted
    val holders = rows.groupBy(r => (r._1, r._2)).map { case (tp, rs) =>
      tp -> rs.map(_._3).toSet
    }
    val leader = scala.collection.mutable.Map.empty[(String, Int), Int]
    rows.filter(_._4).foreach(r => leader((r._1, r._2)) = r._3)
    require(leader.keySet == holders.keySet, "every partition needs exactly one leader")
    val nN = nodes.length.toDouble
    val count = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val topicCount = scala.collection.mutable.Map.empty[(String, Int), Int].withDefaultValue(0)
    leader.foreach { case ((t, _), n) =>
      count(n) += 1; topicCount((t, n)) += 1
    }
    val target = leader.size / nN
    val topicTotals = leader.keys.groupBy(_._1).map { case (t, ps) => t -> ps.size }

    def sq(x: Double) = x * x
    // adjusted_error deltas: only the from/to terms change
    def shardDelta(from: Int, to: Int): Double =
      (sq(count(from) - target) + sq(count(to) - target)) -
        (sq(count(from) - 1 - target) + sq(count(to) + 1 - target))
    def topicDelta(t: String, from: Int, to: Int): Double = {
      val opt = topicTotals(t) / nN
      (sq(topicCount((t, from)) - opt) + sq(topicCount((t, to)) - opt)) -
        (sq(topicCount((t, from)) - 1 - opt) + sq(topicCount((t, to)) + 1 - opt))
    }

    val plan = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Int, Int)]
    var moved = true
    while (moved && plan.length < maxMoves) {
      moved = false
      val candidates = leader.toSeq.flatMap { case ((t, p), from) =>
        (holders((t, p)) - from).toSeq.map { to =>
          (shardDelta(from, to), topicDelta(t, from, to), t, p, from, to)
        }
      }.filter { case (sd, td, _, _, _, _) =>
        sd > jitter || (math.abs(sd) <= jitter && td > jitter)
      }
      if (candidates.nonEmpty) {
        val (_, _, t, p, from, to) = candidates
          .minBy { case (sd, td, ct, cp, _, cto) => (-sd, -td, ct, cp, cto) }
        plan += ((plan.length, t, p, from, to))
        leader((t, p)) = to
        count(from) -= 1; count(to) += 1
        topicCount((t, from)) -= 1; topicCount((t, to)) += 1
        moved = true
      }
    }
    plan.toSeq.toDF("ord", "topic", "partition", "from_node", "to_node")
  }
}
