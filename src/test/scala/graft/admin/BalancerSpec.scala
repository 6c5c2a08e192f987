package graft.admin

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition balancer planner: violation detection and the
  * priority-ordered one-round plan. */
class BalancerSpec extends SparkSpec {
  import spark.implicits._

  // 7 nodes over 3 racks: 4 decommissioning, 6 dead, 3 over the 0.8
  // disk ratio
  private def nodes = Seq(
    (0, "r1", 1000L, 600L, true, false),
    (1, "r1", 1000L, 300L, true, false),
    (2, "r2", 1000L, 200L, true, false),
    (3, "r2", 1000L, 900L, true, false),
    (4, "r3", 1000L, 400L, true, true),
    (5, "r3", 1000L, 250L, true, false),
    (6, "r3", 1000L, 500L, false, false))
    .toDF("node_id", "rack", "total_bytes", "used_bytes", "available", "decommissioning")

  private def replicas = Seq(
    ("a", 0, 0, 100L), ("a", 0, 2, 100L), ("a", 0, 4, 100L),   // on decomm node
    ("b", 0, 0, 200L), ("b", 0, 1, 200L), ("b", 0, 2, 200L),   // rack dup r1
    ("c", 0, 3, 400L), ("c", 0, 1, 100L), ("c", 0, 5, 100L),   // big on full node
    ("c", 1, 3, 250L), ("c", 1, 0, 50L), ("c", 1, 5, 50L),
    ("d", 0, 3, 200L), ("d", 0, 1, 60L), ("d", 0, 5, 60L),
    ("e", 0, 6, 120L), ("e", 0, 1, 30L), ("e", 0, 2, 30L),     // on dead node
    ("f", 0, 6, 900L), ("f", 0, 0, 50L), ("f", 0, 3, 50L))     // unplaceable
    .toDF("topic", "partition", "node_id", "size_bytes")

  test("violations: node-scope flags plus rack duplicates, declaratively") {
    val v = Balancer.violations(nodes, replicas, softMaxDiskRatio = 0.8)
      .select("kind", "node_id", "topic", "partition")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)))).toSet
    assert(v === Set(
      ("node_decommissioning", Some(4), None, None),
      ("node_unavailable", Some(6), None, None),
      ("disk_full", Some(3), None, None),
      ("rack_constraint", None, Some("b"), Some(0))))
  }

  test("plan: priority order, rack-aware allocation, disk headroom, failed moves") {
    val plan = Balancer.planActions(nodes, replicas, softMaxDiskRatio = 0.8)
      .orderBy("ord")
      .as[(Int, String, Int, Int, Int, String)].collect().toSeq
    assert(plan === Seq(
      (0, "a", 0, 4, 5, "node_decommissioning"),  // r3 target keeps diversity
      (1, "e", 0, 6, 5, "node_unavailable"),
      (2, "f", 0, 6, -1, "failed"),               // 900 bytes fit nowhere
      (3, "b", 0, 0, 5, "rack_constraint_repair"),// fullest dup-rack node sheds
      (4, "c", 0, 3, 2, "disk_full")))            // largest first, r2 stays diverse
  }

  test("leader balancer: shard-load first, topic spread breaks ties, stops at equilibrium") {
    // leaders skewed onto node 0 (5 of 6); moves must go to replica
    // holders only
    val reps = Seq(
      ("t", 0, 0, true), ("t", 0, 1, false), ("t", 0, 2, false),
      ("t", 1, 0, true), ("t", 1, 1, false), ("t", 1, 3, false),
      ("t", 2, 0, true), ("t", 2, 2, false), ("t", 2, 3, false),
      ("t", 3, 0, true), ("t", 3, 1, false), ("t", 3, 2, false),
      ("u", 0, 0, true), ("u", 0, 1, false), ("u", 0, 2, false),
      ("u", 1, 1, true), ("u", 1, 2, false), ("u", 1, 3, false))
      .toDF("topic", "partition", "node_id", "is_leader")
    val plan = Balancer.leaderPlan(reps)
      .orderBy("ord").as[(Int, String, Int, Int, Int)].collect().toSeq
    assert(plan === Seq(
      (0, "t", 0, 0, 2),
      (1, "t", 1, 0, 3),
      (2, "t", 3, 0, 1)))
    // already balanced: nothing moves
    val even = Seq(
      ("t", 0, 0, true), ("t", 0, 1, false),
      ("t", 1, 1, true), ("t", 1, 0, false))
      .toDF("topic", "partition", "node_id", "is_leader")
    assert(Balancer.leaderPlan(even).count() === 0L)
  }

  test("plan is empty on a healthy balanced cluster") {
    val ok = Seq(
      (0, "r1", 1000L, 300L, true, false),
      (1, "r2", 1000L, 300L, true, false),
      (2, "r3", 1000L, 300L, true, false))
      .toDF("node_id", "rack", "total_bytes", "used_bytes", "available", "decommissioning")
    val reps = Seq(("t", 0, 0, 100L), ("t", 0, 1, 100L), ("t", 0, 2, 100L))
      .toDF("topic", "partition", "node_id", "size_bytes")
    assert(Balancer.planActions(ok, reps, 0.8).count() === 0L)
    assert(Balancer.violations(ok, reps, 0.8).count() === 0L)
  }
}
