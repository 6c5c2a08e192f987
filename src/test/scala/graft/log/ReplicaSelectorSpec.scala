package graft.log

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KIP-392 rack-aware replica selection (fetch.cc:1841 semantics). */
class ReplicaSelectorSpec extends SparkSpec {
  import spark.implicits._

  private val nodes = Seq(
    (0L, "r1", false), (1L, "r1", true), (2L, "r2", false), (3L, "r2", false))
    .toDF("node_id", "rack", "maintenance")

  private val replicas = Seq(
    // p0: leader 0 (r1); follower 2 (r2) caught up; follower 3 (r2) behind
    ("t", 0, 0L, true, 100L, 100L, true),
    ("t", 0, 2L, false, 100L, 100L, true),
    ("t", 0, 3L, false, 90L, 50L, true),
    // p1: r1 followers are a maintenance node and a dead node
    ("t", 1, 2L, true, 80L, 80L, true),
    ("t", 1, 1L, false, 80L, 80L, true),
    ("t", 1, 0L, false, 80L, 80L, false))
    .toDF("topic", "partition", "node_id", "is_leader",
      "high_watermark", "log_end_offset", "is_alive")

  private def select(cons: Seq[(String, String, Int, Long, String)]) =
    ReplicaSelector.selectPreferredReplicas(
        cons.toDF("client", "topic", "partition", "fetch_offset", "rack")
          .withColumn("rack", when(col("rack") =!= "", col("rack"))),
        replicas, nodes)
      .select("client", "preferred_replica", "selected_by")
      .as[(String, Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("leader for rackless; same-rack max-HW pick; behind/dead/maintenance filtered") {
    val d = select(Seq(
      ("a", "t", 0, 60L, ""),    // no rack -> leader 0
      ("b", "t", 0, 60L, "r2"),  // r2: node 2 (hw 100, caught up) beats node 3 (behind)
      ("c", "t", 0, 60L, "r1"),  // r1: leader node 0 itself is the rack pick
      ("d", "t", 0, 101L, "r2"), // nobody's leo >= 101 -> none
      ("e", "t", 1, 10L, "r1"))) // r1 replicas: maintenance + dead -> none
    assert(d("a") === ((Some(0L), "leader")))
    assert(d("b") === ((Some(2L), "rack")))
    assert(d("c") === ((Some(0L), "rack")))
    assert(d("d") === ((None, "none")))
    assert(d("e") === ((None, "none")))
  }

  test("equal high watermarks break to the lowest node id") {
    val d = select(Seq(("x", "t", 0, 0L, "r2")))
    // nodes 2 and 3 are both r2; 3 has lower hw here, so 2 wins outright;
    // probe the tie on p0 by raising 3 to equal hw via a fresh table
    val tied = Seq(
      ("t", 0, 2L, false, 100L, 100L, true),
      ("t", 0, 3L, false, 100L, 100L, true),
      ("t", 0, 0L, true, 100L, 100L, true))
      .toDF("topic", "partition", "node_id", "is_leader",
        "high_watermark", "log_end_offset", "is_alive")
    val t = ReplicaSelector.selectPreferredReplicas(
        Seq(("y", "t", 0, 0L, "r2")).toDF("client", "topic", "partition", "fetch_offset", "rack"),
        tied, nodes)
      .select("preferred_replica").as[Option[Long]].collect()
    assert(d("x")._1 === Some(2L))
    assert(t.head === Some(2L)) // min node id among equal-HW r2 replicas
  }
}
