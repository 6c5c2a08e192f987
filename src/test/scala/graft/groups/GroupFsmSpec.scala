package graft.groups

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec
import GroupFsm._

/** Live-protocol replays of `kafka/server/tests/group_test.cc` shapes:
  * join barriers, sync completion, leader/protocol election, rebalance
  * generations, leaves, and the recovery-mode log replay. */
class GroupFsmSpec extends AnyFunSuite {

  private val P = Seq("range", "roundrobin")

  test("single member: join prepares, sync completes and stabilizes") {
    val afterJoin = replay(Seq(Join(1, "m1", P)))
    assert(afterJoin.state === State.PreparingRebalance)
    assert(afterJoin.generation === 0)
    val g = replay(Seq(Join(1, "m1", P), Sync(2, "m1")))
    assert(g.state === State.Stable)
    assert(g.generation === 1)
    assert(g.leader === Some("m1"))
    assert(g.protocol === Some("range"))
  }

  test("two joins then leader sync: one generation bump, leader = earliest") {
    val g = replay(Seq(Join(1, "m1", P), Join(2, "m2", P), Sync(3, "m1")))
    assert(g.state === State.Stable)
    assert(g.generation === 1)
    assert(g.leader === Some("m1"))
    assert(g.members.keySet === Set("m1", "m2"))
  }

  test("non-leader sync completes join but group awaits leader assignments") {
    val mid = replay(Seq(Join(1, "m1", P), Join(2, "m2", P), Sync(3, "m2")))
    assert(mid.state === State.CompletingRebalance)
    assert(mid.generation === 1)
    val done = replay(Seq(Join(1, "m1", P), Join(2, "m2", P), Sync(3, "m2"), Sync(4, "m1")))
    assert(done.state === State.Stable)
  }

  test("protocol vote picks leader's first protocol all members support") {
    val g = replay(Seq(
      Join(1, "m1", Seq("sticky", "range")), Join(2, "m2", Seq("range")), Sync(3, "m1")))
    assert(g.leader === Some("m1"))
    assert(g.protocol === Some("range")) // m2 doesn't support sticky
  }

  test("member leave triggers a new rebalance round") {
    val g = replay(Seq(
      Join(1, "m1", P), Join(2, "m2", P), Sync(3, "m1"), // gen 1 stable
      Leave(4, "m2")))
    assert(g.state === State.PreparingRebalance)
    assert(g.members.keySet === Set("m1"))
    val g2 = replay(Seq(
      Join(1, "m1", P), Join(2, "m2", P), Sync(3, "m1"), Leave(4, "m2"), Sync(5, "m1")))
    assert(g2.state === State.Stable)
    assert(g2.generation === 2)
  }

  test("last member leaving empties the group and bumps the generation") {
    val g = replay(Seq(Join(1, "m1", P), Sync(2, "m1"), Leave(3, "m1")))
    assert(g.state === State.Empty)
    assert(g.generation === 2)
    assert(g.leader === None)
  }

  test("stable-member rejoin with unchanged protocols is a no-op") {
    val base = Seq(Join(1, "m1", P), Sync(2, "m1"))
    val g = replay(base :+ Join(3, "m1", P))
    assert(g.state === State.Stable)
    assert(g.generation === 1)
    assert(g.members("m1").joinedSeq === 1)
  }

  test("heartbeats never change membership or generation") {
    val g = replay(Seq(Join(1, "m1", P), Sync(2, "m1"), Heartbeat(3, "m1"), Heartbeat(4, "mX")))
    assert(g.state === State.Stable)
    assert(g.generation === 1)
    assert(g.members.keySet === Set("m1"))
  }

  test("session expiry removes silent members and rebalances (heartbeat_expire)") {
    val g = replay(Seq(
      Join(1, "m1", P), Join(2, "m2", P), Sync(3, "m1"),
      Heartbeat(10, "m1"))) // m2 silent since seq 2
    val expired = GroupFsm.expireSessions(g, deadline = 5)
    assert(expired.members.keySet === Set("m1"))
    assert(expired.state === State.PreparingRebalance)
    // everyone silent => group empties with a generation bump
    val allGone = GroupFsm.expireSessions(g, deadline = 100)
    assert(allGone.state === State.Empty)
    assert(allGone.members.isEmpty)
  }

  test("recovery replay: immediate completion, generation counts effective changes") {
    val g = replayRecovery(Seq(
      Join(1, "m1", P),      // gen 1
      Join(2, "m2", P),      // gen 2
      Heartbeat(3, "m1"),
      Join(4, "m1", P),      // rejoin while present: no-op
      Leave(5, "m2"),        // gen 3
      Leave(6, "mX"),        // unknown: no-op
      Join(7, "m2", P)))     // gen 4
    assert(g.state === State.Stable)
    assert(g.generation === 4)
    assert(g.members.keySet === Set("m1", "m2"))
    assert(g.leader === Some("m1")) // earliest joinedSeq (1 < 7)
    assert(g.members("m2").joinedSeq === 7) // rejoin after leave resets join seq
  }

  // --- static membership (KIP-345; group.h:520-528, _static_members :922) ---

  test("static rejoin under a new member id: no rebalance, no generation bump") {
    val base = Seq(
      Join(1, "m1", P, instance = Some("i1")),
      Join(2, "m2", P, instance = Some("i2")),
      Sync(3, "m1")) // gen 1, stable, leader m1
    val g = replay(base :+ Join(4, "m2b", P, instance = Some("i2")))
    assert(g.state === State.Stable)       // NO rebalance
    assert(g.generation === 1)             // NO generation bump
    assert(g.members.keySet === Set("m1", "m2b")) // m2 replaced in place
    assert(g.members("m2b").joinedSeq === 2)      // seniority kept
    assert(g.leader === Some("m1"))
  }

  test("static leader restart keeps leadership under the new member id") {
    val g = replay(Seq(
      Join(1, "m1", P, instance = Some("i1")),
      Join(2, "m2", P, instance = Some("i2")),
      Sync(3, "m1"),
      Join(4, "m1b", P, instance = Some("i1"))))
    assert(g.state === State.Stable)
    assert(g.generation === 1)
    assert(g.leader === Some("m1b"))
  }

  test("static rejoin with CHANGED protocols still rebalances") {
    val g = replay(Seq(
      Join(1, "m1", P, instance = Some("i1")),
      Join(2, "m2", P, instance = Some("i2")),
      Sync(3, "m1"),
      Join(4, "m2b", Seq("sticky"), instance = Some("i2"))))
    assert(g.state === State.PreparingRebalance)
    assert(g.members.keySet === Set("m1", "m2b"))
  }

  test("instance-keyed leave removes the static member and rebalances") {
    val g = replay(Seq(
      Join(1, "m1", P, instance = Some("i1")),
      Join(2, "m2", P, instance = Some("i2")),
      Sync(3, "m1"),
      Join(4, "m2b", P, instance = Some("i2")), // restart first
      Leave(5, "", instance = Some("i2"))))     // then leave by instance id
    assert(g.members.keySet === Set("m1"))
    assert(g.state === State.PreparingRebalance)
    assert(g.staticInstances === Map("i1" -> "m1"))
  }

  test("a left instance rejoining is a NEW member: generation bumps, seniority resets") {
    val g = replayRecovery(Seq(
      Join(1, "m1", P, instance = Some("i1")),  // gen 1
      Join(2, "m2", P, instance = Some("i2")),  // gen 2
      Join(3, "m2b", P, instance = Some("i2")), // static replace: still gen 2
      Leave(4, "", instance = Some("i2")),      // gen 3
      Join(5, "m2c", P, instance = Some("i2")))) // effective join: gen 4
    assert(g.generation === 4)
    assert(g.members("m2c").joinedSeq === 5)
    assert(g.leader === Some("m1"))
  }
}

/** Distributed describe_groups over a command-log DataFrame. */
class GroupEngineSpec extends SparkSpec {
  import spark.implicits._

  test("describeGroups folds each group's command log independently") {
    val cmds = Seq(
      ("gA", 1L, "m1", "join"), ("gA", 2L, "m2", "join"), ("gA", 3L, "m2", "leave"),
      ("gB", 1L, "m9", "join"), ("gB", 2L, "m9", "leave"))
      .toDF("group", "seq", "member", "cmd")
      .withColumn("protocols", array(lit("range")))
    val got = GroupEngine.describeGroups(cmds)
      .select("group", "state", "generation", "n_members", "leader")
      .as[(String, String, Long, Long, String)].collect().toSet
    assert(got === Set(
      ("gA", "Stable", 3L, 1L, "m1"),
      ("gB", "Empty", 2L, 0L, "")))
  }

  test("listGroups projects (group, state) and honors the KIP-518 states filter") {
    val cmds = Seq(
      ("gA", 1L, "m1", "join"),
      ("gB", 1L, "m9", "join"), ("gB", 2L, "m9", "leave"),
      ("gC", 1L, "m5", "heartbeat"))
      .toDF("group", "seq", "member", "cmd")
      .withColumn("protocols", array(lit("range")))
    val all = GroupEngine.listGroups(cmds)
      .as[(String, String)].collect().toSet
    assert(all === Set(("gA", "Stable"), ("gB", "Empty"), ("gC", "Empty")))
    val stable = GroupEngine.listGroups(cmds, Seq("Stable"))
      .as[(String, String)].collect().toSet
    assert(stable === Set(("gA", "Stable")))
    val empty = GroupEngine.listGroups(cmds, Seq("Empty"))
      .as[(String, String)].collect().toSet
    assert(empty === Set(("gB", "Empty"), ("gC", "Empty")))
  }
}

/** G4 assignment strategies: range per assignment_plans.cc, roundrobin
  * and sticky per the public Kafka assignor semantics. */
class AssignmentSpec extends SparkSpec {
  import spark.implicits._

  private def members(ids: String*) = ids.toDF("member_id")
  private val topics = Seq(("t8", 8), ("t7", 7), ("t1", 1)).toDF("topic", "n_partitions")

  private def collectAssign(df: org.apache.spark.sql.DataFrame): Map[(String, Long), String] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap

  test("range: contiguous runs, first P%M members take one extra") {
    val got = collectAssign(Assignment.rangeAssign(members("a", "b", "c"), topics))
    // t8: len=2 rem=2 -> a:[0,1,2] b:[3,4,5] c:[6,7]
    assert((0 to 2).forall(p => got(("t8", p.toLong)) == "a"))
    assert((3 to 5).forall(p => got(("t8", p.toLong)) == "b"))
    assert((6 to 7).forall(p => got(("t8", p.toLong)) == "c"))
    // t7: len=2 rem=1 -> a:[0,1,2] b:[3,4] c:[5,6]
    assert((0 to 2).forall(p => got(("t7", p.toLong)) == "a"))
    assert((3 to 4).forall(p => got(("t7", p.toLong)) == "b"))
    assert((5 to 6).forall(p => got(("t7", p.toLong)) == "c"))
    // t1: P < M -> only the first member is assigned
    assert(got(("t1", 0L)) == "a" && got.size == 16)
  }

  test("roundrobin: global cyclic deal over sorted members") {
    val got = collectAssign(Assignment.roundRobinAssign(members("a", "b", "c"), topics))
    // sorted order: (t1,0),(t7,0..6),(t8,0..7) dealt a,b,c,a,...
    assert(got(("t1", 0L)) == "a" && got(("t7", 0L)) == "b" && got(("t7", 1L)) == "c")
    assert(got(("t8", 7L)) == "a" && got.size == 16)
    // balance within 1
    val loads = got.values.groupBy(identity).map(_._2.size)
    assert(loads.max - loads.min <= 1)
  }

  test("sticky: surviving ownership never moves; orphans fill least-loaded to target") {
    val prior = Seq(
      ("t8", 0L, "a"), ("t8", 1L, "a"), ("t8", 2L, "a"),
      ("t8", 3L, "b"), ("t8", 4L, "b"), ("t8", 5L, "b"),
      ("t8", 6L, "d"), ("t8", 7L, "d"),
      ("t7", 0L, "a"), ("t7", 1L, "a"), ("t7", 2L, "b"), ("t7", 3L, "b"),
      ("t7", 4L, "d"), ("t7", 5L, "d"), ("t7", 6L, "d"),
      ("t1", 0L, "d")).toDF("topic", "partition", "member_id")
    val got = collectAssign(Assignment.stickyAssign(prior, members("a", "b", "c"), topics))
    // every partition assigned exactly once
    assert(got.size == 16)
    // survivors keep everything they had
    prior.collect().filter(r => r.getString(2) != "d").foreach { r =>
      assert(got((r.getString(0), r.getLong(1))) == r.getString(2))
    }
    // target = ceil(16/3) = 6: nobody exceeds it, newcomer c gets the bulk
    val loads = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(loads.values.max <= 6)
    assert(loads("c") == 4 && loads("a") == 6 && loads("b") == 6)
  }
}
