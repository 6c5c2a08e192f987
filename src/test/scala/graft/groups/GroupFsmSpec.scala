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
}
