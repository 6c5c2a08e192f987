package graft.groups

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * G1 group-membership FSM (SURVEY §2.5): join / sync / heartbeat / leave,
 * rebalance generations, protocol selection, leader choice.
 *
 * Reference: `kafka/server/group.h:90-105` (states empty /
 * preparing_rebalance / completing_rebalance / stable / dead),
 * `handle_join_group` `group.h:499-530`, `handle_sync_group` `group.h:553`,
 * `remove_member`/rebalance in `group.cc` (3.6k LoC).
 *
 * Two replay modes, mirroring the reference's two paths:
 *  - **live**: the full join→sync barrier protocol. A join moves the group
 *    to preparing_rebalance; the first sync completes the join round
 *    (generation bump, protocol vote, leader = earliest member) and moves
 *    to completing_rebalance; the leader's sync distributes assignments
 *    and lands the group in stable. Exercised by the ScalaTest replays of
 *    `kafka/server/tests/group_test.cc` scenarios.
 *  - **recovery**: log-replay semantics as in
 *    `group_recovery_consumer.cc` — there are no live timers or
 *    await-all-member barriers when rebuilding state from a command log,
 *    so each membership change completes its rebalance immediately.
 *    This is the mode the distributed describe-groups query uses.
 *
 * The FSM itself is a pure function (Command, State) => State; the
 * distributed application groups the command log by group id and folds
 * commands in sequence order — state per group is tiny, so a
 * groupByKey+flatMapGroups scales to any number of groups (one shuffle
 * keyed by group).
 */
object GroupFsm {

  /** group_state names as Kafka reports them (group.h:90-105). */
  object State {
    val Empty = "Empty"
    val PreparingRebalance = "PreparingRebalance"
    val CompletingRebalance = "CompletingRebalance"
    val Stable = "Stable"
    val Dead = "Dead"
  }

  sealed trait Command { def seq: Long; def member: String }
  /** `instance` = `group.instance.id` (static membership, KIP-345): a
    * known instance rejoining under a NEW member id replaces its old
    * member without a rebalance (`kafka/server/group.h:520-528`). */
  final case class Join(seq: Long, member: String, protocols: Seq[String],
      instance: Option[String] = None) extends Command
  final case class Sync(seq: Long, member: String) extends Command
  final case class Heartbeat(seq: Long, member: String) extends Command
  /** A static member may leave by instance id alone (member resolved
    * through the instance map, `group.h:922` `_static_members`). */
  final case class Leave(seq: Long, member: String,
      instance: Option[String] = None) extends Command

  /** joinedSeq = when the member last (re)joined; lastSeen = seq of its
    * last join/sync/heartbeat (drives session expiry); protocols =
    * supported partition-assignment protocols in preference order. */
  final case class Member(id: String, protocols: Seq[String], joinedSeq: Long,
      lastSeen: Long = 0L)

  final case class Group(
      state: String = State.Empty,
      generation: Long = 0L,
      leader: Option[String] = None,
      protocol: Option[String] = None,
      members: Map[String, Member] = Map.empty,
      pendingSync: Boolean = false,
      staticInstances: Map[String, String] = Map.empty) {
    def earliestMember: Option[String] =
      if (members.isEmpty) None
      else Some(members.values.minBy(m => (m.joinedSeq, m.id)).id)
  }

  /** Protocol vote: the highest-preference protocol supported by every
    * member (each member lists protocols in preference order; the group
    * picks the first of the leader's list all members support). */
  private def selectProtocol(g: Group): Option[String] = {
    val all = g.members.values.toSeq
    g.leader.flatMap(l => g.members.get(l)).flatMap { lead =>
      lead.protocols.find(p => all.forall(_.protocols.contains(p)))
    }
  }

  /** Complete a join round: bump generation, elect leader + protocol. */
  private def completeJoin(g: Group): Group = {
    if (g.members.isEmpty) g.copy(state = State.Empty, generation = g.generation + 1,
      leader = None, protocol = None)
    else {
      val withLeader = g.copy(leader = g.earliestMember)
      withLeader.copy(
        state = State.CompletingRebalance,
        generation = g.generation + 1,
        protocol = selectProtocol(withLeader))
    }
  }

  /** A known static instance rejoining (usually under a fresh member id,
    * e.g. after a client restart): the new id replaces the old member
    * in place, keeping its join seniority — and when the group is settled
    * and the protocols are unchanged, WITHOUT a rebalance or generation
    * bump (`group.h:520-528` add/replace/update static member). Returns
    * None when the join is not a static replacement. */
  private def replaceStatic(g: Group, cmd: Join): Option[Group] =
    for {
      i <- cmd.instance
      old <- g.staticInstances.get(i)
      om <- g.members.get(old)
    } yield {
      val replaced = g.copy(
        members = g.members - old +
          (cmd.member -> Member(cmd.member, cmd.protocols, om.joinedSeq, lastSeen = cmd.seq)),
        staticInstances = g.staticInstances.updated(i, cmd.member),
        leader = g.leader.map(l => if (l == old) cmd.member else l))
      if (g.state == State.Stable && om.protocols == cmd.protocols) replaced
      else replaced.copy(state = State.PreparingRebalance)
    }

  private def registerInstance(g: Group, instance: Option[String], m: String): Map[String, String] =
    instance.fold(g.staticInstances)(i => g.staticInstances.updated(i, m))

  /** One live-mode FSM step. */
  def step(g: Group, cmd: Command): Group = cmd match {
    case j @ Join(seq, m, protos, instance) =>
      replaceStatic(g, j).getOrElse {
        val known = g.members.contains(m)
        val kept = if (known) g.members(m).joinedSeq else seq
        val updated = g.copy(
          members = g.members.updated(m, Member(m, protos, kept, lastSeen = seq)),
          staticInstances = registerInstance(g, instance, m))
        if (known && g.state == State.Stable && g.members(m).protocols == protos)
          updated // rejoin: refresh liveness, no rebalance
        else updated.copy(state = State.PreparingRebalance)
      }
    case Sync(seq, m) =>
      // Sync from an unknown member is rejected with no state change
      // (the reference answers UNKNOWN_MEMBER_ID and leaves the group as-is).
      if (!g.members.contains(m)) g
      else {
        val alive = touch(g, m, seq)
        alive.state match {
          case State.PreparingRebalance =>
            val done = completeJoin(alive)
            if (done.state == State.CompletingRebalance && done.leader.contains(m))
              done.copy(state = State.Stable)
            else done
          case State.CompletingRebalance if alive.leader.contains(m) =>
            alive.copy(state = State.Stable)
          case _ => alive
        }
      }
    case Heartbeat(seq, m) => touch(g, m, seq) // liveness only
    case Leave(_, m, instance) =>
      removeMember(g, instance.flatMap(g.staticInstances.get).getOrElse(m))
  }

  private def touch(g: Group, m: String, seq: Long): Group =
    g.members.get(m) match {
      case Some(mem) => g.copy(members = g.members.updated(m, mem.copy(lastSeen = seq)))
      case None      => g
    }

  private def removeMember(g: Group, m: String): Group =
    if (!g.members.contains(m)) g
    else {
      val rest = g.members - m
      if (rest.isEmpty) Group(state = State.Empty, generation = g.generation + 1)
      else g.copy(members = rest,
        staticInstances = g.staticInstances.filterNot(_._2 == m),
        state = State.PreparingRebalance,
        leader = if (g.leader.contains(m)) None else g.leader)
    }

  /**
   * Session expiry (`heartbeat_expire`, group.h:538-540): every member
   * whose last sign of life is at or before `deadline` is removed, each
   * removal triggering a rebalance exactly as an explicit leave would.
   */
  def expireSessions(g: Group, deadline: Long): Group =
    g.members.values.filter(_.lastSeen <= deadline).map(_.id)
      .foldLeft(g)(removeMember)

  /** One recovery-mode step: membership changes complete immediately
    * (no sync barrier, as in group_recovery_consumer log replay). A
    * static replacement with unchanged protocols completes with NO
    * generation bump — the member swap never triggered a rebalance. */
  def recoveryStep(g: Group, cmd: Command): Group = cmd match {
    case j @ Join(seq, m, protos, instance) =>
      replaceStatic(g, j) match {
        case Some(replaced) =>
          if (replaced.state == State.PreparingRebalance) // protocols changed
            completeJoin(replaced).copy(state = State.Stable)
          else replaced
        case None =>
          val known = g.members.contains(m)
          if (known && g.members(m).protocols == protos)
            touch(g, m, seq) // idempotent rejoin still proves liveness
          else {
            val updated = g.copy(members =
              g.members.updated(m, Member(m, protos,
                if (known) g.members(m).joinedSeq else seq, lastSeen = seq)),
              staticInstances = registerInstance(g, instance, m))
            completeJoin(updated).copy(state = State.Stable)
          }
      }
    case Leave(_, m, instance) =>
      val mid = instance.flatMap(g.staticInstances.get).getOrElse(m)
      if (!g.members.contains(mid)) g
      else {
        val rest = g.members - mid
        if (rest.isEmpty) Group(state = State.Empty, generation = g.generation + 1)
        else completeJoin(g.copy(members = rest,
          staticInstances = g.staticInstances.filterNot(_._2 == mid)))
          .copy(state = State.Stable)
      }
    // sync/heartbeat carry no membership change on recovery replay, but
    // their seqs still advance lastSeen so expireSessions stays valid.
    case Sync(seq, m)      => touch(g, m, seq)
    case Heartbeat(seq, m) => touch(g, m, seq)
  }

  def replay(cmds: Seq[Command]): Group =
    cmds.sortBy(c => (c.seq, c.member)).foldLeft(Group())(step)

  def replayRecovery(cmds: Seq[Command]): Group =
    cmds.sortBy(c => (c.seq, c.member)).foldLeft(Group())(recoveryStep)
}

/** Distributed application of the FSM over a command-log DataFrame. */
object GroupEngine {

  final case class Cmd(group: String, seq: Long, member: String, cmd: String,
      protocols: Seq[String], instance: Option[String] = None)
  final case class GroupSummary(
      group: String, state: String, generation: Long,
      n_members: Long, leader: String, protocol: String)

  private def toCommand(c: Cmd): GroupFsm.Command = c.cmd match {
    case "join"  => GroupFsm.Join(c.seq, c.member, c.protocols, c.instance)
    case "sync"  => GroupFsm.Sync(c.seq, c.member)
    case "leave" => GroupFsm.Leave(c.seq, c.member, c.instance)
    case _       => GroupFsm.Heartbeat(c.seq, c.member)
  }

  private def summarize(group: String, g: GroupFsm.Group): GroupSummary =
    GroupSummary(group, g.state, g.generation, g.members.size.toLong,
      g.leader.getOrElse(""), g.protocol.getOrElse(""))

  /**
   * describe_groups over a command log with columns
   * (group, seq, member, cmd ['join'|'sync'|'heartbeat'|'leave'],
   * protocols array<string>). One shuffle keyed by group; each group's
   * commands fold through the FSM in seq order.
   */
  /**
   * Streaming fold over a (group, seq, member)-sorted iterator: one run per
   * group, O(1) FSM state held at a time — a hot group with a billion
   * commands streams through without buffering its history in heap.
   */
  private def foldSortedRuns(it: Iterator[Cmd], recovery: Boolean,
      expireDeadline: Option[Long]): Iterator[GroupSummary] = {
    val step: (GroupFsm.Group, GroupFsm.Command) => GroupFsm.Group =
      if (recovery) GroupFsm.recoveryStep else GroupFsm.step
    val buf = it.buffered
    new Iterator[GroupSummary] {
      def hasNext: Boolean = buf.hasNext
      def next(): GroupSummary = {
        val group = buf.head.group
        var g = GroupFsm.Group()
        while (buf.hasNext && buf.head.group == group) g = step(g, toCommand(buf.next()))
        expireDeadline.foreach(d => g = GroupFsm.expireSessions(g, d))
        summarize(group, g)
      }
    }
  }

  /**
   * describe_groups over the command log. `expireDeadline` runs a session
   * sweep after replay: members whose lastSeen is at or before the
   * deadline are expired as if the heartbeat timer fired (group.h:538).
   */
  def describeGroups(commandLog: DataFrame, recovery: Boolean = true,
      expireDeadline: Option[Long] = None): DataFrame = {
    val spark = commandLog.sparkSession
    import spark.implicits._
    // Secondary sort: hash-partition by group, sort runs within each
    // partition, then fold each run streamingly (no per-group toSeq).
    val withInstance =
      if (commandLog.columns.contains("instance")) commandLog
      else commandLog.withColumn("instance", lit(null).cast("string"))
    withInstance
      .select(col("group"), col("seq").cast("long"), col("member"), col("cmd"),
        col("protocols"), col("instance"))
      .as[Cmd]
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("seq"), col("member"))
      .mapPartitions(it => foldSortedRuns(it, recovery, expireDeadline))(
        Encoders.product[GroupSummary])
      .toDF()
  }

  /**
   * list_groups (`kafka/server/handlers/list_groups.cc`; states filter
   * per KIP-518): one row per known group with its coordinator state —
   * the listing projection of [[describeGroups]], optionally narrowed to
   * the requested states. Bounded output (one row per group).
   */
  def listGroups(commandLog: DataFrame, statesFilter: Seq[String] = Nil): DataFrame = {
    val all = describeGroups(commandLog).select("group", "state")
    if (statesFilter.isEmpty) all else all.where(col("state").isin(statesFilter: _*))
  }

  /**
   * Continuous coordinator: the same FSM as a stateful streaming
   * operator — each micro-batch of commands folds into the group's
   * checkpointed state (`mapGroupsWithState`; the Spark analogue of the
   * raft-replicated group STM consuming its log). Emits the updated
   * summary per group per batch; pair with outputMode("update").
   */
  def describeGroupsStream(commands: org.apache.spark.sql.Dataset[Cmd])
      : org.apache.spark.sql.Dataset[GroupSummary] = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import commands.sparkSession.implicits._
    commands.groupByKey(_.group)
      .mapGroupsWithState[GroupFsm.Group, GroupSummary](GroupStateTimeout.NoTimeout) {
        (group, it, state) =>
          val prev = state.getOption.getOrElse(GroupFsm.Group())
          val next = it.map(toCommand).toSeq.sortBy(c => (c.seq, c.member))
            .foldLeft(prev)(GroupFsm.recoveryStep)
          state.update(next)
          summarize(group, next)
      }
  }
}
