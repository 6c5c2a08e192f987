package graft.admin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Controller log rate limiter (reference
 * `cluster/controller_log_limiter.h/.cc`): every controller command
 * belongs to one of five operation groups — topic operations, replica
 * moves, ACLs-and-users, configuration, node management — each with
 * its own token bucket (rate in commands/s, capacity defaulting to the
 * rate). A command costs ONE token and is REJECTED outright when its
 * group's bucket is empty (`try_throttle` + `account_dropped`) — the
 * controller answers retriable-error, it never queues; commands
 * outside every group are always accepted, as is everything while the
 * limiter is disabled.
 *
 * Spark design: the command→group map is one codegen'd CASE; each
 * group's bucket is an integral one-pass fold (micro-token
 * arithmetic so sub-second refills stay exact) — the
 * [[Quota.tokenBucketThrottle]] shape keyed by group. The oracle
 * replays each group's recurrence with a recursive CTE.
 */
object ControllerLimiter {

  /** The reference's command→group mapping
    * (`controller_log_limiter.h:70-108`). */
  def groupOf(cmdType: Column): Column =
    when(cmdType.isin("create_topic", "delete_topic",
      "update_topic_properties", "create_partition",
      "set_topic_partitions_disabled"), "topic_operations")
      .when(cmdType.isin("move_partition_replicas",
        "cancel_moving_partition_replicas", "update_partition_replicas"),
        "move_operations")
      .when(cmdType.isin("create_user", "delete_user", "update_user",
        "create_acls", "delete_acls", "create_role", "delete_role",
        "update_role"), "acls_and_users_operations")
      .when(cmdType.isin("cluster_config_delta",
        "feature_update_license_update"), "configuration_operations")
      .when(cmdType.isin("maintenance_mode", "recommission_node",
        "decommission_node"), "node_management_operations")
      .otherwise("unlimited")

  final case class Cmd(group: String, seq: Long, ts_ms: Long)
  final case class Verdict(group: String, seq: Long, ts_ms: Long,
      accepted: Boolean, tokens_u: Long)

  /**
   * Fold the per-group buckets over a command log `(seq, ts_ms,
   * cmd_type)`. `rates` maps group → commands/s (missing groups and
   * `unlimited` never throttle); capacity = rate. Returns one verdict
   * per command with the post-decision micro-token balance.
   */
  def admit(commands: DataFrame, seqCol: Column, tsMsCol: Column,
      cmdTypeCol: Column, rates: Map[String, Long],
      enabled: Boolean = true): DataFrame = {
    val spark = commands.sparkSession
    import spark.implicits._
    val M = 1000000L
    commands.select(groupOf(cmdTypeCol).as("group"),
        seqCol.cast("long").as("seq"), tsMsCol.cast("long").as("ts_ms"))
      .as[Cmd]
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("ts_ms"), col("seq"))
      .mapPartitions { it =>
        var cur: String = null
        var rate = 0L  // commands/s; 0 = unlimited
        var tokens = 0L // micro-tokens
        var clock = 0L
        it.map { c =>
          if (c.group != cur) {
            cur = c.group
            rate = if (!enabled) 0L else rates.getOrElse(c.group, 0L)
            tokens = rate * M // capacity = rate
            clock = c.ts_ms
          } else if (rate > 0) {
            // refill: rate tokens/s = rate*1000 micro-tokens per ms
            tokens = math.min(rate * M,
              tokens + rate * 1000L * math.max(0L, c.ts_ms - clock))
            clock = math.max(clock, c.ts_ms)
          }
          if (rate == 0L) Verdict(c.group, c.seq, c.ts_ms, accepted = true, 0L)
          else if (tokens >= M) {
            tokens -= M
            Verdict(c.group, c.seq, c.ts_ms, accepted = true, tokens)
          } else Verdict(c.group, c.seq, c.ts_ms, accepted = false, tokens)
        }
      }
      .toDF()
  }
}
