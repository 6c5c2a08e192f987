package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data migrations (reference `cluster/data_migration_types.h`,
 * `data_migration_table.cc`, `data_migrated_resources.cc`): whole
 * topics / consumer groups move in or out of the cluster through a
 * raft0-replicated command log driving a per-migration state machine
 *
 *   planned → preparing → prepared → executing → executed → cut_over
 *   → finished, with preparing..executed also → canceling → cancelled
 *   (`is_valid_state_transition`, table.cc:57-83); finished/cancelled
 *   are terminal.
 *
 * Command validation (first failing rule wins):
 *  - create (`table.cc:298-343`): monotone id (`id <= last_applied` →
 *    already_exists), non-empty resource set (invalid_definition), then
 *    per-resource in declaration order — inbound topics must NOT exist
 *    in the cluster (topic_already_exists) and must not be part of an
 *    active migration (resource_is_being_migrated); outbound topics
 *    must be in the default namespace (invalid_resources), exist
 *    (topic_not_exists), have archiving enabled (invalid_resources),
 *    and not be busy; groups must not be busy.
 *  - update_state: unknown id → not_exists; ladder violation →
 *    invalid_state; finished/cancelled stamp `completed_timestamp`.
 *  - remove (`table.cc:369-401`): unknown id → not_exists; allowed only
 *    from cancelled / finished / planned, else invalid_state.
 *
 * A resource is BUSY while it belongs to a live (created, not removed)
 * migration whose state maps to anything but `non_restricted` — i.e.
 * any state except finished/cancelled (`get_resource_state`,
 * resources.cc:49-88). The restriction level is direction-dependent:
 * inbound planned → metadata_locked, preparing → create_only,
 * prepared..cut_over/canceling → fully_blocked; outbound
 * planned..prepared → metadata_locked, executing/executed/canceling →
 * read_only, cut_over → fully_blocked.
 *
 * Spark design: the command log is a SINGLE raft0 shard in the
 * reference (`data_migrations_shard = 0`) — the fold runs as a
 * one-partition sorted streaming pass (no driver collect, O(live
 * migrations) state), and everything downstream — the migrations
 * table, the restricted-resource map, and the data-plane write gate
 * over the record stream — is declarative on top of its outcome log.
 * The write gate is the distributed half: a broadcast restriction map
 * joined against the full event stream.
 */
object DataMigrations {

  val Transitions: Map[String, Set[String]] = Map(
    "planned" -> Set("preparing"),
    "preparing" -> Set("prepared", "canceling"),
    "prepared" -> Set("executing", "canceling"),
    "executing" -> Set("executed", "canceling"),
    "executed" -> Set("cut_over", "canceling"),
    "cut_over" -> Set("finished"),
    "canceling" -> Set("cancelled"),
    "cancelled" -> Set.empty,
    "finished" -> Set.empty)

  /** `get_resource_state` per (direction, migration state). */
  def restrictionFor(direction: String, state: String): String =
    (direction, state) match {
      case (_, "finished") | (_, "cancelled") => "non_restricted"
      case ("inbound", "planned")             => "metadata_locked"
      case ("inbound", "preparing")           => "create_only"
      case ("inbound", _)                     => "fully_blocked"
      case ("outbound", "planned" | "preparing" | "prepared") => "metadata_locked"
      case ("outbound", "cut_over")           => "fully_blocked"
      case ("outbound", _)                    => "read_only"
    }

  final case class Cmd(seq: Long, op: String, id: Long, direction: String,
      topics: Seq[String], groups: Seq[String], target_state: String, ts_ms: Long)
  final case class Outcome(seq: Long, op: String, id: Long, errc: String,
      state_after: String)

  private final case class Mig(direction: String, var state: String,
      topics: Seq[String], groups: Seq[String],
      createdTs: Long, var completedTs: java.lang.Long)

  /**
   * Replay the command log `(seq, op, id, direction, topics, groups,
   * target_state, ts_ms)` against a cluster topic table
   * `(topic, archival)` (bounded config state, captured by the fold
   * closure the way raft0 holds the topic table). Emits one outcome row
   * per command: the errc and the migration's state after it.
   */
  def outcomes(commandLog: DataFrame, clusterTopics: Seq[(String, Boolean)]): DataFrame = {
    val spark = commandLog.sparkSession
    import spark.implicits._
    val cluster = clusterTopics.toMap
    commandLog.select(col("seq").cast("long"), col("op"), col("id").cast("long"),
        col("direction"), col("topics"), col("groups"), col("target_state"),
        col("ts_ms").cast("long"))
      .as[Cmd]
      .coalesce(1)
      .sortWithinPartitions("seq")
      .mapPartitions { it =>
        val migs = scala.collection.mutable.LinkedHashMap[Long, Mig]()
        var lastApplied = -1L
        def busy(resource: String): Boolean = migs.values.exists(m =>
          m.state != "finished" && m.state != "cancelled" &&
            (m.topics.contains(resource) || m.groups.contains(resource)))
        def validateCreate(c: Cmd): String = {
          if (c.id <= lastApplied) return "data_migration_already_exists"
          if (c.topics.isEmpty && c.groups.isEmpty) return "data_migration_invalid_definition"
          for (t <- c.topics) {
            if (c.direction == "inbound") {
              if (cluster.contains(t)) return "topic_already_exists"
              if (busy(t)) return "resource_is_being_migrated"
            } else {
              if (t.contains("/")) return "data_migration_invalid_resources"
              if (!cluster.contains(t)) return "topic_not_exists"
              if (!cluster(t)) return "data_migration_invalid_resources"
              if (busy(t)) return "resource_is_being_migrated"
            }
          }
          for (g <- c.groups) if (busy(g)) return "resource_is_being_migrated"
          "success"
        }
        it.map { c =>
          c.op match {
            case "create" =>
              val e = validateCreate(c)
              if (e == "success") {
                migs(c.id) = Mig(c.direction, "planned", c.topics, c.groups, c.ts_ms, null)
                lastApplied = c.id
                Outcome(c.seq, c.op, c.id, e, "planned")
              } else Outcome(c.seq, c.op, c.id, e, null)
            case "update_state" =>
              migs.get(c.id) match {
                case None => Outcome(c.seq, c.op, c.id, "data_migration_not_exists", null)
                case Some(m) if !Transitions(m.state).contains(c.target_state) =>
                  Outcome(c.seq, c.op, c.id, "invalid_data_migration_state", m.state)
                case Some(m) =>
                  m.state = c.target_state
                  if (c.target_state == "finished" || c.target_state == "cancelled")
                    m.completedTs = c.ts_ms
                  Outcome(c.seq, c.op, c.id, "success", m.state)
              }
            case "remove" =>
              migs.get(c.id) match {
                case None => Outcome(c.seq, c.op, c.id, "data_migration_not_exists", null)
                case Some(m) if Set("cancelled", "finished", "planned")(m.state) =>
                  migs.remove(c.id)
                  Outcome(c.seq, c.op, c.id, "success", "deleted")
                case Some(m) =>
                  Outcome(c.seq, c.op, c.id, "invalid_data_migration_state", m.state)
              }
            case other =>
              Outcome(c.seq, c.op, c.id, s"unknown_command:$other", null)
          }
        }
      }
      .toDF()
  }

  /** Final migrations table derived declaratively from the outcome log:
    * one row per live (created, never removed) migration with its last
    * state and created/completed stamps. */
  def migrationsTable(commandLog: DataFrame, outcomesDf: DataFrame): DataFrame = {
    val ok = outcomesDf.where(col("errc") === "success")
    val created = ok.where(col("op") === "create")
      .join(commandLog.select(col("seq"), col("direction"), col("ts_ms"),
        size(col("topics")).as("n_topics"), size(col("groups")).as("n_groups")), "seq")
    val removedIds = ok.where(col("op") === "remove").select(col("id")).distinct()
    val lastState = ok.groupBy("id").agg(
      max_by(col("state_after"), col("seq")).as("state"))
    val doneTs = ok.join(commandLog.select(col("seq"), col("ts_ms").as("__ts")), "seq")
      .groupBy("id")
      .agg(max(when(col("state_after").isin("finished", "cancelled"), col("__ts")))
        .as("completed_ts"))
    created.select(col("id"), col("direction"), col("ts_ms").as("created_ts"),
        col("n_topics"), col("n_groups"))
      .join(removedIds.withColumn("__rm", lit(true)), Seq("id"), "left")
      .where(col("__rm").isNull).drop("__rm")
      .join(lastState.select("id", "state"), "id")
      .join(doneTs, Seq("id"), "left")
  }

  /** The `migrated_resources` map: one row per restricted resource of a
    * live migration — resources of finished/cancelled/removed
    * migrations are freed and do not appear (resources.cc:115-132). */
  /** [[restrictionFor]] as a codegen'd conditional (no UDF). */
  def restrictionCol(direction: Column, state: Column): Column =
    when(state.isin("finished", "cancelled"), "non_restricted")
      .when(direction === "inbound",
        when(state === "planned", "metadata_locked")
          .when(state === "preparing", "create_only")
          .otherwise("fully_blocked"))
      .otherwise(
        when(state.isin("planned", "preparing", "prepared"), "metadata_locked")
          .when(state === "cut_over", "fully_blocked")
          .otherwise("read_only"))

  def resourceStates(commandLog: DataFrame, outcomesDf: DataFrame): DataFrame = {
    val live = migrationsTable(commandLog, outcomesDf)
      .where(!col("state").isin("finished", "cancelled"))
    val created = commandLog.where(col("op") === "create")
      .select(col("id"), col("topics"), col("groups"))
    live.join(created, "id")
      .select(col("id"), col("direction"), col("state"),
        explode(concat(
          transform(col("topics"), t => struct(lit("topic").as("kind"), t.as("name"))),
          transform(col("groups"), g => struct(lit("group").as("kind"), g.as("name")))))
          .as("r"))
      .select(col("r.kind").as("kind"), col("r.name").as("name"),
        col("id").as("migration_id"), col("direction"),
        restrictionCol(col("direction"), col("state")).as("restriction"))
  }

  /** The data-plane gate: admit or reject each record of a produce
    * stream against the broadcast restriction map — writes are blocked
    * at `read_only` and `fully_blocked` (types.h:101-107: "when
    * resource is blocked all the writes should be disabled"). The
    * stream side never shuffles; the map is bounded config state. */
  def writeGate(records: DataFrame, topicCol: Column, resources: DataFrame): DataFrame = {
    val blocked = resources.where(col("kind") === "topic" &&
        col("restriction").isin("read_only", "fully_blocked"))
      .select(col("name").as("__topic"), col("restriction").as("__r"))
    records.withColumn("__topic", topicCol)
      .join(broadcast(blocked), Seq("__topic"), "left")
      .withColumn("admitted", col("__r").isNull)
      .withColumn("reject_reason", col("__r"))
      .drop("__r")
      .withColumnRenamed("__topic", "topic")
  }
}
