package graft.admin

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.log.{Compaction, RecordLog}

/**
 * Admin/metadata surface (SURVEY §2.3 Q6, §2.10): topic metadata query,
 * describe/alter configs backed by a config command log, and
 * config-driven log housekeeping.
 *
 * Reference: metadata handler `kafka/server/handlers/metadata.cc` (629
 * LoC), config handlers `kafka/server/handlers/handlers.h:71-112`
 * (describe/alter/incremental-alter configs), topic knobs
 * `cluster/topic_properties.h:123-128+`.
 *
 * Spark design: topic configuration is itself a compacted log —
 * alter_configs appends (seq, topic, key, value) and the current config
 * is last-write-wins per (topic, key), i.e. exactly the A1 compaction
 * operator. describe_configs overlays dynamic entries on the static
 * defaults, mirroring the DEFAULT_CONFIG / DYNAMIC_TOPIC_CONFIG config
 * sources of the Kafka protocol.
 */
object Admin {

  /** Default topic knobs (cluster/topic_properties.h:123-128 defaults). */
  val Defaults: Seq[(String, String)] = Seq(
    "cleanup.policy" -> "delete",
    "compression.type" -> "producer",
    "delete.retention.ms" -> "86400000",
    "message.timestamp.type" -> "CreateTime",
    "retention.bytes" -> "-1",
    "retention.ms" -> "604800000")

  /** Current dynamic config: latest value per (topic, key) over the
    * alter-configs command log — the same LWW compaction as A1. */
  def currentConfigs(alterLog: DataFrame): DataFrame =
    Compaction.compact(alterLog, Seq("topic", "key"), "seq")
      .select("topic", "key", "value")

  /**
   * incremental_alter_configs (`kafka/server/handlers/handlers.h:71-112`,
   * distinct from the full-replace alter): the command log carries an
   * `op` per entry — SET overrides the key, DELETE removes the override
   * so the key reverts to its static default. Same compacted-log shape;
   * a DELETE is a tombstone on the (topic, key) override.
   */
  def currentConfigsIncremental(alterLog: DataFrame): DataFrame =
    Compaction.compact(alterLog, Seq("topic", "key"), "seq")
      .where(col("op") === "set")
      .select("topic", "key", "value")

  /**
   * describe_configs: every known key per topic with its effective value
   * and config source (dynamic override or static default).
   */
  def describeConfigs(spark: SparkSession, topics: Seq[String], alterLog: DataFrame): DataFrame =
    overlayDefaults(spark, topics, currentConfigs(alterLog))

  /** describe_configs over an incremental (SET/DELETE-op) command log:
    * deleted overrides fall back to DEFAULT_CONFIG. */
  def describeConfigsIncremental(spark: SparkSession, topics: Seq[String],
      alterLog: DataFrame): DataFrame =
    overlayDefaults(spark, topics, currentConfigsIncremental(alterLog))

  private def overlayDefaults(spark: SparkSession, topics: Seq[String],
      dynamic0: DataFrame): DataFrame = {
    import spark.implicits._
    val defaults = topics.flatMap(t => Defaults.map { case (k, v) => (t, k, v) })
      .toDF("topic", "key", "value")
      .withColumn("source", lit("DEFAULT_CONFIG"))
    val dynamic = dynamic0.withColumn("source", lit("DYNAMIC_TOPIC_CONFIG"))
    val defaultsKept = defaults.join(dynamic.select("topic", "key"), Seq("topic", "key"), "left_anti")
    defaultsKept.unionByName(dynamic)
  }

  /**
   * Topic lifecycle (`create/delete_topics` handlers,
   * `kafka/server/handlers/handlers.h:71-112`) as a compacted command
   * log: create/alter upsert the topic row, delete writes a tombstone.
   * The live catalog is last-write-wins per topic with tombstones
   * dropped — recreation after delete is simply a later create. Command
   * columns: (seq, topic, partitions, cleanup_policy, deleted).
   */
  def listTopics(topicLog: DataFrame): DataFrame =
    Compaction.compact(topicLog, Seq("topic"), "seq")
      .where(!col("deleted"))
      .drop("deleted", "seq")

  /**
   * Q6 metadata: topics/partitions/leader/offset-bounds listing
   * (`metadata.cc`). Leader/replica fields are engine constants — Spark
   * owns placement — kept for API parity.
   */
  def metadata(log: DataFrame, topic: String): DataFrame =
    log.groupBy("partition")
      .agg(min("offset").as("start_offset"), (max("offset") + 1).as("hwm"),
        count(lit(1)).as("n_records"))
      .select(lit(topic).as("topic"), col("partition"),
        lit(0).as("leader"), lit(1).as("replicas"),
        col("start_offset"), col("hwm"), col("n_records"))

  /**
   * describe_log_dirs (`kafka/server/handlers/handlers.h:71-112`):
   * per-partition storage accounting — total payload bytes, record
   * count, log end offset. One aggregate keyed on partition; at 100 TB
   * the sums partial-combine map-side and the result is one row per
   * partition.
   */
  def describeLogDirs(log: DataFrame, sizeCol: Column): DataFrame =
    log.groupBy("partition")
      .agg(sum(sizeCol).as("size_bytes"), count(lit(1)).as("n_records"),
        (max("offset") + 1).as("log_end_offset"))

  /**
   * find_coordinator: group id -> coordinator partition of the offsets
   * topic via the reference's murmur2 unsigned-modulo routing
   * (`kafka/server/coordinator_mapper.h`; hashing as
   * `kafka/client/partitioners.cc:41-44`). Narrow projection over the
   * codegen'd murmur2 kernel.
   */
  def coordinatorFor(groups: DataFrame, groupCol: Column, nPartitions: Int): DataFrame = {
    graft.functions.GraftFunctions.register(groups.sparkSession)
    groups.select(groupCol.as("group"))
      .withColumn("coordinator_partition",
        pmod(expr("murmur2(encode(group, 'UTF-8'))").cast("long")
          .bitwiseAND(lit(0xffffffffL)), lit(nPartitions)).cast("int"))
  }

  /**
   * create_partitions (partition-count increase): history is never
   * re-shuffled — existing records keep their partition — and only new
   * produce routes across the enlarged count, continuing each existing
   * partition's offsets from its HWM and starting fresh partitions at 0
   * (the reference rejects shrinking; growth only). The HWM side is one
   * row per partition and broadcasts.
   */
  def createPartitions(log: DataFrame, batch: DataFrame, newCount: Int,
      keyCol: Column, arrivalCol: Column): DataFrame = {
    val hwm = log.groupBy("partition").agg((max("offset") + 1).as("hwm"))
    val appended = RecordLog.appendBatch(batch, hwm, pmod(keyCol, lit(newCount)), arrivalCol)
    log.unionByName(appended, allowMissingColumns = true)
  }

  /**
   * describe/alter_client_quotas (`kafka/server/quota_manager.cc`,
   * `snc_quota_manager.cc`): quota targets (produce/fetch byte rates,
   * request percentage) are configured per client-id entity or as the
   * cluster default, and the effective quota for a client resolves with
   * exact-entity-over-default precedence — the reference's
   * quota_manager lookup order. Enforcement (token buckets) is runtime
   * admission the survey marks N/A (A6); the CRUD + resolution surface
   * is what a control plane queries.
   *
   * The quota store is the same compacted command log as configs:
   * `quotaLog` columns (seq, entity_name [null = cluster default], key,
   * value, op[set|remove]); REMOVE tombstones the override. Both the
   * folded override table and the key list are admin-sized broadcasts;
   * the client set is scanned once, never shuffled.
   */
  def resolveClientQuotas(clients: DataFrame, quotaLog: DataFrame,
      keys: Seq[String]): DataFrame = {
    val spark = clients.sparkSession
    import spark.implicits._
    val live = Compaction.compact(quotaLog, Seq("entity_name", "key"), "seq")
      .where(col("op") === "set")
    val exact = live.where(col("entity_name").isNotNull)
      .select(col("entity_name").as("client_id"), col("key"), col("value").as("__exact"))
    val dflt = live.where(col("entity_name").isNull)
      .select(col("key"), col("value").as("__default"))
    clients.select(col("client_id")).crossJoin(broadcast(keys.toDF("key")))
      .join(broadcast(exact), Seq("client_id", "key"), "left")
      .join(broadcast(dflt), Seq("key"), "left")
      .select(col("client_id"), col("key"),
        coalesce(col("__exact"), col("__default"), lit(-1.0)).as("value"),
        when(col("__exact").isNotNull, lit("CLIENT"))
          .when(col("__default").isNotNull, lit("DEFAULT"))
          .otherwise(lit("NONE")).as("source"))
  }

  /**
   * alter/list_partition_reassignments
   * (`kafka/server/handlers/alter_partition_reassignments.cc`,
   * `list_partition_reassignments.cc`): an alter sets a pending target
   * replica set for a partition, a later complete applies the pending
   * target as the current assignment, a cancel abandons it. list shows
   * in-flight reassignments with their `adding` (target minus current)
   * and `removing` (current minus target) replica deltas, exactly the
   * AlterPartitionReassignments/ListPartitionReassignments response
   * shape.
   *
   * Derivation is two bounded aggregates over the admin command log
   * (`reassignLog` columns: seq, topic, partition, op[alter|complete|
   * cancel], targets comma-string, null for terminal ops): per
   * partition, the last terminal seq splits alters into applied (the
   * newest one a complete ratified) and pending (any alter after the
   * last terminal). Replica sets travel as sorted comma strings so any
   * engine re-derives them byte-identically.
   */
  def partitionReassignments(initial: DataFrame, reassignLog: DataFrame): DataFrame = {
    val terminals = reassignLog.groupBy("topic", "partition").agg(
      max(when(col("op") === "complete", col("seq"))).as("__sc"),
      max(when(col("op") === "complete" || col("op") === "cancel", col("seq"))).as("__st"))
    val alters = reassignLog.where(col("op") === "alter")
      .join(broadcast(terminals), Seq("topic", "partition"), "left")
      .groupBy("topic", "partition").agg(
        max_by(col("targets"), when(col("seq") < col("__sc"), col("seq"))).as("__applied"),
        max_by(col("targets"), when(col("seq") > coalesce(col("__st"), lit(Long.MinValue)),
          col("seq"))).as("__pending"))
    val setDiff = (a: Column, b: Column) =>
      array_join(array_sort(array_except(split(a, ","), split(b, ","))), ",")
    initial.join(broadcast(alters), Seq("topic", "partition"), "left")
      .select(col("topic"), col("partition"),
        coalesce(col("__applied"), col("replicas")).as("replicas"),
        when(col("__pending").isNotNull,
          setDiff(col("__pending"), coalesce(col("__applied"), col("replicas"))))
          .otherwise(lit("")).as("adding"),
        when(col("__pending").isNotNull,
          setDiff(coalesce(col("__applied"), col("replicas")), col("__pending")))
          .otherwise(lit("")).as("removing"),
        col("__pending").isNotNull.as("in_flight"))
  }

  /**
   * Config-driven housekeeping: apply a topic's effective cleanup policy
   * to its log, exactly as the reference's housekeeping loop reads
   * topic_properties (`storage/disk_log_impl.h:86-88`): 'delete' applies
   * retention GC first — the prefix cut is the more aggressive of the
   * time cutoff and the `retention.bytes` budget, as in
   * `disk_log_impl.h:197` where retention_offset combines both — then
   * 'compact' applies key LWW compaction ('compact,delete' does both).
   * `retentionBytes < 0` (the default knob) disables the size bound;
   * `sizeCol` is the per-record byte size it meters.
   */
  def applyCleanupPolicy(
      log: DataFrame,
      policy: String,
      keyCols: Seq[String],
      tsCol: Column,
      now: Column,
      retentionMs: Long,
      retentionBytes: Long = -1L,
      sizeCol: Column = lit(1L)): DataFrame = {
    val policies = policy.split(",").map(_.trim).toSet
    val afterTime =
      if (policies.contains("delete") && retentionMs >= 0)
        RecordLog.retainAfter(log, tsCol, timestamp_millis(unix_millis(now) - lit(retentionMs)))
      else log
    val afterSize =
      if (policies.contains("delete") && retentionBytes >= 0)
        RecordLog.retainBytes(afterTime, sizeCol, retentionBytes)
      else afterTime
    if (policies.contains("compact")) Compaction.compact(afterSize, keyCols)
    else afterSize
  }

  /**
   * api_versions: the engine's capability advertisement — every Kafka
   * API key (public protocol numbering) whose semantics this library
   * implements, with the module that carries it. The reference's
   * handler registry is the 42-key table in
   * `kafka/server/handlers/handlers.h:71-112`; this is its graft
   * counterpart and is what a compat shim would serve to clients.
   * Static by design (the handler returns a constant table).
   */
  val ApiVersions: Seq[(Int, String, String)] = Seq(
    (0, "produce", "log.RecordLog/streaming.Produce"),
    (1, "fetch", "log.RecordLog.fetch"),
    (2, "list_offsets", "log.RecordLog.{earliest,latest,offsetsForTimestamp}"),
    (3, "metadata", "admin.Admin.metadata"),
    (8, "offset_commit", "groups.ConsumerGroups"),
    (9, "offset_fetch", "groups.ConsumerGroups.fetchOffsets"),
    (10, "find_coordinator", "admin.Admin.coordinatorFor"),
    (11, "join_group", "groups.GroupFsm"),
    (12, "heartbeat", "groups.GroupFsm"),
    (13, "leave_group", "groups.GroupFsm"),
    (14, "sync_group", "groups.GroupFsm/groups.Assignment"),
    (15, "describe_groups", "groups.GroupEngine.describeGroups"),
    (16, "list_groups", "groups.GroupEngine.listGroups"),
    (17, "sasl_handshake", "security.Scram.handshake"),
    (18, "api_versions", "admin.Admin.ApiVersions"),
    (19, "create_topics", "admin.Admin topic lifecycle"),
    (20, "delete_topics", "admin.Admin topic lifecycle"),
    (21, "delete_records", "log.RecordLog.deleteRecords"),
    (22, "init_producer_id", "log.TxnEngine.initProducerIds"),
    (23, "offset_for_leader_epoch", "log.RecordLog.offsetsForLeaderEpoch"),
    (24, "add_partitions_to_txn", "log.TxnEngine"),
    (25, "add_offsets_to_txn", "log.TxnEngine"),
    (26, "end_txn", "log.TxnEngine"),
    (28, "txn_offset_commit", "log.TxnEngine.commitTxOffsets"),
    (29, "describe_acls", "security.Acls.describeAcls"),
    (30, "create_acls", "security.Acls"),
    (31, "delete_acls", "security.Acls"),
    (32, "describe_configs", "admin.Admin.describeConfigs"),
    (33, "alter_configs", "admin.Admin.currentConfigs"),
    (35, "describe_log_dirs", "admin.Admin.describeLogDirs"),
    (36, "sasl_authenticate", "security.Scram.authenticate"),
    (37, "create_partitions", "admin.Admin.createPartitions"),
    (42, "delete_groups", "groups.ConsumerGroups"),
    (44, "incremental_alter_configs", "admin.Admin.currentConfigsIncremental"),
    (45, "alter_partition_reassignments", "admin.Admin.partitionReassignments"),
    (46, "list_partition_reassignments", "admin.Admin.partitionReassignments"),
    (47, "offset_delete", "groups.ConsumerGroups.deleteOffsets"),
    (48, "describe_client_quotas", "admin.Admin.resolveClientQuotas"),
    (49, "alter_client_quotas", "admin.Admin.resolveClientQuotas"),
    (50, "describe_user_scram_credentials", "security.Scram.describeCredentials"),
    (51, "alter_user_scram_credentials", "security.Scram.currentCredentials"),
    (61, "describe_producers", "log.TxnEngine.describeProducers"),
    (65, "describe_transactions", "log.TxnEngine.describeTransactions"),
    (66, "list_transactions", "log.TxnEngine.listTransactions"))

  def apiVersions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ApiVersions.toDF("api_key", "api_name", "implemented_by")
  }

  /** Kafka error codes surfaced by topic validation. */
  val InvalidPartitions = 37
  val InvalidReplicationFactor = 38
  val InvalidConfig = 40

  private val ValidCompression =
    Seq("none", "gzip", "snappy", "lz4", "zstd", "producer")
  private val ValidCleanup = Seq("delete", "compact", "compact,delete", "delete,compact")
  private val ValidTimestampType = Seq("CreateTime", "LogAppendTime")

  /**
   * create_topics/alter validation
   * (`kafka/server/handlers/topics/validators.h`): the ordered rule
   * chain each creatable topic runs — positive partition count
   * (`partition_count_must_be_positive`), positive odd replication
   * factor (`replication_factor_must_be_odd/positive`), positive
   * max.message.bytes (`batch_max_bytes_limits`), enumerated
   * compression / cleanup.policy / timestamp.type values — and the
   * FIRST failing rule's error code is the topic's response, exactly
   * the reference's sequential validator list. Null CONFIG values mean
   * "not set" and validate trivially; null partition/replication COUNTS
   * mean "use the broker default" (the protocol's -1) and are
   * explicitly valid — the positivity rules only judge counts the
   * request actually carries. One codegen'd conditional projection; no
   * shuffle, request-batch sized.
   */
  def validateTopicConfigs(requests: DataFrame): DataFrame =
    requests.withColumn("error_code",
      when(col("partitions").isNotNull && col("partitions") <= 0, InvalidPartitions)
        .when(col("replication_factor").isNotNull &&
          (col("replication_factor") <= 0 ||
            pmod(col("replication_factor"), lit(2)) === 0), InvalidReplicationFactor)
        .when(col("max_message_bytes").isNotNull &&
          col("max_message_bytes") <= 0, InvalidConfig)
        .when(col("compression").isNotNull &&
          !col("compression").isin(ValidCompression: _*), InvalidConfig)
        .when(col("cleanup_policy").isNotNull &&
          !col("cleanup_policy").isin(ValidCleanup: _*), InvalidConfig)
        .when(col("timestamp_type").isNotNull &&
          !col("timestamp_type").isin(ValidTimestampType: _*), InvalidConfig)
        .otherwise(0))

  /**
   * Cluster health report rollup (`cluster/health_monitor_types.h` —
   * `node_state{membership, is_alive}` + per-node `local_state` disks;
   * `health_monitor_backend.cc` assembles the per-node reports the
   * balancer consumes): liveness from heartbeat staleness against
   * `nowMs`, disk ratio from the report, partition/leader counts from
   * the replica map. Pure declarative aggregation over control-plane
   * tables — join order keeps the (small) per-node side broadcast.
   *
   * Inputs: `heartbeats` (node_id, last_heartbeat_ms);
   * `disks` (node_id, total_bytes, free_bytes);
   * `replicas` (topic, partition, node_id, is_leader).
   */
  def clusterHealth(heartbeats: DataFrame, disks: DataFrame,
      replicas: DataFrame, nowMs: Long, stalenessMs: Long): DataFrame = {
    val counts = replicas.groupBy("node_id")
      .agg(count(lit(1)).as("n_replicas"),
        sum(when(col("is_leader"), 1L).otherwise(0L)).as("n_leaders"))
    heartbeats
      .join(broadcast(disks), Seq("node_id"), "left")
      .join(counts, Seq("node_id"), "left")
      .select(col("node_id"),
        (lit(nowMs) - col("last_heartbeat_ms") <= stalenessMs).as("is_alive"),
        col("total_bytes"),
        // exact long integer division (`div`): bit-exact at any disk
        // size, where double-divide-then-cast can lose a permille once
        // (total-free)*1000 exceeds 2^53 (~9 TB used).
        expr("(total_bytes - free_bytes) * 1000 div total_bytes")
          .as("used_permille"),
        coalesce(col("n_replicas"), lit(0L)).as("n_replicas"),
        coalesce(col("n_leaders"), lit(0L)).as("n_leaders"))
  }
}
