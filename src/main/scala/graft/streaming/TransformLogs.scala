package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WASM data-transform log manager (reference `transform/logging/`):
 * transforms emit log lines by writing stdout (info) / stderr (warn);
 * the WASI layer forwards each line to a per-core manager that
 * sanitizes, buffers, and periodically publishes them — OTel
 * LogRecord JSON — to the internal `transform_logs` topic.
 *
 * Reference semantics modeled 1:1 (`log_manager.cc:270-346`):
 *  1. truncate the message to `data_transforms_logging_line_max_bytes`
 *     BYTES (`msg_len`, `:275-278` — a view substr, before any
 *     allocation);
 *  2. optimistically acquire buffer units for the truncated size from
 *     a manager-global semaphore sized
 *     `data_transforms_logging_buffer_capacity_bytes`; if they are not
 *     available the event is DROPPED and counted by the probe
 *     (`:333-338`) — note this check runs BEFORE validation, so an
 *     oversized invalid message reports as a buffer drop;
 *  3. validate: only valid UTF-8 with no control characters besides
 *     `\n` and `\t` (`contains_invalid_characters`, `:36-40`); invalid
 *     messages are dropped WITHOUT consuming units (`:340-345` — the
 *     units destruct on return);
 *  4. surviving events buffer per transform name and flush every
 *     `data_transforms_logging_flush_interval_ms`
 *     (`flusher::flush_loop`), serialized as OpenTelemetry LogRecord
 *     JSON (`event.cc:81-99`: body / timeUnixNano / severityNumber /
 *     attributes[transform_name, node], severity map `:105-114`), and
 *     published to partition `murmur2(name) % n_partitions`
 *     (`rpc_client.cc:82-94` — same unsigned-mod routing as
 *     find_coordinator).
 *
 * Spark design: the flush interval becomes an event-time window; the
 * global semaphore is per-core (single-threaded arrival order), so
 * admission is a sequential greedy fold — expressed as one
 * `groupBy(window)` + `aggregate()` over the window's arrival-sorted
 * events. State per window is bounded by the buffer capacity itself
 * (that is the reference's own memory bound), so the fold is a
 * bounded-local pass and the only shuffle carries one partition per
 * flush window. Everything downstream (severity, escaping, JSON
 * envelope, murmur2 routing) is codegen'd column work.
 */
object TransformLogs {

  /** OTel SeverityNumber map (`event.cc:105-114`). Unknown levels are
   *  not representable in the reference enum; null surfaces a bug. */
  def severity(level: Column): Column =
    when(level === "trace", 1)
      .when(level === "debug", 5)
      .when(level === "info", 9)
      .when(level === "warn", 13)
      .when(level === "error", 17)

  /** Truncate to `lineMaxBytes` BYTES (not chars): slice the UTF-8
   *  encoding. A slice through a multi-byte sequence decodes lossily
   *  and is then rejected by [[isValidMessage]] — the same outcome as
   *  the reference's substr-then-`is_valid_utf8` order. */
  def truncateBytes(msg: Column, lineMaxBytes: Int): Column =
    substring(msg.cast("binary"), 1, lineMaxBytes).cast("string")

  /** `contains_invalid_characters` (`log_manager.cc:36-40`) inverted:
   *  valid UTF-8, no control chars besides `\n`/`\t`. The UTF-8 check
   *  is encode∘decode idempotence — Spark's lossy binary→string cast
   *  substitutes U+FFFD for invalid sequences, so re-encoding a bad
   *  slice never reproduces the original bytes. */
  def isValidMessage(msgBytes: Column): Column = {
    val decoded = msgBytes.cast("string")
    !decoded.rlike("[\\x00-\\x08\\x0B-\\x1F\\x7F]") &&
      encode(decoded, "UTF-8") === msgBytes
  }

  /** JSON string escaping for the fixed envelope: survivors contain
   *  only printable chars + `\n`/`\t`, so the full rapidjson table
   *  collapses to these four (backslash first). */
  private def jsonEscape(s: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(s, "\\\\", "\\\\\\\\"),
          "\"", "\\\\\""),
        "\n", "\\\\n"),
      "\t", "\\\\t")

  /** OTel LogRecord JSON in the reference writer's exact field order
   *  (`event.cc:81-99`). */
  def otelJson(name: Column, sourceId: Column, tsNanos: Column,
      level: Column, message: Column): Column =
    concat(
      lit("""{"body":{"stringValue":""""), jsonEscape(message),
      lit(""""},"timeUnixNano":"""), tsNanos.cast("string"),
      lit(""","severityNumber":"""), severity(level).cast("string"),
      lit(""","attributes":[{"key":"transform_name","value":{"stringValue":""""),
      jsonEscape(name),
      lit(""""}},{"key":"node","value":{"intValue":"""), sourceId.cast("string"),
      lit("}}]}"))

  /**
   * The enqueue path over a log-event table `(transform_name, seq,
   * ts_ms, level, source_id, message)` where `seq` is the per-core
   * arrival order. Returns one row per event with the truncated
   * message and a `status` ∈ {`ok`, `dropped_buffer_full`,
   * `dropped_invalid`} plus the flush window `win`, classified by the
   * reference's exact check order (fit first, then validity).
   */
  def enqueue(events: DataFrame, lineMaxBytes: Int,
      bufferCapacityBytes: Long, flushIntervalMs: Long): DataFrame = {
    require(lineMaxBytes > 0 && bufferCapacityBytes > 0 && flushIntervalMs > 0)
    val truncBytes = substring(col("message").cast("binary"), 1, lineMaxBytes)
    val prepared = events.select(
      col("transform_name"), col("seq"), col("ts_ms"), col("level"),
      col("source_id"),
      truncBytes.cast("string").as("message"),
      length(truncBytes).cast("long").as("sz"),
      isValidMessage(truncBytes).as("valid"),
      floor(col("ts_ms") / flushIntervalMs).cast("long").as("win"))
    // Greedy semaphore fold per flush window in arrival order: an event
    // is admitted iff it fits AND validates; a non-fitting event never
    // consumes units, so later smaller events can still be admitted
    // (try_get_units semantics, not a prefix-sum cutoff).
    val stZero = struct(
      lit(0L).as("used"),
      array().cast("array<struct<seq:bigint,st:string>>").as("out"))
    val folded = prepared
      .groupBy("win")
      .agg(sort_array(collect_list(struct(
        col("seq"), col("sz"), col("valid")))).as("evs"))
      .select(col("win"), explode(aggregate(col("evs"), stZero,
        (st, e) => {
          val fits = st.getField("used") + e.getField("sz") <= bufferCapacityBytes
          val admit = fits && e.getField("valid")
          struct(
            when(admit, st.getField("used") + e.getField("sz"))
              .otherwise(st.getField("used")).as("used"),
            concat(st.getField("out"), array(struct(
              e.getField("seq").as("seq"),
              when(!fits, "dropped_buffer_full")
                .when(!e.getField("valid"), "dropped_invalid")
                .otherwise("ok").as("st")))).as("out"))
        }).getField("out")).as("r"))
      .select(col("win").as("__w"), col("r.seq").as("__seq"),
        col("r.st").as("status"))
    // Co-keyed equi-join on (win, seq) — both sides hash the same key,
    // and the fold side is exactly one row per event.
    prepared.join(folded,
      prepared("win") === folded("__w") && prepared("seq") === folded("__seq"))
      .drop("__w", "__seq")
  }

  /**
   * Publish survivors: OTel JSON + output partition
   * `murmur2(transform_name) % nPartitions` (`rpc_client.cc:92-93`).
   * One row per surviving event, the unit the flusher's json_batches
   * carry to the `transform_logs` topic.
   */
  def publish(enqueued: DataFrame, nPartitions: Int): DataFrame = {
    require(nPartitions > 0, "partition_lookup_failure: zero partitions")
    graft.functions.GraftFunctions.register(enqueued.sparkSession)
    enqueued.where(col("status") === "ok")
      .select(
        col("win"), col("seq"), col("transform_name"),
        pmod(expr("murmur2(encode(transform_name, 'UTF-8'))").cast("long")
          .bitwiseAND(lit(0xffffffffL)), lit(nPartitions.toLong))
          .cast("int").as("partition"),
        (col("ts_ms") * 1000000L).as("time_unix_nano"),
        severity(col("level")).as("severity_number"),
        otelJson(col("transform_name"), col("source_id"),
          col("ts_ms") * 1000000L, col("level"), col("message")).as("body_json"))
  }

  /**
   * [[enqueue]]+[[publish]] as the CONTINUOUS flusher loop the
   * reference runs (`flusher::flush_loop`): log events stream in, each
   * flush interval is an event-time window on the arrival clock, and
   * append mode emits each window's enqueue decisions exactly once when
   * the watermark closes it. The greedy semaphore fold runs INSIDE the
   * windowed aggregate (one `collect_list` + `aggregate()` per window —
   * state bounded by the flush interval, exactly the manager's buffer
   * bound); everything emitted is per-event `(win, seq, transform_name,
   * partition, status, sz)`.
   */
  def publishStream(events: DataFrame, dataPath: String, ckptPath: String,
      lineMaxBytes: Int, bufferCapacityBytes: Long, flushIntervalMs: Long,
      nPartitions: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    require(lineMaxBytes > 0 && bufferCapacityBytes > 0 && flushIntervalMs > 0)
    graft.functions.GraftFunctions.register(events.sparkSession)
    val truncBytes = substring(col("message").cast("binary"), 1, lineMaxBytes)
    val prepared = events.select(
      col("transform_name"), col("seq"), col("ts_ms"),
      truncBytes.cast("string").as("message"),
      length(truncBytes).cast("long").as("sz"),
      isValidMessage(truncBytes).as("valid"))
    val stZero = struct(
      lit(0L).as("used"),
      array().cast("array<struct<seq:bigint,name:string,sz:bigint,st:string>>")
        .as("out"))
    val q = prepared
      .withColumn("__ts", timestamp_millis(col("ts_ms")))
      .withWatermark("__ts", "0 milliseconds")
      .groupBy(window(col("__ts"), s"$flushIntervalMs milliseconds"))
      .agg(sort_array(collect_list(struct(
        col("seq"), col("sz"), col("valid"), col("transform_name")))).as("evs"))
      .select(
        (unix_millis(col("window.start")) / flushIntervalMs).cast("long").as("win"),
        explode(aggregate(col("evs"), stZero,
          (st, e) => {
            val fits = st.getField("used") + e.getField("sz") <= bufferCapacityBytes
            val admit = fits && e.getField("valid")
            struct(
              when(admit, st.getField("used") + e.getField("sz"))
                .otherwise(st.getField("used")).as("used"),
              concat(st.getField("out"), array(struct(
                e.getField("seq").as("seq"),
                e.getField("transform_name").as("name"),
                e.getField("sz").as("sz"),
                when(!fits, "dropped_buffer_full")
                  .when(!e.getField("valid"), "dropped_invalid")
                  .otherwise("ok").as("st")))).as("out"))
          }).getField("out")).as("r"))
      .select(col("win"), col("r.seq").as("seq"),
        col("r.name").as("transform_name"),
        pmod(expr("murmur2(encode(r.name, 'UTF-8'))").cast("long")
          .bitwiseAND(lit(0xffffffffL)), lit(nPartitions.toLong))
          .cast("int").as("partition"),
        col("r.st").as("status"), col("r.sz").as("sz"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", dataPath)
      .start()
    q.awaitTermination()
    q
  }

  /** Per-transform probe counters (`probes.h`): `log_event` fires per
   *  enqueue attempt, `dropped_log_event` only on buffer-full
   *  (`log_manager.cc:322,335` — validation failures are not counted
   *  by the drop probe). */
  def probes(enqueued: DataFrame): DataFrame =
    enqueued.groupBy("transform_name")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("status") === "dropped_buffer_full", 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("status") === "dropped_invalid", 1L).otherwise(0L))
          .as("n_invalid"),
        sum(when(col("status") === "ok", 1L).otherwise(0L)).as("n_published"))
}
