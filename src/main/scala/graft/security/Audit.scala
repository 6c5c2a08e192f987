package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Audit-log manager semantics (reference
 * `security/audit/audit_log_manager.h:386-401`): auditable API events
 * queue per drain interval in a hashed-unique structure so IDENTICAL
 * events coalesce into ONE audit record carrying a count — "many
 * requests are identical and can be combined into one" — which is what
 * keeps produce-request auditing affordable. Admission is filtered by
 * the enabled event-type set and the excluded topic/principal lists
 * (`audit_log_manager.h:360-368`).
 *
 * Fold shape: the filters are tiny broadcast literals folded into one
 * codegen'd predicate; the coalescing is one groupBy whose map-side
 * combine absorbs the duplicate mass — the shuffle carries one row per
 * distinct (interval, identity) tuple, never per request. The same
 * keys-×-intervals bound as the transform commit batcher.
 */
object Audit {

  /**
   * Coalesce an API event log `(seq, principal, event_type, topic,
   * operation)` into audit records per drain interval: one row per
   * (interval, principal, event_type, topic, operation) with `count`,
   * `first_seq`, `last_seq` (the OCSF record's count + start/end
   * times). Events outside `enabledTypes`, or on excluded topics /
   * from excluded principals, are not auditable and drop before the
   * fold.
   */
  private def admission(enabledTypes: Seq[String], excludedTopics: Seq[String],
      excludedPrincipals: Seq[String]): Column =
    col("event_type").isin(enabledTypes: _*) &&
      (if (excludedTopics.isEmpty) lit(true)
       else !col("topic").isin(excludedTopics: _*)) &&
      (if (excludedPrincipals.isEmpty) lit(true)
       else !col("principal").isin(excludedPrincipals: _*))

  def coalesce(events: DataFrame, drainIntervalLen: Long,
      enabledTypes: Seq[String], excludedTopics: Seq[String] = Nil,
      excludedPrincipals: Seq[String] = Nil): DataFrame = {
    require(drainIntervalLen > 0, "drainIntervalLen must be positive")
    require(enabledTypes.nonEmpty, "at least one enabled event type")
    events
      .where(admission(enabledTypes, excludedTopics, excludedPrincipals))
      .withColumn("interval", floor(col("seq") / drainIntervalLen).cast("long"))
      .groupBy("interval", "principal", "event_type", "topic", "operation")
      .agg(count(lit(1)).as("count"),
        min("seq").as("first_seq"), max("seq").as("last_seq"))
  }

  /**
   * [[coalesce]]'s STREAMING twin — the `_drain_timer` loop the
   * reference actually runs: the seq clock becomes event time, each
   * drain interval an event-time window, and append mode emits each
   * coalesced audit record exactly once when its interval closes, with
   * watermark-bounded state (the shard-local pending map).
   *
   * This is a ONE-SHOT AvailableNow run: after the query drains the
   * source, the still-open windows (those the 0 ms watermark never
   * closed — at minimum the final drain interval) are flushed from the
   * aggregation's checkpointed state via the state-store reader and
   * appended to `dataPath`, so the caller needs no clock-advancing
   * sentinel and no audit record is ever lost. The state read is
   * bounded by open (interval × identity) tuples — metadata scale.
   */
  def coalesceStream(events: DataFrame, dataPath: String, ckptPath: String,
      drainIntervalLen: Long, enabledTypes: Seq[String],
      excludedTopics: Seq[String] = Nil,
      excludedPrincipals: Seq[String] = Nil): StreamingQuery = {
    require(drainIntervalLen > 0, "drainIntervalLen must be positive")
    require(enabledTypes.nonEmpty, "at least one enabled event type")
    val q = events
      .withColumn("__ts", timestamp_millis(col("seq")))
      .withWatermark("__ts", "0 milliseconds")
      .where(admission(enabledTypes, excludedTopics, excludedPrincipals))
      .groupBy(window(col("__ts"), s"$drainIntervalLen milliseconds"),
        col("principal"), col("event_type"), col("topic"), col("operation"))
      .agg(count(lit(1)).as("count"),
        min("seq").as("first_seq"), max("seq").as("last_seq"))
      .select(
        (unix_millis(col("window.start")) / drainIntervalLen).cast("long").as("interval"),
        col("principal"), col("event_type"), col("topic"), col("operation"),
        col("count"), col("first_seq"), col("last_seq"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", dataPath)
      .start()
    q.awaitTermination()
    // Final drain: rows still in the aggregation state are exactly the
    // windows append mode has not emitted (emitted ones are evicted).
    // The file sink's _spark_metadata log must go first — with it in
    // place readers trust only sink-listed files and the drained append
    // would be invisible; dropping it turns the one-shot output into a
    // plain parquet dir (the checkpoint, which owns restart semantics,
    // is untouched).
    val spark = events.sparkSession
    val meta = new org.apache.hadoop.fs.Path(dataPath, "_spark_metadata")
    meta.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(meta, true)
    // Buffer fields arrive in agg order: (count, min(seq), max(seq)).
    val st = spark.read.format("statestore").load(ckptPath)
    val vcols = st.select(col("value.*")).columns
    st.select(
        (unix_millis(col("key.window.start")) / drainIntervalLen).cast("long").as("interval"),
        col("key.principal"), col("key.event_type"), col("key.topic"),
        col("key.operation"),
        col(s"value.${vcols(0)}").as("count"),
        col(s"value.${vcols(1)}").as("first_seq"),
        col(s"value.${vcols(2)}").as("last_seq"))
      .write.mode("append").parquet(dataPath)
    q
  }
}
