package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  def coalesce(events: DataFrame, drainIntervalLen: Long,
      enabledTypes: Seq[String], excludedTopics: Seq[String] = Nil,
      excludedPrincipals: Seq[String] = Nil): DataFrame = {
    require(drainIntervalLen > 0, "drainIntervalLen must be positive")
    require(enabledTypes.nonEmpty, "at least one enabled event type")
    val admitted = events
      .where(col("event_type").isin(enabledTypes: _*) &&
        (if (excludedTopics.isEmpty) lit(true)
         else !col("topic").isin(excludedTopics: _*)) &&
        (if (excludedPrincipals.isEmpty) lit(true)
         else !col("principal").isin(excludedPrincipals: _*)))
    admitted
      .withColumn("interval", floor(col("seq") / drainIntervalLen).cast("long"))
      .groupBy("interval", "principal", "event_type", "topic", "operation")
      .agg(count(lit(1)).as("count"),
        min("seq").as("first_seq"), max("seq").as("last_seq"))
  }
}
