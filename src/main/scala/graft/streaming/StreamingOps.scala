package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Watermarked stateful streaming operators — the Structured Streaming
 * twins of the engine's batch aggregations, with bounded state.
 *
 * The reference computes these continuously broker-side (usage windows in
 * `cluster/health_monitor_*`/usage tracking, produce dedup in the
 * idempotent-producer path `kafka/server/produce.cc` + `rm_stm`); the
 * Spark-native re-expression is `withWatermark` + windowed agg /
 * `dropDuplicatesWithinWatermark`, which gives the same two guarantees
 * the broker implementations engineer by hand:
 *
 *  - *bounded state*: hour windows older than the watermark are
 *    finalized and evicted; dedup keys older than the watermark delay
 *    are forgotten (the reference's producer-id state likewise expires,
 *    `producer_state_manager.cc`);
 *  - *exactly-once emission*: append output mode emits a window exactly
 *    once, when the watermark passes its end — late data within the
 *    delay still lands in its window, later data is dropped.
 *
 * At 100 TB / 1000 executors this is the shape that survives: state is
 * partitioned by group key across executors, each micro-batch shuffles
 * only its own rows, and the state store holds O(active windows x
 * groups), not O(history).
 */
object StreamingOps {

  /**
   * A5's streaming twin: hourly usage windows (bytes + records per
   * group), emitted in append mode once the event-time watermark passes
   * each window's end. `stream` must already carry an event-time
   * timestamp column named `tsField`.
   */
  def usageWindowsStream(stream: DataFrame, outPath: String, ckptDir: String,
      tsField: String, grpCol: Column, bytesCol: Column,
      delay: String = "1 hour"): StreamingQuery =
    stream
      .withWatermark(tsField, delay)
      .groupBy(window(col(tsField), "1 hour"), grpCol.as("grp"))
      .agg(sum(bytesCol).as("bytes"), count(lit(1)).as("records"))
      .select(col("window.start").as("window_start"), col("grp"),
        col("bytes"), col("records"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .start()

  /**
   * Streaming exact dedup with watermark-bounded state: the first row
   * per key set is emitted immediately; duplicates arriving within
   * `delay` of the original's event time are dropped; state for keys
   * older than the watermark is evicted (so the state store is bounded
   * by the key arrival rate x delay, not by stream history — the same
   * expiry contract as the reference's producer-id dedup state).
   */
  def dedupStream(stream: DataFrame, outPath: String, ckptDir: String,
      tsField: String, keyCols: Seq[String],
      delay: String): StreamingQuery =
    stream
      .withWatermark(tsField, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .start()

  /**
   * Stream-stream interval join: both inputs must carry watermarks and
   * the join condition must bound event time on both sides (an equality
   * key plus a time range), so each side's buffered state is evicted
   * once the other side's watermark passes the range — the
   * bounded-state contract that makes a continuous join survive at
   * 100 TB (state is O(in-flight interval), not O(stream history)).
   * Matches are emitted as both sides arrive; with AvailableNow over
   * finite inputs the emitted set is exactly the batch join's.
   */
  def intervalJoinStream(lhs: DataFrame, rhs: DataFrame,
      joinExpr: Column, outPath: String, ckptDir: String): StreamingQuery =
    lhs.join(rhs, joinExpr)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outPath)
      .start()
}
