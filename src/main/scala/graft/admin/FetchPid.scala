package graft.admin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fetch PID controller (SURVEY §4 optional tuning) — the adaptive fetch
 * debounce of `kafka/server/fetch_pid_controller.h:21` /
 * `fetch_pid_controller.cc:62` (`current_delay`): a per-shard PID loop
 * over reactor samples that delays fetch handling just enough to hold
 * the fetch scheduling group at its target utilization once the
 * reactor saturates.
 *
 * Semantics preserved from the reference:
 *  - error = (busy < ~100%) ? busy - 100% : fetch_runtime - target
 *    (`fetch_pid_controller.cc:96-99`) — drive the reactor to full
 *    utilization first; only then cap the fetch group's share.
 *  - integral clamped to [0, max_delay / i] (`:108-112`) so a
 *    saturated controller stays responsive in both directions.
 *  - out-of-range samples (dt too small, busy or runtime outside
 *    [0, dt]) carry the previous delay unchanged (`:69-90`).
 *  - pid floored at 0, delay capped at max_delay (`:118-125`).
 *
 * Spark re-expression: the reference's long-double loop becomes an
 * INTEGRAL recurrence — utilizations in permille, coefficients in
 * micro-units (µs of delay per permille of error), delays in µs/ms —
 * so the fold is bit-exact and any engine (the DuckDB oracle replays
 * it as a recursive CTE) re-derives it. The controller is a per-shard
 * sequential fold, so it runs as the same secondary-sorted
 * streaming iterator as the quota token bucket ([[Quota]]): repartition
 * by shard, in-partition sort, one pass, O(1) state per shard.
 */
object FetchPid {

  final case class Sample(shard: String, seq: Long, dt_ms: Long,
      busy_ms: Long, sg_ms: Long)
  final case class Delay(shard: String, seq: Long, error_pm: Long,
      error_int: Long, delay_us: Long)

  /** Reactor-saturation threshold: 999 permille (~ the reference's
    * 0.999 `target_reactor_util`). */
  val ReactorTargetPm = 999L

  /**
   * Fold the PID over each shard's sample sequence (ordered by `seq`).
   * `dt_ms` is the sample interval, `busy_ms` total reactor busy time
   * within it, `sg_ms` the fetch scheduling group's runtime within it.
   * Coefficients: `pMicro`/`iMicro`/`dMicro` are µs of delay per
   * permille of error (P), per permille·ms of integrated error (I),
   * and per permille-per-ms of error slope (D); `targetPm` the fetch
   * group's target utilization in permille; `maxDelayMs` the debounce
   * cap. Emits (shard, seq, error_pm, error_int, delay_us) — the delay
   * in the reference's own 1µs duration_unit.
   */
  def fetchDelays(samples: DataFrame, shardCol: Column, seqCol: Column,
      dtMsCol: Column, busyMsCol: Column, sgMsCol: Column,
      pMicro: Long, iMicro: Long, dMicro: Long,
      targetPm: Long, maxDelayMs: Long): DataFrame = {
    require(iMicro > 0 && maxDelayMs > 0, "need positive i coefficient and max delay")
    val spark = samples.sparkSession
    import spark.implicits._
    // i-term alone may reach, but never exceed, the max delay:
    // iMicro * intMax / 1000 == maxDelayMs * 1000  (cc:108-112)
    val intMax = maxDelayMs * 1000L * 1000L / iMicro
    samples.select(shardCol.cast("string").as("shard"),
        seqCol.cast("long").as("seq"), dtMsCol.cast("long").as("dt_ms"),
        busyMsCol.cast("long").as("busy_ms"), sgMsCol.cast("long").as("sg_ms"))
      .as[Sample]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
      .mapPartitions { it =>
        var cur: String = null
        var eInt = 0L; var lastE = 0L; var lastDelay = 0L
        it.map { s =>
          if (s.shard != cur) { cur = s.shard; eInt = 0L; lastE = 0L; lastDelay = 0L }
          val valid = s.dt_ms > 0 && s.busy_ms >= 0 && s.busy_ms <= s.dt_ms &&
            s.sg_ms >= 0 && s.sg_ms <= s.dt_ms
          if (!valid) Delay(s.shard, s.seq, lastE, eInt, lastDelay)
          else {
            val busyPm = s.busy_ms * 1000L / s.dt_ms
            val runPm = s.sg_ms * 1000L / s.dt_ms
            val e = if (busyPm < ReactorTargetPm) busyPm - ReactorTargetPm
                    else runPm - targetPm
            eInt = math.max(0L, math.min(intMax, eInt + e * s.dt_ms))
            val pUs = pMicro * e / 1000L
            val iUs = iMicro * eInt / 1000L
            val dUs = dMicro * (e - lastE) / s.dt_ms / 1000L
            lastE = e
            val pidUs = math.max(0L, pUs + iUs + dUs)
            lastDelay = math.min(maxDelayMs * 1000L, pidUs)
            Delay(s.shard, s.seq, e, eInt, lastDelay)
          }
        }
      }
      .toDF()
  }
}
