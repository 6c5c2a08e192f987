package graft.admin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Debug-bundle service lifecycle (reference
 * `debug_bundle/debug_bundle_service.{h,cc}`, status enum
 * `debug_bundle/types.h:122` {running, success, error, expired},
 * error codes `debug_bundle/error.h:22-33`): a single-shard service
 * (`types.h` `service_shard = 0`) tracks AT MOST ONE rpk bundle
 * process — the latest initiated job — with command rules:
 *
 *  - initiate: refused with `debug_bundle_process_running` while a
 *    bundle runs (`service.cc:373`); otherwise the previous run's file
 *    is cleaned up (`cleanup_previous_run`, service.h:144) and the new
 *    job starts `running`.
 *  - finish (process exit): `success` keeps the bundle file (name +
 *    size), a non-zero exit lands `error`.
 *  - cancel: `debug_bundle_process_never_started` before any job,
 *    `debug_bundle_process_not_running` when the tracked job already
 *    finished, `job_id_not_recognized` for a stale job id
 *    (`service.cc:462-472`); a live cancel terminates the process →
 *    status `error`.
 *  - expire (the cleanup timer): a `success` bundle past its TTL drops
 *    its file and becomes `expired`.
 *  - get_file: never_started / process_running / process_failed /
 *    debug_bundle_expired / job_id_not_recognized ladder
 *    (`service.cc:543-556`), success returns the path.
 *
 * Spark shape: the command log is control-plane-sized (bundles are
 * operator-initiated) and the service is one shard by construction —
 * the replay is the same one-partition sorted fold as
 * [[graft.cluster.DataMigrations.outcomes]]: no driver collect, O(1)
 * state (the single tracked process).
 */
object DebugBundle {

  final case class Cmd(seq: Long, op: String, job_id: String, ok: Boolean,
      file_size: Long, ts_ms: Long)
  final case class Outcome(seq: Long, op: String, job_id: String,
      errc: String, status_after: String, current_job: String)

  /** TTL for a success bundle before the cleanup timer expires it. */
  val DefaultTtlMs: Long = 3600L * 1000

  /**
   * Replay `(seq, op ∈ initiate|finish|cancel|expire_sweep|get_file,
   * job_id, ok, file_size, ts_ms)` in seq order; one outcome row per
   * command with the errc, the tracked job's status after the command,
   * and the tracked job id.
   */
  def outcomes(commandLog: DataFrame, ttlMs: Long = DefaultTtlMs): DataFrame = {
    val spark = commandLog.sparkSession
    import spark.implicits._
    commandLog.select(col("seq").cast("long"), col("op"), col("job_id"),
        col("ok"), col("file_size").cast("long"), col("ts_ms").cast("long"))
      .as[Cmd]
      .coalesce(1)
      .sortWithinPartitions("seq")
      .mapPartitions { it =>
        var job: String = null        // tracked (latest) job id
        var status: String = null     // running | success | error | expired
        var successTs = 0L
        def out(c: Cmd, errc: String) = Outcome(c.seq, c.op, c.job_id, errc,
          status, job)
        it.map { c =>
          c.op match {
            case "initiate" =>
              if (status == "running") out(c, "debug_bundle_process_running")
              else {
                // cleanup_previous_run: the prior bundle's file is gone
                job = c.job_id; status = "running"
                out(c, "success")
              }
            case "finish" =>
              // process-exit notification for the tracked job
              if (job != c.job_id || status != "running") out(c, "internal_error")
              else {
                status = if (c.ok) "success" else "error"
                successTs = c.ts_ms
                out(c, "success")
              }
            case "cancel" =>
              if (job == null) out(c, "debug_bundle_process_never_started")
              else if (status != "running") out(c, "debug_bundle_process_not_running")
              else if (job != c.job_id) out(c, "job_id_not_recognized")
              else { status = "error"; out(c, "success") }
            case "expire_sweep" =>
              if (status == "success" && c.ts_ms - successTs >= ttlMs)
                status = "expired"
              out(c, "success")
            case "get_file" =>
              if (job == null) out(c, "debug_bundle_process_never_started")
              else if (status == "running") out(c, "debug_bundle_process_running")
              else if (status == "error") out(c, "process_failed")
              else if (status == "expired") out(c, "debug_bundle_expired")
              else if (job != c.job_id) out(c, "job_id_not_recognized")
              else out(c, "success")
            case other => out(c, s"invalid_parameters:$other")
          }
        }
      }
      .toDF()
  }
}
