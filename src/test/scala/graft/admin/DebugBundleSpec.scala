package graft.admin

import graft.SparkSpec

/** Debug-bundle lifecycle fold: the refusal ladder and TTL expiry. */
class DebugBundleSpec extends SparkSpec {
  import spark.implicits._

  test("initiate/cancel/finish/expire ladder matches the service rules") {
    val log = Seq(
      (1L, "cancel", "a", true, 0L, 0L),         // nothing ever started
      (2L, "initiate", "a", true, 0L, 10L),
      (3L, "initiate", "b", true, 0L, 20L),      // refused: a running
      (4L, "cancel", "x", true, 0L, 30L),        // stale id while a runs
      (5L, "finish", "a", true, 100L, 40L),
      (6L, "get_file", "a", true, 0L, 50L),      // success
      (7L, "expire_sweep", "", true, 0L, 2000L), // 40 + 1000 <= 2000: expire
      (8L, "get_file", "a", true, 0L, 2100L))
      .toDF("seq", "op", "job_id", "ok", "file_size", "ts_ms")
    val got = DebugBundle.outcomes(log, ttlMs = 1000L)
      .select("seq", "errc", "status_after")
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "debug_bundle_process_never_started", None),
      (2L, "success", Some("running")),
      (3L, "debug_bundle_process_running", Some("running")),
      (4L, "job_id_not_recognized", Some("running")),
      (5L, "success", Some("success")),
      (6L, "success", Some("success")),
      (7L, "success", Some("expired")),
      (8L, "debug_bundle_expired", Some("expired"))))
  }
}
