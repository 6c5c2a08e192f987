package graft.log

import graft.SparkSpec

/** Topic purger: marker branch ladder, quota prefix cut, and the
  * retryable-failure run abort (`purger.cc`). */
class PurgerSpec extends SparkSpec {
  import spark.implicits._

  private def markers(rows: (String, Int, Int, Boolean, Boolean, Long)*) =
    rows.toDF("topic", "revision", "partition_count", "remote_delete",
      "read_replica", "marker_ts_ms")

  test("a retryable manifest failure aborts the run; later markers stay untouched") {
    val mk = markers(
      ("a", 1, 2, true, false, 0L),
      ("b", 1, 2, true, false, 0L),
      ("c", 1, 2, true, false, 0L))
    // topic b partition 0: manifest walk is reverse order (m desc), so
    // m=1 unreadable cuts before m=0 — only m=2's ops land.
    val man = Seq(
      ("a", 0, 0, 1500L, "ok"), ("a", 1, 0, 1500L, "ok"),
      ("b", 0, 0, 4000L, "ok"), ("b", 0, 1, 1000L, "unreadable"),
      ("b", 0, 2, 2000L, "ok"),
      ("b", 1, 0, 1500L, "ok"),
      ("c", 0, 0, 1500L, "ok"), ("c", 1, 0, 1500L, "ok"))
      .toDF("topic", "partition", "m", "n_segments", "state")
    val got = Purger.run(mk, man, quota = 100L, nowMs = 10L, graceMs = 0L)
      .orderBy("topic").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("a", "purged", 2L, 2L),          // 1 + 1 ops (1500 segs → max(1,1))
      ("b", "retry_pending", 2L, 0L),   // only m=2's 2000 segs → 2 ops
      ("c", "not_reached", 0L, 0L)))
  }

  test("quota exhaustion at a topic boundary still marks the reached topic") {
    val mk = markers(("a", 1, 1, true, false, 0L), ("b", 1, 1, true, false, 0L))
    val man = Seq(("a", 0, 0, 3000L, "ok"), ("b", 0, 0, 1000L, "ok"))
      .toDF("topic", "partition", "m", "n_segments", "state")
    val got = Purger.run(mk, man, quota = 3L, nowMs = 10L, graceMs = 0L)
      .orderBy("topic").collect().map(r => (r.getString(0), r.getString(1)))
    // a consumes exactly the quota (3 ops); b is reached, checks the
    // spent quota before its first partition, and drops out.
    assert(got.toSeq === Seq(("a", "purged"), ("b", "quota_exhausted")))
  }

  test("an empty manifest list purges with zero ops") {
    val mk = markers(("a", 1, 2, true, false, 0L))
    val man = Seq.empty[(String, Int, Int, Long, String)]
      .toDF("topic", "partition", "m", "n_segments", "state")
    val got = Purger.run(mk, man, quota = 10L, nowMs = 10L, graceMs = 0L)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("purged", 0L, 2L)))
  }
}
