package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Refusal corpus for the datalake coordinator's exactly-once
 * file-admission FSM (reference `datalake/coordinator/
 * state_update.cc`): every rejection rung — gap, overlap/retry, stale
 * commit, non-boundary commit, commit-without-files, empty adds,
 * lifecycle refusals — plus the acceptance invariants (closed topics
 * still commit, purge clears state, re-registration starts fresh).
 */
class DatalakeCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private val L = "lifecycle"; private val A = "add_files"; private val M = "mark_committed"
  private val e = Seq.empty[Long]

  private def replay(rows: Seq[(Long, String, String, Int, Long, String, Long, Seq[Long], Long)])
      : Map[Long, (String, java.lang.Long, Int)] =
    DatalakeCoordinator.outcomes(rows.toDF("seq", "op", "topic", "partition",
        "revision", "target", "add_start", "entry_ends", "new_committed"))
      .select("seq", "errc", "last_committed", "pending_count")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
        r.getInt(3))))
      .toMap

  test("add_files admission: first-add anywhere, then strictly contiguous") {
    val out = replay(Seq(
      (1L, L, "t", 0, 1L, "live", -1L, e, -1L),
      (2L, A, "t", 0, 1L, "", 5L, Seq(20L), -1L),      // no state: any start
      (3L, A, "t", 0, 1L, "", 21L, Seq(30L, 40L), -1L), // contiguous multi-entry
      (4L, A, "t", 0, 1L, "", 45L, Seq(50L), -1L),     // gap -> reject
      (5L, A, "t", 0, 1L, "", 21L, Seq(30L), -1L),     // retried duplicate -> reject
      (6L, A, "t", 0, 1L, "", 41L, Seq(60L), -1L)))    // resumes exactly
    assert(out(2L)._1 == "success")
    assert(out(3L)._1 == "success")
    assert(out(4L)._1 == "not_contiguous")
    assert(out(5L)._1 == "not_contiguous")
    assert(out(6L)._1 == "success" && out(6L)._3 == 4)
  }

  test("mark_files_committed: boundary-only, monotone, prefix drop") {
    val out = replay(Seq(
      (1L, L, "t", 0, 1L, "live", -1L, e, -1L),
      (2L, M, "t", 0, 1L, "", -1L, e, 10L),            // nothing pending
      (3L, A, "t", 0, 1L, "", 0L, Seq(9L, 19L, 29L), -1L),
      (4L, M, "t", 0, 1L, "", -1L, e, 15L),            // not an entry boundary
      (5L, M, "t", 0, 1L, "", -1L, e, 19L),            // drops [9,19]
      (6L, M, "t", 0, 1L, "", -1L, e, 19L),            // stale (already committed)
      (7L, M, "t", 0, 1L, "", -1L, e, 9L),             // stale (below committed)
      (8L, M, "t", 0, 1L, "", -1L, e, 29L),
      (9L, M, "t", 0, 1L, "", -1L, e, 29L)))           // pending drained: no_files first
    assert(out(2L)._1 == "no_files")
    assert(out(4L)._1 == "no_entry_boundary")
    assert(out(5L) == (("success", java.lang.Long.valueOf(19L), 1)))
    assert(out(6L)._1 == "stale_commit")
    assert(out(7L)._1 == "stale_commit")
    assert(out(8L) == (("success", java.lang.Long.valueOf(29L), 0)))
    // reference checks empty-pending BEFORE staleness (state_update.cc:163-168)
    assert(out(9L)._1 == "no_files")
  }

  test("lifecycle ladder: closed topics commit but don't add; purge clears") {
    val out = replay(Seq(
      (1L, A, "t", 0, 1L, "", 0L, Seq(9L), -1L),       // unregistered
      (2L, L, "t", 0, 1L, "live", -1L, e, -1L),
      (3L, A, "t", 0, 1L, "", 0L, Seq(9L), -1L),
      (4L, A, "t", 0, 2L, "", 10L, Seq(19L), -1L),     // revision mismatch
      (5L, A, "t", 0, 1L, "", 10L, e, -1L),            // empty entries
      (6L, L, "t", 0, 0L, "live", -1L, e, -1L),        // obsolete revision
      (7L, L, "t", 0, 2L, "live", -1L, e, -1L),        // new rev before purge
      (8L, L, "t", 0, 1L, "closed", -1L, e, -1L),
      (9L, A, "t", 0, 1L, "", 10L, Seq(19L), -1L),     // closed: no new adds
      (10L, L, "t", 0, 1L, "purged", -1L, e, -1L),     // still has pending
      (11L, M, "t", 0, 1L, "", -1L, e, 9L),            // closed still commits
      (12L, L, "t", 0, 1L, "live", -1L, e, -1L),       // backward transition
      (13L, L, "t", 0, 1L, "purged", -1L, e, -1L),     // now allowed; clears state
      (14L, L, "t", 0, 2L, "live", -1L, e, -1L),       // re-register new revision
      (15L, A, "t", 0, 2L, "", 100L, Seq(120L), -1L))) // fresh state: any start
    assert(out(1L)._1 == "not_registered")
    assert(out(3L)._1 == "success")
    assert(out(4L)._1 == "revision_mismatch")
    assert(out(5L)._1 == "no_entries")
    assert(out(6L)._1 == "obsolete_revision")
    assert(out(7L)._1 == "not_purged")
    assert(out(8L)._1 == "success")
    assert(out(9L)._1 == "topic_closed")
    assert(out(10L)._1 == "has_pending")
    assert(out(11L) == (("success", java.lang.Long.valueOf(9L), 0)))
    assert(out(12L)._1 == "invalid_transition")
    assert(out(13L) == (("success", null, 0)))         // purge drops last_committed
    assert(out(14L)._1 == "success")
    assert(out(15L)._1 == "success")
  }

  test("purge with pending on ANY partition of the topic refuses") {
    val out = replay(Seq(
      (1L, L, "t", 0, 1L, "live", -1L, e, -1L),
      (2L, A, "t", 0, 1L, "", 0L, Seq(9L), -1L),
      (3L, A, "t", 1, 1L, "", 0L, Seq(9L), -1L),
      (4L, M, "t", 0, 1L, "", -1L, e, 9L),
      (5L, L, "t", 0, 1L, "closed", -1L, e, -1L),
      (6L, L, "t", 0, 1L, "purged", -1L, e, -1L),      // partition 1 still pending
      (7L, M, "t", 1, 1L, "", -1L, e, 9L),
      (8L, L, "t", 0, 1L, "purged", -1L, e, -1L)))
    assert(out(6L)._1 == "has_pending")
    assert(out(8L)._1 == "success")
  }

  test("committer crash-retry: the table property dedups files, marks replay") {
    // iceberg_file_committer.cc:152-226 — first run against a fresh
    // table appends everything and stamps the property; if the
    // coordinator dies AFTER the Iceberg commit but BEFORE the STM
    // marks apply, the retry sees the property at max(added_at):
    // every file dedups, no Iceberg txn, and the SAME mark updates
    // re-emit so the STM converges.
    val log = Seq(
      (1L, L, "t", 0, 1L, "live", -1L, e, -1L),
      (2L, A, "t", 0, 1L, "", 0L, Seq(9L), -1L),
      (3L, A, "t", 1, 1L, "", 0L, Seq(4L), -1L),
      (4L, A, "t", 0, 1L, "", 10L, Seq(19L), -1L))
      .toDF("seq", "op", "topic", "partition", "revision", "target",
        "add_start", "entry_ends", "new_committed")
    val pend = DatalakeCoordinator.pendingEntries(log,
      DatalakeCoordinator.outcomes(log))
    def run(tc: org.apache.spark.sql.DataFrame) = {
      val dec = DatalakeCoordinator.commitDecisions(pend, tc)
      (dec.collect().map(r => (r.getLong(2), r.getString(4))).sortBy(_._1),
        DatalakeCoordinator.commitUpdates(dec)
          .select("partition", "new_committed", "iceberg_txn", "new_property")
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1))
    }
    val fresh = Seq.empty[(String, Long)].toDF("topic", "committed_at")
    val (dec1, upd1) = run(fresh)
    assert(dec1.toSeq === Seq((2L, "append"), (3L, "append"), (4L, "append")))
    assert(upd1.toSeq === Seq((0, 19L, true, 4L), (1, 4L, true, 4L)))
    // crash-retry: the property now carries max(added_at) = 4
    val (dec2, upd2) = run(Seq(("t", 4L)).toDF("topic", "committed_at"))
    assert(dec2.forall(_._2 == "dedup_skip"))
    assert(upd2.map(u => (u._1, u._2)).toSeq === upd1.map(u => (u._1, u._2)).toSeq)
    assert(upd2.forall(!_._3)) // no Iceberg txn on the retry
  }

  test("finalState: last data op per partition, purge clears older partitions") {
    val log = Seq(
      (1L, L, "t", 0, 1L, "live", -1L, e, -1L),
      (2L, A, "t", 0, 1L, "", 0L, Seq(9L), -1L),
      (3L, A, "t", 1, 1L, "", 0L, Seq(9L, 19L), -1L),
      (4L, M, "t", 0, 1L, "", -1L, e, 9L),
      (5L, M, "t", 1, 1L, "", -1L, e, 9L))
      .toDF("seq", "op", "topic", "partition", "revision", "target",
        "add_start", "entry_ends", "new_committed")
    val fs = DatalakeCoordinator.finalState(DatalakeCoordinator.outcomes(log))
      .orderBy("partition")
      .select("partition", "lifecycle", "revision", "last_committed",
        "pending_count", "pending_last")
      .collect()
    assert(fs.length == 2)
    assert(fs(0).getInt(0) == 0 && fs(0).getString(1) == "live" &&
      fs(0).getLong(3) == 9L && fs(0).getInt(4) == 0 && fs(0).isNullAt(5))
    assert(fs(1).getInt(0) == 1 && fs(1).getLong(3) == 9L &&
      fs(1).getInt(4) == 1 && fs(1).getLong(5) == 19L)
  }
}
