package graft.log

import graft.SparkSpec

class SegmentMergerSpec extends SparkSpec {
  import spark.implicits._

  // (partition, base, committed, size, term)
  private def segs(rows: (Int, Long, Long, Long, Long)*) =
    rows.toDF("partition", "base_offset", "committed_offset", "size_bytes", "term")

  private def runs(df: org.apache.spark.sql.DataFrame,
      max: Long = 100L, min: Long = 50L, local: Long = 1000L) =
    SegmentMerger.scanRuns(df, max, min, local)
      .select("partition", "base_offset", "committed_offset", "num_segments", "size_bytes")
      .as[(Int, Long, Long, Int, Long)].collect().toList.sortBy(_._1)

  test("a small-segment run merges up to the target size and stops") {
    // 40+40 fits (80 <= 100), third 40 would exceed -> run of 2, frozen
    val r = runs(segs((0, 0L, 9L, 40L, 1L), (0, 10L, 19L, 40L, 1L),
      (0, 20L, 29L, 40L, 1L), (0, 30L, 39L, 40L, 1L)))
    assert(r === List((0, 0L, 19L, 2, 80L)))
  }

  test("one-segment corner reset: skip the previous, start at the current") {
    // 70 then 60: 130 > 100 resets; 60 starts a new run, joins 30 -> (60+30)
    val r = runs(segs((0, 0L, 9L, 70L, 1L), (0, 10L, 19L, 60L, 1L),
      (0, 20L, 29L, 30L, 1L)))
    assert(r === List((0, 10L, 29L, 2, 90L)))
  }

  test("cross-term merging is disallowed — a 1-run wedges on the boundary") {
    // the reference's run state sticks at the single term-1 segment: a
    // term-mismatched neighbor neither joins, freezes (num must be >1),
    // nor restarts the run (maybe_add_segment returns false leaving the
    // run unchanged), so THIS scan invocation finds nothing
    val r = runs(segs((0, 0L, 9L, 40L, 1L), (0, 10L, 19L, 40L, 2L),
      (0, 20L, 29L, 40L, 2L), (0, 30L, 39L, 40L, 3L)))
    assert(r === Nil)
  }

  test("a non-contiguous neighbor resets the run and is itself skipped") {
    // gap after committed 9: the run resets AND base-20 is dropped
    // (run.cc returns false right after the reset); the run restarts at
    // the NEXT segment
    val r = runs(segs((0, 0L, 9L, 40L, 1L), (0, 20L, 29L, 40L, 1L),
      (0, 30L, 39L, 40L, 1L), (0, 40L, 49L, 40L, 1L)))
    assert(r === List((0, 30L, 49L, 2, 80L)))
  }

  test("a wedged run below the low watermark is still accepted") {
    // two 20s (40 < min 50) followed by a 200 (too big to join or start):
    // run does not touch the manifest tail -> accepted
    val r = runs(segs((0, 0L, 9L, 20L, 1L), (0, 10L, 19L, 20L, 1L),
      (0, 20L, 29L, 200L, 1L)))
    assert(r === List((0, 0L, 19L, 2, 40L)))
  }

  test("a tail run below the low watermark is rejected") {
    val r = runs(segs((0, 0L, 9L, 20L, 1L), (0, 10L, 19L, 20L, 1L)))
    assert(r === Nil)
  }

  test("segments at or above the local start offset are not scanned") {
    // the second segment is still local-only; the single uploaded
    // segment cannot form a run
    val r = runs(segs((0, 0L, 9L, 40L, 1L), (0, 10L, 19L, 40L, 1L)),
      local = 10L)
    assert(r === Nil)
  }

  test("mergeManifest replaces exactly the run rows") {
    val m = segs((0, 0L, 9L, 40L, 1L), (0, 10L, 19L, 40L, 1L),
      (0, 20L, 29L, 40L, 1L), (1, 0L, 9L, 500L, 1L))
    val out = SegmentMerger.mergeManifest(m,
        SegmentMerger.scanRuns(m, 100L, 50L, 1000L))
      .select("partition", "base_offset", "committed_offset", "size_bytes", "merged")
      .as[(Int, Long, Long, Long, Boolean)].collect().toList
      .sortBy(r => (r._1, r._2))
    assert(out === List(
      (0, 0L, 19L, 80L, true),   // consolidated
      (0, 20L, 29L, 40L, false), // untouched tail
      (1, 0L, 9L, 500L, false))) // other partition untouched
  }
}
