package graft.log

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tiered-storage scrubber: the `scrub_segment_meta` rule ladder
  * (cloud_storage/types.cc:150-216), existence anti-joins, and the
  * depth-bounded run summary. */
class ScrubberSpec extends SparkSpec {
  import spark.implicits._

  // partition 0: a clean prefix then one planted defect per rule.
  //   seg0 [0,9] d=0/2     clean
  //   seg1 [10,19] d=null  missing_delta (prev had one)
  //   seg2 [20,29] d=0/2   no anomaly: prev delta null → monotonicity not checked
  //   seg3 [32,41] d=1/3   offset_gap (30 expected, 32 seen)
  //   seg4 [40,49] d=0/2   offset_overlap (42 expected) + non_monotonical (1→0)
  //   seg5 [50,44] d=5/4   committed_smaller + end_delta_smaller; base 50
  //                        exactly follows committed 49 → no gap/overlap
  private val manifest = Seq(
    (0, 0L, 9L, Some(0L), Some(2L), "s0"),
    (0, 10L, 19L, None, None, "s1"),
    (0, 20L, 29L, Some(0L), Some(2L), "s2"),
    (0, 32L, 41L, Some(1L), Some(3L), "s3"),
    (0, 40L, 49L, Some(0L), Some(2L), "s4"),
    (0, 50L, 44L, Some(5L), Some(4L), "s5"),
    (1, 0L, 9L, Some(0L), Some(0L), "t0"),
    (1, 10L, 19L, Some(0L), Some(0L), "t1"))
    .toDF("partition", "base_offset", "committed_offset",
      "delta_offset", "delta_offset_end", "path")

  test("each metadata rule fires exactly on its planted segment") {
    val got = Scrubber.scrubSegmentMeta(manifest)
      .orderBy("partition", "at_base_offset", "anomaly_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq === Seq(
      (0, "missing_delta", 10L, 0L),
      (0, "offset_gap", 32L, 20L),
      (0, "non_monotonical_delta", 40L, 32L),
      (0, "offset_overlap", 40L, 32L),
      (0, "committed_smaller", 50L, -1L),
      (0, "end_delta_smaller", 50L, -1L)))
  }

  test("existence anti-joins surface missing segments and spillover manifests") {
    val objects = Seq("s0", "s1", "s2", "s3", "s5", "t0", "t1", "sp0").toDF("path")
    val spill = Seq((0, "sp0"), (1, "sp1")).toDF("partition", "path")
    val got = Scrubber.scrub(manifest, objects, spill)
      .where(col("anomaly_type").startsWith("missing_s"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSet === Set((0, "missing_segment"), (1, "missing_spillover_manifest")))
  }

  test("depth-bounded run reports partial with the last visited offset") {
    val objects = manifest.select("path")
    val spill = spark.emptyDataset[(Int, String)].toDF("partition", "path")
    val got = Scrubber.scrubStatus(manifest, objects, spill, maxSegments = 3)
      .orderBy("partition").collect()
    val p0 = got(0)
    assert(p0.getString(1) === "partial")
    assert(p0.getLong(2) === 29L) // last visited committed offset
    assert(p0.getLong(3) === 3L)  // segments_visited
    assert(p0.getLong(4) === 1L)  // only seg1's missing_delta is in the slice
    val p1 = got(1)
    assert(p1.getString(1) === "full" && p1.isNullAt(2) && p1.getLong(4) === 0L)
  }

  test("the scrub window is partition-scoped — no single-partition global sort") {
    val p = Scrubber.scrubSegmentMeta(manifest)
      .queryExecution.executedPlan.toString()
    assert(p.contains("hashpartitioning(partition"), p)
    assert(!p.contains("SinglePartition"), p)
  }
}
