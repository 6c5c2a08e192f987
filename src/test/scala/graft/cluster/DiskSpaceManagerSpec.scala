package graft.cluster

import graft.SparkSpec

/** Disk-space manager: target rule, trigger threshold, and the
  * balanced round-robin eviction schedule. */
class DiskSpaceManagerSpec extends SparkSpec {
  import spark.implicits._

  test("target size: pct/bytes compose as min; bytes clamp to usable") {
    // disk 1000, 10% reserved -> usable 900
    assert(DiskSpaceManager.targetSize(1000L, 10.0, Some(50.0), None) === 450L)
    assert(DiskSpaceManager.targetSize(1000L, 10.0, None, Some(400L)) === 400L)
    assert(DiskSpaceManager.targetSize(1000L, 10.0, Some(50.0), Some(400L)) === 400L)
    assert(DiskSpaceManager.targetSize(1000L, 10.0, Some(30.0), Some(400L)) === 270L)
    // bytes beyond usable clamp to it
    assert(DiskSpaceManager.targetSize(1000L, 10.0, None, Some(5000L)) === 900L)
    assert(DiskSpaceManager.targetSize(1000L, 10.0, None, None) === 0L)
  }

  test("trigger: overage within one segment size reclaims nothing") {
    assert(DiskSpaceManager.adjustedExcess(1000L, 990L, 100L, 2.0) === 0L)
    assert(DiskSpaceManager.adjustedExcess(1200L, 1000L, 100L, 2.0) === 400L)
    assert(DiskSpaceManager.adjustedExcess(900L, 1000L, 100L, 2.0) === 0L)
  }

  test("schedule marks round-robin across partitions, levels in order") {
    // local_retention: p0 has s0,s1; p1 has s0 — RR visits p0s0, p1s0,
    // then p0s1; the active segment only if the target still uncovered.
    val segs = Seq(
      (0, "local_retention", 0L, 100L), (0, "local_retention", 1L, 100L),
      (1, "local_retention", 0L, 100L), (0, "active_segment", 2L, 100L))
      .toDF("partition", "level", "seg", "size")
    val sched = DiskSpaceManager.evictionSchedule(segs, targetExcess = 250L)
      .select("partition", "level", "seg", "marked", "bytes_before")
      .as[(Int, String, Long, Boolean, Long)].collect().toSet
    assert(sched === Set(
      (0, "local_retention", 0L, true, 0L),
      (1, "local_retention", 0L, true, 100L),
      (0, "local_retention", 1L, true, 200L),
      (0, "active_segment", 2L, false, 300L)))
    // a larger target reaches the active-segment level
    val est = DiskSpaceManager.levelEstimates(
        DiskSpaceManager.evictionSchedule(segs, targetExcess = 350L))
      .select("level", "bytes_marked").as[(String, Long)].collect().toMap
    assert(est === Map("local_retention" -> 300L, "active_segment" -> 100L))
    // zero target marks nothing
    val none = DiskSpaceManager.evictionSchedule(segs, targetExcess = 0L)
      .where(col("marked")).count()
    assert(none === 0L)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
