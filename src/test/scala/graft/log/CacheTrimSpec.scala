package graft.log

import graft.SparkSpec

class CacheTrimSpec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (Int, String, Long, Long)*) =
    rows.toDF("node_id", "path", "size_bytes", "access_time")

  private def actions(df: org.apache.spark.sql.DataFrame, maxBytes: Long,
      maxObjects: Long, lw: Int = 800) =
    CacheTrim.trim(df, maxBytes, maxObjects, lw)
      .select("path", "action").as[(String, String)].collect().toMap

  test("no trim while under both limits") {
    val a = actions(files(
      (0, "a.log", 50L, 1L), (0, "b.log", 40L, 2L)), maxBytes = 100L, maxObjects = 10L)
    assert(a.values.toSet === Set("kept"))
  }

  test("LRU eviction to the low-watermark target") {
    // size 120 > max 100 -> target 80; delete 40: the two oldest (15+30)
    val a = actions(files(
      (0, "old.log", 15L, 1L), (0, "mid.log", 30L, 2L),
      (0, "new.log", 75L, 3L)), maxBytes = 100L, maxObjects = 10L)
    assert(a === Map("old.log" -> "deleted_lru", "mid.log" -> "deleted_lru",
      "new.log" -> "kept"))
  }

  test("exempt, tmp, and companion files are walked over, not deleted") {
    val a = actions(files(
      (0, "/c/accesstime", 5L, 0L), (0, "x.part", 5L, 1L),
      (0, "orphan.index", 5L, 2L), (0, "seg.log", 100L, 3L),
      (0, "big.log", 100L, 4L)), maxBytes = 100L, maxObjects = 10L)
    assert(a("/c/accesstime") === "skipped_exempt")
    assert(a("x.part") === "skipped_tmp")
    assert(a("orphan.index") === "skipped_companion")
    // overage 215-80=135: seg.log (100) then big.log (100) delete
    assert(a("seg.log") === "deleted_lru" && a("big.log") === "deleted_lru")
  }

  test("deleting a segment takes its .tx/.index companions and their bytes count") {
    // LRU: seg.log first; its companions (accessed later) go with it and
    // their 60 bytes satisfy the quota, so young.log survives
    val a = actions(files(
      (0, "seg.log", 40L, 1L), (0, "young.log", 60L, 2L),
      (0, "seg.log.tx", 30L, 3L), (0, "seg.log.index", 30L, 4L)),
      maxBytes = 100L, maxObjects = 10L)
    // size 160 > 100 -> target 80 -> delete 80 = 40 + 30 + 30
    assert(a === Map("seg.log" -> "deleted_lru",
      "seg.log.tx" -> "deleted_companion", "seg.log.index" -> "deleted_companion",
      "young.log" -> "kept"))
  }

  test("the object limit trims even when bytes are fine") {
    // 4 objects > max 3 -> object target 3*800/1000 = 2 -> delete 2
    val a = actions(files(
      (0, "a.log", 1L, 1L), (0, "b.log", 1L, 2L),
      (0, "c.log", 1L, 3L), (0, "d.log", 1L, 4L)),
      maxBytes = 1000L, maxObjects = 3L)
    assert(a === Map("a.log" -> "deleted_lru", "b.log" -> "deleted_lru",
      "c.log" -> "kept", "d.log" -> "kept"))
  }

  test("nodes trim independently") {
    val a = CacheTrim.trim(files(
        (0, "a.log", 200L, 1L), (1, "b.log", 10L, 1L)),
        maxBytes = 100L, maxObjects = 10L)
      .select("node_id", "action").as[(Int, String)].collect().toMap
    assert(a === Map(0 -> "deleted_lru", 1 -> "kept"))
  }
}
