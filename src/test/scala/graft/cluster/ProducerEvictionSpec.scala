package graft.cluster

import graft.SparkSpec

class ProducerEvictionSpec extends SparkSpec {
  import spark.implicits._

  private def run(maxIds: Int, exp: Long, rows: (Long, String, Long, Long)*) =
    ProducerEviction.outcomes(rows.toDF("seq", "op", "pid", "ts_ms"), maxIds, exp)
      .select("seq", "outcome", "evicted_pids", "n_active")
      .as[(Long, String, Seq[Long], Int)].collect().map(r => r._1 -> r).toMap

  test("insert-time eviction takes the LRU entry, skipping open transactions") {
    val o = run(2, 10000L,
      (1L, "register", 1L, 0L), (2L, "register", 2L, 10L),
      (3L, "begin_tx", 1L, 20L),      // p1 is now newest AND unevictable
      (4L, "register", 3L, 30L))      // p2 (LRU evictable) goes
    assert(o(4L) === ((4L, "ok", Seq(2L), 2)))
  }

  test("a full cache of open transactions refuses registration") {
    val o = run(2, 10000L,
      (1L, "register", 1L, 0L), (2L, "register", 2L, 10L),
      (3L, "begin_tx", 1L, 20L), (4L, "begin_tx", 2L, 30L),
      (5L, "register", 3L, 40L))
    assert(o(5L) === ((5L, "cache_full", Nil, 2)))
  }

  test("the reaper expires idle producers but not touched or in-tx ones") {
    val o = run(10, 1000L,
      (1L, "register", 1L, 0L), (2L, "register", 2L, 0L), (3L, "register", 3L, 0L),
      (4L, "begin_tx", 2L, 10L),      // in tx: survives
      (5L, "touch", 3L, 1500L),       // recent: survives
      (6L, "reaper", 0L, 2000L))      // deadline 1000: p1 expires
    assert(o(6L) === ((6L, "ok", Seq(1L), 2)))
  }

  test("data from an evicted producer is unknown; end_tx re-enables eviction") {
    val o = run(1, 10000L,
      (1L, "register", 1L, 0L),
      (2L, "begin_tx", 1L, 10L),
      (3L, "register", 2L, 20L),      // p1 in tx, cache of 1 full
      (4L, "end_tx", 1L, 30L),
      (5L, "register", 2L, 40L),      // now p1 evicts
      (6L, "data", 1L, 50L))
    assert(o(3L)._2 === "cache_full")
    assert(o(5L) === ((5L, "ok", Seq(1L), 1)))
    assert(o(6L)._2 === "unknown_producer")
  }
}
