package graft.log

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** write_caching flush fold (`ntp_config.h:273-301`,
  * `consensus.cc:874`): byte trigger, time trigger, reset-on-flush. */
class WriteCachingSpec extends SparkSpec {
  import spark.implicits._

  // p0: bytes 60+50 >= 100 flushes at off 1 (acc resets), then 30+30 < 100
  //     but off 3 is 1000ms past the off-1 flush -> time flush; 40 remains.
  // p1: single small batch, no trigger -> durable stays -1.
  private def mkLog() = Seq(
    (0, 0L, 0L, 60L), (0, 1L, 100L, 50L), (0, 2L, 500L, 30L),
    (0, 3L, 1100L, 30L), (0, 4L, 1200L, 40L),
    (1, 0L, 0L, 10L))
    .toDF("partition", "offset", "ts_ms", "bytes")

  test("byte and time triggers fire and the accumulator resets at each flush") {
    val got = WriteCaching.flushAccounting(mkLog(), col("partition"), col("offset"),
        col("ts_ms"), col("bytes"), cachingEnabled = true,
        flushBytes = 100L, flushMs = 1000L)
      .select("partition", "offset", "flushed", "flushed_offset")
      .as[(Int, Long, Boolean, Long)].collect().toSet
    assert(got === Set(
      (0, 0L, false, -1L), (0, 1L, true, 1L), (0, 2L, false, 1L),
      (0, 3L, true, 3L), (0, 4L, false, 3L),
      (1, 0L, false, -1L)))
  }

  test("watermarks: HWM runs ahead of durable under caching, coincides in sync") {
    val cached = WriteCaching.watermarks(mkLog(), col("partition"), col("offset"),
        col("ts_ms"), col("bytes"), cachingEnabled = true,
        flushBytes = 100L, flushMs = 1000L)
      .as[(Int, Long, Long, Long, Long)].collect().toMap2
    assert(cached(0) === ((5L, 3L, 1L, 2L)))
    assert(cached(1) === ((1L, -1L, 1L, 0L)))
    val sync = WriteCaching.watermarks(mkLog(), col("partition"), col("offset"),
        col("ts_ms"), col("bytes"), cachingEnabled = false,
        flushBytes = 100L, flushMs = 1000L)
      .as[(Int, Long, Long, Long, Long)].collect().toMap2
    assert(sync(0) === ((5L, 4L, 0L, 5L)))
    assert(sync(1) === ((1L, 0L, 0L, 1L)))
  }

  private implicit class Tup5Ops(rows: Array[(Int, Long, Long, Long, Long)]) {
    def toMap2: Map[Int, (Long, Long, Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
