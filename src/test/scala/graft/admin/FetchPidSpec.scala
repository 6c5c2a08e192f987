package graft.admin

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fetch PID debounce semantics (fetch_pid_controller.cc:62). */
class FetchPidSpec extends SparkSpec {
  import spark.implicits._

  private def run(samples: Seq[(String, Long, Long, Long, Long)],
      p: Long = 50L, i: Long = 2L, d: Long = 10L,
      target: Long = 400L, maxMs: Long = 100L) =
    FetchPid.fetchDelays(
        samples.toDF("shard", "seq", "dt_ms", "busy_ms", "sg_ms"),
        col("shard"), col("seq"), col("dt_ms"), col("busy_ms"), col("sg_ms"),
        p, i, d, target, maxMs)
      .orderBy("shard", "seq")
      .select("shard", "seq", "error_pm", "error_int", "delay_us")
      .as[(String, Long, Long, Long, Long)].collect().toSeq

  test("idle reactor earns no delay; saturation above target earns one") {
    // busy = dt/2 (499pm < 999) -> negative error, integral clamps at 0
    val idle = run((1L to 5L).map(q => ("s0", q, 2L, 1L, 1L)))
    assert(idle.forall(_._5 == 0L), idle)
    // saturated reactor, fetch at 100% vs target 400pm -> error 600pm,
    // integral i-term ramps the delay sample over sample
    val hot = run((1L to 5L).map(q => ("s0", q, 2L, 2L, 2L)))
    assert(hot.map(_._3).forall(_ == 600L))
    // sample 1 carries a one-off derivative kick (slope from 0); from
    // sample 2 on the integral term ramps the delay monotonically
    val ramp = hot.tail.map(_._5)
    assert(ramp === ramp.sorted, s"monotone i-term ramp: $hot")
    assert(hot.last._5 > hot(1)._5)
    // integral alone may reach but never exceed max delay (100ms = 1e5µs)
    val sat = run((1L to 200L).map(q => ("s0", q, 2L, 2L, 2L)), i = 2000L)
    assert(sat.map(_._5).max === 100000L)
  }

  test("out-of-range samples carry the previous state verbatim") {
    val out = run(Seq(
      ("s0", 1L, 2L, 2L, 2L),  // valid, saturated
      ("s0", 2L, 2L, 5L, 2L),  // busy > dt -> carry
      ("s0", 3L, 2L, 2L, 2L))) // valid again
    assert(out(1)._3 === out(0)._3) // error carried
    assert(out(1)._4 === out(0)._4) // integral unchanged
    assert(out(1)._5 === out(0)._5) // delay unchanged
    assert(out(2)._4 > out(1)._4)   // resumes integrating
  }

  test("shards fold independently") {
    val two = run(
      (1L to 3L).map(q => ("a", q, 2L, 2L, 2L)) ++
      (1L to 3L).map(q => ("b", q, 2L, 1L, 1L)))
    val (a, b) = two.partition(_._1 == "a")
    assert(a.map(_._5).exists(_ > 0L) && b.map(_._5).forall(_ == 0L))
  }
}
