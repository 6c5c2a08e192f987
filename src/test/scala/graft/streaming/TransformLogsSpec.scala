package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TransformLogsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(seq: Long, name: String, msg: String, tsMs: Long = 0L,
      level: String = "info", source: Int = 1) =
    (name, seq, tsMs, level, source, msg)

  private def enqueue(rows: Seq[(String, Long, Long, String, Int, String)],
      lineMax: Int = 32, cap: Long = 100L, flushMs: Long = 1000L) =
    TransformLogs.enqueue(
      rows.toDF("transform_name", "seq", "ts_ms", "level", "source_id", "message"),
      lineMax, cap, flushMs)

  test("severity matches the OTel map in event.cc") {
    val got = Seq("trace", "debug", "info", "warn", "error").toDF("l")
      .select(TransformLogs.severity(col("l"))).as[Int].collect().toSeq
    assert(got === Seq(1, 5, 9, 13, 17))
  }

  test("greedy admission: a non-fitting event consumes no units") {
    // cap=100: 60 fits (used 60), 50 does NOT fit (60+50>100) and is
    // dropped WITHOUT consuming, 30 then fits (used 90), 20 overflows.
    val rows = Seq(
      ev(1, "t", "a" * 60), ev(2, "t", "b" * 50),
      ev(3, "t", "c" * 30), ev(4, "t", "d" * 20))
    val st = enqueue(rows, lineMax = 64, cap = 100L)
      .select("seq", "status").as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "ok", 2L -> "dropped_buffer_full",
      3L -> "ok", 4L -> "dropped_buffer_full"))
  }

  test("buffer-full is checked before validity (reference check order)") {
    val rows = Seq(ev(1, "t", "a" * 90), ev(2, "t", "bad\u0001" + "x" * 40))
    val st = enqueue(rows, lineMax = 64, cap = 100L)
      .select("seq", "status").as[(Long, String)].collect().toMap
    // event 2 is invalid AND does not fit: the reference drops it as
    // buffer_full (probe counted) before validation ever runs
    assert(st(2L) === "dropped_buffer_full")
  }

  test("control chars drop; newline and tab survive; truncation can cure") {
    val rows = Seq(
      ev(1, "t", "fine\nwith\ttabs"),             // \n and \t are allowed
      ev(2, "t", "bel\u0007bad"),                  // BEL inside the line max
      ev(3, "t", "12345678\u0007"))                // BEL beyond it: cut away
    val out = enqueue(rows, lineMax = 8, cap = 1000L)
      .select("seq", "status", "message")
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === "ok" && out(1L)._3 === "fine\nwit") // byte-truncated
    assert(out(2L)._2 === "dropped_invalid")
    assert(out(3L)._2 === "ok" && out(3L)._3 === "12345678")
  }

  test("flush windows reset the budget") {
    val rows = Seq(
      ev(1, "t", "a" * 80, tsMs = 0L),
      ev(2, "t", "b" * 80, tsMs = 10L),   // same window: dropped
      ev(3, "t", "c" * 80, tsMs = 1500L)) // next window: fresh budget
    val st = enqueue(rows, lineMax = 100, cap = 100L)
      .select("seq", "status").as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "ok", 2L -> "dropped_buffer_full", 3L -> "ok"))
  }

  test("otel json envelope and escaping match the reference writer") {
    val df = Seq(("n1", 1L, 1000L, "warn", 7, "say \"hi\" \\ now\there"))
      .toDF("transform_name", "seq", "ts_ms", "level", "source_id", "message")
    val enq = TransformLogs.enqueue(df, 64, 1000L, 1000L)
    val json = TransformLogs.publish(enq, 8)
      .select("body_json").as[String].head()
    assert(json ===
      """{"body":{"stringValue":"say \"hi\" \\ now\there"},""" +
      """"timeUnixNano":1000000000,"severityNumber":13,""" +
      """"attributes":[{"key":"transform_name","value":{"stringValue":"n1"}},""" +
      """{"key":"node","value":{"intValue":7}}]}""")
    // and it round-trips through a JSON parser to the original message
    val parsed = spark.range(1).select(
      get_json_object(lit(json), "$.body.stringValue")).as[String].head()
    assert(parsed === "say \"hi\" \\ now\there")
  }

  test("publish routes on unsigned murmur2 like find_coordinator") {
    val df = Seq(("xform-0", 1L, 0L, "info", 0, "m"),
      ("xform-1", 2L, 0L, "info", 0, "m"),
      ("xform-2", 3L, 0L, "info", 0, "m"),
      ("xform-3", 4L, 0L, "info", 0, "m"))
      .toDF("transform_name", "seq", "ts_ms", "level", "source_id", "message")
    val parts = TransformLogs.publish(
        TransformLogs.enqueue(df, 64, 1000L, 1000L), 8)
      .select("transform_name", "partition").as[(String, Int)].collect().toMap
    val expected = Seq("xform-0", "xform-1", "xform-2", "xform-3").map(n =>
      n -> graft.functions.Murmur2.partitionFor(n.getBytes("UTF-8"), 8)).toMap
    assert(parts === expected)
    assert(expected === Map("xform-0" -> 4, "xform-1" -> 5,
      "xform-2" -> 2, "xform-3" -> 6)) // the oracle's golden values
  }

  test("probes: validation failures are not drop-counted") {
    val rows = Seq(
      ev(1, "t", "ok1"), ev(2, "t", "bad\u0002"), ev(3, "t", "x" * 200))
    val p = TransformLogs.probes(enqueue(rows, lineMax = 64, cap = 10L))
      .as[(String, Long, Long, Long, Long)].collect().head
    // cap 10: ok1 (3) fits; bad (4) fits but invalid; 64-byte trunc of
    // the 200-char line does not fit -> buffer drop
    assert(p === (("t", 3L, 1L, 1L, 1L)))
  }
}
