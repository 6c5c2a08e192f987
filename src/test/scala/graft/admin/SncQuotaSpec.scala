package graft.admin

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.admin.SncQuota._

class SncQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def reqs(rows: Seq[(Int, Long, Long, String, Long, Long)]) =
    rows.toDF("node_id", "seq", "ts_ms", "client_id", "req_bytes", "resp_bytes")

  test("control group matcher ladder: all / missing / full-match regex") {
    val df = Seq("svc-a", "svc-abc", "other", null)
      .toDF("client_id")
    def assign(groups: Seq[ControlGroup]) =
      df.select(col("client_id"), controlGroupFor(col("client_id"), groups).as("g"))
        .as[(String, String)].collect().toMap
    // regex must FULL-match (RE2 FullMatch): svc-abc does not match svc-.
    val m = assign(Seq(
      ControlGroup("svc", MatchRegex("svc-.")),
      ControlGroup("anon", MatchMissing)))
    assert(m === Map("svc-a" -> "svc", "svc-abc" -> null,
      "other" -> null, (null: String) -> "anon"))
    // an omitted matcher matches everything, and order wins
    val all = assign(Seq(ControlGroup("first", MatchAll),
      ControlGroup("svc", MatchRegex("svc-.*"))))
    assert(all.values.toSet === Set("first"))
  }

  test("exempt connections touch no bucket") {
    val out = nodeThrottle(
      reqs(Seq((0, 1L, 1000L, "x", 500L, 500L), (0, 2L, 1000L, "y", 50L, 50L))),
      Seq(ControlGroup("g", MatchRegex("x"))),
      inBps = Some(100L), egBps = Some(100L), maxDelayMs = 30000L, epochMs = 0L)
      .select("seq", "exempt", "throttle_ms", "tokens_in")
      .as[(Long, Boolean, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 && out(1L)._3 === 0L && out(1L)._4.isEmpty)
    // the big exempt request did not overdraw the bucket for seq 2:
    // bucket saw only 50 bytes after a 1 s refill of 100 tokens
    assert(!out(2L)._2 && out(2L)._4 === Some(50L))
  }

  test("ingress debits before the delay calc; egress after") {
    // one request at t=1s: in bucket = min(100, 0 + 100) - 150 = -50 ->
    // delay ceil(50*1000/100) = 500ms. eg bucket delay is computed on
    // the PRE-debit balance (100 >= 0 -> 0), so the response bytes do
    // not throttle their own request.
    val out = nodeThrottle(
      reqs(Seq((0, 1L, 1000L, "c", 150L, 500L))),
      Nil, inBps = Some(100L), egBps = Some(100L), maxDelayMs = 30000L, epochMs = 0L)
      .select("throttle_ms", "tokens_in", "tokens_eg")
      .as[(Long, Long, Long)].head()
    assert(out === ((500L, -50L, -400L)))
  }

  test("the egress deficit throttles the NEXT request, clamped at max") {
    val out = nodeThrottle(
      reqs(Seq((0, 1L, 1000L, "c", 10L, 100000L), (0, 2L, 1100L, "c", 10L, 0L))),
      Nil, inBps = Some(1000L), egBps = Some(1000L), maxDelayMs = 60000L, epochMs = 0L)
      .select("seq", "throttle_ms").as[(Long, Long)].collect().toMap
    assert(out(1L) === 0L)
    // eg balance after req1: 1000 - 100000 = -99000; +100ms refill = 100
    // tokens -> -98900 -> ceil(98900*1000/1000) = 98900ms, clamped 60000
    assert(out(2L) === 60000L)
  }

  test("refill caps at one second of burst and an absent limit never throttles") {
    val out = nodeThrottle(
      reqs(Seq((0, 1L, 100000L, "c", 1500L, 999999L))),
      Nil, inBps = Some(1000L), egBps = None, maxDelayMs = 30000L, epochMs = 0L)
      .select("throttle_ms", "tokens_in", "tokens_eg")
      .as[(Long, Long, Option[Long])].head()
    // 100 s idle refills only to the 1000-token cap; 1500 overdraws 500
    assert(out._1 === 500L && out._2 === -500L && out._3.isEmpty)
  }

  test("probes count traffic for non-exempt connections only") {
    val r = reqs(Seq(
      (0, 1L, 1000L, "in", 100L, 200L),
      (0, 2L, 1001L, "c", 10L, 20L),
      (1, 3L, 1002L, "c", 30L, 40L)))
    val thr = nodeThrottle(r, Seq(ControlGroup("g", MatchRegex("in"))),
      Some(1000000L), Some(1000000L), 30000L, 0L)
    val p = probes(thr, r, Some(1000000L), Some(1000000L))
      .select("node_id", "traffic_intake", "traffic_egress", "n_requests")
      .as[(Int, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(p(0) === ((0, 10L, 20L, 2L)) && p(1) === ((1, 30L, 40L, 1L)))
  }
}
