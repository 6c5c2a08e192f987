package graft.admin

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Self-test result reduction: exact rank-based percentiles, integer
  * throughput, and the frontend status view. */
class SelfTestSpec extends SparkSpec {
  import spark.implicits._

  test("percentiles are the rank-ceil sample; rps/bps exact integers") {
    // node 0 / disk: latencies 10,20,...,100 over seq 0..9
    val samples = (0 until 10)
      .map(i => (0, "disk", i.toLong, (i + 1) * 10L, 100L, i != 3))
      .toDF("node", "test_type", "seq", "lat_us", "bytes", "ok")
    val r = SelfTest.report(samples, col("node"), col("test_type"),
        col("seq"), col("lat_us"), col("bytes"), col("ok"))
      .collect().head
    assert(r.getAs[Long]("n_requests") === 10L)
    assert(r.getAs[Long]("timeouts") === 1L)
    // ceil(.5*10)=5 -> 50; ceil(.9*10)=9 -> 90; ceil(.99*10)=10 -> 100
    assert(r.getAs[Long]("p50_us") === 50L)
    assert(r.getAs[Long]("p90_us") === 90L)
    assert(r.getAs[Long]("p99_us") === 100L)
    assert(r.getAs[Long]("p999_us") === 100L)
    assert(r.getAs[Long]("max_us") === 100L)
    // duration = 9 - 0 + 1 = 10 ms; 10 reqs * 1e6 / 10 = 1,000,000
    assert(r.getAs[Long]("rps_x1000") === 1000000L)
    // bytes_total = 10 * 100 = 1000; 1000 * 1e6 / 10 = 100,000,000
    assert(r.getAs[Long]("bps_x1000") === 100000000L)
  }

  test("status view: heartbeat stage vs done vs missing node") {
    val nodes = Seq(0, 1, 2).toDF("node")
    val hb = Seq((0, "disk", false), (1, "net", true)).toDF("node", "stage", "done")
    val got = SelfTest.statusView(nodes, hb)
      .as[(Int, String, String)].collect().toSet
    assert(got === Set((0, "running", "disk"), (1, "idle", "idle"),
      (2, "unreachable", "idle")))
  }
}
