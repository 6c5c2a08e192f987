package graft.admin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cluster self-test report (reference `cluster/self_test_rpc_types.h`:
 * `self_test_result` — p50/p90/p99/p999/max, rps, bps, timeouts per
 * (node, test); `self_test_status {idle, running, unreachable}`
 * `:33`; stage `{idle, disk, net, cloud}` `:39`; collection
 * `self_test_frontend.h:39`): the disk/net benchmark jobs each node
 * runs produce request-level samples, and the frontend reduces them
 * to one result row per (node, test) plus a per-node status view.
 *
 * Spark shape: percentiles are EXACT rank-based selections — a
 * per-(node, test) window ranks the latencies and the p-th disc
 * percentile is the sample at position ceil(p·n) — then one aggregate
 * per group. Groups are (node × test): each holds one benchmark run's
 * samples, the natural per-node granularity of the reference's
 * self-test (the window sorts within a single node's run, never
 * across the fleet). Throughput figures are integer micro-units so an
 * external SQL engine reproduces every cell bit-exactly.
 */
object SelfTest {

  private val Pcts = Seq("p50" -> 0.50, "p90" -> 0.90, "p99" -> 0.99, "p999" -> 0.999)

  /**
   * Reduce request-level samples `(node, test_type, seq, latency_us,
   * bytes, ok)` to `self_test_result` rows. The synthetic clock is the
   * seq span: duration_ms = max(seq) - min(seq) + 1 per group, making
   * rps/bps exact integer arithmetic.
   */
  def report(samples: DataFrame, nodeCol: Column, testCol: Column,
      seqCol: Column, latencyUsCol: Column, bytesCol: Column,
      okCol: Column): DataFrame = {
    val base = samples.select(nodeCol.cast("int").as("node"),
      testCol.as("test_type"), seqCol.cast("long").as("seq"),
      latencyUsCol.cast("long").as("lat_us"), bytesCol.cast("long").as("bytes"),
      okCol.as("ok"))
    val w = Window.partitionBy("node", "test_type").orderBy("lat_us", "seq")
    val ranked = base
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy("node", "test_type")))
    val pctAggs = Pcts.map { case (name, p) =>
      max(when(col("__rn") === ceil(lit(p) * col("__n")), col("lat_us")))
        .as(s"${name}_us")
    }
    val aggs = Seq(sum((!col("ok")).cast("long")).as("timeouts")) ++ pctAggs ++ Seq(
      max("lat_us").as("max_us"), sum("bytes").as("bytes_total"),
      (max("seq") - min("seq") + 1).as("duration_ms"))
    ranked.groupBy("node", "test_type")
      .agg(count(lit(1)).as("n_requests"), aggs: _*)
      // `div`, not `/`: Column./ on longs is DOUBLE division — the
      // micro-unit figures must stay exact integers
      .withColumn("rps_x1000", expr("n_requests * 1000000 div duration_ms"))
      .withColumn("bps_x1000", expr("bytes_total * 1000000 div duration_ms"))
  }

  /**
   * The frontend's per-node status view: a node with a heartbeat and an
   * unfinished stage reports `running` at that stage, a finished node
   * `idle`, and a node missing from the heartbeat set `unreachable`
   * (status collection, `self_test_frontend.h`). `nodes` = the fleet;
   * `heartbeats` = (node, stage, done).
   */
  def statusView(nodes: DataFrame, heartbeats: DataFrame): DataFrame =
    nodes.select(col("node").cast("int").as("node"))
      .join(broadcast(heartbeats.select(col("node").cast("int").as("node"),
        col("stage"), col("done"))), Seq("node"), "left")
      .select(col("node"),
        when(col("stage").isNull, "unreachable")
          .when(col("done"), "idle").otherwise("running").as("status"),
        when(col("stage").isNull || col("done"), "idle")
          .otherwise(col("stage")).as("stage"))
}
