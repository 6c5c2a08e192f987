package graft.admin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Shard/node/cluster (SNC) throughput quotas — the NODE-wide ingress/
 * egress rate limiter, distinct from the per-client quota (A6,
 * [[Quota]]).
 *
 * Reference `kafka/server/snc_quota_manager.{h,cc}`:
 *  - a pair of node-wide token buckets (`ingress_egress_state`), rates
 *    `kafka_throughput_limit_node_{in,out}_bps`; an absent limit means
 *    no bucket and no throttling on that side
 *    (`update_node_bucket`, `.cc:117-133`; burst limit = rate);
 *  - connections matching an ordered `kafka_throughput_control` group
 *    list are EXEMPT (`get_or_create_quota_context`, `.cc:203-249`):
 *    first matching group wins; a group with no client_id matcher
 *    matches everything, an empty matcher matches only a MISSING
 *    client_id, a regex must full-match a present client_id
 *    (`config/throughput_control_group.cc:131-147`);
 *  - per request: `record_request_receive` replenishes + debits the
 *    ingress bucket BEFORE `get_shard_delays` computes
 *    `min(max_kafka_throttle_delay, max(delay_in, delay_eg))`
 *    (`.cc:251-270`), and `record_response` debits the egress bucket
 *    AFTER — so a request's own response bytes never contribute to its
 *    own throttle;
 *  - the probe counts intake/egress traffic for non-exempt connections
 *    only (`snc_quotas_probe`).
 *
 * Spark design: exemption is a broadcast ordered-first-match conditional
 * (one codegen'd coalesce, the [[graft.security.PrincipalMapping]] fold
 * shape). The buckets are per-node sequential state, exactly as physical
 * as the reference's per-broker shard — so the fold runs as the same
 * secondary-sorted streaming iterator as [[Quota.tokenBucketThrottle]]:
 * repartition by node, in-partition sort, one pass, O(1) state. All
 * arithmetic is integral (bytes, ms, bps) so a DuckDB recursive CTE
 * replays it bit-exactly.
 */
object SncQuota {

  /** `config::throughput_control_group`'s client_id matcher ladder. */
  sealed trait ClientMatcher
  /** Omitted criterion: matches every connection. */
  case object MatchAll extends ClientMatcher
  /** Empty matcher: only a connection with NO client_id matches. */
  case object MatchMissing extends ClientMatcher
  /** Full-match regex over a present client_id (RE2 FullMatch ≙
    * anchored java regex). */
  final case class MatchRegex(re: String) extends ClientMatcher

  final case class ControlGroup(name: String, matcher: ClientMatcher)

  /** Ordered first-match group assignment: the matched group's name, or
    * null if the connection is subject to node quotas. */
  def controlGroupFor(clientId: Column, groups: Seq[ControlGroup]): Column =
    groups.foldRight(lit(null).cast("string")) { (g, acc) =>
      val cond = g.matcher match {
        case MatchAll        => lit(true)
        case MatchMissing    => clientId.isNull
        case MatchRegex(re)  => clientId.isNotNull && clientId.rlike(s"^(?:$re)$$")
      }
      when(cond, lit(g.name)).otherwise(acc)
    }

  final case class Req(node_id: Int, seq: Long, ts_ms: Long,
      client_id: String, group: String, req_bytes: Long, resp_bytes: Long)
  final case class Out(node_id: Int, seq: Long, client_id: String,
      group: String, exempt: Boolean, throttle_ms: Long,
      tokens_in: java.lang.Long, tokens_eg: java.lang.Long)

  /**
   * Evaluate the node throttle over a request log `(node_id, seq,
   * ts_ms, client_id, req_bytes, resp_bytes)`. Buckets start EMPTY at
   * `epochMs` (`update_node_bucket` passes `start_full=false`) and
   * refill `bps * dt / 1000` integral tokens capped at one second of
   * burst (limit = rate). A debit may overdraw; the deficit's recovery
   * time `ceil(deficit * 1000 / bps)` is the requested delay, clamped
   * at `maxDelayMs`. Exempt requests (first-match control group) touch
   * no bucket and carry zero delay with null token balances.
   */
  def nodeThrottle(requests: DataFrame, groups: Seq[ControlGroup],
      inBps: Option[Long], egBps: Option[Long], maxDelayMs: Long,
      epochMs: Long): DataFrame = {
    require(inBps.forall(_ > 0) && egBps.forall(_ > 0) && maxDelayMs >= 0)
    val spark = requests.sparkSession
    import spark.implicits._
    requests.select(
        col("node_id").cast("int").as("node_id"),
        col("seq").cast("long").as("seq"),
        col("ts_ms").cast("long").as("ts_ms"),
        col("client_id").cast("string").as("client_id"),
        controlGroupFor(col("client_id"), groups).as("group"),
        col("req_bytes").cast("long").as("req_bytes"),
        col("resp_bytes").cast("long").as("resp_bytes"))
      .as[Req]
      .repartition(col("node_id"))
      .sortWithinPartitions(col("node_id"), col("ts_ms"), col("seq"))
      .mapPartitions { it =>
        var node = Int.MinValue
        var tIn = 0L; var tEg = 0L; var lastTs = epochMs
        def refill(tokens: Long, bps: Long, dt: Long): Long =
          math.min(bps, tokens + bps * dt / 1000L)
        def delayFor(tokens: Long, bps: Long): Long =
          if (tokens >= 0) 0L else ((-tokens) * 1000L + bps - 1) / bps
        it.map { r =>
          if (r.node_id != node) { node = r.node_id; tIn = 0L; tEg = 0L; lastTs = epochMs }
          if (r.group != null) {
            // exempt: no bucket interaction, no delay
            Out(r.node_id, r.seq, r.client_id, r.group, exempt = true, 0L, null, null)
          } else {
            val dt = r.ts_ms - lastTs
            lastTs = r.ts_ms
            // receive: replenish + debit ingress, then compute delays —
            // the egress bucket replenishes but is debited only after
            val dIn = inBps.fold(0L) { bps =>
              tIn = refill(tIn, bps, dt) - r.req_bytes
              delayFor(tIn, bps)
            }
            val dEg = egBps.fold(0L) { bps =>
              tEg = refill(tEg, bps, dt)
              val d = delayFor(tEg, bps)
              tEg -= r.resp_bytes
              d
            }
            val throttle = math.min(maxDelayMs, math.max(dIn, dEg))
            Out(r.node_id, r.seq, r.client_id, null, exempt = false, throttle,
              if (inBps.isDefined) tIn else null,
              if (egBps.isDefined) tEg else null)
          }
        }
      }
      .toDF()
  }

  /** `snc_quotas_probe` per node: intake/egress traffic (non-exempt
    * only, `.cc:285,301`), throttled-request count, and the effective
    * per-shard quota metric (`setup_metrics` `calc_quota`: limit / n
    * shards, or 2^63-capped when unlimited — here per node). */
  def probes(throttled: DataFrame, requests: DataFrame,
      inBps: Option[Long], egBps: Option[Long]): DataFrame = {
    val sized = requests.select(
      col("node_id").cast("int").as("node_id"), col("seq").cast("long").as("seq"),
      col("req_bytes").cast("long").as("req_bytes"),
      col("resp_bytes").cast("long").as("resp_bytes"))
    val noLimit = Long.MaxValue / 1024 * 1024
    throttled.join(sized, Seq("node_id", "seq"))
      .groupBy("node_id")
      .agg(
        sum(when(!col("exempt"), col("req_bytes")).otherwise(0L)).as("traffic_intake"),
        sum(when(!col("exempt"), col("resp_bytes")).otherwise(0L)).as("traffic_egress"),
        sum(when(col("throttle_ms") > 0, 1L).otherwise(0L)).as("n_throttled"),
        count(lit(1)).as("n_requests"))
      .withColumn("quota_effective_in", lit(inBps.getOrElse(noLimit)))
      .withColumn("quota_effective_eg", lit(egBps.getOrElse(noLimit)))
  }
}
