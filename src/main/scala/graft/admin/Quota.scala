package graft.admin

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A6 client-quota throttle (SURVEY §2.4): per-client token-bucket rate
 * enforcement over a request log.
 *
 * Reference: each client's produce/fetch rate is enforced by a token
 * bucket — capacity `burst`, refilled at the quota rate; a request that
 * overdraws the bucket is admitted but earns a throttle delay returned
 * in the response until the balance recovers
 * (`kafka/server/quota_manager.cc`, `utils/atomic_token_bucket.h`;
 * resolved per-client quota values come from the quota store —
 * [[Admin.resolveClientQuotas]]).
 *
 * Spark design: the bucket is inherently a per-client sequential fold,
 * so it runs as the same secondary-sorted streaming iterator as the
 * idempotent-producer admission fold (`ConsumerGroups.validateSequences`)
 * — repartition by client, in-partition sort by (client, ts, seq), one
 * pass; a hot client never buffers its history in heap. All arithmetic
 * is integral (tokens, ms, rate tokens/ms), so the result is bit-exact
 * reproducible by any engine — the DuckDB oracle replays the recurrence
 * with a recursive CTE.
 */
object Quota {

  final case class Req(client_id: String, ts_ms: Long, bytes: Long, seq: Long)
  final case class Decision(client_id: String, seq: Long, ts_ms: Long, bytes: Long,
      tokens: Long, throttle_ms: Long)

  /**
   * Fold the token bucket over each client's request sequence. A client
   * starts with a full bucket (`burst` tokens); on each request the
   * bucket refills `ratePerMs * dt` capped at `burst`, then the request
   * debits its bytes. Negative balance ⇒ `throttle_ms =
   * ceil(-tokens / ratePerMs)` — the delay until the balance recovers,
   * the figure the reference returns in the response header.
   */
  def tokenBucketThrottle(requests: DataFrame, clientCol: Column, tsMsCol: Column,
      bytesCol: Column, seqCol: Column, ratePerMs: Long, burst: Long): DataFrame = {
    require(ratePerMs > 0 && burst > 0, "quota rate and burst must be positive")
    val spark = requests.sparkSession
    import spark.implicits._
    requests.select(clientCol.cast("string").as("client_id"),
        tsMsCol.cast("long").as("ts_ms"), bytesCol.cast("long").as("bytes"),
        seqCol.cast("long").as("seq"))
      .as[Req]
      .repartition(col("client_id"))
      .sortWithinPartitions(col("client_id"), col("ts_ms"), col("seq"))
      .mapPartitions { it =>
        var cur: String = null
        var tokens = 0L
        var lastTs = 0L
        it.map { r =>
          if (r.client_id != cur) { cur = r.client_id; tokens = burst; lastTs = r.ts_ms }
          else {
            tokens = math.min(burst, tokens + ratePerMs * (r.ts_ms - lastTs))
            lastTs = r.ts_ms
          }
          tokens -= r.bytes
          val throttle = if (tokens < 0) (-tokens + ratePerMs - 1) / ratePerMs else 0L
          Decision(r.client_id, r.seq, r.ts_ms, r.bytes, tokens, throttle)
        }
      }
      .toDF()
  }
}
