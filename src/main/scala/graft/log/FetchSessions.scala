package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Incremental fetch sessions (the reference's KIP-227 surface): a
 * consumer registers its partition set once, then each subsequent fetch
 * ships only the delta — new/updated partitions in the request,
 * partitions with available data in the response.
 *
 * Reference semantics (`kafka/server/fetch_session_cache.cc:17-135`,
 * `fetch_session.h:189-195`):
 *  - a FULL fetch (epoch 0) closes any session with that id and creates
 *    a fresh one from the request's partition list; the next incremental
 *    request must carry epoch 1;
 *  - a FULL fetch with FINAL_EPOCH (-1) closes the session and stays
 *    sessionless (no error either way);
 *  - an incremental fetch (epoch > 0) on an unknown session id errors
 *    `not_found`; on a known session with the wrong epoch it errors
 *    `invalid_epoch` and leaves the session untouched; on a match it
 *    applies the request's partition adds/updates and forgets, then
 *    advances the session epoch by one;
 *  - within a session, a listed partition updates its fetch offset, an
 *    unlisted one keeps its prior state, a forgotten one is removed.
 * Divergence, declared: the reference also evicts a session the moment
 * its partition set becomes empty (cache-capacity housekeeping,
 * `fetch_session_cache.cc:118-130`); here a session stays addressable
 * until closed or replaced — the observable response content of an
 * empty session is empty either way.
 *
 * Cache housekeeping ([[sessionCacheFold]]): the reference's
 * time-based GC sweep (`gc_sessions`, `fetch_session_cache.cc:155-170`
 * — evict every session idle for `_session_eviction_duration`, skip
 * locked or recently-used) and the capacity guard on session creation
 * (`new_session_id`, `:137-145` — cache over its mem/session budget →
 * no session id, the fetch is served sessionless). `_last_used`
 * advances only on create and on a successful incremental
 * (`fetch_session.h:202,218-221` — a wrong-epoch request does not
 * touch it).
 *
 * Spark design: epoch validation is an inherently sequential per-session
 * recurrence (each decision depends on how many prior requests were
 * valid), so it runs as the same secondary-sorted one-pass streaming
 * fold as the quota bucket ([[graft.admin.Quota.tokenBucketThrottle]])
 * — repartition by session, in-partition sort by seq, O(1) state per
 * session (a liveness bit and an expected-epoch counter). Partition
 * state and response assembly are then declarative: last-writer-wins
 * compaction keyed by the session's current era (requests since its
 * latest create), windows bounded by a single session's history — never
 * the corpus. The DuckDB oracle replays the same recurrence with a
 * recursive CTE.
 */
object FetchSessions {

  final case class Req(session_id: String, seq: Long, epoch: Int)
  final case class Decision(session_id: String, seq: Long, epoch: Int, decision: String)

  /**
   * Fold the epoch FSM over each session's request sequence (one row
   * per request — partition rows are carried separately). Decisions:
   * `created` (epoch 0), `closed` (epoch -1), `ok`, `invalid_epoch`,
   * `not_found`.
   */
  def validateEpochs(requests: DataFrame, sessionCol: Column, seqCol: Column,
      epochCol: Column): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    requests.select(sessionCol.cast("string").as("session_id"),
        seqCol.cast("long").as("seq"), epochCol.cast("int").as("epoch"))
      .as[Req]
      .repartition(col("session_id"))
      .sortWithinPartitions(col("session_id"), col("seq"))
      .mapPartitions { it =>
        var cur: String = null
        var live = false
        var expected = 0
        it.map { r =>
          if (r.session_id != cur) { cur = r.session_id; live = false; expected = 0 }
          val d =
            if (r.epoch == 0) { live = true; expected = 1; "created" }
            else if (r.epoch == -1) { live = false; "closed" }
            else if (!live) "not_found"
            else if (r.epoch == expected) { expected += 1; "ok" }
            else "invalid_epoch"
          Decision(r.session_id, r.seq, r.epoch, d)
        }
      }
      .toDF()
  }

  final case class CacheReq(session_id: String, seq: Long, epoch: Int,
      ts: Long, shard: Int)
  final case class CacheDecision(session_id: String, seq: Long, epoch: Int,
      decision: String)

  /**
   * The session-cache fold WITH housekeeping: the epoch FSM of
   * [[validateEpochs]] plus the reference's time-based GC
   * (`fetch_session_cache.cc:155-170`) and creation capacity guard
   * (`:137-145`). Sessions hash-route to `nShards` shard caches (the
   * reference's per-core split); each shard folds its request stream
   * sequentially with a live-session table — state bounded by the cache
   * itself, exactly the structure being modeled.
   *
   * The GC sweep runs at every request's clock (`tsCol`). Sequentially
   * that is STRICTER than a periodic timer — and with no concurrent
   * fetches there are no locked sessions to skip — but the observable
   * rule collapses to the session's own idle gap: a session is gone at
   * its next touch iff that touch arrives `evictionMs` or more after
   * its `last_used` (any earlier sweep that could have evicted it
   * implies the final gap also exceeds the duration). Decisions:
   * `created`, `sessionless_full` (capacity guard — served without a
   * session), `closed`, `ok`, `invalid_epoch`, `not_found` (unknown OR
   * evicted — the same error the reference returns for both).
   */
  def sessionCacheFold(requests: DataFrame, sessionCol: Column, seqCol: Column,
      epochCol: Column, tsCol: Column, evictionMs: Long,
      maxSessions: Int = Int.MaxValue, nShards: Int = 1): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    final class Sess { var expected = 1; var lastUsed = 0L }
    requests.select(sessionCol.cast("string").as("session_id"),
        seqCol.cast("long").as("seq"), epochCol.cast("int").as("epoch"),
        tsCol.cast("long").as("ts"),
        pmod(xxhash64(sessionCol), lit(nShards)).cast("int").as("shard"))
      .as[CacheReq]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("seq"))
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var sessions: scala.collection.mutable.LinkedHashMap[String, Sess] = null
        it.map { r =>
          if (r.shard != curShard) {
            curShard = r.shard
            sessions = scala.collection.mutable.LinkedHashMap.empty
          }
          // gc_sessions at the request clock (:158-167): evict everything
          // idle >= evictionMs; recently-used sessions survive the sweep
          sessions.filterInPlace((_, st) => r.ts - st.lastUsed < evictionMs)
          val d =
            if (r.epoch == 0) {
              if (!sessions.contains(r.session_id) && sessions.size >= maxSessions)
                "sessionless_full" // new_session_id -> nullopt (:137-145)
              else {
                val st = new Sess; st.lastUsed = r.ts
                sessions(r.session_id) = st
                "created"
              }
            } else if (r.epoch == -1) { sessions.remove(r.session_id); "closed" }
            else sessions.get(r.session_id) match {
              case None => "not_found"
              case Some(st) if r.epoch != st.expected => "invalid_epoch"
              case Some(st) =>
                st.expected += 1; st.lastUsed = r.ts // advance_epoch (h:218-221)
                "ok"
            }
          CacheDecision(r.session_id, r.seq, r.epoch, d)
        }
      }
      .toDF()
  }

  final case class EpochState(live: Boolean, expected: Int)

  /**
   * The epoch FSM as the CONTINUOUS query a long-lived fetch frontend
   * runs: requests stream in, per-session (live, expected-epoch) state
   * persists in the checkpoint across micro-batches
   * (`flatMapGroupsWithState`, the commit-batcher pattern), and each
   * batch's decisions emit exactly once — byte-identical to
   * [[validateEpochs]] over the concatenated stream, certified by the
   * same oracle. Restart-safe: the carried state makes batch N+1 resume
   * exactly where batch N's session counters left off. The per-group
   * sort buffers ONE SESSION's requests within one trigger — bounded by
   * a single consumer's request rate, unlike a produce partition's
   * volume (which is why [[WriteCaching.flushAccountingStream]] instead
   * folds each micro-batch through a spillable repartition+sort pass).
   */
  def validateEpochsStream(requests: DataFrame, dataPath: String,
      ckptPath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    val spark = requests.sparkSession
    import spark.implicits._
    val out = requests.select(col("session_id").cast("string").as("session_id"),
        col("seq").cast("long").as("seq"), col("epoch").cast("int").as("epoch"))
      .as[Req]
      .groupByKey(_.session_id)
      .flatMapGroupsWithState[EpochState, Decision](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (sid, it, state) =>
        val batch = it.toSeq.sortBy(_.seq)
        if (batch.isEmpty) Iterator.empty
        else {
          var st = state.getOption.getOrElse(EpochState(live = false, expected = 0))
          val rows = batch.map { r =>
            val d =
              if (r.epoch == 0) { st = EpochState(live = true, expected = 1); "created" }
              else if (r.epoch == -1) { st = st.copy(live = false); "closed" }
              else if (!st.live) "not_found"
              else if (r.epoch == st.expected) {
                st = st.copy(expected = st.expected + 1); "ok"
              } else "invalid_epoch"
            Decision(sid, r.seq, r.epoch, d)
          }
          state.update(st)
          rows.iterator
        }
      }
    val q = out.toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckptPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        // idempotent per-batch sink: a retried micro-batch overwrites
        // its own directory instead of appending duplicates
        b.write.mode("overwrite").parquet(s"$dataPath/batch=$id")
      }
      .start()
    q.awaitTermination()
    q
  }

  /** Requests that mutate session state: creates and valid incrementals. */
  private def validSeqs(decisions: DataFrame): DataFrame =
    decisions.where(col("decision").isin("created", "ok"))
      .select(col("session_id"), col("seq"), col("epoch"), col("decision"))

  /** Per-session seq of the latest create, and whether a close ended the
    * session after it (such sessions have no live state). */
  private def sessionEra(decisions: DataFrame): DataFrame =
    decisions.groupBy("session_id")
      .agg(max(when(col("decision") === "created", col("seq"))).as("create_seq"),
        max(when(col("decision") === "closed", col("seq"))).as("close_seq"))
      .where(col("create_seq").isNotNull &&
        (col("close_seq").isNull || col("close_seq") < col("create_seq")))
      .select("session_id", "create_seq")

  /**
   * Final live partition state per session: last-writer-wins over the
   * partition rows of the session's current era, forgets as tombstones
   * — the same compaction shape as the key-compacted log (A1/A2).
   * Output: (session_id, topic, partition, fetch_offset).
   */
  def sessionState(partitionRows: DataFrame, decisions: DataFrame): DataFrame = {
    val live = partitionRows
      .join(validSeqs(decisions).select("session_id", "seq"), Seq("session_id", "seq"))
      .join(sessionEra(decisions), "session_id")
      .where(col("seq") >= col("create_seq"))
      .select("session_id", "topic", "partition", "fetch_offset", "forget", "seq")
    Compaction.compact(live, Seq("session_id", "topic", "partition"), "seq")
      .where(!col("forget"))
      .select("session_id", "topic", "partition", "fetch_offset")
  }

  /**
   * Response content of every valid request: the session's as-of
   * partition state, restricted to partitions with data available
   * (`hwm > fetch_offset`) — the delta-shipping rule that makes the
   * session "incremental" (unchanged drained partitions are omitted).
   *
   * Scale shape: partition rows join to the requests of their own
   * session era with `cmd.seq <= req.seq` — work is (requests ×
   * partition-rows) WITHIN one session, bounded by session size (a
   * session holds one consumer's assignment and its request history),
   * never corpus-sized; the era index is a per-session running count.
   * `hwms` (one row per topic-partition) broadcasts.
   * Output: (seq, session_id, epoch, topic, partition, fetch_offset, hwm).
   */
  def incrementalResponses(partitionRows: DataFrame, decisions: DataFrame,
      hwms: DataFrame): DataFrame = {
    val valid = validSeqs(decisions)
    // era = number of creates up to this seq, per session: a bounded
    // per-session running count (window over one session's history)
    val w = Window.partitionBy("session_id").orderBy("seq")
    val withEra = valid
      .withColumn("era", sum(when(col("decision") === "created", 1).otherwise(0)).over(w))
    val reqs = withEra.select(col("session_id"), col("seq"), col("epoch"), col("era"))
    val cmds = partitionRows
      .join(withEra.select(col("session_id"), col("seq"), col("era")), Seq("session_id", "seq"))
      .select(col("session_id"), col("era"), col("seq").as("cmd_seq"),
        col("topic"), col("partition"), col("fetch_offset"), col("forget"))
    reqs.join(cmds, Seq("session_id", "era"))
      .where(col("cmd_seq") <= col("seq"))
      .groupBy("seq", "session_id", "epoch", "topic", "partition")
      .agg(max_by(col("fetch_offset"), col("cmd_seq")).as("fetch_offset"),
        max_by(col("forget"), col("cmd_seq")).as("forget"))
      .where(!col("forget"))
      .join(broadcast(hwms), Seq("topic", "partition"))
      .where(col("hwm") > col("fetch_offset"))
      .select("seq", "session_id", "epoch", "topic", "partition", "fetch_offset", "hwm")
  }
}
