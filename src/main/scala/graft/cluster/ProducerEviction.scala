package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * Producer-state eviction (reference `cluster/producer_state_manager.cc`,
 * `cluster/namespaced_cache.h`, `cluster/producer_state.cc:317`): the
 * shard-wide LRU cache of idempotent/transactional producer states is
 * bounded by `max_concurrent_producer_ids`; registrations over the
 * bound evict the least-recently-used EVICTABLE producer
 * (`namespaced_cache::insert`, `.h:398-408` — a full cache with nothing
 * evictable refuses the registration), and a periodic reaper expires
 * producers idle longer than `transactional_id_expiration_ms`
 * (`evict_older_than` over the LRU prefix below the deadline).
 *
 * `can_evict` (`producer_state.cc:317-334`): a producer with an open
 * transaction is NOT evictable (nor one with in-flight requests /
 * a held op-lock — execution-engine states collapsed here into the
 * open-transaction bit, the durable condition). Data from an evicted
 * producer comes back `unknown_producer_id` — the client must re-init.
 *
 * Spark shape: per-shard sequential state (the reference is a per-shard
 * manager); the fold emits one outcome per command. Single-shard
 * command logs are control-plane bounded; the fold runs as a
 * one-partition sorted pass like [[DataMigrations.outcomes]].
 */
object ProducerEviction {

  final case class Cmd(seq: Long, op: String, pid: Long, ts_ms: Long)
  final case class Outcome(seq: Long, op: String, pid: Long, outcome: String,
      evicted_pids: Seq[Long], n_active: Int)

  private final case class P(var lastUpdate: Long, var openTx: Int)

  /**
   * Replay `(seq, op, pid, ts_ms)` with `op` ∈ `register`, `touch`,
   * `data`, `begin_tx`, `end_tx`, `reaper`. Returns per command the
   * outcome (`ok` / `cache_full` / `unknown_producer` /
   * `already_registered`), the pids evicted BY that command in eviction
   * order, and the live-producer count after it.
   */
  def outcomes(commandLog: DataFrame, maxIds: Int, expirationMs: Long): DataFrame = {
    require(maxIds > 0 && expirationMs > 0)
    val spark = commandLog.sparkSession
    import spark.implicits._
    commandLog.select(col("seq").cast("long"), col("op"),
        col("pid").cast("long"), col("ts_ms").cast("long"))
      .as[Cmd]
      .coalesce(1)
      .sortWithinPartitions("seq")
      .mapPartitions { it =>
        // LRU: LinkedHashMap iteration order = insertion order; touch
        // re-inserts at the tail (the intrusive-list move-to-back)
        val lru = scala.collection.mutable.LinkedHashMap.empty[Long, P]
        def canEvict(p: P): Boolean = p.openTx == 0
        def touchTo(pid: Long, ts: Long): Unit = {
          val p = lru.remove(pid).get
          p.lastUpdate = ts
          lru(pid) = p
        }
        it.map { c =>
          c.op match {
            case "register" =>
              if (lru.contains(c.pid)) {
                touchTo(c.pid, c.ts_ms)
                Outcome(c.seq, c.op, c.pid, "already_registered", Nil, lru.size)
              } else {
                val evicted = scala.collection.mutable.ArrayBuffer[Long]()
                if (lru.size >= maxIds) {
                  // walk LRU head-first for the first evictable entry;
                  // insert() loops evict() up to _size times
                  var it2 = lru.iterator.filter { case (_, p) => canEvict(p) }
                  while (lru.size >= maxIds && it2.hasNext) {
                    val (epid, _) = it2.next()
                    lru.remove(epid)
                    evicted += epid
                    it2 = lru.iterator.filter { case (_, p) => canEvict(p) }
                  }
                }
                if (lru.size >= maxIds)
                  Outcome(c.seq, c.op, c.pid, "cache_full", evicted.toSeq, lru.size)
                else {
                  lru(c.pid) = P(c.ts_ms, 0)
                  Outcome(c.seq, c.op, c.pid, "ok", evicted.toSeq, lru.size)
                }
              }
            case "touch" | "data" =>
              if (!lru.contains(c.pid))
                Outcome(c.seq, c.op, c.pid, "unknown_producer", Nil, lru.size)
              else {
                touchTo(c.pid, c.ts_ms)
                Outcome(c.seq, c.op, c.pid, "ok", Nil, lru.size)
              }
            case "begin_tx" | "end_tx" =>
              lru.get(c.pid) match {
                case None =>
                  Outcome(c.seq, c.op, c.pid, "unknown_producer", Nil, lru.size)
                case Some(p) =>
                  if (c.op == "begin_tx") p.openTx += 1
                  else p.openTx = math.max(0, p.openTx - 1)
                  touchTo(c.pid, c.ts_ms)
                  Outcome(c.seq, c.op, c.pid, "ok", Nil, lru.size)
              }
            case "reaper" =>
              val deadline = c.ts_ms - expirationMs
              // evict_older_than walks the LRU prefix strictly below the
              // deadline, skipping unevictable entries
              val evicted = lru.iterator
                .takeWhile { case (_, p) => p.lastUpdate < deadline }
                .filter { case (_, p) => canEvict(p) }
                .map(_._1).toSeq
              evicted.foreach(lru.remove)
              Outcome(c.seq, c.op, c.pid, "ok", evicted, lru.size)
            case other =>
              Outcome(c.seq, c.op, c.pid, s"unknown_command:$other", Nil, lru.size)
          }
        }
      }
      .toDF()
  }
}
