package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * S1+ write-caching durability accounting (reference
 * `model/metadata.h:548` `write_caching_mode`, `storage/ntp_config.h:
 * 273-301` `write_caching`/`flush_ms`/`flush_bytes`,
 * `raft/consensus.cc:874` — `flush = force_flush || !write_caching`):
 * with the knob ON, a produced batch ACKs from replicated MEMORY — the
 * HWM advances immediately — and the log fsyncs only when the bytes
 * accumulated since the last flush reach `flush_bytes` or the batch
 * clock has advanced `flush_ms` past it. The DURABLE offset therefore
 * trails the HWM by the unflushed suffix, which is exactly the data a
 * simultaneous whole-cluster crash may lose; with the knob OFF every
 * batch flushes and the two watermarks coincide.
 *
 * Spark shape: the flush decision is a reset-on-flush recurrence (the
 * accumulator zeroes at each flush), so it folds per PARTITION in
 * offset order — `repartition(partition) + sortWithinPartitions +
 * mapPartitions`, the same bounded-state fold as
 * [[CloudTopics.throttleWrites]]. State is three scalars per
 * partition; parallelism is the partition count, the natural unit of
 * the reference's per-replica flush bookkeeping.
 */
object WriteCaching {

  final case class In(partition: Int, offset: Long, ts_ms: Long, bytes: Long)
  final case class Out(partition: Int, offset: Long, bytes: Long,
      flushed: Boolean, flushed_offset: Long)

  /**
   * Per-batch flush replay. Input: one row per batch with dense
   * per-partition offsets. Output adds `flushed` (this batch triggered
   * an fsync) and `flushed_offset` (the durable watermark AFTER this
   * batch; -1 until the first flush). The partition-open instant
   * counts as flushed at the first batch's timestamp, so the time
   * trigger measures from stream start.
   */
  def flushAccounting(log: DataFrame, partitionCol: Column, offsetCol: Column,
      tsMsCol: Column, bytesCol: Column, cachingEnabled: Boolean,
      flushBytes: Long, flushMs: Long): DataFrame = {
    require(flushBytes > 0 && flushMs > 0)
    val spark = log.sparkSession
    import spark.implicits._
    log.select(partitionCol.cast("int").as("partition"),
        offsetCol.cast("long").as("offset"),
        tsMsCol.cast("long").as("ts_ms"),
        bytesCol.cast("long").as("bytes"))
      .as[In]
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .mapPartitions { it =>
        var cur = Int.MinValue
        var acc = 0L
        var lastFlushTs = 0L
        var durable = -1L
        it.map { r =>
          if (r.partition != cur) {
            cur = r.partition; acc = 0L; lastFlushTs = r.ts_ms; durable = -1L
          }
          acc += r.bytes
          val flush = !cachingEnabled || acc >= flushBytes ||
            r.ts_ms - lastFlushTs >= flushMs
          if (flush) { acc = 0L; lastFlushTs = r.ts_ms; durable = r.offset }
          Out(r.partition, r.offset, r.bytes, flush, durable)
        }
      }
      .toDF()
  }

  final case class FlushState(acc: Long, lastFlushTs: Long, durable: Long)

  /** A batch row stamped (via broadcast join) with its partition's
    * carried seed state; null seeds mean a first-seen partition. */
  final case class InSeed(partition: Int, offset: Long, ts_ms: Long, bytes: Long,
      _sacc: java.lang.Long, _sts: java.lang.Long, _sdur: java.lang.Long)

  final case class OutSt(partition: Int, offset: Long, bytes: Long,
      flushed: Boolean, flushed_offset: Long, acc: Long, last_flush_ts: Long)

  /**
   * The flush fold as the CONTINUOUS query a long-lived produce path
   * runs: batches stream in, per-partition (acc, lastFlushTs, durable)
   * state persists across micro-batches, and each batch's flush
   * decisions emit exactly once — byte-identical to
   * [[flushAccounting]] over the concatenated stream, certified by
   * the same oracle.
   *
   * Shape: each micro-batch folds with the SAME
   * `repartition(partition) + sortWithinPartitions + mapPartitions`
   * pass as the batch operator — a spillable SortExec feeding a
   * streaming iterator, never an in-memory whole-group buffer (the
   * earlier `flatMapGroupsWithState` spelling materialized every
   * partition's rows of the trigger as one Seq; a busy partition in a
   * large trigger would hold its whole slice on one task's heap).
   * State is three scalars per partition, persisted as a
   * batch-id-versioned parquet table under the checkpoint: batch N
   * seeds from the newest state < N, so a RETRIED micro-batch
   * re-reads the same seed and overwrites its own output and state
   * directories — idempotent, restart-safe. The seed state rides the
   * PLAN, not the closure: a broadcast left-join stamps each row with
   * its partition's carried (acc, lastFlushTs, durable) before the
   * fold, so nothing is collected to the driver and a fleet-scale
   * partition count never serializes a seed map into every task.
   */
  def flushAccountingStream(log: DataFrame, dataPath: String, ckptPath: String,
      cachingEnabled: Boolean, flushBytes: Long,
      flushMs: Long): org.apache.spark.sql.streaming.StreamingQuery = {
    require(flushBytes > 0 && flushMs > 0)
    import org.apache.spark.sql.streaming.Trigger
    val stateRoot = s"$ckptPath/flush_state"
    val q = log.select(col("partition").cast("int").as("partition"),
        col("offset").cast("long").as("offset"),
        col("ts_ms").cast("long").as("ts_ms"),
        col("bytes").cast("long").as("bytes"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckptPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        val spark = b.sparkSession
        import spark.implicits._
        val root = new org.apache.hadoop.fs.Path(stateRoot)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val priorIds =
          if (!fs.exists(root)) Array.empty[Long]
          else fs.listStatus(root).map(_.getPath.getName)
            .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
            .filter(_ < id)
        val prior: DataFrame =
          if (priorIds.isEmpty)
            Seq.empty[(Int, Long, Long, Long)]
              .toDF("partition", "acc", "last_flush_ts", "durable")
          else spark.read.parquet(s"$stateRoot/batch=${priorIds.max}")
            .select("partition", "acc", "last_flush_ts", "durable")
        val folded = b
          .join(broadcast(prior.select(col("partition"),
              col("acc").as("_sacc"), col("last_flush_ts").as("_sts"),
              col("durable").as("_sdur"))),
            Seq("partition"), "left")
          .as[InSeed]
          .repartition(col("partition"))
          .sortWithinPartitions(col("partition"), col("offset"))
          .mapPartitions { it =>
            var cur = Int.MinValue
            var st = FlushState(0L, 0L, -1L)
            it.map { r =>
              if (r.partition != cur) {
                cur = r.partition
                st = if (r._sacc == null) FlushState(0L, r.ts_ms, -1L)
                     else FlushState(r._sacc, r._sts, r._sdur)
              }
              val acc = st.acc + r.bytes
              val flush = !cachingEnabled || acc >= flushBytes ||
                r.ts_ms - st.lastFlushTs >= flushMs
              st = if (flush) FlushState(0L, r.ts_ms, r.offset)
                   else st.copy(acc = acc)
              OutSt(r.partition, r.offset, r.bytes, flush, st.durable,
                st.acc, st.lastFlushTs)
            }
          }
          .toDF().persist()
        try {
          folded
            .select("partition", "offset", "bytes", "flushed", "flushed_offset")
            .write.mode("overwrite").parquet(s"$dataPath/batch=$id")
          val ended = folded.groupBy("partition")
            .agg(max_by(struct(col("acc"), col("last_flush_ts"),
              col("flushed_offset")), col("offset")).as("s"))
            .select(col("partition"), col("s.acc").as("acc"),
              col("s.last_flush_ts").as("last_flush_ts"),
              col("s.flushed_offset").as("durable"))
          val carried = prior
            .join(ended.select("partition"), Seq("partition"), "left_anti")
          ended.unionByName(carried)
            .write.mode("overwrite").parquet(s"$stateRoot/batch=$id")
          // bound the state history: a retry of batch N re-reads the
          // newest state < N, so only the seed this batch used must
          // survive — older snapshots are dead and a long-lived query
          // would otherwise accumulate one directory per trigger
          if (priorIds.nonEmpty) priorIds.filter(_ < priorIds.max).foreach(k =>
            fs.delete(new org.apache.hadoop.fs.Path(s"$stateRoot/batch=$k"), true))
        } finally folded.unpersist()
      }
      .start()
    q.awaitTermination()
    q
  }

  /**
   * The per-partition watermark ledger under the knob: HWM (ack
   * watermark), the durable offset, the acked-but-unflushed row count
   * (dense offsets make it `hwm - 1 - durable`), and the flush count —
   * the divergence a produce path with relaxed acks exposes.
   */
  def watermarks(log: DataFrame, partitionCol: Column, offsetCol: Column,
      tsMsCol: Column, bytesCol: Column, cachingEnabled: Boolean,
      flushBytes: Long, flushMs: Long): DataFrame =
    flushAccounting(log, partitionCol, offsetCol, tsMsCol, bytesCol,
        cachingEnabled, flushBytes, flushMs)
      .groupBy("partition")
      .agg((max("offset") + 1).as("hwm"),
        max("flushed_offset").as("durable_offset"),
        (max("offset") - max("flushed_offset")).as("unflushed_rows"),
        sum(col("flushed").cast("long")).as("n_flushes"))
}
