package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cloud-topics L0 object packing (reference `cloud_topics/`: the
 * batcher aggregates batches from MANY partitions into shared cloud
 * objects; `dl_overlay.h` maps each partition's offset ranges to the
 * object extents a reader materializes — `cloud_topics/README.md`
 * "placeholder_extent ... contains information that belongs to
 * different NTPs").
 *
 * Packing contract: batches pack in global arrival order; a batch is
 * never split; object k covers the batches whose cumulative byte start
 * falls in [k*objectBytes, (k+1)*objectBytes) — so object boundaries
 * land at the first batch that crosses the line and an object may
 * exceed the budget by at most one batch tail. Fully deterministic:
 * any engine re-derives every object id from (arrival, bytes) alone.
 *
 * Scale shape: the global byte prefix sum is the same two-phase
 * chunked pattern as offset assignment and sequence packing — per
 * 4096-arrival-chunk byte totals prefix-summed on the tiny chunk table
 * and broadcast back; no window ever spans the log. The overlay is
 * bounded metadata (objects × partitions rows).
 */
object CloudTopics {

  private val ChunkSize = 4096L

  /**
   * Assign every batch its L0 object: adds `object_id` and
   * `obj_byte_offset` (the batch's byte position inside its object's
   * nominal window). `seqCol` is the global arrival order, `bytesCol`
   * the batch's serialized size.
   */
  def packL0(log: DataFrame, seqCol: Column, bytesCol: Column,
      objectBytes: Long): DataFrame = {
    require(objectBytes > 0, "objectBytes must be positive")
    val base = log
      .withColumn("__seq", seqCol.cast("long"))
      .withColumn("__bytes", bytesCol.cast("long"))
      // `div` = integral division on longs: __seq >= 0, so identical to
      // floor division but no double ever appears (bit-exact under any
      // engine's hasher, unlike floor(double-quotient)).
      .withColumn("__chunk", expr(s"__seq div ${ChunkSize}L"))
    val chunkAgg = base.groupBy("__chunk").agg(sum("__bytes").as("__n"))
    // prefix over the chunk table: #batches/4096 rows, not the log
    val baseW = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    val bases = chunkAgg
      .withColumn("__base", coalesce(sum("__n").over(baseW), lit(0L)))
      .select("__chunk", "__base")
    val localW = Window.partitionBy("__chunk").orderBy("__seq")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(bases), Seq("__chunk"))
      .withColumn("__cum_before",
        col("__base") + coalesce(sum("__bytes").over(localW), lit(0L)))
      .withColumn("object_id", expr(s"__cum_before div ${objectBytes}L"))
      .withColumn("obj_byte_offset",
        col("__cum_before") - col("object_id") * objectBytes)
      .drop("__seq", "__bytes", "__chunk", "__base", "__cum_before")
  }

  /**
   * The dl_overlay: per (object, partition) extent — offset range, byte
   * count, batch count — the map a reader consults to turn a
   * (partition, offset-range) fetch into the object extents it must
   * materialize. One partial-agg groupBy over the packed log.
   */
  def overlay(packed: DataFrame, bytesCol: Column): DataFrame =
    packed.groupBy("object_id", "partition").agg(
      min("offset").as("base_offset"), max("offset").as("last_offset"),
      sum(bytesCol.cast("long")).as("bytes"), count(lit(1)).as("n_batches"))

  /**
   * Reader resolution: the object extents a fetch of `partition` from
   * `fromOffset` must materialize — every overlay extent of that
   * partition whose range ends at or after the cursor. The overlay is
   * bounded metadata, so this is a metadata-only lookup (no log scan),
   * exactly the reader's placeholder→extent step.
   */
  def resolveFetch(overlayDf: DataFrame, partition: Int, fromOffset: Long): DataFrame =
    overlayDf.where(col("partition") === partition &&
      col("last_offset") >= fromOffset)

  // ------------------------------------------------- dl_stm MVCC read side

  /**
   * The data-layout STM's MVCC view (`cloud_topics/dl_stm/
   * dl_stm_state.h`: `dl_overlay_entry{overlay, added_at, removed_at}`):
   * a snapshot at version v (`dl_snapshot.h` — `dl_snapshot_payload` is
   * "overlays visible at the snapshot version") is the entries with
   * `added_at <= v` and no removal at or before v. A pure filter over
   * the bounded overlay-entry metadata — snapshot reads never touch
   * data objects.
   */
  def snapshotAt(overlayEntries: DataFrame, version: Long): DataFrame =
    overlayEntries.where(col("added_at") <= version &&
      (col("removed_at").isNull || col("removed_at") > version))

  /**
   * Reconciliation (`cloud_topics/reconciler/reconciler.h`: batches
   * "are packaged up into L1 objects and uploaded into the cloud.
   * Finally, overlay batches are committed into each partition"):
   * re-pack the small arrival-interleaved L0 objects into L1 objects
   * under a bigger byte budget — L0 objects pack whole, in object-id
   * order, via the SAME chunked prefix-sum operator as L0 packing (the
   * object table is log_bytes/objectBytes rows, so the scalable shape
   * matters). Returns per-(l1_object, partition) overlay extents.
   */
  def reconcileL1(l0Overlay: DataFrame, l1Bytes: Long): DataFrame = {
    require(l1Bytes > 0, "l1Bytes must be positive")
    val objTable = l0Overlay.groupBy(col("object_id").as("__l0_id"))
      .agg(sum("bytes").as("__l0_bytes"))
    val l1Assign = packL0(objTable, col("__l0_id"), col("__l0_bytes"), l1Bytes)
      .select(col("__l0_id"), col("object_id").as("__l1_id"))
    // NOT broadcast: the object table is log_bytes/objectBytes rows
    // (~1.6B at 100 TB / 64 KiB) — both sides are already keyed by
    // object id, so this is a co-keyed shuffle join; AQE may still
    // broadcast it at small scale.
    l0Overlay.join(l1Assign, col("object_id") === col("__l0_id"))
      .groupBy(col("__l1_id").as("object_id"), col("partition"))
      .agg(min("base_offset").as("base_offset"), max("last_offset").as("last_offset"),
        sum("bytes").as("bytes"), sum("n_batches").as("n_batches"))
  }

  /**
   * The MVCC overlay-entry log across one reconciliation epoch: L0
   * extents live [l0AddedAt, version), their L1 replacements
   * [version, ∞) — `dl_stm_state::push_overlay` at `version` plus the
   * removal marks on the superseded entries. Snapshots before `version`
   * see L0; at/after see L1; both cover identical offsets (the
   * invariant `ct_dl_snapshot` pins).
   */
  def reconcileLog(l0Overlay: DataFrame, l1Bytes: Long, l0AddedAt: Long,
      version: Long): DataFrame = {
    require(version > l0AddedAt,
      "reconciliation version must advance past the L0 epoch (dl_version_monotonic_invariant)")
    val l0 = l0Overlay
      .withColumn("added_at", lit(l0AddedAt))
      .withColumn("removed_at", lit(version))
    val l1 = reconcileL1(l0Overlay, l1Bytes)
      .withColumn("added_at", lit(version))
      .withColumn("removed_at", lit(null).cast("long"))
    l0.unionByName(l1)
  }

  /**
   * `dl_stm_state::lower_bound`: per probe (partition, probe_offset),
   * the overlay containing the offset — or, when the offset falls in a
   * gap, the overlay covering the next closest AVAILABLE offset. Among
   * extents with `last_offset >= probe`, the one with the smallest
   * base_offset wins. Probes broadcast against the bounded overlay
   * metadata; no data object is opened.
   */
  def lowerBound(overlayDf: DataFrame, probes: DataFrame): DataFrame =
    overlayDf.join(broadcast(probes), Seq("partition"))
      .where(col("last_offset") >= col("probe_offset"))
      .groupBy("partition", "probe_offset")
      .agg(min(struct(col("base_offset"), col("last_offset"), col("object_id")))
        .as("__best"))
      .select(col("partition"), col("probe_offset"),
        col("__best.object_id").as("object_id"),
        col("__best.base_offset").as("base_offset"),
        col("__best.last_offset").as("last_offset"))

  final case class WriteReq(shard: Int, seq: Long, ts_ms: Long, bytes: Long)
  final case class ThrottleDecision(shard: Int, seq: Long, ts_ms: Long,
      bytes: Long, action: String, wait_ms: Long, tokens_after: Long)

  /**
   * Cloud-topics write throttler (reference
   * `cloud_topics/throttler/throttler.cc`): ingress bytes debit a
   * per-shard token bucket; a request the bucket cannot cover is
   * WITHHELD from the write pipeline until enough tokens accrue
   * (`throttle_tput` + `token_bucket::maybe_throttle`), then
   * backfilled; a request whose wait would outlive its own deadline
   * expires instead — culled without ever debiting the bucket (the
   * weak-ptr drop in `throttle_tput:58-60`).
   *
   * Deterministic per-shard fold (the [[graft.admin.Quota]] /
   * SncQuota shape): bucket starts full, refills `ratePerMs` capped at
   * `burst`; `pass` debits immediately, `throttled` completes at
   * `ts + ceil((bytes - tokens)/rate)` leaving the residual tokens,
   * `expired` leaves the bucket untouched. The clock never runs
   * backwards (a request arriving during a backfill wait refills 0).
   * Integral arithmetic throughout; the oracle replays the recurrence
   * as a recursive CTE.
   */
  final case class BucketState(tokens: Long, clock: Long)

  /** One throttler step: refill (clock never runs backwards), then
    * pass / throttle / expire. Shared by the batch fold and the
    * streaming twin so the two DAGs cannot drift. */
  private def throttleStep(st: BucketState, r: WriteReq, ratePerMs: Long,
      burst: Long, timeoutMs: Long): (BucketState, ThrottleDecision) = {
    val tokens = math.min(burst,
      st.tokens + ratePerMs * math.max(0L, r.ts_ms - st.clock))
    val clock = math.max(st.clock, r.ts_ms)
    if (tokens >= r.bytes)
      (BucketState(tokens - r.bytes, clock),
        ThrottleDecision(r.shard, r.seq, r.ts_ms, r.bytes, "pass", 0L,
          tokens - r.bytes))
    else {
      val wait = (r.bytes - tokens + ratePerMs - 1) / ratePerMs
      if (wait > timeoutMs)
        (BucketState(tokens, clock),
          ThrottleDecision(r.shard, r.seq, r.ts_ms, r.bytes, "expired", wait, tokens))
      else
        (BucketState(tokens + wait * ratePerMs - r.bytes, clock + wait),
          ThrottleDecision(r.shard, r.seq, r.ts_ms, r.bytes, "throttled", wait,
            tokens + wait * ratePerMs - r.bytes))
    }
  }

  def throttleWrites(requests: DataFrame, shardCol: Column, seqCol: Column,
      tsMsCol: Column, bytesCol: Column, ratePerMs: Long, burst: Long,
      timeoutMs: Long): DataFrame = {
    require(ratePerMs > 0 && burst > 0 && timeoutMs >= 0)
    val spark = requests.sparkSession
    import spark.implicits._
    requests.select(shardCol.cast("int").as("shard"),
        seqCol.cast("long").as("seq"), tsMsCol.cast("long").as("ts_ms"),
        bytesCol.cast("long").as("bytes"))
      .as[WriteReq]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ts_ms"), col("seq"))
      .mapPartitions { it =>
        var cur = Int.MinValue
        var st = BucketState(0L, 0L)
        it.map { r =>
          if (r.shard != cur) { cur = r.shard; st = BucketState(burst, r.ts_ms) }
          val (next, d) = throttleStep(st, r, ratePerMs, burst, timeoutMs)
          st = next
          d
        }
      }
      .toDF()
  }

  /**
   * The throttler as the CONTINUOUS loop the reference runs
   * (`bg_throttle_write_pipeline`): requests stream in, per-shard
   * bucket state persists in the checkpoint across micro-batches
   * (`flatMapGroupsWithState`), and each batch's decisions emit
   * exactly once. A batch's requests fold in (ts, seq) order; the
   * carried (tokens, clock) state makes a restart resume exactly where
   * the previous batch's bucket left off — byte-identical to the batch
   * fold over the concatenated stream.
   */
  def throttleWritesStream(requests: DataFrame, dataPath: String,
      ckptPath: String, ratePerMs: Long, burst: Long,
      timeoutMs: Long): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
    val spark = requests.sparkSession
    import spark.implicits._
    val decisions = requests.select(col("shard").cast("int").as("shard"),
        col("seq").cast("long").as("seq"), col("ts_ms").cast("long").as("ts_ms"),
        col("bytes").cast("long").as("bytes"))
      .as[WriteReq]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[BucketState, ThrottleDecision](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val batch = it.toSeq.sortBy(r => (r.ts_ms, r.seq))
        if (batch.isEmpty) Iterator.empty
        else {
          var st = state.getOption.getOrElse(
            BucketState(burst, batch.head.ts_ms))
          val out = batch.map { r =>
            val (next, d) = throttleStep(st, r, ratePerMs, burst, timeoutMs)
            st = next
            d
          }
          state.update(st)
          out.iterator
        }
      }
    val q = decisions.toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckptPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        // idempotent per-batch sink: a retried micro-batch overwrites its
        // own directory instead of appending duplicates
        b.write.mode("overwrite").parquet(s"$dataPath/batch=$id")
      }
      .start()
    q.awaitTermination()
    q
  }
}
