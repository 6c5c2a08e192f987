package graft.log

import graft.Pins._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.BatchType

/**
 * Transactions T1–T3 (SURVEY §2.6): producer-id allocation, commit/abort
 * control markers, and the engine-maintained aborted-range / open-txn
 * state that read_committed (P4) and LSO (A7/T4) consume.
 *
 * Reference shape:
 *  - T1 `init_producer_id`: a monotonic id allocator
 *    (`cluster/id_allocator_stm.cc`, internal topic `model/namespace.h:61`).
 *  - T2 `begin/commit/abort`: `rm_stm` writes fence/control batches into
 *    the data partition and tracks open txn ranges
 *    (`cluster/rm_stm.h:144-159`); the end-marker is a control record
 *    (`model/record.h:319-322`) that *occupies an offset* in the log.
 *  - T3 `add_partitions_to_txn / end_txn`: the coordinator fans the final
 *    marker out to every partition the txn touched
 *    (`kafka/server/handlers/add_partitions_to_txn.h`, `end_txn.h`).
 *
 * Spark design: the engine is fed two inputs — transactional data rows
 * (pid, epoch, txn_seq tagged) and end-txn commands (pid, txn_seq,
 * decision) — and derives the marker-carrying log plus all downstream txn
 * state as declarative plans. Marker fan-out is a join against the
 * (txn → touched partitions) set, i.e. exactly T3's add_partitions list.
 * All shuffles key on (partition) or (pid, txn_seq) — both bounded and
 * skew-safe at 100 TB; aborted-range and open-txn tables are tiny
 * relative to the log and broadcast on the read path.
 */
object TxnEngine {

  /** Below this row count [[initProducerIds]] takes the single-partition
    * rank instead of the chunked two-phase path (see
    * `Dedup.DriverUnionFindMaxEdges` for the same gate shape). */
  val SmallProducerTableMaxRows = 1L << 20

  /**
   * T1 init_producer_id: allocate dense producer ids to producer
   * identities, deterministically (allocation order = identity order —
   * the replay of a monotonic id-allocator log,
   * `cluster/id_allocator_stm.cc`). Returns `producers` with a `pid`
   * column. The input must be one row per producer identity.
   */
  def initProducerIds(
      producers: DataFrame, identityCol: Column, base: Long = 0L,
      smallInputMaxRows: Long = SmallProducerTableMaxRows): DataFrame = {
    // Producer-identity tables are control-plane-sized in practice (one row
    // per transactional.id), so below the gate a single-partition rank is
    // both correct and cheaper than three shuffles — the same size-gated
    // two-path shape as Dedup.connectedComponents/DriverUnionFindMaxEdges.
    // The gate's count() needs one pass anyway, so the input checkpoints
    // first: whichever path runs reads the materialized table instead of
    // re-deriving the (usually distinct-aggregated) lineage.
    if (smallInputMaxRows > 0) {
      val cp = producers.pinned()
      if (cp.count() <= smallInputMaxRows)
        return cp.withColumn("pid",
          row_number().over(Window.orderBy(identityCol)).cast("long") - 1 + base)
      return initProducerIds(cp, identityCol, base, smallInputMaxRows = 0)
    }
    // Two-phase dense rank (the same shape as RecordLog.assignOffsetsScalable
    // and Sampling.epochShuffle): range-partition by identity so partition i
    // holds only identities ordered before partition i+1's, rank inside each
    // partition, then add broadcast per-partition prefix bases. No global
    // window or sort ever spans the producer table; identities are unique
    // (one row per identity), so the result is independent of where the
    // range boundaries fall.
    val n = math.max(producers.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val parted = producers.repartitionByRange(n, identityCol)
      .withColumn("__part", spark_partition_id())
    val bases = parted.groupBy("__part").agg(count(lit(1)).as("__n"))
      .withColumn("__base", coalesce(sum("__n").over(
        Window.orderBy("__part").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__part", "__base")
    parted.join(broadcast(bases), Seq("__part"))
      .withColumn("pid",
        col("__base") + row_number().over(
          Window.partitionBy("__part").orderBy(identityCol)).cast("long") - 1 + base)
      .drop("__part")
  }

  /**
   * T2+T3: interleave per-txn fence batches and end-txn control markers
   * into the data log and stamp offsets over the combined stream.
   *
   * `data` columns: partition, arrival (dense order domain), pid, epoch,
   * txn_seq, plus payload. `ends` columns: pid, txn_seq, decision
   * ('commit' | 'abort'), arrival (when the end_txn command landed; must
   * be > every data arrival of that txn).
   *
   * Per (txn, touched partition) — T3's add_partitions fan-out — the
   * engine emits:
   *  - a `tx_fence` batch (`batch_type = 10`) at the txn's first arrival
   *    slot, sorting BEFORE its first data row (rm_stm writes the fence
   *    on begin, `cluster/rm_stm.h:144-151`); fences are their own batch
   *    type, not control records;
   *  - for ended txns, an end marker: a raft_data record with the control
   *    bit set carrying the decision (`model/record.h:319-322`).
   * Offsets are dense per partition across ALL kinds, because fence and
   * control batches occupy offsets in the reference log. Tie order within
   * an arrival slot is fence < data < marker, then (pid, txn_seq) — fully
   * deterministic and replicable by the SQL oracle.
   *
   * Scale: offset stamping over the combined stream uses the same
   * two-phase chunked assignment as the produce path
   * ([[RecordLog.assignOffsetsScalable]]) — chunk counts are prefix-summed
   * on a tiny (partition × chunk) table and broadcast back, so no task
   * ever sorts a whole partition. Order key inside a chunk is the struct
   * (arrival, slot, pid, txn_seq); chunking on arrival respects it because
   * arrival is the leading field.
   */
  def interleaveMarkers(data: DataFrame, ends: DataFrame): DataFrame = {
    val payloadCols = data.columns.filterNot(Set("partition", "arrival", "pid", "epoch", "txn_seq"))
    val fixed = Seq(col("partition"), col("arrival"), col("pid"), col("epoch"), col("txn_seq"))
    def nullPayload = payloadCols.map(c => lit(null).cast(data.schema(c).dataType).as(c))
    val touched = data.groupBy("pid", "txn_seq", "partition")
      .agg(max("epoch").as("epoch"), min("arrival").as("first_arrival"))
    val fences = touched
      .withColumn("arrival", col("first_arrival")).drop("first_arrival")
      .select(fixed ++ Seq(
        lit(BatchType.TxFence).as("batch_type"), lit(false).as("is_control"),
        lit(null).cast("string").as("decision"), lit(0).as("_slot")) ++ nullPayload: _*)
    val markers = ends.join(touched.drop("first_arrival"), Seq("pid", "txn_seq"))
      .select(fixed ++ Seq(
        lit(BatchType.RaftData).as("batch_type"), lit(true).as("is_control"),
        col("decision"), lit(2).as("_slot")) ++ nullPayload: _*)
    val dataRows = data
      .select(fixed ++ Seq(
        lit(BatchType.RaftData).as("batch_type"), lit(false).as("is_control"),
        lit(null).cast("string").as("decision"), lit(1).as("_slot")) ++
        payloadCols.map(col): _*)
    val combined = dataRows.unionByName(fences).unionByName(markers)
    RecordLog.assignOffsetsScalable(combined, col("partition"),
        arrivalCol = struct(col("arrival"), col("_slot"), col("pid"), col("txn_seq")),
        chunkCol = floor(col("arrival") / 4096))
      .drop("_slot")
  }

  /**
   * Transactions the coordinator's expiry sweep would abort: open at
   * `sweepArrival` (data seen, no end command applied by then) and idle
   * longer than `timeoutArrival` — `tm_stm::is_expired`
   * (`cluster/tm_stm.cc:751-754`: `last_update_ts + expiration < now`) as
   * consumed by `tx_gateway_frontend::expire_old_txs`
   * (`cluster/tx_gateway_frontend.h:263-265`). All times are in the
   * engine's arrival domain. The result — (pid, txn_seq, last_update,
   * expired_at) — is control-plane-sized (one row per hung txn).
   */
  def expiredTransactions(
      data: DataFrame, ends: DataFrame,
      timeoutArrival: Long, sweepArrival: Long): DataFrame = {
    val ended = ends.where(col("arrival") <= sweepArrival)
      .select("pid", "txn_seq").distinct()
    data.where(col("arrival") <= sweepArrival)
      .groupBy("pid", "txn_seq")
      .agg(max("arrival").as("last_update"))
      .join(ended, Seq("pid", "txn_seq"), "left_anti")
      .where(col("last_update") + timeoutArrival < lit(sweepArrival))
      .withColumn("expired_at", lit(sweepArrival))
  }

  /**
   * The expiry sweep itself (`tm_stm::expire_tx`, `cluster/tm_stm.h:317`;
   * `tx_gateway_frontend::do_expire_old_tx`): every expired transaction
   * gets a coordinator-authored ABORT end command at the sweep time, and
   * any end command the (now fenced) producer sends after the sweep is
   * rejected with `invalid_producer_epoch` instead of being applied —
   * the tail of a crashed producer can no longer resurrect its txn.
   *
   * Returns (effectiveEnds, rejected): feed `effectiveEnds` to
   * [[interleaveMarkers]] to build the post-sweep log (the synthesized
   * abort markers occupy offsets like any end marker, so the LSO advances
   * past the hung txns — the whole point of the sweep); `rejected` is the
   * fenced-command audit table. The expired set is tiny (hung txns only)
   * and broadcasts against the end stream; no data-sized shuffle is added.
   */
  def expireSweep(
      data: DataFrame, ends: DataFrame,
      timeoutArrival: Long, sweepArrival: Long): (DataFrame, DataFrame) = {
    val expired = expiredTransactions(data, ends, timeoutArrival, sweepArrival)
    val keys = broadcast(expired.select("pid", "txn_seq"))
    // An end command at arrival <= sweep would have kept the txn out of the
    // expired set, so every end of an expired txn is by construction late —
    // fenced, not applied.
    val rejected = ends.join(keys, Seq("pid", "txn_seq"))
      .withColumn("error", lit("invalid_producer_epoch"))
    val synthesized = expired.select(col("pid"), col("txn_seq"),
      lit("abort").as("decision"), col("expired_at").as("arrival"))
    val applied = ends.join(keys, Seq("pid", "txn_seq"), "left_anti")
      .select("pid", "txn_seq", "decision", "arrival")
      .unionByName(synthesized)
    (applied, rejected)
  }

  /**
   * The aborted-transaction index served to read_committed fetches
   * (`rm_stm::aborted_transactions`, `cluster/rm_stm.h:158-159`):
   * per aborted txn and partition, the [first, last] offset range of its
   * data records.
   */
  def abortedRanges(log: DataFrame): DataFrame = {
    val aborted = log.where(col("is_control") && col("decision") === "abort")
      .select("partition", "pid", "txn_seq").distinct()
    log.where(!col("is_control"))
      .join(aborted, Seq("partition", "pid", "txn_seq"))
      .groupBy("partition", "pid", "txn_seq")
      .agg(min("offset").as("first"), max("offset").as("last"))
  }

  /**
   * Open transactions: data on the log with no end marker yet. Their
   * minimum first offset per partition holds back the LSO
   * (`cluster/rm_stm.h:157`).
   */
  def openTransactions(log: DataFrame): DataFrame = {
    val ended = log.where(col("is_control")).select("partition", "pid", "txn_seq").distinct()
    log.where(!col("is_control"))
      .join(ended, Seq("partition", "pid", "txn_seq"), "left_anti")
      .groupBy("partition", "pid", "txn_seq")
      .agg(min("offset").as("first_offset"))
  }

  /** T4/A7: LSO per partition from the engine's own open-txn state. */
  def lastStableOffsets(log: DataFrame): DataFrame =
    Transactions.lastStableOffsets(log, openTransactions(log))

  /**
   * A3 txn-marker compaction: the compaction rewrite removes data of
   * aborted transactions and all control/fence batches, then applies key
   * LWW (`storage/compaction_reducers.h:217-231` tx_reducer). Unlike
   * read_committed this does NOT cap at the LSO — open-txn data survives
   * the rewrite.
   */
  def compactCommitted(log: DataFrame, keyCols: Seq[String]): DataFrame = {
    val ar = broadcast(abortedRanges(log).select(
      col("partition").as("a_partition"), col("pid").as("a_pid"),
      col("first"), col("last")))
    val data = log.where(!col("is_control") && col("batch_type") === BatchType.RaftData)
      .join(ar,
        col("partition") === col("a_partition") && col("pid") === col("a_pid") &&
          col("offset").between(col("first"), col("last")),
        "left_anti")
    Compaction.compact(data, keyCols)
  }

  /**
   * G3 group-transaction tracking: offset commits made inside a
   * transaction become visible only when that transaction commits
   * (`group_tx_tracker_stm.cc`, `txn_offset_commit.cc`; group tx batch
   * types `record_batch_types.h:34-36`). `commitLog` rows carry
   * (group, topic, partition, committed_offset, commit_seq, pid,
   * txn_seq); the result is the latest committed offset per group key,
   * considering only commits whose txn has a commit marker in `log`.
   */
  def commitTxOffsets(commitLog: DataFrame, log: DataFrame): DataFrame = {
    val committedTxns = log.where(col("is_control") && col("decision") === "commit")
      .select("pid", "txn_seq").distinct()
    graft.groups.ConsumerGroups.fetchOffsets(
      commitLog.join(committedTxns, Seq("pid", "txn_seq")))
  }

  /**
   * Q5 offset translation (`storage/offset_translator_state.h:64-67`,
   * `storage/offset_translator.h`): kafka-visible offsets subtract the
   * non-data batches (fences, control markers) interleaved in the raft
   * log, so user offsets are dense. Returns the log with a
   * `kafka_offset` column — populated for data rows, null for batches
   * invisible to consumers (`from_log_offset`; the inverse is a lookup
   * on the same mapping).
   *
   * Scale: the running data-row count is NOT one monolithic window per
   * partition — the log chunks on `floor(offset / 4096)` (the analogue of
   * a segment, and exactly the granularity of the reference's translator
   * state: per-segment counts of non-data batches,
   * `storage/offset_translator_state.h:64-67`). Phase 1 counts data rows
   * per (partition, chunk) and prefix-sums that tiny table; phase 2
   * broadcasts the bases back and ranks only inside each chunk, so
   * parallelism is partitions × chunks and no task sorts a partition's
   * entirety.
   */
  def offsetTranslation(log: DataFrame): DataFrame = {
    val isData = !col("is_control") && col("batch_type") === BatchType.RaftData
    val tagged = log.withColumn("__chunk", floor(col("offset") / 4096).cast("long"))
      .withColumn("__d", isData.cast("long"))
    val counts = tagged.groupBy("partition", "__chunk").agg(sum("__d").as("__n"))
    val baseW = Window.partitionBy("partition").orderBy("__chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = counts.withColumn("__base", coalesce(sum("__n").over(baseW), lit(0L)))
      .select("partition", "__chunk", "__base")
    val localW = Window.partitionBy("partition", "__chunk").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.join(broadcast(bases), Seq("partition", "__chunk"))
      .withColumn("kafka_offset",
        when(col("__d") === 1, col("__base") + sum("__d").over(localW) - 1))
      .drop("__chunk", "__d", "__base")
  }

  /**
   * list_transactions (`kafka/server/handlers/list_transactions.cc`):
   * one row per transaction with its coordinator-visible state — Ongoing
   * (no end marker yet), CompleteCommit or CompleteAbort — plus the
   * fan-out breadth (T3's touched-partition count) and data footprint.
   * One aggregate over data rows left-joined to the tiny distinct-marker
   * set; no shuffle beyond the (pid, txn_seq) key.
   */
  def listTransactions(log: DataFrame): DataFrame = {
    val data = log.where(!col("is_control") && col("batch_type") === BatchType.RaftData)
      .groupBy("pid", "txn_seq")
      .agg(countDistinct("partition").as("n_partitions"),
        count(lit(1)).as("n_records"),
        min("offset").as("min_first_offset"))
    val ended = log.where(col("is_control"))
      .select("pid", "txn_seq", "decision").distinct()
    data.join(ended, Seq("pid", "txn_seq"), "left")
      .select(col("pid"), col("txn_seq"),
        when(col("decision") === "commit", "CompleteCommit")
          .when(col("decision") === "abort", "CompleteAbort")
          .otherwise("Ongoing").as("state"),
        col("n_partitions"), col("n_records"), col("min_first_offset"))
  }

  /**
   * describe_transactions (`kafka/server/handlers/describe_transactions.cc`):
   * per producer's CURRENT (latest) transaction, the coordinator-visible
   * detail the handler serves — state, producer epoch, the transaction's
   * start offset on each partition it touched, and its data footprint —
   * one row per (pid, touched partition), i.e. T3's add_partitions list
   * exploded. Two aggregates keyed on (pid[, txn_seq], partition) plus a
   * join to the tiny distinct-marker set; no windows, no driver state.
   */
  def describeTransactions(log: DataFrame): DataFrame = {
    val data = log.where(!col("is_control") && col("batch_type") === BatchType.RaftData)
    val latest = data.groupBy("pid").agg(max("txn_seq").as("txn_seq"))
    val touched = data.join(latest, Seq("pid", "txn_seq"))
      .groupBy("pid", "txn_seq", "partition")
      .agg(max("epoch").as("producer_epoch"),
        min("offset").as("start_offset"), max("offset").as("last_offset"),
        count(lit(1)).as("n_records"))
    val ended = log.where(col("is_control"))
      .select("pid", "txn_seq", "decision").distinct()
    touched.join(ended, Seq("pid", "txn_seq"), "left")
      .select(col("pid"), col("txn_seq"), col("partition"),
        when(col("decision") === "commit", "CompleteCommit")
          .when(col("decision") === "abort", "CompleteAbort")
          .otherwise("Ongoing").as("state"),
        col("producer_epoch"), col("start_offset"), col("last_offset"),
        col("n_records"))
  }

  /**
   * describe_producers (`kafka/server/handlers/describe_producers.cc`):
   * per (partition, producer) — latest epoch, last produced offset, data
   * record count, and the first offset of its currently-open transaction
   * (null when none; the txn starts at the fence batch rm_stm wrote on
   * begin, so the fence's offset is the start), i.e. the per-producer
   * state rm_stm serves.
   */
  def describeProducers(log: DataFrame): DataFrame = {
    val open = openTransactions(log)
      .groupBy("partition", "pid")
      .agg(min("first_offset").as("current_txn_first_offset"))
    log.where(!col("is_control") && col("batch_type") === BatchType.RaftData)
      .groupBy("partition", "pid")
      .agg(max("epoch").as("producer_epoch"), max("offset").as("last_offset"),
        count(lit(1)).as("n_records"))
      .join(open, Seq("partition", "pid"), "left")
  }

  /**
   * P4 read_committed over engine-produced state: drop control records,
   * aborted ranges, and rows at or past the LSO — all three inputs
   * derived from the marker-carrying log itself. Aborted ranges and LSO
   * are broadcast (tiny vs the log), so the data side never shuffles.
   */
  def readCommitted(log: DataFrame): DataFrame = {
    val ar = broadcast(abortedRanges(log).select(
      col("partition").as("a_partition"), col("pid").as("a_pid"),
      col("first"), col("last")))
    val lso = broadcast(lastStableOffsets(log))
    // Fetch returns only raft_data batches (storage/types.h:252-266 type
    // filter), minus control records, minus aborted ranges, below LSO.
    log.where(!col("is_control") && col("batch_type") === BatchType.RaftData)
      .join(ar,
        col("partition") === col("a_partition") && col("pid") === col("a_pid") &&
          col("offset").between(col("first"), col("last")),
        "left_anti")
      .join(lso, Seq("partition"))
      .where(col("offset") < col("lso"))
      .drop("lso")
  }
}
