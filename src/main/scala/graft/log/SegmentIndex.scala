package graft.log

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-segment sparse offset/time index — the mechanism behind the
 * reference's in-segment seek and timequery
 * (`storage/segment_index.cc:117-143` `maybe_track`,
 * `storage/index_state.cc:223-312` `maybe_index`,
 * `:673-745` the `find_*` lookups).
 *
 * The reference appends batches to a segment and samples an index entry
 * (relative offset, relative timestamp, file position) whenever the
 * byte accumulator since the last sample reaches `step` (default 32
 * KiB); the segment's FIRST batch is always indexed ("always saving the
 * first batch simplifies a lot of book keeping"), and an indexed batch
 * resets the accumulator (`maybe_track`: `if (_state.maybe_index(...))
 * _acc = 0`). Lookups:
 *
 *  - `find_nearest(offset)`: the greatest entry with
 *    `rel_offset <= o - base_offset`, null when `o < base_offset`
 *    (`index_state.cc:673-690` — lower_bound then walk back);
 *  - `find_nearest(timestamp)`: lower_bound on the relative-time
 *    column, then ONE ENTRY BACK (a sparse index cannot guarantee the
 *    needle's timestamp is inside the landed batch, `index_state.cc:
 *    654-670`), clamped at entry 0; null when `t < base_timestamp` or
 *    when every entry's time is below the needle.
 *
 * Non-data timestamps (`index_state.cc:246-264,268-280`): a segment
 * whose FIRST batch is an internal config batch (walltime stamps, not
 * user time) still indexes that batch ("always saving the first
 * batch"), but sets the `non_data_timestamps` flag; the first USER
 * batch then overrides — the single existing entry's time cell is
 * RESET to that batch's last_timestamp raw (`try_reset_relative_time
 * _index`, `:248-249` — the reference stores the absolute value here,
 * which dominates later relative deltas so a timequery conservatively
 * lands on entry 0), `base/max_timestamp` re-seed from the user batch,
 * and the flag clears. Config batches never extend the timestamp
 * bounds nor trigger accumulator sampling (`user_data` gates both,
 * `:287-297,303`).
 *
 * Scale: the entry fold is sequential per (partition, segment) — state
 * is one accumulator — and segments distribute across executors via a
 * hash repartition, exactly like the repo's other control-log FSFs.
 * Everything else (segment bounds, monotonicity, both lookups) is
 * declarative: lookups are a broadcast-or-shuffle join of probes
 * against the tiny entries table, never a scan of the log itself.
 */
object SegmentIndex {

  final case class BatchRow(partition: Int, segment: Long, base_offset: Long,
      last_offset: Long, first_ts: Long, max_ts: Long, size_bytes: Long,
      user_data: Boolean)

  final case class EntryRow(partition: Int, segment: Long, entry_seq: Int,
      rel_offset: Long, rel_time: Long, filepos: Long)

  /** Frames without a `user_data` column treat every batch as user data
    * (the all-user-data topic; `segment_index.cc:136-138` — internal
    * topics and raft_data batches count as user data). */
  private def withUserData(batches: DataFrame): DataFrame =
    if (batches.columns.contains("user_data")) batches
    else batches.withColumn("user_data", lit(true))

  /**
   * Build the sparse index entries. `batches` carries one row per
   * appended batch: `partition, segment, base_offset, last_offset,
   * first_ts, max_ts, size_bytes[, user_data]`. Entries are emitted per
   * (partition, segment), `entry_seq` dense from 0, with the non-data
   * timestamp override applied (`index_state.cc:246-264`: the first
   * user batch after a config-batch segment head resets entry 0's time
   * cell to its raw last_timestamp).
   */
  def indexEntries(batches: DataFrame, step: Long): DataFrame = {
    val spark = batches.sparkSession
    import spark.implicits._
    withUserData(batches).select(col("partition").cast("int").as("partition"),
        col("segment").cast("long").as("segment"),
        col("base_offset").cast("long").as("base_offset"),
        col("last_offset").cast("long").as("last_offset"),
        col("first_ts").cast("long").as("first_ts"),
        col("max_ts").cast("long").as("max_ts"),
        col("size_bytes").cast("long").as("size_bytes"),
        col("user_data").cast("boolean").as("user_data"))
      .as[BatchRow]
      .repartition(col("partition"), col("segment"))
      .sortWithinPartitions(col("partition"), col("segment"), col("base_offset"))
      .mapPartitions { it =>
        // Entries buffer per (partition, segment): the non-data override
        // mutates entry 0 after it was emitted, so a segment's entries
        // flush only at its end. Bounded: segment bytes / step entries.
        val buf = it.buffered
        new Iterator[Seq[EntryRow]] {
          def hasNext: Boolean = buf.hasNext
          def next(): Seq[EntryRow] = {
            val first = buf.head
            val entries = scala.collection.mutable.ArrayBuffer.empty[EntryRow]
            var acc = 0L; var filepos = 0L; var seq = 0; var empty = true
            var nonData = false
            val segBase = first.base_offset; var baseTs = 0L
            while (buf.hasNext && buf.head.partition == first.partition &&
                buf.head.segment == first.segment) {
              val b = buf.next()
              val pos = filepos
              filepos += b.size_bytes
              acc += b.size_bytes
              val lastTs = math.max(b.first_ts, b.max_ts)
              if (b.user_data && nonData) {
                // first user batch after a config head: reset entry 0's
                // time cell RAW (:248-249) and re-seed the time base
                entries(0) = entries(0).copy(rel_time = lastTs)
                baseTs = b.first_ts
                nonData = false
              }
              if (empty) {
                nonData = !b.user_data
                baseTs = b.first_ts
              }
              // maybe_index: first batch always; else accumulator >= step
              // AND user data (:303); an indexed batch resets the
              // accumulator (maybe_track)
              val indexed = empty || (acc >= step && b.user_data)
              empty = false
              if (indexed) {
                acc = 0L
                entries += EntryRow(b.partition, b.segment, seq,
                  b.base_offset - segBase, lastTs - baseTs, pos)
                seq += 1
              }
            }
            entries.toSeq
          }
        }.flatMap(identity)
      }
      .toDF()
  }

  /**
   * Per-segment index header state (`index_state` fields): offset and
   * timestamp bounds plus the batch-timestamp monotonicity flag
   * (`segment_index.cc:121-126` — ANDed `hdr.max_timestamp >=
   * max(prev first, prev max)` over the append order). Declarative:
   * one window + one aggregate over the BATCH-level frame (tiny next
   * to the log itself).
   */
  def indexState(batches: DataFrame): DataFrame = {
    val w = Window.partitionBy("partition", "segment").orderBy("base_offset")
    // Config batches never contribute to the segment's timestamp bounds
    // (index_state.cc:287-297: user_data gates max_timestamp; :268-280:
    // the first user batch re-seeds base_timestamp after a config head).
    // A segment with no user data at all keeps the config head's
    // walltime stamps and reports non_data_timestamps = true.
    withUserData(batches)
      .withColumn("prev_last_ts",
        lag(greatest(col("first_ts"), col("max_ts")), 1).over(w))
      .groupBy("partition", "segment")
      .agg(min("base_offset").as("base_offset"),
        max("last_offset").as("max_offset"),
        coalesce(
          min_by(when(col("user_data"), col("first_ts")),
            when(col("user_data"), col("base_offset"))),
          min_by(col("first_ts"), col("base_offset"))).as("base_timestamp"),
        coalesce(
          max(when(col("user_data"), greatest(col("first_ts"), col("max_ts")))),
          min_by(col("first_ts"), col("base_offset"))).as("max_timestamp"),
        coalesce(bool_and(col("max_ts") >= col("prev_last_ts")), lit(true))
          .as("timestamps_monotonic"),
        // still true only while NO user batch has arrived (a user batch
        // anywhere implies the override ran or the head was user data)
        (!bool_or(col("user_data"))).as("non_data_timestamps"),
        count(lit(1)).cast("long").as("n_batches"))
  }

  /**
   * `find_nearest(offset)` for a probe frame `(partition, segment,
   * probe)`: greatest entry at-or-below the needle, null below the
   * segment base. The entries/state tables are index-sized, so the
   * join is broadcast-able at any log scale.
   */
  private def renamedEntries(entries: DataFrame): DataFrame =
    entries.select(col("partition").as("ep"), col("segment").as("es"),
      col("entry_seq"), col("rel_offset"), col("rel_time"), col("filepos"))

  def findNearestOffset(entries: DataFrame, state: DataFrame,
      probes: DataFrame): DataFrame =
    probes.join(broadcast(state.select(col("partition"), col("segment"),
        col("base_offset"))), Seq("partition", "segment"))
      .join(broadcast(renamedEntries(entries)),
        col("ep") === col("partition") && col("es") === col("segment") &&
          col("probe") >= col("base_offset") &&
          col("rel_offset") <= col("probe") - col("base_offset"), "left")
      .groupBy(col("partition"), col("segment"), col("probe"))
      .agg(max(when(col("entry_seq").isNotNull, struct(
        col("rel_offset"), col("rel_time"), col("filepos")))).as("e"))
      .select(col("partition"), col("segment"), col("probe"),
        col("e").isNotNull.as("found"),
        col("e.rel_offset").as("rel_offset"), col("e.rel_time").as("rel_time"),
        col("e.filepos").as("filepos"))

  /**
   * `find_above_size_bytes(distance)` (`index_state.cc:708-720`): the
   * FIRST entry whose file position is strictly above the needle —
   * `position_upper_bound` then translate; null when every entry sits
   * at-or-below (or the index is empty). Used by the reader to skip
   * `distance` bytes into a segment.
   */
  def findAboveSizeBytes(entries: DataFrame, probes: DataFrame): DataFrame =
    probes.join(broadcast(renamedEntries(entries)),
        col("ep") === col("partition") && col("es") === col("segment") &&
          col("filepos") > col("probe"), "left")
      .groupBy(col("partition"), col("segment"), col("probe"))
      // entries ascend in filepos, so min(struct) with filepos leading
      // is the upper_bound entry
      .agg(min(when(col("entry_seq").isNotNull, struct(
        col("filepos"), col("rel_offset"), col("rel_time")))).as("e"))
      .select(col("partition"), col("segment"), col("probe"),
        col("e").isNotNull.as("found"),
        col("e.rel_offset").as("rel_offset"), col("e.rel_time").as("rel_time"),
        col("e.filepos").as("filepos"))

  /**
   * `find_below_size_bytes(distance)` (`:722-736`): the LAST entry at
   * or below the needle (upper_bound minus one); null when even entry
   * 0 sits above. Bounds a read that must not exceed `distance` bytes.
   */
  def findBelowSizeBytes(entries: DataFrame, probes: DataFrame): DataFrame =
    probes.join(broadcast(renamedEntries(entries)),
        col("ep") === col("partition") && col("es") === col("segment") &&
          col("filepos") <= col("probe"), "left")
      .groupBy(col("partition"), col("segment"), col("probe"))
      .agg(max(when(col("entry_seq").isNotNull, struct(
        col("filepos"), col("rel_offset"), col("rel_time")))).as("e"))
      .select(col("partition"), col("segment"), col("probe"),
        col("e").isNotNull.as("found"),
        col("e.rel_offset").as("rel_offset"), col("e.rel_time").as("rel_time"),
        col("e.filepos").as("filepos"))

  /**
   * Index truncation (`index_state::truncate`, `:739-763`) as the
   * surviving entries: a cut at `new_max_offset` drops every entry
   * with `rel_offset >= new_max_offset - base_offset`
   * (offset_lower_bound onward); a cut below the segment base is a
   * no-op. `cuts`: one `(partition, segment, new_max_offset)` row per
   * segment (absent segments keep everything).
   */
  def truncatedEntries(entries: DataFrame, state: DataFrame,
      cuts: DataFrame): DataFrame =
    entries
      .join(broadcast(state.select(col("partition"), col("segment"),
        col("base_offset"))), Seq("partition", "segment"))
      .join(broadcast(cuts), Seq("partition", "segment"), "left")
      .where(col("new_max_offset").isNull ||
        col("new_max_offset") < col("base_offset") ||
        col("rel_offset") < col("new_max_offset") - col("base_offset"))
      .select(col("partition"), col("segment"), col("entry_seq"),
        col("rel_offset"), col("rel_time"), col("filepos"))

  /**
   * Post-truncation header state (`:753-762`): bounds shrink to
   * `(new_max_offset, new_max_timestamp)` when the cut lowered
   * `max_offset`; if the cut emptied the index they collapse to the
   * base instead. `cuts` carries `(partition, segment, new_max_offset,
   * new_max_ts)`.
   */
  def truncatedState(entries: DataFrame, state: DataFrame,
      cuts: DataFrame): DataFrame = {
    val surviving = truncatedEntries(entries, state, cuts)
      .groupBy("partition", "segment")
      .agg(count(lit(1)).as("__kept"))
    state
      .join(broadcast(cuts), Seq("partition", "segment"), "left")
      .join(broadcast(surviving), Seq("partition", "segment"), "left")
      .withColumn("__kept", coalesce(col("__kept"), lit(0L)))
      .withColumn("__applies",
        col("new_max_offset").isNotNull &&
          col("new_max_offset") >= col("base_offset") &&
          col("new_max_offset") < col("max_offset"))
      .select(col("partition"), col("segment"), col("base_offset"),
        when(!col("__applies"), col("max_offset"))
          .when(col("__kept") === 0, col("base_offset"))
          .otherwise(col("new_max_offset")).as("max_offset"),
        col("base_timestamp"),
        when(!col("__applies"), col("max_timestamp"))
          .when(col("__kept") === 0, col("base_timestamp"))
          .otherwise(col("new_max_ts")).as("max_timestamp"),
        col("__kept").as("n_entries"))
  }

  /**
   * `find_nearest(timestamp)`: lower_bound on relative time, stepped
   * back one entry (clamped at 0); null when the needle precedes
   * `base_timestamp` or exceeds every indexed time.
   */
  def findNearestTime(entries: DataFrame, state: DataFrame,
      probes: DataFrame): DataFrame = {
    val lb = probes.join(broadcast(state.select(col("partition"), col("segment"),
        col("base_timestamp"))), Seq("partition", "segment"))
      .join(broadcast(renamedEntries(entries)),
        col("ep") === col("partition") && col("es") === col("segment") &&
          col("probe") >= col("base_timestamp") &&
          col("rel_time") >= col("probe") - col("base_timestamp"), "left")
      .groupBy(col("partition"), col("segment"), col("probe"))
      .agg(min(col("entry_seq")).as("lb_seq"))
    lb.join(broadcast(renamedEntries(entries)),
        col("lb_seq").isNotNull &&
          col("ep") === col("partition") && col("es") === col("segment") &&
          col("entry_seq") === greatest(col("lb_seq") - 1, lit(0)), "left")
      .select(col("partition"), col("segment"), col("probe"),
        col("entry_seq").isNotNull.as("found"),
        col("rel_offset"), col("rel_time"), col("filepos"))
  }
}
