package graft.log

import graft.SparkSpec

/** Pins storage/index_state.cc maybe_index + find_nearest semantics on a
  * hand-built batch sequence. */
class SegmentIndexSpec extends SparkSpec {
  import spark.implicits._

  // (partition, segment, base_offset, last_offset, first_ts, max_ts, size)
  private def batchesDf = Seq(
    (0, 0L, 0L, 9L, 1000L, 1009L, 40L),   // first: always indexed, acc reset
    (0, 0L, 10L, 19L, 1010L, 1019L, 40L), // acc 40 < 100
    (0, 0L, 20L, 29L, 1020L, 1029L, 70L), // acc 110 >= 100: indexed, reset
    (0, 0L, 30L, 39L, 1030L, 1039L, 10L), // acc 10
    // a second segment: fold state must reset across the key change
    (0, 1L, 40L, 49L, 1040L, 1049L, 10L), // first: indexed despite tiny size
    // another partition, out-of-order batch timestamps
    (1, 0L, 0L, 9L, 2000L, 2050L, 40L),
    (1, 0L, 10L, 19L, 2010L, 2020L, 100L) // max_ts 2020 < prev last 2050
  ).toDF("partition", "segment", "base_offset", "last_offset",
    "first_ts", "max_ts", "size_bytes")

  private def entries = SegmentIndex.indexEntries(batchesDf, step = 100L)

  test("maybe_index: first batch always indexed; accumulator resets on index") {
    val e = entries.orderBy("partition", "segment", "entry_seq")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(e === Seq(
      (0, 0L, 0, 0L, 9L, 0L),    // rel_time = 1009 - 1000, filepos 0
      (0, 0L, 1, 20L, 29L, 80L), // bytes before = 40 + 40
      (0, 1L, 0, 0L, 9L, 0L),    // fresh segment: tiny first batch indexed
      (1, 0L, 0, 0L, 50L, 0L),
      (1, 0L, 1, 10L, 20L, 40L)  // acc exactly == step after the reset
    ))
  }

  test("index_state: bounds + batch-timestamp monotonicity flag") {
    val st = SegmentIndex.indexState(batchesDf)
      .orderBy("partition", "segment").collect()
    val s00 = st(0)
    assert(s00.getAs[Long]("base_offset") === 0L)
    assert(s00.getAs[Long]("max_offset") === 39L)
    assert(s00.getAs[Long]("base_timestamp") === 1000L)
    assert(s00.getAs[Long]("max_timestamp") === 1039L)
    assert(s00.getAs[Boolean]("timestamps_monotonic"))
    // partition 1: second batch's max_ts regressed below the first's
    assert(!st(2).getAs[Boolean]("timestamps_monotonic"))
  }

  test("find_nearest(offset): floor entry; null below base") {
    val st = SegmentIndex.indexState(batchesDf)
    val probes = Seq((0, 0L, -1L), (0, 0L, 0L), (0, 0L, 15L), (0, 0L, 20L),
      (0, 0L, 39L)).toDF("partition", "segment", "probe")
    val r = SegmentIndex.findNearestOffset(entries, st, probes)
      .orderBy("probe").collect()
      .map(x => (x.getLong(2), x.getBoolean(3),
        if (x.isNullAt(4)) -99L else x.getLong(4)))
    assert(r === Seq((-1L, false, -99L), (0L, true, 0L), (15L, true, 0L),
      (20L, true, 20L), (39L, true, 20L)))
  }

  test("find_above/below_size_bytes: upper_bound and upper_bound-minus-one") {
    // p0 seg0 entries sit at filepos 0 and 80 (see the entries test)
    val st = SegmentIndex.indexState(batchesDf)
    val probes = Seq((0, 0L, 0L), (0, 0L, 79L), (0, 0L, 80L), (0, 0L, 200L))
      .toDF("partition", "segment", "probe")
    val above = SegmentIndex.findAboveSizeBytes(entries, probes)
      .orderBy("probe").collect()
      .map(r => (r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(6)) -99L else r.getLong(6)))
    assert(above === Seq(
      (0L, true, 80L),    // first entry strictly past byte 0
      (79L, true, 80L),
      (80L, false, -99L), // nothing past the last entry
      (200L, false, -99L)))
    val below = SegmentIndex.findBelowSizeBytes(entries, probes)
      .orderBy("probe").collect()
      .map(r => (r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(6)) -99L else r.getLong(6)))
    assert(below === Seq(
      (0L, true, 0L),     // entry 0 is at-or-below byte 0
      (79L, true, 0L),
      (80L, true, 80L),
      (200L, true, 80L)))
  }

  test("truncate: below-base no-op, midpoint cut shrinks, base cut collapses to base") {
    val st = SegmentIndex.indexState(batchesDf)
    def cutAt(c: Long) = Seq((0, 0L, c, 7777L))
      .toDF("partition", "segment", "new_max_offset", "new_max_ts")
    def stateRow(c: Long) = SegmentIndex.truncatedState(entries, st, cutAt(c))
      .where($"partition" === 0 && $"segment" === 0).collect()(0)
    // p0 seg0: base 0, max 39, entries at rel 0 and 20
    val noop = stateRow(-1L)
    assert(noop.getAs[Long]("max_offset") === 39L)
    assert(noop.getAs[Long]("n_entries") === 2L)
    val mid = stateRow(20L) // lower_bound(20) drops the rel-20 entry
    assert(mid.getAs[Long]("max_offset") === 20L)
    assert(mid.getAs[Long]("max_timestamp") === 7777L)
    assert(mid.getAs[Long]("n_entries") === 1L)
    val empty = stateRow(0L) // every entry dropped: collapse to base
    assert(empty.getAs[Long]("max_offset") === 0L)
    assert(empty.getAs[Long]("max_timestamp") ===
      empty.getAs[Long]("base_timestamp"))
    assert(empty.getAs[Long]("n_entries") === 0L)
    // entry table itself shrinks in step
    assert(SegmentIndex.truncatedEntries(entries, st, cutAt(20L))
      .where($"partition" === 0 && $"segment" === 0).count() === 1L)
  }

  test("non-data timestamps: config head indexed, first user batch overrides entry 0") {
    // (partition, segment, base, last, first_ts, max_ts, size, user_data)
    val mixed = Seq(
      (0, 0L, 0L, 9L, 9000000000L, 9000000005L, 40L, false), // config head
      (0, 0L, 10L, 19L, 1100L, 1150L, 40L, true),  // first user: override
      (0, 0L, 20L, 29L, 1200L, 1250L, 70L, true),  // acc 150 >= 100: indexed
      (1, 0L, 0L, 9L, 9000000000L, 9000000005L, 40L, false), // all-config seg
      (1, 0L, 10L, 19L, 9000000010L, 9000000015L, 200L, false) // no sampling
    ).toDF("partition", "segment", "base_offset", "last_offset",
      "first_ts", "max_ts", "size_bytes", "user_data")
    val e = SegmentIndex.indexEntries(mixed, step = 100L)
      .orderBy("partition", "entry_seq").collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(e === Seq(
      // entry 0's time cell reset to the user batch's RAW last_timestamp
      // (index_state.cc:248-249), base re-seeded to its first_ts
      (0, 0, 0L, 1150L, 0L),
      (0, 1, 20L, 150L, 80L),   // 1250 - 1100, sampled (acc 110 >= 100)
      // config-only segment: head indexed with walltime, never reset;
      // later config batches cannot trip the sampler (user_data gate)
      (1, 0, 0L, 5L, 0L)))
    val st = SegmentIndex.indexState(mixed).orderBy("partition").collect()
    assert(st(0).getAs[Long]("base_timestamp") === 1100L)
    assert(st(0).getAs[Long]("max_timestamp") === 1250L)
    assert(!st(0).getAs[Boolean]("non_data_timestamps"))
    assert(st(1).getAs[Long]("base_timestamp") === 9000000000L)
    assert(st(1).getAs[Long]("max_timestamp") === 9000000000L)
    assert(st(1).getAs[Boolean]("non_data_timestamps"))
  }

  test("find_nearest(time): lower_bound minus one, clamped; null out of range") {
    val st = SegmentIndex.indexState(batchesDf)
    val probes = Seq((0, 0L, 999L), (0, 0L, 1000L), (0, 0L, 1015L),
      (0, 0L, 1029L), (0, 0L, 1030L)).toDF("partition", "segment", "probe")
    val r = SegmentIndex.findNearestTime(entries, st, probes)
      .orderBy("probe").collect()
      .map(x => (x.getLong(2), x.getBoolean(3),
        if (x.isNullAt(4)) -99L else x.getLong(4)))
    assert(r === Seq(
      (999L, false, -99L),  // t < base_timestamp
      (1000L, true, 0L),    // lb = entry 0, clamped back to 0
      (1015L, true, 0L),    // lb = entry 1 (rel 29 >= 15), back one -> 0
      (1029L, true, 0L),    // lb lands exactly on entry 1, back one
      (1030L, false, -99L)  // delta 30 above every indexed time
    ))
  }
}
