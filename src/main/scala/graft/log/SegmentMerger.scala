package graft.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tiered-storage adjacent segment merger (reference
 * `cluster/archival/adjacent_segment_merger.cc`,
 * `adjacent_segment_run.cc`): upload housekeeping re-uploads runs of
 * small adjacent cloud segments as one larger segment, bounded by the
 * target segment size.
 *
 * Scan semantics (`adjacent_segment_run::maybe_add_segment`), per
 * partition in manifest order:
 *  - a run starts at a segment smaller than `maxSize`;
 *  - a run of exactly one segment RESETS when the next segment would
 *    push it over `maxSize` (the corner case `run.cc:28-34` — skip the
 *    previous segment, the current one may start a new run);
 *  - a segment extends the run only in the same term (cross-term
 *    merging disallowed) and while the combined size stays ≤ `maxSize`;
 *    a non-contiguous neighbor (committed+1 ≠ base) resets the run;
 *  - the scan STOPS at the first segment that cannot join a run of ≥ 2
 *    segments — that run is the candidate (`scan_manifest` breaks when
 *    maybe_add_segment returns true);
 *  - remote lookup ignores segments at or above the local start offset
 *    (`adjacent_segment_merger.cc:109-112`).
 * A candidate is accepted if it has > 1 segment AND (its bytes exceed
 * `minSize`, OR it does not touch the manifest's last offset — a small
 * run wedged between large segments is still worth re-uploading,
 * `merger.cc:124-143`). Watermarks: `minSize` defaults to half the
 * target (`get_low_high_segment_size`).
 *
 * Spark design: one secondary-sorted per-partition streaming pass (the
 * per-NTP archiver loop), with the manifest tail offset broadcast on.
 * The merged manifest is then declarative: drop the run's rows, insert
 * the consolidated row.
 */
object SegmentMerger {

  final case class Seg(partition: Int, base_offset: Long, committed_offset: Long,
      size_bytes: Long, term: Long, last_offset: Long)
  final case class Run(partition: Int, base_offset: Long, committed_offset: Long,
      num_segments: Int, size_bytes: Long, term: Long)

  /**
   * Detect the first acceptable adjacent-segment run per partition.
   * `segments`: `(partition, base_offset, committed_offset, size_bytes,
   * term)` — the uploaded-segment manifest. Returns zero or one run row
   * per partition.
   */
  def scanRuns(segments: DataFrame, maxSize: Long, minSize: Long,
      localStartOffset: Long): DataFrame = {
    require(minSize < maxSize, "low watermark must be below the high watermark")
    val spark = segments.sparkSession
    import spark.implicits._
    val lastOffsets = segments.groupBy("partition")
      .agg(max("committed_offset").as("last_offset"))
    segments
      .join(broadcast(lastOffsets), Seq("partition"))
      .where(col("committed_offset") < localStartOffset)
      .select(col("partition").cast("int"), col("base_offset").cast("long"),
        col("committed_offset").cast("long"), col("size_bytes").cast("long"),
        col("term").cast("long"), col("last_offset").cast("long"))
      .as[Seg]
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("base_offset"))
      .mapPartitions { it =>
        var part = Int.MinValue
        var num = 0; var size = 0L; var base = 0L; var committed = 0L
        var term = 0L; var found = false; var lastOff = 0L
        val out = scala.collection.mutable.ArrayBuffer[Run]()
        def reset(): Unit = { num = 0; size = 0L }
        def finish(): Unit = {
          // acceptance: >1 segments AND (size > min OR not the manifest tail)
          if (num > 1 && (size > minSize || committed != lastOff))
            out += Run(part, base, committed, num, size, term)
        }
        it.foreach { s =>
          if (s.partition != part) {
            if (part != Int.MinValue) finish()
            part = s.partition; found = false; reset()
          }
          lastOff = s.last_offset
          if (!found) {
            if (num == 1 && size + s.size_bytes > maxSize) reset()
            if (num == 0) {
              if (s.size_bytes < maxSize) {
                num = 1; size = s.size_bytes; base = s.base_offset
                committed = s.committed_offset; term = s.term
              }
            } else if (term == s.term && size + s.size_bytes <= maxSize) {
              if (committed + 1 != s.base_offset) reset()
              else {
                num += 1; size += s.size_bytes; committed = s.committed_offset
              }
            } else if (num > 1) {
              found = true // the candidate run is frozen; scan stops here
            }
          }
        }
        if (part != Int.MinValue) finish()
        out.iterator
      }
      .toDF()
  }

  /** The manifest after one housekeeping round: each partition's run is
    * replaced by its consolidated segment (same offsets span, summed
    * bytes, the run's term); all other rows pass through. */
  def mergeManifest(segments: DataFrame, runs: DataFrame): DataFrame = {
    val r = runs.select(col("partition").as("__p"), col("base_offset").as("__b"),
      col("committed_offset").as("__c"))
    val untouched = segments.join(broadcast(r),
        segments("partition") === col("__p") &&
          segments("base_offset") >= col("__b") &&
          segments("base_offset") <= col("__c"), "left_anti")
      .withColumn("merged", lit(false))
    val consolidated = runs.select(col("partition"), col("base_offset"),
        col("committed_offset"), col("size_bytes"), col("term"))
      .withColumn("merged", lit(true))
    untouched.select(col("partition"), col("base_offset"),
        col("committed_offset"), col("size_bytes"), col("term"), col("merged"))
      .union(consolidated)
  }
}
