package graft.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Tiered-storage scrubber (reference
 * `cloud_storage/anomalies_detector.cc` + the metadata rule ladder
 * `cloud_storage/types.cc:150-216` `scrub_segment_meta`): housekeeping
 * validates the uploaded partition manifest against both its own
 * invariants and the actual object listing, reporting anomalies
 * (`cloud_storage/types.h:289-296,325-344`):
 *
 *  - `missing_delta` — once a segment carries a delta offset, every
 *    later segment must too;
 *  - `non_monotonical_delta` — delta offsets never decrease;
 *  - `committed_smaller` — a segment's committed offset is >= its base;
 *  - `end_delta_smaller` — a segment's end delta is >= its base delta;
 *  - `offset_gap` / `offset_overlap` — each segment's base offset is
 *    exactly the previous committed offset + 1; greater is a gap,
 *    smaller an overlap;
 *  - `missing_segment` / `missing_spillover_manifest` — objects
 *    referenced by the manifest that the bucket listing does not have
 *    (`anomalies_detector.h` steps 2-4).
 *
 * A scrub run is depth-bounded (`anomalies_detector::quota_limit
 * .max_num_segments`): only the first `maxSegments` manifest entries
 * per partition are visited this run; a partition cut short reports
 * `scrub_status::partial` with its `last_scrubbed_offset`
 * (`anomalies_detector.h:66-70`), a fully-visited one `full`.
 *
 * Spark design: the manifest is bounded per-partition metadata
 * (segment list), so the previous-segment context is one
 * partition-scoped lag window — the same control-plane window shape as
 * `groups/Assignment`; no data-plane rows are touched. Existence
 * checks are broadcast-able anti-joins of manifest paths against the
 * listing (in production the inventory table the reference's
 * `existence_query_context` prefers over per-object HEADs). Everything
 * downstream of the lag is one codegen'd rule ladder.
 */
object Scrubber {

  private val win = Window.partitionBy("partition").orderBy("base_offset")

  /**
   * The metadata rule ladder over a visited manifest slice. Input
   * columns: `partition, base_offset, committed_offset, delta_offset
   * (nullable), delta_offset_end (nullable)`. Emits one row per fired
   * rule: `(partition, anomaly_type, at_base_offset,
   * prev_base_offset)` — `prev_base_offset` null for the two
   * self-contained rules, matching `anomaly_meta.previous`.
   */
  def scrubSegmentMeta(manifest: DataFrame): DataFrame = {
    val ctx = manifest.select(col("partition"), col("base_offset"),
        col("committed_offset"), col("delta_offset"), col("delta_offset_end"))
      .withColumn("prev_base", lag("base_offset", 1).over(win))
      .withColumn("prev_committed", lag("committed_offset", 1).over(win))
      .withColumn("prev_delta", lag("delta_offset", 1).over(win))
      .withColumn("has_prev", lag(lit(1), 1).over(win).isNotNull)
    // Each rule is an independent (condition, type, carries_prev) leg of
    // one explode — a single pass, no self-joins.
    val rules = array(
      struct(lit("missing_delta").as("t"),
        (col("has_prev") && col("prev_delta").isNotNull &&
          col("delta_offset").isNull).as("fire"), lit(true).as("p")),
      struct(lit("non_monotonical_delta").as("t"),
        (col("has_prev") && col("prev_delta").isNotNull &&
          col("delta_offset").isNotNull &&
          col("prev_delta") > col("delta_offset")).as("fire"), lit(true).as("p")),
      struct(lit("committed_smaller").as("t"),
        (col("committed_offset") < col("base_offset")).as("fire"),
        lit(false).as("p")),
      struct(lit("end_delta_smaller").as("t"),
        (col("delta_offset").isNotNull && col("delta_offset_end").isNotNull &&
          col("delta_offset_end") < col("delta_offset")).as("fire"),
        lit(false).as("p")),
      struct(lit("offset_gap").as("t"),
        (col("has_prev") &&
          col("prev_committed") + 1 < col("base_offset")).as("fire"),
        lit(true).as("p")),
      struct(lit("offset_overlap").as("t"),
        (col("has_prev") &&
          col("prev_committed") + 1 > col("base_offset")).as("fire"),
        lit(true).as("p")))
    ctx.select(col("partition"), col("base_offset"), col("prev_base"),
        explode(filter(rules, r => r("fire"))).as("r"))
      .select(col("partition"), col("r.t").as("anomaly_type"),
        col("base_offset").as("at_base_offset"),
        when(col("r.p"), col("prev_base")).as("prev_base_offset"))
  }

  /** The manifest slice a depth-bounded run visits: the first
    * `maxSegments` entries per partition in offset order. */
  private def visited(manifest: DataFrame, maxSegments: Int): DataFrame =
    manifest.withColumn("__rank", row_number().over(win))
      .where(col("__rank") <= maxSegments)

  /**
   * One full scrub run: metadata ladder over the visited slice, plus
   * object-existence anti-joins for visited segments and for the
   * spillover manifests referenced by the partition manifest
   * (existence is partition-level metadata, never depth-bounded —
   * step 2 of `anomalies_detector` runs before the segment walk).
   * `manifest` additionally carries a `path` column; `spilloverRefs`
   * is `(partition, path)`; `objects` is the bucket listing `(path)`.
   */
  def scrub(manifest: DataFrame, objects: DataFrame, spilloverRefs: DataFrame,
      maxSegments: Int = Int.MaxValue): DataFrame = {
    val slice = visited(manifest, maxSegments)
    val meta = scrubSegmentMeta(slice.drop("path", "__rank"))
    val missingSegs = slice
      .join(objects.select(col("path")), Seq("path"), "left_anti")
      .select(col("partition"), lit("missing_segment").as("anomaly_type"),
        col("base_offset").as("at_base_offset"),
        lit(null).cast("long").as("prev_base_offset"))
    val missingSpill = spilloverRefs
      .join(objects.select(col("path")), Seq("path"), "left_anti")
      .select(col("partition"),
        lit("missing_spillover_manifest").as("anomaly_type"),
        lit(null).cast("long").as("at_base_offset"),
        lit(null).cast("long").as("prev_base_offset"))
    meta.unionByName(missingSegs).unionByName(missingSpill)
  }

  /**
   * The per-partition run summary (`anomalies_detector::result`):
   * `full` when every manifest entry was visited this run, else
   * `partial` with the last visited committed offset; `segments_visited`
   * and the anomaly counts the result accumulates.
   */
  def scrubStatus(manifest: DataFrame, objects: DataFrame,
      spilloverRefs: DataFrame, maxSegments: Int): DataFrame = {
    val slice = visited(manifest, maxSegments)
    val perPart = manifest.groupBy("partition")
      .agg(count(lit(1)).as("n_segments"))
    val visitedAgg = slice.groupBy("partition")
      .agg(count(lit(1)).as("segments_visited"),
        max("committed_offset").as("last_scrubbed_offset"))
    val anomalies = scrub(manifest, objects, spilloverRefs, maxSegments)
      .groupBy("partition")
      .agg(count(lit(1)).as("n_anomalies"),
        count(when(col("anomaly_type") === "missing_segment", lit(1)))
          .as("n_missing_segments"),
        count(when(col("anomaly_type") === "missing_spillover_manifest", lit(1)))
          .as("n_missing_spillover"))
    perPart.join(visitedAgg, Seq("partition"), "left")
      .join(anomalies, Seq("partition"), "left")
      .select(col("partition"),
        when(coalesce(col("segments_visited"), lit(0L)) >= col("n_segments"),
          lit("full")).otherwise(lit("partial")).as("status"),
        when(coalesce(col("segments_visited"), lit(0L)) < col("n_segments"),
          col("last_scrubbed_offset")).as("last_scrubbed_offset"),
        coalesce(col("segments_visited"), lit(0L)).as("segments_visited"),
        coalesce(col("n_anomalies"), lit(0L)).as("n_anomalies"),
        coalesce(col("n_missing_segments"), lit(0L)).as("n_missing_segments"),
        coalesce(col("n_missing_spillover"), lit(0L)).as("n_missing_spillover"))
  }
}
