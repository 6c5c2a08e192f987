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
}
