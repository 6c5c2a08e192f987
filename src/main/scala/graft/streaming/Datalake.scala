package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Datalake materialization (SURVEY §2.7 D1/D4/D6): continuous
 * translation of topic logs into partitioned analytical tables with
 * snapshot metadata and expiry.
 *
 * Reference: the record multiplexer consumes batches and routes them to
 * per-output partitioning writers (`datalake/record_multiplexer.h:32`);
 * the default partition spec is hourly on the record timestamp
 * (`datalake/table_definition.cc:57-66`); commits append manifests and
 * snapshots through the catalog (`iceberg/merge_append_action.cc`,
 * `datalake/coordinator/`), and retention expires old snapshots.
 *
 * Spark design: each commit appends hour-partitioned parquet under
 * `data/snapshot_id=N/p_key=...` plus one row of snapshot metadata —
 * Spark's dynamic-partition writer IS the partitioning writer, so the
 * multiplexer reduces to a routed write per output table inside
 * `foreachBatch`. Readers see exactly the surviving-snapshot set
 * (semi-join against the snapshot table, pruned by partition directory),
 * and expiry = metadata delete + physical directory removal — the same
 * two-step the reference's expire_snapshots performs.
 */
object Datalake {

  /** Hourly partition value — the reference's default spec (iceberg
    * `hour(timestamp)` transform, table_definition.cc:57-66). */
  def hourPartition(ts: Column): Column = date_format(ts, "yyyy-MM-dd-HH")

  /** Daily partition value (iceberg `day(timestamp)`). Partition
    * granularity must match data volume: a partition should hold at
    * least a target-file-size of data, or the table devolves into
    * per-directory commit overhead and tiny files. Callers pick the
    * transform; hour is the reference default, day the low-volume choice. */
  def dayPartition(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /**
   * D2 default record translation (`datalake/record_translator.h:28-66`):
   * the canonical log row becomes the reference's default Iceberg shape —
   * a `redpanda` system struct (partition, offset, timestamp, headers,
   * key; `table_definition.cc:20-45`) alongside the (possibly
   * schema-decoded) value.
   */
  def translateDefault(log: DataFrame): DataFrame =
    log.select(
      struct(col("partition"), col("offset"), col("timestamp"),
        col("headers"), col("key")).as("redpanda"),
      col("value"))

  private def snapshotsPath(outPath: String) = s"$outPath/snapshots"
  private def dataPath(outPath: String) = s"$outPath/data"

  /** Snapshot metadata table: (snapshot_id, committed_at_ms, n_rows). */
  def snapshots(spark: SparkSession, outPath: String): DataFrame = {
    val p = new Path(snapshotsPath(outPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      import spark.implicits._
      Seq.empty[(Long, Long, Long)].toDF("snapshot_id", "committed_at_ms", "n_rows")
    } else spark.read.parquet(snapshotsPath(outPath))
  }

  private def nextSnapshotId(spark: SparkSession, outPath: String): Long = {
    val row = snapshots(spark, outPath).agg(max("snapshot_id")).collect()(0)
    if (row.isNullAt(0)) 1L else row.getLong(0) + 1
  }

  /**
   * D1/D6 commit: append `df` hour-partitioned under a fresh snapshot id
   * and record the snapshot. Returns the snapshot id.
   */
  def commit(df: DataFrame, tsCol: Column, outPath: String,
      partFn: Column => Column = hourPartition): Long = {
    val spark = df.sparkSession
    val snap = nextSnapshotId(spark, outPath)
    val n = df.count()
    // Cluster rows by target partition before the dynamic-partition
    // write: one task per partition directory instead of every task
    // touching every directory (tasks × dirs tiny files — the classic
    // small-files failure; the reference's partitioning_writer groups
    // rows per partition key for exactly this reason,
    // datalake/partitioning_writer.h).
    df.withColumn("p_key", partFn(tsCol))
      .withColumn("snapshot_id", lit(snap))
      .repartition(col("p_key"))
      .write.mode("append").partitionBy("snapshot_id", "p_key")
      .parquet(dataPath(outPath))
    import spark.implicits._
    Seq((snap, System.currentTimeMillis(), n))
      .toDF("snapshot_id", "committed_at_ms", "n_rows")
      .write.mode("append").parquet(snapshotsPath(outPath))
    snap
  }

  /** Read the table as of the surviving snapshot set. */
  def readTable(spark: SparkSession, outPath: String): DataFrame = {
    val live = snapshots(spark, outPath).select("snapshot_id")
    spark.read.parquet(dataPath(outPath))
      .join(broadcast(live), Seq("snapshot_id"), "left_semi")
  }

  /**
   * D6 snapshot expiry: keep the most recent `keepLast` snapshots;
   * delete the metadata rows and the expired data directories
   * (`expireSnapshots` + deleteWhere semantics).
   */
  def expireSnapshots(spark: SparkSession, outPath: String, keepLast: Int): Seq[Long] = {
    val all = snapshots(spark, outPath).orderBy(col("snapshot_id").desc).collect()
    val (keep, expire) = all.splitAt(keepLast)
    if (expire.nonEmpty) {
      val fs = new Path(outPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      expire.foreach { r =>
        fs.delete(new Path(s"${dataPath(outPath)}/snapshot_id=${r.getLong(0)}"), true)
      }
      import spark.implicits._
      val kept = keep.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .toDF("snapshot_id", "committed_at_ms", "n_rows")
      // rewrite metadata atomically: write fresh, then swap
      val tmp = s"${snapshotsPath(outPath)}__new"
      kept.coalesce(1).write.mode("overwrite").parquet(tmp)
      fs.delete(new Path(snapshotsPath(outPath)), true)
      fs.rename(new Path(tmp), new Path(snapshotsPath(outPath)))
    }
    expire.map(_.getLong(0)).toSeq
  }

  /**
   * D1 record multiplexer: route every row to its output table and
   * append each output hour-partitioned — one cached pass over the
   * batch, then one filtered write per distinct output (the Spark shape
   * of `record_multiplexer.h:32` fan-out to partitioning writers).
   * Returns (output, rows) per output table.
   */
  def writeMultiplexed(
      batch: DataFrame,
      routeCol: Column,
      tsCol: Column,
      basePath: String,
      partFn: Column => Column = hourPartition): Seq[(String, Long)] = {
    val routed = batch
      .withColumn("_output", routeCol)
      .withColumn("p_key", partFn(tsCol))
      .cache()
    try {
      val outputs = routed.select("_output").distinct().collect().map(_.getString(0)).sorted
      outputs.toSeq.map { o =>
        val rows = routed.where(col("_output") === o).drop("_output")
        // cluster by partition key before the write — see commit() note
        rows.repartition(col("p_key"))
          .write.mode("append").partitionBy("p_key").parquet(s"$basePath/$o")
        o -> rows.count()
      }
    } finally routed.unpersist()
  }
}
