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
 * `data/snapshot_id=N/p_hour=...` plus one row of snapshot metadata —
 * Spark's dynamic-partition writer IS the partitioning writer, so the
 * multiplexer reduces to a routed write per output table inside
 * `foreachBatch`. Readers see exactly the surviving-snapshot set
 * (semi-join against the snapshot table, pruned by partition directory),
 * and expiry = metadata delete + physical directory removal — the same
 * two-step the reference's expire_snapshots performs.
 */
object Datalake {

  /** Hourly partition value (iceberg `hour(timestamp)` transform,
    * table_definition.cc:57-66). */
  def hourPartition(ts: Column): Column = date_format(ts, "yyyy-MM-dd-HH")

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
  def commit(df: DataFrame, tsCol: Column, outPath: String): Long = {
    val spark = df.sparkSession
    val snap = nextSnapshotId(spark, outPath)
    val n = df.count()
    df.withColumn("p_hour", hourPartition(tsCol))
      .withColumn("snapshot_id", lit(snap))
      .write.mode("append").partitionBy("snapshot_id", "p_hour")
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
      basePath: String): Seq[(String, Long)] = {
    val routed = batch
      .withColumn("_output", routeCol)
      .withColumn("p_hour", hourPartition(tsCol))
      .cache()
    try {
      val outputs = routed.select("_output").distinct().collect().map(_.getString(0)).sorted
      outputs.toSeq.map { o =>
        val rows = routed.where(col("_output") === o).drop("_output")
        rows.write.mode("append").partitionBy("p_hour").parquet(s"$basePath/$o")
        o -> rows.count()
      }
    } finally routed.unpersist()
  }
}
