package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.log.RecordLog

/**
 * S1 streaming produce path: continuous append with dense per-partition
 * offsets. Each micro-batch lands on the topic's current high
 * watermarks, exactly the reference's per-partition append
 * (`storage/disk_log_appender.h`, `produce.cc:176`): read hwm (one tiny
 * aggregate over the existing log's parquet footers), stamp
 * `hwm + local rank`, append. Offset assignment is serialized per
 * partition *across* micro-batches by the stream's own sequencing —
 * micro-batches commit in order — which is the same guarantee raft
 * replication gives the reference's appends.
 */
object Produce {

  private val hwmSchema = StructType(Seq(
    StructField("partition", IntegerType), StructField("hwm", LongType)))

  /** Current high watermarks of the topic table; empty when the table
    * doesn't exist yet (or holds no data files). */
  def highWatermarks(spark: SparkSession, outPath: String): DataFrame =
    try RecordLog.latestOffsets(spark.read.parquet(outPath))
      .select(col("partition"), col("hwm").cast("long"))
    catch { case _: org.apache.spark.sql.AnalysisException =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], hwmSchema)
    }

  /**
   * Deploy the continuous producer: every micro-batch of `input` is
   * offset-stamped on top of the live hwm and appended to `outPath`.
   *
   * The per-partition high watermark is kept in coordinator state across
   * micro-batches (the reference keeps it in the partition leader's
   * in-memory log state, `storage/disk_log_impl.h`): seeded ONCE from the
   * existing table at deploy, then advanced by each batch's per-partition
   * row count. Per-batch cost is one tiny aggregate over the batch — not
   * a metadata scan of the whole log, which grows with topic size.
   * Delivery matches the previous footer-rescan variant: micro-batches
   * commit in order, and a post-crash batch replay appends again either
   * way (at-least-once, as with any non-transactional sink).
   *
   * `timestampType` applies the topic's `message.timestamp.type` knob on
   * append (`model/timestamp.h:30`): under LogAppendTime every record of
   * a micro-batch gets `appendClock()` — the broker clock sampled once
   * per batch, the reference's batch-level append stamp — as its
   * `timestamp`; under CreateTime (default) records keep whatever the
   * producer supplied.
   */
  def appendStream(
      spark: SparkSession,
      input: Transforms.Input,
      outPath: String,
      checkpointDir: String,
      partitionCol: Column,
      arrivalCol: Column,
      timestampType: String = "CreateTime",
      appendClock: () => Column = () => current_timestamp()): StreamingQuery = {
    val state = scala.collection.mutable.Map.empty[Int, Long] // partition -> hwm
    var seeded = false
    input.stream(spark).writeStream
      .queryName(s"produce:$outPath")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        if (!seeded) {
          highWatermarks(s, outPath).collect()
            .foreach(r => state(r.getInt(0)) = r.getLong(1))
          seeded = true
        }
        val counts = batch.groupBy(partitionCol.cast("int").as("partition"))
          .agg(count(lit(1)).as("n")).collect()
        val hwm = state.toSeq.toDF("partition", "hwm")
        val stamped =
          if (timestampType == "LogAppendTime")
            batch.withColumn("timestamp", appendClock())
          else batch
        RecordLog.appendBatch(stamped, hwm, partitionCol, arrivalCol)
          .write.mode("append").parquet(outPath)
        counts.foreach(r =>
          state(r.getInt(0)) = state.getOrElse(r.getInt(0), 0L) + r.getLong(1))
      }
      .start()
  }
}
