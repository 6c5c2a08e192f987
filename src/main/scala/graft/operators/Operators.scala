package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Remaining reference operators that are plain declarative plans:
 * usage metering (A5), Iceberg partition transforms (D4), record
 * translation (D2), and the WASM-transform semantic corpus (U1/U3).
 */
object Operators {

  /**
   * A5 usage metering: fixed-width tumbling windows of bytes, aligned to
   * the epoch (`kafka/server/usage_aggregator.h:29-38,83`). Textbook
   * map-side-combinable aggregation: one shuffle on (window, group).
   */
  def usageWindows(df: DataFrame, tsCol: Column, groupCol: Column, bytesCol: Column): DataFrame =
    df.groupBy(date_trunc("hour", tsCol).as("window_start"), groupCol.as("grp"))
      .agg(sum(bytesCol).as("bytes"), count(lit(1)).as("records"))

  /**
   * D4 Iceberg partition transforms (`iceberg/transform.h:16-37`):
   * identity / bucket / truncate / year / month / day / hour. The
   * reference's default topic materialization partitions by
   * hour(timestamp) (`datalake/table_definition.cc:57-66`).
   */
  def icebergTransforms(df: DataFrame, tsCol: Column, idCol: Column, strCol: Column, nBuckets: Int): DataFrame =
    df.select(
      year(tsCol).as("t_year"),
      month(tsCol).as("t_month"),
      dayofmonth(tsCol).as("t_day"),
      hour(tsCol).as("t_hour"),
      pmod(idCol, lit(nBuckets)).cast("int").as("t_bucket"),
      substring(strCol, 1, 3).as("t_truncate"))

  /**
   * U3 transform corpus, from the reference SDK examples
   * (`src/transform-sdk/go/transform/example_*_test.go`):
   * mirror = identity projection; regexp filter; transcode; validation
   * with dead-letter routing. Each is a per-record flatMap in the
   * reference (`transform/transform_processor.h:78`); in Spark they are
   * narrow (no-shuffle) plans.
   */
  def transformMirror(df: DataFrame): DataFrame = df

  def transformRegexFilter(df: DataFrame, valueCol: Column, pattern: String): DataFrame =
    df.where(valueCol.rlike(pattern))

  def transformTranscode(df: DataFrame, out: Column): DataFrame =
    df.select(out.as("value"))

  /** Validation: tag rows valid/dead-letter; caller routes on `route`. */
  def transformValidate(df: DataFrame, isValid: Column): DataFrame =
    df.withColumn("route", when(isValid, lit("output")).otherwise(lit("dead_letter")))
}
