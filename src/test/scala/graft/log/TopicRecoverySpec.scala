package graft.log

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Topic recovery: retention-bounded newest→oldest staging walks
  * (`partition_recovery_manager.cc`). */
class TopicRecoverySpec extends SparkSpec {
  import spark.implicits._

  // one partition, four 10-offset segments of 100 bytes each; deltas
  // set only from the second segment on; max_ts missing on segment 0.
  private val manifest = Seq(
    (0, 0L, 9L, 100L, None: Option[Long], None: Option[String]),
    (0, 10L, 19L, 100L, Some(3L), Some("2024-01-05 00:00:00")),
    (0, 20L, 29L, 100L, Some(6L), Some("2024-01-15 00:00:00")),
    (0, 30L, 39L, 100L, Some(9L), Some("2024-01-25 00:00:00")))
    .toDF("partition", "base_offset", "committed_offset", "size_bytes",
      "delta_offset", "max_ts")
    .withColumn("max_ts", col("max_ts").cast("timestamp"))

  test("size bound stops where the running total would reach the cap") {
    val got = TopicRecovery.recover(manifest, "size", maxSizeBytes = 250L)
      .collect().head
    // newest→oldest: 100, 200 stage; 300 >= 250 stops → segments 20+, 30+
    assert(got.getAs[Long]("start_offset") === 20L)
    assert(got.getAs[Long]("n_segments") === 2L)
    assert(got.getAs[Long]("start_delta") === 6L)
    assert(got.getAs[Boolean]("clean_download"))
  }

  test("time bound stops at the first missing-or-older max timestamp") {
    val got = TopicRecovery.recover(manifest, "time",
      timeThreshold = lit("2024-01-10 00:00:00").cast("timestamp"))
      .collect().head
    // seg[10,19] is older than the threshold → only 20+ and 30+ stage
    assert(got.getAs[Long]("start_offset") === 20L)
    assert(got.getAs[Long]("n_segments") === 2L)
  }

  test("the none policy restores everything; unset deltas propagate from the oldest set") {
    val got = TopicRecovery.recover(manifest, "none").collect().head
    assert(got.getAs[Long]("start_offset") === 0L)
    assert(got.getAs[Long]("n_segments") === 4L)
    // oldest staged segment with a delta set is [10,19] → 3
    assert(got.getAs[Long]("start_delta") === 3L)
  }

  test("remote-fetch-enabled topics recover shallow — zero segments") {
    val got = TopicRecovery.recover(manifest, "size", maxSizeBytes = 250L,
      remoteFetchEnabled = true).collect().head
    assert(got.getAs[String]("policy") === "shallow")
    assert(got.getAs[Long]("n_segments") === 0L)
    assert(!got.getAs[Boolean]("clean_download"))
  }

  test("a manifest gap inside the staged range spoils clean_download") {
    val gappy = manifest.where(col("base_offset") =!= 20L)
    val got = TopicRecovery.recover(gappy, "none").collect().head
    assert(got.getAs[Long]("n_segments") === 3L)
    assert(!got.getAs[Boolean]("clean_download"))
  }
}
