package graft.admin

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** alter_config_test.cc shapes: alters override defaults LWW, and the
  * effective cleanup policy changes housekeeping behavior. */
class AdminSpec extends SparkSpec {
  import spark.implicits._

  private def alters = Seq(
    (1L, "t", "cleanup.policy", "compact"),
    (2L, "t", "retention.ms", "1000"),
    (3L, "t", "cleanup.policy", "delete"))
    .toDF("seq", "topic", "key", "value")

  test("describe_configs overlays latest dynamic values on defaults") {
    val got = Admin.describeConfigs(spark, Seq("t"), alters)
      .select("key", "value", "source").as[(String, String, String)].collect().toMap2
    assert(got("cleanup.policy") === ("delete", "DYNAMIC_TOPIC_CONFIG")) // LWW: seq 3 wins
    assert(got("retention.ms") === ("1000", "DYNAMIC_TOPIC_CONFIG"))
    assert(got("compression.type") === ("producer", "DEFAULT_CONFIG"))
    assert(got.size === Admin.Defaults.size)
  }

  test("topic catalog: create/alter/delete/recreate lifecycle") {
    val log = Seq(
      (1L, "a", 1, "delete", false),
      (2L, "a", 8, "delete", false),   // alter
      (3L, "b", 2, "compact", false),
      (4L, "b", 2, "compact", true),   // delete
      (5L, "b", 4, "delete", false))   // recreate with new config
      .toDF("seq", "topic", "partitions", "cleanup_policy", "deleted")
    val got = Admin.listTopics(log)
      .select("topic", "partitions", "cleanup_policy")
      .as[(String, Int, String)].collect().toSet
    assert(got === Set(("a", 8, "delete"), ("b", 4, "delete")))
  }

  test("cleanup policy drives which housekeeping operators run") {
    val log = Seq(
      (0, 0L, "k1", "2024-01-01 00:00:00"),
      (0, 1L, "k1", "2024-01-03 00:00:00"),
      (0, 2L, "k2", "2024-01-01 00:00:00"))
      .toDF("partition", "offset", "key", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val now = lit("2024-01-04 00:00:00").cast("timestamp")
    val dayMs = 86400000L

    // delete-only: retention (2 days) drops rows older than 2024-01-02
    val deleted = Admin.applyCleanupPolicy(log, "delete", Seq("partition", "key"),
      col("ts"), now, 2 * dayMs)
    assert(deleted.select("offset").as[Long].collect().toSet === Set(1L))

    // compact-only: latest per key regardless of age
    val compacted = Admin.applyCleanupPolicy(log, "compact", Seq("partition", "key"),
      col("ts"), now, 2 * dayMs)
    assert(compacted.select("offset").as[Long].collect().toSet === Set(1L, 2L))

    // compact,delete: retention first, then LWW
    val both = Admin.applyCleanupPolicy(log, "compact,delete", Seq("partition", "key"),
      col("ts"), now, 2 * dayMs)
    assert(both.select("offset").as[Long].collect().toSet === Set(1L))
  }

  private implicit class Map2Ops(rows: Array[(String, String, String)]) {
    def toMap2: Map[String, (String, String)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
