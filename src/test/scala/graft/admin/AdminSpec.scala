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

  test("incremental alter: DELETE reverts an override to its static default") {
    val ops = Seq(
      (1L, "t", "retention.ms", "1000", "set"),
      (2L, "t", "retention.ms", null, "delete"),
      (3L, "t", "cleanup.policy", "compact", "set"))
      .toDF("seq", "topic", "key", "value", "op")
    val eff = Admin.describeConfigsIncremental(spark, Seq("t"), ops)
      .select("key", "value", "source").as[(String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(eff("retention.ms") === (("604800000", "DEFAULT_CONFIG")))
    assert(eff("cleanup.policy") === (("compact", "DYNAMIC_TOPIC_CONFIG")))
  }

  test("create_partitions: history keeps placement, new produce spans the growth") {
    val log = Seq((0, 0L), (0, 1L), (1, 0L)).toDF("partition", "offset")
    // keys 0..7 route mod 4 into partitions 0..3
    val batch = (0L until 8L).map(k => (k, k)).toDF("key", "arrival")
    val got = Admin.createPartitions(log, batch, 4, col("key"), col("arrival"))
      .groupBy("partition")
      .agg(count(lit(1)).as("n"), (max(col("offset")) + 1).as("hwm"))
      .as[(Int, Long, Long)].collect().map { case (p, n, h) => p -> ((n, h)) }.toMap
    // p0: 2 old + keys 0,4 continuing at hwm 2 -> hwm 4; p1: 1 old + 2 new;
    // p2/p3 fresh from offset 0
    assert(got === Map(0 -> ((4L, 4L)), 1 -> ((3L, 3L)), 2 -> ((2L, 2L)), 3 -> ((2L, 2L))))
  }

  test("describe_log_dirs sums payload bytes per partition") {
    val log = Seq((0, 0L, "aa"), (0, 1L, "bbb"), (1, 0L, "c"))
      .toDF("partition", "offset", "props")
    val got = Admin.describeLogDirs(log, length(col("props")).cast("long"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === Set((0, 5L, 2L, 2L), (1, 1L, 1L, 1L)))
  }

  test("find_coordinator routes by unsigned murmur2 mod partition count") {
    val got = Admin.coordinatorFor(Seq("redpanda", "user-42").toDF("g"), col("g"), 16)
      .as[(String, Int)].collect().toMap
    assert(got === Map("redpanda" -> 6, "user-42" -> 12))
  }

  test("client quotas: exact entity beats default, remove reverts") {
    val qlog = Seq[(Long, Option[String], String, Option[Double], String)](
      (1L, None, "producer_byte_rate", Some(100.0), "set"),
      (2L, Some("c1"), "producer_byte_rate", Some(200.0), "set"),
      (3L, Some("c2"), "producer_byte_rate", Some(300.0), "set"),
      (4L, Some("c2"), "producer_byte_rate", None, "remove"),
      (5L, Some("c1"), "fetch_rate", Some(7.0), "set"))
      .toDF("seq", "entity_name", "key", "value", "op")
    val clients = Seq("c1", "c2", "c3").toDF("client_id")
    val got = Admin.resolveClientQuotas(clients, qlog, Seq("producer_byte_rate", "fetch_rate"))
      .as[(String, String, Double, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("c1", "producer_byte_rate")) === ((200.0, "CLIENT")))
    assert(got(("c2", "producer_byte_rate")) === ((100.0, "DEFAULT"))) // removed override
    assert(got(("c3", "producer_byte_rate")) === ((100.0, "DEFAULT")))
    assert(got(("c1", "fetch_rate")) === ((7.0, "CLIENT")))
    assert(got(("c3", "fetch_rate")) === ((-1.0, "NONE")))
    assert(got.size === 6)
  }

  test("partition reassignments: applied, in-flight, cancelled, no-op complete") {
    val initial = Seq(("t", 0, "0,1,2"), ("t", 1, "0,1,2"), ("t", 2, "0,1,2"), ("t", 3, "0,1,2"))
      .toDF("topic", "partition", "replicas")
    val rlog = Seq[(Long, String, Int, String, Option[String])](
      (1L, "t", 0, "alter", Some("1,2,3")),
      (2L, "t", 0, "complete", None),
      (3L, "t", 0, "alter", Some("2,3,4")),
      (4L, "t", 1, "alter", Some("3,4,5")),
      (5L, "t", 2, "alter", Some("5,6,7")),
      (6L, "t", 2, "cancel", None),
      (7L, "t", 3, "complete", None))
      .toDF("seq", "topic", "partition", "op", "targets")
    val got = Admin.partitionReassignments(initial, rlog)
      .as[(String, Int, String, String, String, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(0) === (("1,2,3", "4", "1", true)))   // applied 1,2,3; pending 2,3,4
    assert(got(1) === (("0,1,2", "3,4,5", "0,1,2", true)))
    assert(got(2) === (("0,1,2", "", "", false)))    // cancelled
    assert(got(3) === (("0,1,2", "", "", false)))    // complete without alter: no-op
  }

  private implicit class Map2Ops(rows: Array[(String, String, String)]) {
    def toMap2: Map[String, (String, String)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}

/** A6 token-bucket throttle semantics (quota_manager.cc shapes). */
class QuotaSpec extends SparkSpec {
  import spark.implicits._

  private def run(reqs: Seq[(String, Long, Long, Long)], rate: Long = 2, burst: Long = 100) =
    Quota.tokenBucketThrottle(
        reqs.toDF("client_id", "ts_ms", "bytes", "seq"),
        col("client_id"), col("ts_ms"), col("bytes"), col("seq"), rate, burst)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5))).toMap

  test("bucket starts full, refills at rate capped at burst, throttles on overdraw") {
    val got = run(Seq(
      ("c1", 0L, 60L, 1L),    // 100-60 = 40, no throttle
      ("c1", 10L, 70L, 2L),   // refill 20 -> 60; 60-70 = -10 -> throttle ceil(10/2)=5
      ("c1", 1000L, 50L, 3L), // refill caps at burst 100; 100-50=50
      ("c2", 5L, 250L, 4L)))  // independent bucket: 100-250=-150 -> 75
    assert(got(("c1", 1L)) == ((40L, 0L)))
    assert(got(("c1", 2L)) == ((-10L, 5L)))
    assert(got(("c1", 3L)) == ((50L, 0L)))
    assert(got(("c2", 4L)) == ((-150L, 75L)))
  }

  test("equal timestamps break ties by seq; throttle ceiling is exact") {
    val got = run(Seq(
      ("c", 0L, 99L, 1L),  // 1 left
      ("c", 0L, 2L, 2L),   // same ts, no refill: -1 -> ceil(1/2)=1
      ("c", 2L, 0L, 3L)))  // refill 4 -> 3; 3-0=3
    assert(got(("c", 1L)) == ((1L, 0L)))
    assert(got(("c", 2L)) == ((-1L, 1L)))
    assert(got(("c", 3L)) == ((3L, 0L)))
  }
}

/** api_versions capability table (handlers.h:71-112 counterpart). */
class ApiVersionsSpec extends SparkSpec {
  test("api keys are unique, public-protocol numbered, and name real modules") {
    val rows = Admin.ApiVersions
    assert(rows.map(_._1).distinct.size == rows.size)
    assert(rows.map(_._1).forall(k => k >= 0 && k <= 66))
    // spot-check the public numbering of the core five
    val byName = rows.map(r => r._2 -> r._1).toMap
    assert(byName("produce") == 0 && byName("fetch") == 1 &&
      byName("list_offsets") == 2 && byName("metadata") == 3 &&
      byName("api_versions") == 18)
    assert(Admin.apiVersions(spark).count() == rows.size)
  }
}
