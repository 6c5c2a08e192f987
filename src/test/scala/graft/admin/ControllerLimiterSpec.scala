package graft.admin

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Controller log limiter: group mapping, reject-on-empty, refill. */
class ControllerLimiterSpec extends SparkSpec {
  import spark.implicits._

  private def cmds(rows: (Long, Long, String)*) =
    rows.toDF("seq", "ts_ms", "cmd_type")

  test("an empty bucket rejects without queueing; refill re-admits") {
    // rate 2/s, capacity 2: two immediate accepts, third rejected,
    // 500ms later one token has refilled → accepted again
    val log = cmds(
      (0L, 0L, "create_topic"), (1L, 0L, "delete_topic"),
      (2L, 0L, "create_partition"), (3L, 500L, "create_topic"))
    val got = ControllerLimiter.admit(log, col("seq"), col("ts_ms"),
        col("cmd_type"), rates = Map("topic_operations" -> 2L))
      .orderBy("seq").collect().map(r => (r.getLong(1), r.getBoolean(3)))
    assert(got.toSeq === Seq((0L, true), (1L, true), (2L, false), (3L, true)))
  }

  test("groups are independent; unmapped commands and disabled limiter ride free") {
    val log = cmds(
      (0L, 0L, "create_topic"), (1L, 0L, "create_user"),
      (2L, 0L, "metadata_snapshot"), (3L, 0L, "create_topic"))
    val strict = ControllerLimiter.admit(log, col("seq"), col("ts_ms"),
        col("cmd_type"),
        rates = Map("topic_operations" -> 1L, "acls_and_users_operations" -> 1L))
      .orderBy("seq").collect().map(r => (r.getString(0), r.getBoolean(3)))
    assert(strict.toSeq === Seq(
      ("topic_operations", true), ("acls_and_users_operations", true),
      ("unlimited", true), ("topic_operations", false)))
    val off = ControllerLimiter.admit(log, col("seq"), col("ts_ms"),
        col("cmd_type"), rates = Map("topic_operations" -> 1L), enabled = false)
      .collect().forall(_.getBoolean(3))
    assert(off)
  }
}
