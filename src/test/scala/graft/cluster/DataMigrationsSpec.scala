package graft.cluster

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.cluster.DataMigrations._

class DataMigrationsSpec extends SparkSpec {
  import spark.implicits._

  private val n: String = null

  private def log(rows: (Long, String, Long, String, Seq[String], Seq[String], String, Long)*) =
    rows.toDF("seq", "op", "id", "direction", "topics", "groups", "target_state", "ts_ms")

  test("transition ladder matches data_migration_table.cc exactly") {
    // every (from, to) pair the reference allows, and only those
    val allowed = for {
      (from, tos) <- Transitions.toSeq; to <- tos
    } yield (from, to)
    assert(allowed.toSet === Set(
      ("planned", "preparing"), ("preparing", "prepared"),
      ("preparing", "canceling"), ("prepared", "executing"),
      ("prepared", "canceling"), ("executing", "executed"),
      ("executing", "canceling"), ("executed", "cut_over"),
      ("executed", "canceling"), ("cut_over", "finished"),
      ("canceling", "cancelled")))
  }

  test("restrictionCol agrees with the scalar map for every combination") {
    val combos = for {
      d <- Seq("inbound", "outbound")
      s <- Transitions.keys.toSeq
    } yield (d, s)
    val got = combos.toDF("d", "s")
      .select(col("d"), col("s"), restrictionCol(col("d"), col("s")).as("r"))
      .as[(String, String, String)].collect()
    got.foreach { case (d, s, r) => assert(r === restrictionFor(d, s), s"($d,$s)") }
  }

  test("remove of a planned migration frees its resources") {
    val out = outcomes(log(
      (1L, "create", 1L, "inbound", Seq("t1"), Seq[String](), n, 10L),
      (2L, "create", 2L, "inbound", Seq("t1"), Seq[String](), n, 20L), // busy
      (3L, "remove", 1L, n, Seq[String](), Seq[String](), n, 30L),             // frees t1
      (4L, "create", 3L, "inbound", Seq("t1"), Seq[String](), n, 40L)),
      clusterTopics = Seq())
      .select("seq", "errc").as[(Long, String)].collect().toMap
    assert(out(2L) === "resource_is_being_migrated")
    assert(out(3L) === "success")
    assert(out(4L) === "success")
  }

  test("groups are validated after topics, first error wins") {
    val out = outcomes(log(
      (1L, "create", 1L, "inbound", Seq("g_t"), Seq("shared_g"), n, 10L),
      // busy group AND missing-cluster topic: inbound topic check passes
      // (t2 not in cluster, not busy), then the group check fires
      (2L, "create", 2L, "inbound", Seq("t2"), Seq("shared_g"), n, 20L)),
      clusterTopics = Seq())
      .select("seq", "errc").as[(Long, String)].collect().toMap
    assert(out(2L) === "resource_is_being_migrated")
  }

  test("write gate blocks read_only and fully_blocked topics only") {
    val res = Seq(
      ("topic", "ro_t", 1L, "outbound", "read_only"),
      ("topic", "fb_t", 2L, "inbound", "fully_blocked"),
      ("topic", "ml_t", 3L, "outbound", "metadata_locked"),
      ("group", "ro_t", 4L, "outbound", "read_only")) // group, not topic
      .toDF("kind", "name", "migration_id", "direction", "restriction")
    val recs = Seq(("ro_t", 1L), ("fb_t", 2L), ("ml_t", 3L), ("free_t", 4L))
      .toDF("t", "v")
    val got = writeGate(recs, col("t"), res)
      .select("topic", "admitted", "reject_reason")
      .as[(String, Boolean, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(got("ro_t") === (("ro_t", false, Some("read_only"))))
    assert(got("fb_t") === (("fb_t", false, Some("fully_blocked"))))
    assert(got("ml_t") === (("ml_t", true, None)))   // metadata lock ≠ write block
    assert(got("free_t") === (("free_t", true, None)))
  }

  test("write gate plan broadcasts the restriction map (no shuffle on the stream)") {
    val res = Seq(("topic", "ro_t", 1L, "outbound", "read_only"))
      .toDF("kind", "name", "migration_id", "direction", "restriction")
    val recs = Seq(("ro_t", 1L)).toDF("t", "v")
    val plan = writeGate(recs, col("t"), res)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
