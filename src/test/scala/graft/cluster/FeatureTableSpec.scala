package graft.cluster

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FeatureTableSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(
    ("f_always", 5L, "always", "always"),
    ("f_explicit", 5L, "explicit_only", "always"),
    ("f_migr", 5L, "always", "requires_migration"),
    ("f_new", 5L, "new_clusters_only", "always"),
    ("f_future", 99L, "always", "always"))
    .toDF("name", "require_version", "available_policy", "prepare_policy")

  private def run(cmds: Seq[(Long, String, String)], original: Long = 5L) = {
    val nodes = Seq((0, 6L), (1, 7L)).toDF("node_id", "version")
    FeatureTable.states(specs, nodes,
      cmds.toDF("seq", "op", "feature"), original)
      .select("name", "state").as[(String, String)].collect().toMap
  }

  test("the ladder: min node version gates, policies branch, migration holds") {
    val st = run(Nil)
    assert(st === Map(
      "f_always" -> "active",
      "f_explicit" -> "available",     // waits for the admin
      "f_migr" -> "preparing",         // waits for the migration
      "f_new" -> "active",             // original 5 >= 5
      "f_future" -> "unavailable"))
  }

  test("upgraded-in-place clusters never get new_clusters_only features") {
    assert(run(Nil, original = 3L)("f_new") === "unavailable")
  }

  test("disable remembers the return state; the last admin verdict wins") {
    val st = run(Seq((1L, "disable", "f_always"), (2L, "disable", "f_migr"),
      (3L, "disable", "f_explicit"), (4L, "enable", "f_explicit")))
    assert(st("f_always") === "disabled_active")
    assert(st("f_migr") === "disabled_preparing")
    assert(st("f_explicit") === "active") // re-enabled
  }

  test("the gate broadcasts the active set over the record stream") {
    val st = FeatureTable.states(specs,
      Seq((0, 6L)).toDF("node_id", "version"),
      Seq.empty[(Long, String, String)].toDF("seq", "op", "feature"), 5L)
    val recs = Seq(("f_always", 1L), ("f_migr", 2L), ("nope", 3L)).toDF("f", "v")
    val out = FeatureTable.gate(recs, col("f"), st)
      .select("feature", "feature_active").as[(String, Boolean)].collect().toMap
    assert(out === Map("f_always" -> true, "f_migr" -> false, "nope" -> false))
    val p = FeatureTable.gate(recs, col("f"), st).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }
}
