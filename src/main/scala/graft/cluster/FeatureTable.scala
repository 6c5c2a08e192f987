package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Feature table activation (reference `features/feature_table.h`,
 * `feature_state.h:27-96`): each feature spec carries a required
 * logical cluster version, an availability policy, and a prepare
 * policy; features start `unavailable` and progress as the cluster
 * upgrades:
 *
 *  - a feature becomes AVAILABLE once every node reports a version at
 *    or above `require_version` (the min over node reports);
 *    `new_clusters_only` additionally requires the cluster's ORIGINAL
 *    version to be recent enough (upgraded-in-place clusters never get
 *    it);
 *  - an `always` feature then advances autonomously; `explicit_only`
 *    waits at `available` for an administrator's enable;
 *  - `requires_migration` features pass through `preparing` until the
 *    migration completes; `prepare_policy::always` goes straight to
 *    `active`;
 *  - an administrative disable moves any non-unavailable feature to
 *    `disabled_clean` / `disabled_preparing` / `disabled_active`,
 *    remembering where re-enable returns it.
 *
 * Spark shape: entirely declarative — the node min-version is one
 * aggregate, the last admin verdict and the migration set are two tiny
 * grouped tables, and the state ladder is one codegen'd CASE over the
 * broadcast-joined spec table. No fold, no window.
 */
object FeatureTable {

  val AvailablePolicies: Set[String] = Set("always", "explicit_only", "new_clusters_only")
  val PreparePolicies: Set[String] = Set("always", "requires_migration")

  /**
   * Resolve feature states. `specs`: `(name, require_version,
   * available_policy, prepare_policy)`; `nodeVersions`:
   * `(node_id, version)`; `commands`: `(seq, op ∈
   * enable|disable|complete_migration, feature)`.
   */
  def states(specs: DataFrame, nodeVersions: DataFrame, commands: DataFrame,
      originalVersion: Long): DataFrame = {
    val minV = nodeVersions.agg(min(col("version")).cast("long").as("__min_v"))
    val lastAdmin = commands.where(col("op").isin("enable", "disable"))
      .groupBy(col("feature").as("__f"))
      .agg(max_by(col("op"), col("seq")).as("__last_admin"))
    val migrated = commands.where(col("op") === "complete_migration")
      .select(col("feature").as("__m")).distinct()
      .withColumn("__migrated", lit(true))
    val eligible = col("__min_v") >= col("require_version") &&
      (col("available_policy") =!= "new_clusters_only" ||
        lit(originalVersion) >= col("require_version"))
    val prog =
      when(!eligible, "unavailable")
        .when(col("available_policy") === "explicit_only" && col("__last_admin").isNull,
          "available")
        .when(col("prepare_policy") === "requires_migration" && col("__migrated").isNull,
          "preparing")
        .otherwise("active")
    specs
      .crossJoin(broadcast(minV))
      .join(broadcast(lastAdmin), col("name") === col("__f"), "left")
      .join(broadcast(migrated), col("name") === col("__m"), "left")
      .withColumn("__prog", prog)
      .select(col("name"), col("require_version"), col("available_policy"),
        col("prepare_policy"),
        when(col("__last_admin") === "disable",
          when(col("__prog") === "active", "disabled_active")
            .when(col("__prog") === "preparing", "disabled_preparing")
            .otherwise("disabled_clean"))
          .otherwise(col("__prog")).as("state"))
  }

  /** Gate a request stream on a feature being active: the data-plane
    * check every feature-guarded handler performs. */
  def gate(records: DataFrame, featureCol: Column, statesDf: DataFrame): DataFrame = {
    val active = statesDf.where(col("state") === "active")
      .select(col("name").as("__feat"), lit(true).as("__on"))
    records.withColumn("__feat", featureCol)
      .join(broadcast(active), Seq("__feat"), "left")
      .withColumn("feature_active", coalesce(col("__on"), lit(false)))
      .withColumnRenamed("__feat", "feature").drop("__on")
  }
}
