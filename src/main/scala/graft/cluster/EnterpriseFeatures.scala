package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Enterprise feature report (reference `features/enterprise_features.h`
 * — the 11 `license_required_feature`s — and `enterprise_features.cc`
 * `enterprise_feature_report`): each licensed capability is DETECTED
 * from cluster configuration, and running any of them without a valid
 * license is a violation the health report surfaces.
 *
 * Detection conditions (the table documented in the header):
 * `audit_enabled`, `cloud_storage_enabled`, continuous
 * partition/core balancing, GSSAPI / OAUTHBEARER in the advertised
 * SASL mechanisms, `schema_id_validation != none`, RBAC roles defined,
 * FIPS mode, Iceberg datalake mode, and leadership pinning.
 *
 * Spark shape: the config log pivots to one row (a bounded agg) and the
 * detection ladder is a single projection of codegen'd conditionals —
 * one row out per licensed feature.
 */
object EnterpriseFeatures {

  def report(configs: DataFrame, licenseValid: Boolean): DataFrame = {
    def cfg(key: String) = max(when(col("key") === key, col("value"))).as(key)
    val one = configs.agg(
      cfg("audit_enabled"), cfg("cloud_storage_enabled"),
      cfg("partition_autobalancing_mode"), cfg("core_balancing_continuous"),
      cfg("sasl_mechanisms"), cfg("http_authentication"),
      cfg("schema_id_validation"), cfg("rbac_roles_defined"),
      cfg("fips_mode"), cfg("iceberg_enabled"),
      cfg("default_leaders_preference"))
    def f(name: String, enabled: org.apache.spark.sql.Column) =
      struct(lit(name).as("feature"), coalesce(enabled, lit(false)).as("enabled"))
    one.select(explode(array(
        f("audit_logging", col("audit_enabled") === "true"),
        f("cloud_storage", col("cloud_storage_enabled") === "true"),
        f("partition_auto_balancing_continuous",
          col("partition_autobalancing_mode") === "continuous"),
        f("core_balancing_continuous", col("core_balancing_continuous") === "true"),
        f("gssapi", array_contains(split(col("sasl_mechanisms"), ","), "GSSAPI")),
        f("oidc", array_contains(split(col("sasl_mechanisms"), ","), "OAUTHBEARER") ||
          array_contains(split(col("http_authentication"), ","), "OIDC")),
        f("schema_id_validation",
          col("schema_id_validation").isNotNull && col("schema_id_validation") =!= "none"),
        f("rbac", coalesce(col("rbac_roles_defined").cast("long"), lit(0L)) > 0),
        f("fips", col("fips_mode").isNotNull && col("fips_mode") =!= "disabled"),
        f("datalake_iceberg", col("iceberg_enabled") === "true"),
        f("leadership_pinning",
          col("default_leaders_preference").isNotNull &&
            col("default_leaders_preference") =!= "none"))).as("r"))
      .select(col("r.feature").as("feature"), col("r.enabled").as("enabled"),
        (col("r.enabled") && lit(!licenseValid)).as("violation"))
  }
}
