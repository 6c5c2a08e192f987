package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Principal-mapping rules (reference `security/mtls_rule.h` /
 * `gssapi_principal_mapper.h` — the public Kafka
 * `ssl.principal.mapping.rules` / kerberos `principal.to.local`
 * semantics): an ORDERED rule list; the first rule whose pattern
 * matches the presented identity (an mTLS cert DN or a kerberos
 * principal) rewrites it to the local principal, optionally
 * case-folded; with no match the identity passes through verbatim (the
 * DEFAULT rule).
 *
 * The whole ordered list folds into ONE nested conditional expression —
 * `when(rlike).otherwise(...)` chained right-to-left — so mapping a
 * billion connection identities is a single codegen'd projection: no
 * UDF, no shuffle, rule count is config-plane-bounded.
 */
object PrincipalMapping {

  /** One mapping rule: java-regex `pattern` (match is anchored by the
    * pattern itself), `replacement` with `$1`-style groups, optional
    * case fold of the result. */
  final case class Rule(pattern: String, replacement: String,
      toLower: Boolean = false, toUpper: Boolean = false)

  /** Fold the ordered rules over `idCol` into a `principal` column;
    * unmatched identities keep `idCol` as-is. */
  def mapPrincipal(df: DataFrame, idCol: Column, rules: Seq[Rule]): DataFrame = {
    val mapped = rules.foldRight(idCol) { (r, acc) =>
      val rewritten0 = regexp_replace(idCol, r.pattern, r.replacement)
      val rewritten =
        if (r.toLower) lower(rewritten0)
        else if (r.toUpper) upper(rewritten0)
        else rewritten0
      when(idCol.rlike(r.pattern), rewritten).otherwise(acc)
    }
    df.withColumn("principal", mapped)
  }
}
