package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * GSSAPI (Kerberos) principal-to-local mapping (SURVEY §2.10) — the
 * `principal.to.local` rule engine of the reference's GSSAPI
 * authenticator: ordered first-match rules over parsed kerberos names
 * (`security/gssapi_rule.h:24`, `security/gssapi_principal_mapper.h:47`,
 * rule grammar `security/config_rcl.cc:30`).
 *
 * A rule `RULE:[n:format](match)s/from/to/g/L` applies iff the name has
 * exactly `n` components (primary [+ host], realm excluded); `format`
 * rebuilds a base string from `$0`=realm `$1`=primary `$2`=host; the
 * base must full-match `match` (empty = always); `s/from/to/` rewrites
 * the first occurrence (`/g` = every occurrence); `/L`/`/U` case-fold.
 * A result that is empty or non-simple (contains `/` or `@`,
 * `gssapi_rule.cc:135-147`) does not apply and the next rule is tried.
 * `DEFAULT` maps `primary` iff the name's realm equals the default
 * realm. No rule applying → no principal (auth fails).
 *
 * Spark design: the ordered rule list folds into ONE nested
 * `when(...).otherwise(...)` conditional — the same shape as
 * [[PrincipalMapping.mapPrincipal]] — so mapping a billion connection
 * principals is a single codegen'd projection: no UDF, no shuffle; rule
 * count is config-plane-bounded. First-occurrence substitution (which
 * Spark's global-only `regexp_replace` lacks) is expressed by extending
 * the pattern with a dot-all tail group `(?s)from(.*)` and re-emitting
 * the tail, so it stays a native regexp_replace.
 */
object Gssapi {

  sealed trait CaseChange
  case object Noop extends CaseChange
  case object MakeLower extends CaseChange
  case object MakeUpper extends CaseChange

  /** One parsed rule; `isDefault` = the DEFAULT rule. */
  final case class Rule(
      isDefault: Boolean,
      nComponents: Int = 0,
      format: String = "",
      matchRe: String = "",
      fromPattern: String = "",
      toPattern: String = "",
      repeat: Boolean = false,
      caseChange: CaseChange = Noop)

  /** A parsed kerberos name `primary[/host][@realm]`. */
  final case class Name(primary: String, host: String, realm: String)

  // `security/config_rcl.cc:30` rule_pattern, anchored.
  private val RuleRe =
    """(?:DEFAULT|RULE:\[(\d*):([^\]]*)](?:\(([^)]*)\))?(?:s/([^/]*)/([^/]*)/(g)?)?/?(L|U)?)""".r

  /** Parse the ordered rule list; invalid rules throw
    * (`validate_kerberos_mapping_rules`). Empty list = [DEFAULT]. */
  def parseRules(unparsed: Seq[String]): Seq[Rule] =
    if (unparsed.isEmpty) Seq(Rule(isDefault = true))
    else unparsed.map {
      case "DEFAULT" => Rule(isDefault = true)
      case r @ RuleRe(n, format, m, from, to, g, lu) if r.startsWith("RULE:") =>
        Rule(isDefault = false,
          nComponents = n.toInt,
          format = format,
          matchRe = Option(m).getOrElse(""),
          fromPattern = Option(from).getOrElse(""),
          toPattern = Option(to).getOrElse(""),
          repeat = g != null,
          caseChange = lu match {
            case "L" => MakeLower
            case "U" => MakeUpper
            case _   => Noop
          })
      case bad => throw new IllegalArgumentException(s"GSSAPI: Invalid rule: $bad")
    }

  // `gssapi_principal_mapper.cc:34` gssapi_name_pattern, full-match.
  private val NameRe = """([^/@]*)(?:/([^/@]*))?@([^/@]*)""".r

  /** Parse `primary[/host]@realm`; a name without `@` is primary-only;
    * malformed names (an `@` but no full match) parse to None. */
  def parseName(principal: String): Option[Name] = principal match {
    case NameRe(p, h, r) if p.nonEmpty =>
      Some(Name(p, Option(h).getOrElse(""), r))
    case _ if !principal.contains('@') && principal.nonEmpty =>
      Some(Name(principal, "", ""))
    case _ => None
  }

  /** `$N` placeholders in a format string, split into literal/index
    * tokens at rule-parse time (`gssapi_rule.cc:168` replace_parameters). */
  private def formatTokens(format: String): Seq[Either[String, Int]] = {
    val tok = """\$(\d+)""".r
    val out = Seq.newBuilder[Either[String, Int]]
    var last = 0
    for (m <- tok.findAllMatchIn(format)) {
      if (m.start > last) out += Left(format.substring(last, m.start))
      out += Right(m.group(1).toInt)
      last = m.end
    }
    if (last < format.length) out += Left(format.substring(last))
    out.result()
  }

  /** Count capturing groups of a java regex (unescaped `(` not `(?`). */
  private def groupCount(re: String): Int = {
    var i = 0; var n = 0
    while (i < re.length) {
      re.charAt(i) match {
        case '\\' => i += 1
        case '(' if i + 1 >= re.length || re.charAt(i + 1) != '?' => n += 1
        case _ =>
      }
      i += 1
    }
    n
  }

  /**
   * Apply the ordered rules to one name (control-plane path; mirrors
   * `gssapi_principal_mapper.cc:107` apply + `gssapi_rule.cc:51`).
   * A host-less, realm-less name short-circuits to its primary.
   */
  def applyOne(defaultRealm: String, rules: Seq[Rule], name: Name): Option[String] = {
    if (name.host.isEmpty && name.realm.isEmpty) return Some(name.primary)
    val params: Vector[String] =
      if (name.host.isEmpty) Vector(name.realm, name.primary)
      else Vector(name.realm, name.primary, name.host)
    rules.iterator.flatMap { r =>
      val result: Option[String] =
        if (r.isDefault) {
          if (params(0) == defaultRealm) Some(params(1)) else None
        } else if (params.size - 1 != r.nComponents) None
        else {
          val toks = formatTokens(r.format)
          if (toks.exists { case Right(i) => i >= params.size; case _ => false }) None
          else {
            val base = toks.map {
              case Left(s) => s
              case Right(i) => params(i)
            }.mkString
            if (r.matchRe.nonEmpty && !base.matches(r.matchRe)) None
            else if (r.fromPattern.isEmpty) Some(base)
            else Some(
              if (r.repeat) base.replaceAll(r.fromPattern, r.toPattern)
              else base.replaceFirst(r.fromPattern, r.toPattern))
          }
        }
      result
        .filter(s => s.nonEmpty && !s.exists(c => c == '/' || c == '@'))
        .map { s =>
          r.caseChange match {
            case MakeLower => s.toLowerCase(java.util.Locale.ROOT)
            case MakeUpper => s.toUpperCase(java.util.Locale.ROOT)
            case Noop      => s
          }
        }
    }.nextOption()
  }

  /**
   * The data-plane fold: map a principal column through the rules in
   * one codegen'd projection. Adds `principal` (the local name, null
   * when no rule applies — the reference refuses the connection).
   */
  def mapPrincipals(df: DataFrame, principalCol: Column,
      defaultRealm: String, rules: Seq[Rule]): DataFrame = {
    val full = """^([^/@]*)(?:/([^/@]*))?@([^/@]*)$"""
    val hasAt = principalCol.contains("@")
    val primary = when(hasAt, regexp_extract(principalCol, full, 1))
      .otherwise(principalCol)
    val host = when(hasAt, regexp_extract(principalCol, full, 2)).otherwise(lit(""))
    val realm = when(hasAt, regexp_extract(principalCol, full, 3)).otherwise(lit(""))
    // malformed = has '@' but primary extraction came back empty
    val valid = !hasAt || (principalCol.rlike(full) && length(primary) > 0)
    val nComp = when(length(host) > 0, 2).otherwise(1)

    def param(i: Int): Column = i match {
      case 0 => realm
      case 1 => primary
      case 2 => host
    }

    def candidate(r: Rule): (Column, Column) =
      if (r.isDefault) (realm === defaultRealm, primary)
      else {
        val toks = formatTokens(r.format)
        if (toks.exists { case Right(i) => i > r.nComponents; case _ => false })
          (lit(false), lit(null).cast("string"))
        else {
          val base = concat(toks.map {
            case Left(s) => lit(s)
            case Right(i) => param(i)
          }: _*)
          val matches = (nComp === r.nComponents) &&
            (if (r.matchRe.isEmpty) lit(true) else base.rlike(s"^(?:${r.matchRe})$$"))
          val rewritten =
            if (r.fromPattern.isEmpty) base
            else if (r.repeat) regexp_replace(base, r.fromPattern, r.toPattern)
            else {
              // first-occurrence replace: consume the dot-all tail as an
              // extra group after `from`'s own groups and re-emit it.
              val tail = groupCount(r.fromPattern) + 1
              regexp_replace(base, s"(?s)${r.fromPattern}(.*)",
                s"${r.toPattern}$$$tail")
            }
          (matches, rewritten)
        }
      }

    val mapped = rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      val (matches, rewritten0) = candidate(r)
      val rewritten = r.caseChange match {
        case MakeLower => lower(rewritten0)
        case MakeUpper => upper(rewritten0)
        case Noop      => rewritten0
      }
      val applies = matches && length(rewritten) > 0 && !rewritten.rlike("[/@]")
      when(applies, rewritten).otherwise(acc)
    }
    df.withColumn("principal",
      when(!valid, lit(null).cast("string"))
        .when(length(host) === 0 && length(realm) === 0, primary)
        .otherwise(mapped))
  }
}
