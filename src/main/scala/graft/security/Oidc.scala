package graft.security

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8
import java.security.spec.RSAPublicKeySpec
import java.security.{KeyFactory, Signature}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SASL/OAUTHBEARER with OIDC token validation (reference
 * `security/oidc_authenticator.h:63` + `oidc_authenticator.cc`, JWT
 * parsing in `security/jwt.h`): the client presents a JWS compact
 * token inside the SASL initial response `n,,\x01auth=Bearer
 * <token>\x01\x01` (`oidc_authenticator.cc:177`); the broker
 * verifies the signature against the IdP's JWKS, then the claim
 * ladder in `oidc_authenticator.cc:36-62`: `iss` must equal the
 * configured issuer, `aud` must contain the configured audience,
 * `exp + skew >= now`, `nbf - skew <= now`; the principal derives
 * from the `sub` claim through the principal-mapping rule
 * (`oidc_principal_mapping_applicator.h`).
 *
 * Spark design: token structure (base64url header/payload, claim
 * extraction, the whole claim ladder) is pure codegen'd expressions —
 * `translate`+pad+`unbase64` for base64url, `get_json_object` for
 * claims, one nested `when` chain for the ladder, evaluated in claim
 * order so the FIRST failing check names the error exactly like the
 * reference's early returns. Only the signature check is a crypto
 * kernel (HMAC / RSA verify per row — same rationale as the SCRAM
 * PBKDF2 kernel: per-row crypto dwarfs row-boundary overhead, codegen
 * would buy nothing). The JWKS is a broadcast driver-side map
 * (config-plane-bounded, exactly the reference's in-memory verifier
 * state); `now` is an explicit parameter so any engine re-derives
 * every decision bit-identically.
 */
object Oidc {

  /** One JWKS entry. `alg` is HS256 (material = shared secret) or
    * RS256 (material = modulus big-endian unsigned bytes + public
    * exponent) — `security/jwt.h` supports the RSA family; HS256 is
    * the symmetric twin with the identical JWS layout. */
  final case class Jwk(kid: String, alg: String, material: Array[Byte],
      exponent: Array[Byte] = Array(1, 0, 1)) // 65537

  /** base64url decode of a string column: '-_' → '+/' plus restored
    * padding. `try_to_binary` (not `unbase64`) so garbage decodes to
    * NULL instead of failing the task — the ladder's `malformed` arm
    * owns that case. */
  def base64UrlDecode(c: Column): Column = {
    val std = translate(c, "-_", "+/")
    try_to_binary(concat(std, substring(lit("==="), lit(1),
      pmod(lit(4) - pmod(length(std), lit(4)), lit(4)))), lit("base64"))
  }

  /**
   * Validate a column of JWS compact tokens. Adds:
   *  - `error`: null | 'malformed' | 'unknown_kid' | 'invalid_signature'
   *    | 'invalid_iss' | 'invalid_aud' | 'expired' | 'not_yet_valid'
   *    (first failing check in the reference's ladder order)
   *  - `principal`: mapped `sub` when authenticated, else null
   *  - `sub`, `token_exp`: the audited identity + expiry
   *    (`oidc_authenticator.cc:196-198` audits name + uid;
   *    `credential_expires_in_ms` hangs reauth on exp)
   */
  def validate(tokens: DataFrame, tokenCol: Column, jwks: Seq[Jwk],
      issuer: String, audience: String, skewSeconds: Long, nowEpoch: Long,
      mappingRules: Seq[PrincipalMapping.Rule] = Nil): DataFrame = {
    require(jwks.nonEmpty, "JWKS must hold at least one key")
    val keyMap = jwks.map(k => k.kid -> k).toMap
    // signature kernel: verify sig over "header.payload" with the kid's
    // key; JWKS rides the closure (config-plane-bounded broadcast)
    val verifySig = udf { (signingInput: String, sig: Array[Byte],
        kid: String, alg: String) =>
      kid != null && sig != null && signingInput != null &&
        keyMap.get(kid).exists { k =>
          k.alg == alg && (k.alg match {
            case "HS256" =>
              val m = Mac.getInstance("HmacSHA256")
              m.init(new SecretKeySpec(k.material, "HmacSHA256"))
              java.security.MessageDigest.isEqual(
                m.doFinal(signingInput.getBytes(UTF_8)), sig)
            case "RS256" =>
              val pub = KeyFactory.getInstance("RSA").generatePublic(
                new RSAPublicKeySpec(new BigInteger(1, k.material),
                  new BigInteger(1, k.exponent)))
              val s = Signature.getInstance("SHA256withRSA")
              s.initVerify(pub)
              s.update(signingInput.getBytes(UTF_8))
              try s.verify(sig) catch { case _: Exception => false }
            case _ => false
          })
        }
    }

    val parts = split(tokenCol, "\\.")
    val df = tokens
      .withColumn("__nparts", size(parts))
      .withColumn("__header", decode(base64UrlDecode(try_element_at(parts, lit(1))), "UTF-8"))
      .withColumn("__payload", decode(base64UrlDecode(try_element_at(parts, lit(2))), "UTF-8"))
      .withColumn("__sig", base64UrlDecode(try_element_at(parts, lit(3))))
      .withColumn("__signing_input",
        concat(try_element_at(parts, lit(1)), lit("."), try_element_at(parts, lit(2))))
      .withColumn("__kid", get_json_object(col("__header"), "$.kid"))
      .withColumn("__alg", get_json_object(col("__header"), "$.alg"))
      .withColumn("__iss", get_json_object(col("__payload"), "$.iss"))
      .withColumn("__aud", get_json_object(col("__payload"), "$.aud"))
      .withColumn("sub", get_json_object(col("__payload"), "$.sub"))
      .withColumn("token_exp",
        get_json_object(col("__payload"), "$.exp").cast("long"))
      .withColumn("__nbf",
        get_json_object(col("__payload"), "$.nbf").cast("long"))
    // `aud` may be a JSON array or a bare string (RFC 7519 §4.1.3)
    val audOk = when(col("__aud").startsWith("["),
        array_contains(from_json(col("__aud"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), audience))
      .otherwise(col("__aud") === audience)
    // the ladder, in the reference's check order: structure → key →
    // signature → iss → aud → exp → nbf
    val error =
      when(col("__nparts") =!= 3 || col("__header").isNull ||
        col("__payload").isNull || col("__alg").isNull, "malformed")
      .when(col("__kid").isNull ||
        !col("__kid").isin(keyMap.keys.toSeq.map(lit(_)): _*), "unknown_kid")
      .when(!verifySig(col("__signing_input"), col("__sig"),
        col("__kid"), col("__alg")), "invalid_signature")
      .when(col("__iss").isNull || col("__iss") =!= issuer, "invalid_iss")
      .when(col("__aud").isNull || !audOk, "invalid_aud")
      .when(coalesce(col("token_exp"), lit(nowEpoch)) + skewSeconds < nowEpoch,
        "expired")
      .when(coalesce(col("__nbf"), lit(nowEpoch)) - skewSeconds > nowEpoch,
        "not_yet_valid")
      .otherwise(lit(null).cast("string"))
    val withErr = df.withColumn("error", error)
    val mapped = PrincipalMapping.mapPrincipal(withErr, col("sub"), mappingRules)
    mapped
      .withColumn("principal",
        when(col("error").isNull, col("principal")).otherwise(lit(null)))
      .drop("__nparts", "__header", "__payload", "__sig", "__signing_input",
        "__kid", "__alg", "__iss", "__aud", "__nbf")
  }

  /**
   * SASL/OAUTHBEARER exchange (`oidc_authenticator.cc:177-187`): strip
   * the `n,,\x01auth=Bearer <token>\x01\x01` gs2 frame, then
   * [[validate]]. A frame that does not parse is `malformed_sasl` and
   * never reaches token validation.
   */
  def saslAuthenticate(requests: DataFrame, authBytesCol: Column, jwks: Seq[Jwk],
      issuer: String, audience: String, skewSeconds: Long, nowEpoch: Long,
      mappingRules: Seq[PrincipalMapping.Rule] = Nil): DataFrame = {
    val header = "n,,\u0001auth=Bearer "
    val trailer = "\u0001\u0001"
    val s = decode(authBytesCol, "UTF-8")
    val framed = s.startsWith(header) && s.endsWith(trailer) &&
      (length(s) > lit(header.length + trailer.length))
    val toks = requests
      .withColumn("__auth_str", s)
      .withColumn("__token",
        when(framed, col("__auth_str").substr(
          lit(header.length + 1),
          length(col("__auth_str")) - lit(header.length + trailer.length))))
    val validated = validate(toks, col("__token"), jwks, issuer, audience,
      skewSeconds, nowEpoch, mappingRules)
    validated
      .withColumn("error",
        when(col("__token").isNull, "malformed_sasl").otherwise(col("error")))
      .withColumn("principal",
        when(col("error").isNull, col("principal")).otherwise(lit(null)))
      .drop("__auth_str", "__token")
  }
}
