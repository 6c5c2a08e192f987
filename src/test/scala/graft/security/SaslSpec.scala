package graft.security

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyPairGenerator, Signature}
import java.security.interfaces.RSAPublicKey
import java.util.Base64

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SASL/PLAIN parse-ladder + credential check, and OAUTHBEARER/OIDC
  * token validation including the RS256 JWKS path the entry's HS256
  * scenario does not exercise. */
class SaslSpec extends SparkSpec {
  import spark.implicits._

  private def b64u(b: Array[Byte]) =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private val creds = {
    val (salt, stored, server, i) = Scram.makeCredential(
      "hunter2", "s".getBytes(UTF_8), 256, Scram.Sha256)
    Seq(("alice", "SCRAM-SHA-256", salt, stored, server, i))
      .toDF("user", "mechanism", "salt", "stored_key", "server_key", "iterations")
  }

  private def plainBlob(s: String) = s.getBytes(UTF_8)

  test("PLAIN: ladder — authzid, missing separator, empty fields, unknown, wrong, ok") {
    val attempts = Seq(
      ("ok", plainBlob("\u0000alice\u0000hunter2")),
      ("wrong", plainBlob("\u0000alice\u0000letmein")),
      ("unknown", plainBlob("\u0000bob\u0000hunter2")),
      ("authzid", plainBlob("admin\u0000alice\u0000hunter2")),
      ("nosep", plainBlob("\u0000alicehunter2")),
      ("emptypw", plainBlob("\u0000alice\u0000")),
      ("emptyuser", plainBlob("\u0000\u0000hunter2")))
      .toDF("name", "auth_bytes")
    val got = Scram.authenticatePlain(attempts, creds)
      .select("name", "decision").as[(String, String)].collect().toMap
    assert(got("ok") === "authenticated")
    assert(got("wrong") === "failed")
    assert(got("unknown") === "unknown_user")
    assert(got("authzid") === "malformed")
    assert(got("nosep") === "malformed")
    assert(got("emptypw") === "malformed")
    assert(got("emptyuser") === "malformed")
  }

  test("OIDC: RS256 signature verifies against the JWKS public key; tampering fails") {
    val kp = {
      val g = KeyPairGenerator.getInstance("RSA")
      g.initialize(2048, new java.security.SecureRandom("fixed-seed".getBytes))
      g.generateKeyPair()
    }
    val pub = kp.getPublic.asInstanceOf[RSAPublicKey]
    val jwks = Seq(Oidc.Jwk("r1", "RS256",
      pub.getModulus.toByteArray.dropWhile(_ == 0),
      pub.getPublicExponent.toByteArray))
    val now = 1700000000L
    def token(sub: String, exp: Long): String = {
      val h = b64u("""{"alg":"RS256","kid":"r1"}""".getBytes(UTF_8))
      val p = b64u(
        s"""{"iss":"https://idp","aud":"svc","sub":"$sub","exp":$exp}""".getBytes(UTF_8))
      val s = Signature.getInstance("SHA256withRSA")
      s.initSign(kp.getPrivate)
      s.update(s"$h.$p".getBytes(UTF_8))
      s"$h.$p." + b64u(s.sign())
    }
    val good = token("u1", now + 100)
    val expired = token("u2", now - 7200)
    val tampered = good.dropRight(4) + "AAAA"
    val got = Oidc.validate(
        Seq(("g", good), ("e", expired), ("t", tampered)).toDF("name", "token"),
        col("token"), jwks, "https://idp", "svc", 60L, now)
      .select("name", "error", "principal")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("g") === ((None, Some("u1"))))
    assert(got("e") === ((Some("expired"), None)))
    assert(got("t") === ((Some("invalid_signature"), None)))
  }

  test("OIDC: SASL frame parsing feeds validation; a bad frame is malformed_sasl") {
    val jwks = Seq(Oidc.Jwk("h1", "HS256", "topsecret".getBytes(UTF_8)))
    val now = 1700000000L
    def hs(input: String): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec("topsecret".getBytes(UTF_8), "HmacSHA256"))
      m.doFinal(input.getBytes(UTF_8))
    }
    val h = b64u("""{"alg":"HS256","kid":"h1"}""".getBytes(UTF_8))
    val p = b64u(
      s"""{"iss":"https://idp","aud":["svc"],"sub":"carol","exp":${now + 50}}""".getBytes(UTF_8))
    val tok = s"$h.$p." + b64u(hs(s"$h.$p"))
    val frame = ("n,,\u0001auth=Bearer " + tok + "\u0001\u0001").getBytes(UTF_8)
    val garbage = "hello".getBytes(UTF_8)
    val got = Oidc.saslAuthenticate(
        Seq(("ok", frame), ("bad", garbage)).toDF("name", "auth_bytes"),
        col("auth_bytes"), jwks, "https://idp", "svc", 60L, now)
      .select("name", "error", "principal")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("ok") === ((None, Some("carol"))))
    assert(got("bad") === ((Some("malformed_sasl"), None)))
  }
}
