package graft.security

import java.util.Base64

import graft.SparkSpec
import graft.functions.WireHeaders
import graft.functions.WireHeaders.{SaslAuthenticate, SaslHandshake}

/** The SCRAM conversation over SaslHandshake/SaslAuthenticate frames:
  * RFC 7677's golden exchange replayed byte-for-byte through the wire
  * FSM, the failure ladder of scram_authenticator.cc, and the frame
  * serde itself. */
class SaslWireSpec extends SparkSpec {

  private val Rfc7677Salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
  private val CNonce = "rOprNGfwEbeRWgbNEkqO"
  private val SNonce = "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"

  private def rfcCred(password: String): SaslWire.Cred = {
    val (salt, stored, server, it) =
      Scram.makeCredential(password, Rfc7677Salt, 4096, Scram.Sha256)
    SaslWire.Cred(salt, stored, server, it)
  }

  test("RFC 7677 exchange authenticates over the wire with mutual auth") {
    val r = SaslWire.exchange(
      SaslWire.Attempt("rfc", "user", "SCRAM-SHA-256", "pencil",
        CNonce, SNonce, None),
      Some(rfcCred("pencil")))
    assert(r.fail_leg === "none")
    assert(r.error_code === 0)
    assert(r.iterations === 4096)
    assert(r.nonce_ok)
    assert(r.server_sig_ok) // client verified v= against its own keys
    assert(r.corr_ok)
  }

  test("wrong password fails at client-final with error 58 and the errc message") {
    val r = SaslWire.exchange(
      SaslWire.Attempt("bad", "user", "SCRAM-SHA-256", "not-pencil",
        CNonce, SNonce, None),
      Some(rfcCred("pencil")))
    assert(r.fail_leg === "server_final")
    assert(r.error_code === 58)
    assert(r.error_message === Some(SaslWire.InvalidCredsMsg))
    assert(!r.server_sig_ok)
    // the server-first leg succeeded, so the client saw the iterations
    assert(r.iterations === 4096 && r.nonce_ok)
  }

  test("unknown user, authzid mismatch, and low iterations all reject at client-first") {
    val unknown = SaslWire.exchange(
      SaslWire.Attempt("u", "ghost", "SCRAM-SHA-256", "x", CNonce, SNonce, None),
      None)
    assert(unknown.fail_leg === "server_first" && unknown.error_code === 58)

    val mismatch = SaslWire.exchange(
      SaslWire.Attempt("a", "user", "SCRAM-SHA-256", "pencil",
        CNonce, SNonce, Some("somebody-else")),
      Some(rfcCred("pencil")))
    assert(mismatch.fail_leg === "server_first" && mismatch.error_code === 58)

    // authzid EQUAL to the authcid is allowed (scram_authenticator.cc:42)
    val sameAuthzid = SaslWire.exchange(
      SaslWire.Attempt("s", "user", "SCRAM-SHA-256", "pencil",
        CNonce, SNonce, Some("user")),
      Some(rfcCred("pencil")))
    assert(sameAuthzid.fail_leg === "none" && sameAuthzid.server_sig_ok)

    val (salt, stored, server, it) =
      Scram.makeCredential("pencil", Rfc7677Salt, 1024, Scram.Sha256)
    val low = SaslWire.exchange(
      SaslWire.Attempt("l", "user", "SCRAM-SHA-256", "pencil",
        CNonce, SNonce, None),
      Some(SaslWire.Cred(salt, stored, server, it)))
    assert(low.fail_leg === "server_first" && low.error_code === 58)
  }

  test("unsupported mechanism stops at the handshake with 33 and the enabled list") {
    val r = SaslWire.exchange(
      SaslWire.Attempt("h", "user", "PLAIN-ISH", "x", CNonce, SNonce, None),
      None)
    assert(r.fail_leg === "handshake")
    assert(r.hs_error === 33 && r.error_code === 33)
    assert(r.a1_req_bytes === -1 && r.a2_resp_bytes === -1)
  }

  test("SaslHandshake v1 serde round-trips and rejects truncation") {
    val req = SaslHandshake.encodeRequest(SaslHandshake.Request("SCRAM-SHA-512"))
    assert(SaslHandshake.decodeRequest(req).mechanism === "SCRAM-SHA-512")
    val resp = SaslHandshake.encodeResponse(
      SaslHandshake.Response(33, SaslWire.Enabled))
    val back = SaslHandshake.decodeResponse(resp)
    assert(back.errorCode === 33 && back.mechanisms === SaslWire.Enabled)
    intercept[IllegalArgumentException] {
      SaslHandshake.decodeResponse(resp.take(resp.length - 3))
    }
  }

  test("SaslAuthenticate v2 serde round-trips null and non-null messages") {
    val req = SaslAuthenticate.encodeRequest(
      SaslAuthenticate.Request("n,,n=u,r=abc".getBytes("UTF-8")))
    assert(new String(SaslAuthenticate.decodeRequest(req).authBytes, "UTF-8")
      === "n,,n=u,r=abc")

    val ok = SaslAuthenticate.Response(0, None, "v=abc".getBytes("UTF-8"), 7L)
    val okBack = SaslAuthenticate.decodeResponse(SaslAuthenticate.encodeResponse(ok))
    assert(okBack.errorCode === 0 && okBack.errorMessage === None)
    assert(new String(okBack.authBytes, "UTF-8") === "v=abc")
    assert(okBack.sessionLifetimeMs === 7L)

    val err = SaslAuthenticate.Response(58, Some("nope"), Array.emptyByteArray, 0L)
    val errBack = SaslAuthenticate.decodeResponse(SaslAuthenticate.encodeResponse(err))
    assert(errBack.errorCode === 58 && errBack.errorMessage === Some("nope"))
    assert(errBack.authBytes.isEmpty)
  }

  test("distributed run: the seven oracle scenarios land their verdicts") {
    def salt(u: String): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest((u + "/salt").getBytes("UTF-8")).take(12)
    def cred(u: String, pw: String, mech: Scram.Mechanism, iters: Int) = {
      val (sl, stored, server, it) = Scram.makeCredential(pw, salt(u), iters, mech)
      (u, mech.name) -> SaslWire.Cred(sl, stored, server, it)
    }
    val creds = Map(
      cred("alice", "alice-secret", Scram.Sha256, 4096),
      cred("bob", "bob-secret", Scram.Sha512, 4096))
    val out = SaslWire.run(spark, Seq(
        SaslWire.Attempt("ok256", "alice", "SCRAM-SHA-256", "alice-secret",
          "cnalice0", "snalice0", None),
        SaslWire.Attempt("ok512", "bob", "SCRAM-SHA-512", "bob-secret",
          "cnbob000", "snbob000", None),
        SaslWire.Attempt("bad", "alice", "SCRAM-SHA-256", "wrong",
          "cnalice0", "snalice0", None)),
      creds)
      .collect().map(r => r.getAs[String]("scenario") ->
        (r.getAs[String]("fail_leg"), r.getAs[Boolean]("server_sig_ok"),
          r.getAs[Int]("a2_req_bytes"))).toMap
    assert(out("ok256") === (("none", true, 94)))
    // SHA-512 proof is 64 bytes -> 88 base64 chars -> 44 bytes larger
    assert(out("ok512") === (("none", true, 138)))
    assert(out("bad")._1 === "server_final" && !out("bad")._2)
  }
}
