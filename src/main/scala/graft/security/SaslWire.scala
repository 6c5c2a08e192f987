package graft.security

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.WireHeaders
import graft.functions.WireHeaders.{SaslAuthenticate, SaslHandshake}

/**
 * The full SASL/SCRAM conversation OVER THE WIRE: SaslHandshake v1
 * picks the mechanism, then each SCRAM message rides its own
 * SaslAuthenticate v2 frame, and the server side is a byte-driven FSM
 * holding exactly the reference authenticator's state
 * (`security/scram_authenticator.cc`: handle_client_first looks up the
 * credential, rejects unknown users / mismatched authzid / iterations
 * below the mechanism minimum as invalid_credentials, and replies the
 * server-first message; handle_client_final recovers the client key
 * from proof XOR signature and compares the stored key,
 * `scram_algorithm.h:264-270`). Failures reach the wire as
 * SASL_AUTHENTICATION_FAILED (58) with the errc message, exactly the
 * fill of `sasl_authenticate_handler::handle`
 * (`kafka/server/server.cc:470-541`); the handshake answers
 * UNSUPPORTED_SASL_MECHANISM (33) plus the enabled list
 * (`kafka/server/server.cc:683-743`).
 *
 * The one divergence from the reference: the server nonce is injected
 * by the caller instead of `gen_alphanum_string(nonce_size)` — the
 * exchange is otherwise byte-identical and deterministic, which is what
 * lets the oracle pin every frame size as a closed-form law.
 *
 * Shape: one row per authentication attempt, the whole 3-to-6-leg
 * conversation runs inside the row (it is a single connection's
 * control-plane dialogue, never data-plane), credentials ride a
 * broadcast map. Scales as O(attempts) with zero shuffles.
 */
object SaslWire {

  /** Mechanisms the broker enables when `sasl_mechanisms` contains
    * SCRAM (`server.cc:702-707`). */
  val Enabled: Seq[String] = Seq("SCRAM-SHA-256", "SCRAM-SHA-512")

  /** `errc::invalid_credentials` rendered through the handler's
    * "SASL authentication failed: {}" format (`server.cc:534-537`,
    * `security/errc.h`). */
  val InvalidCredsMsg = "SASL authentication failed: security: Invalid credentials"

  /** Minimum PBKDF2 iterations (`scram_algorithm.h:357`: both
    * instantiations pin 4096). */
  val MinIterations = 4096

  final case class Attempt(scenario: String, user: String, mechanism: String,
      password: String, cnonce: String, snonce: String,
      authzid: Option[String])

  final case class Cred(salt: Array[Byte], storedKey: Array[Byte],
      serverKey: Array[Byte], iterations: Int)

  final case class Result(scenario: String, user: String, mechanism: String,
      hs_error: Int, fail_leg: String, error_code: Int,
      error_message: Option[String], iterations: Int, nonce_ok: Boolean,
      server_sig_ok: Boolean, hs_req_bytes: Int, hs_resp_bytes: Int,
      a1_req_bytes: Int, a1_resp_bytes: Int, a2_req_bytes: Int,
      a2_resp_bytes: Int, corr_ok: Boolean)

  private def b64(a: Array[Byte]): String = Base64.getEncoder.encodeToString(a)

  /** RFC 5802 saslname escaping ('=' first so the escapes it inserts
    * are not re-escaped). */
  private def saslName(s: String): String =
    s.replace("=", "=3D").replace(",", "=2C")
  private def unSaslName(s: String): String =
    s.replace("=2C", ",").replace("=3D", "=")

  /** Split "k1=v1,k2=v2,..." keeping '=' inside values intact. */
  private def attrs(msg: String): Seq[(String, String)] =
    msg.split(",", -1).toSeq.filter(_.nonEmpty).map { part =>
      val i = part.indexOf('=')
      require(i == 1, s"malformed SCRAM attribute: $part")
      (part.substring(0, 1), part.substring(2))
    }

  /** Server-side state across the two SCRAM legs — what the reference
    * authenticator keeps between handle_client_first and
    * handle_client_final (_client_first, _server_first, _credential). */
  private final case class ServerState(clientFirstBare: String,
      serverFirst: String, expectedNonce: String, cred: Cred,
      mech: Scram.Mechanism)

  /** One wire conversation. Every byte the "client" and "server" see
    * goes through the real frame + message serde in both directions. */
  def exchange(a: Attempt, credLookup: Option[Cred]): Result = {
    var corr = 700
    var corrOk = true

    def requestLeg[T](apiKey: Short, version: Short, flexible: Boolean,
        payload: Array[Byte]): (WireHeaders.RequestHeader, Array[Byte], Int) = {
      corr += 1
      val frame = WireHeaders.encodeRequestFrame(
        WireHeaders.RequestHeader(apiKey, version, corr, Some("graft")),
        payload, flexible)
      val (hdr, body) = WireHeaders.decodeRequestFrame(frame, flexible)
      (hdr, body, frame.length)
    }
    def responseLeg(body: Array[Byte], flexibleHeader: Boolean): (Array[Byte], Int) = {
      val frame = WireHeaders.encodeResponseFrame(corr, body, flexibleHeader)
      val (corrBack, respBody) = WireHeaders.decodeResponseFrame(frame, flexibleHeader)
      corrOk &&= corrBack == corr
      (respBody, frame.length)
    }

    // ---- leg 0: SaslHandshake v1 (non-flexible)
    val (_, hsBody, hsReq) = requestLeg(17, 1, flexible = false,
      SaslHandshake.encodeRequest(SaslHandshake.Request(a.mechanism)))
    val hsMech = SaslHandshake.decodeRequest(hsBody).mechanism
    val hsErr: Short = if (Enabled.contains(hsMech)) 0 else 33
    val (hsRespBody, hsResp) = responseLeg(
      SaslHandshake.encodeResponse(SaslHandshake.Response(hsErr, Enabled)),
      flexibleHeader = false)
    val hsDecoded = SaslHandshake.decodeResponse(hsRespBody)

    if (hsDecoded.errorCode != 0)
      return Result(a.scenario, a.user, a.mechanism, hsDecoded.errorCode,
        "handshake", hsDecoded.errorCode, None, -1, nonce_ok = false,
        server_sig_ok = false, hsReq, hsResp, -1, -1, -1, -1, corrOk)

    val mech = Scram.mechanism(a.mechanism)

    // ---- client-first message
    val gs2 = a.authzid match {
      case None    => "n,,"
      case Some(z) => s"n,a=${saslName(z)},"
    }
    val clientFirstBare = s"n=${saslName(a.user)},r=${a.cnonce}"
    val clientFirst = gs2 + clientFirstBare

    // ---- leg 1: client-first over SaslAuthenticate v2
    val (_, a1Body, a1Req) = requestLeg(36, 2, flexible = true,
      SaslAuthenticate.encodeRequest(
        SaslAuthenticate.Request(clientFirst.getBytes(UTF_8))))

    // server: handle_client_first (scram_authenticator.cc:22-67)
    val received1 = new String(SaslAuthenticate.decodeRequest(a1Body).authBytes, UTF_8)
    val (state: Option[ServerState], resp1: SaslAuthenticate.Response) = {
      require(received1.startsWith("n,"), "channel binding not supported")
      val afterCb = received1.drop(2)
      val (authzidPart, rest) =
        if (afterCb.startsWith("a=")) {
          val i = afterCb.indexOf(',')
          (Some(unSaslName(afterCb.substring(2, i))), afterCb.substring(i + 1))
        } else {
          require(afterCb.startsWith(","), "malformed gs2 header")
          (None, afterCb.drop(1))
        }
      val kv = attrs(rest).toMap
      val authid = unSaslName(kv("n"))
      val clientNonce = kv("r")
      val invalid = SaslAuthenticate.Response(58, Some(InvalidCredsMsg),
        Array.emptyByteArray, 0L)
      credLookup match {
        case None => (None, invalid)
        case Some(_) if authzidPart.exists(_ != authid) => (None, invalid)
        case Some(c) if c.iterations < MinIterations => (None, invalid)
        case Some(c) =>
          val serverFirst =
            s"r=$clientNonce${a.snonce},s=${b64(c.salt)},i=${c.iterations}"
          (Some(ServerState(rest, serverFirst, clientNonce + a.snonce, c, mech)),
            SaslAuthenticate.Response(0, None, serverFirst.getBytes(UTF_8), 0L))
      }
    }
    val (resp1Body, a1Resp) = responseLeg(
      SaslAuthenticate.encodeResponse(resp1), flexibleHeader = true)
    val got1 = SaslAuthenticate.decodeResponse(resp1Body)

    if (got1.errorCode != 0 || state.isEmpty)
      return Result(a.scenario, a.user, a.mechanism, 0, "server_first",
        got1.errorCode, got1.errorMessage, -1, nonce_ok = false,
        server_sig_ok = false, hsReq, hsResp, a1Req, a1Resp, -1, -1, corrOk)

    // client: parse server-first, derive keys from its own password
    val sfAttrs = attrs(new String(got1.authBytes, UTF_8)).toMap
    val fullNonce = sfAttrs("r")
    val nonceOk = fullNonce.startsWith(a.cnonce) && fullNonce.length > a.cnonce.length
    val clientSalt = Base64.getDecoder.decode(sfAttrs("s"))
    val clientIters = sfAttrs("i").toInt
    val serverFirstAsSeen = new String(got1.authBytes, UTF_8)

    val clientFinalNoProof = s"c=${b64(gs2.getBytes(UTF_8))},r=$fullNonce"
    val clientAuthMessage =
      s"$clientFirstBare,$serverFirstAsSeen,$clientFinalNoProof"
    val salted = Scram.hi(a.password, clientSalt, clientIters, mech)
    val proof = Scram.clientProof(salted, clientAuthMessage, mech)
    val clientFinal = s"$clientFinalNoProof,p=${b64(proof)}"

    // ---- leg 2: client-final over SaslAuthenticate v2
    val (_, a2Body, a2Req) = requestLeg(36, 2, flexible = true,
      SaslAuthenticate.encodeRequest(
        SaslAuthenticate.Request(clientFinal.getBytes(UTF_8))))

    // server: handle_client_final (scram_authenticator.cc:69-103)
    val st = state.get
    val received2 = new String(SaslAuthenticate.decodeRequest(a2Body).authBytes, UTF_8)
    val fin = attrs(received2).toMap
    val finNoProof = received2.substring(0, received2.lastIndexOf(",p="))
    val serverAuthMessage = s"${st.clientFirstBare},${st.serverFirst},$finNoProof"
    val proofOk = fin("r") == st.expectedNonce &&
      Scram.verifyProof(st.cred.storedKey, serverAuthMessage,
        Base64.getDecoder.decode(fin("p")), st.mech)
    val resp2 =
      if (proofOk) {
        val sig = Scram.serverSignature(st.cred.serverKey, serverAuthMessage, st.mech)
        SaslAuthenticate.Response(0, None, s"v=${b64(sig)}".getBytes(UTF_8), 0L)
      } else
        SaslAuthenticate.Response(58, Some(InvalidCredsMsg),
          Array.emptyByteArray, 0L)
    val (resp2Body, a2Resp) = responseLeg(
      SaslAuthenticate.encodeResponse(resp2), flexibleHeader = true)
    val got2 = SaslAuthenticate.decodeResponse(resp2Body)

    if (got2.errorCode != 0)
      return Result(a.scenario, a.user, a.mechanism, 0, "server_final",
        got2.errorCode, got2.errorMessage, clientIters, nonceOk,
        server_sig_ok = false, hsReq, hsResp, a1Req, a1Resp, a2Req, a2Resp,
        corrOk)

    // client: mutual auth — verify v= against its own server key
    val vAttrs = attrs(new String(got2.authBytes, UTF_8)).toMap
    val expectedSig =
      b64(Scram.serverSignature(Scram.serverKey(salted, mech), clientAuthMessage, mech))
    Result(a.scenario, a.user, a.mechanism, 0, "none", 0, None, clientIters,
      nonceOk, server_sig_ok = vAttrs("v") == expectedSig, hsReq, hsResp,
      a1Req, a1Resp, a2Req, a2Resp, corrOk)
  }

  /** Run a batch of attempts distributed: credentials broadcast (the
    * store is control-plane-sized), one conversation per row. */
  def run(spark: SparkSession, attempts: Seq[Attempt],
      creds: Map[(String, String), Cred]): DataFrame = {
    import spark.implicits._
    val credsB = spark.sparkContext.broadcast(creds)
    attempts.toDS()
      .map(a => exchange(a, credsB.value.get((a.user, a.mechanism))))
      .toDF()
  }
}
