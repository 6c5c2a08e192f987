package graft.security

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import graft.SparkSpec

/** SCRAM algorithm against the RFC 7677 SCRAM-SHA-256 golden exchange,
  * plus the credential-store and batch-auth semantics. */
class ScramSpec extends SparkSpec {

  private def b64(s: String) = Base64.getDecoder.decode(s)
  private def enc(b: Array[Byte]) = Base64.getEncoder.encodeToString(b)

  // RFC 7677 §3: user=user password=pencil i=4096
  private val Salt = b64("W22ZaJ0SNY7soEsUEjb6gQ==")
  private val AuthMessage =
    "n=user,r=rOprNGfwEbeRWgbNEkqO," +
      "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096," +
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"

  test("RFC 7677 golden vectors: client proof and server signature") {
    val salted = Scram.hi("pencil", Salt, 4096, Scram.Sha256)
    assert(enc(Scram.clientProof(salted, AuthMessage, Scram.Sha256)) ===
      "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(enc(Scram.serverSignature(Scram.serverKey(salted, Scram.Sha256),
      AuthMessage, Scram.Sha256)) ===
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("server verifies the golden proof with only the stored key; a corrupt proof fails") {
    val salted = Scram.hi("pencil", Salt, 4096, Scram.Sha256)
    val stored = Scram.storedKey(Scram.clientKey(salted, Scram.Sha256), Scram.Sha256)
    val proof = Scram.clientProof(salted, AuthMessage, Scram.Sha256)
    assert(Scram.verifyProof(stored, AuthMessage, proof, Scram.Sha256))
    val bad = proof.clone(); bad(0) = (bad(0) ^ 1).toByte
    assert(!Scram.verifyProof(stored, AuthMessage, bad, Scram.Sha256))
    // and the proof is bound to the auth message (nonce replay fails)
    assert(!Scram.verifyProof(stored, AuthMessage + "x", proof, Scram.Sha256))
  }

  test("SHA-512 round-trip: derived credential authenticates its own password only") {
    val (_, stored, _, _) =
      Scram.makeCredential("hunter2", "s".getBytes(UTF_8), 512, Scram.Sha512)
    val ok = Scram.storedKey(Scram.clientKey(
      Scram.hi("hunter2", "s".getBytes(UTF_8), 512, Scram.Sha512), Scram.Sha512), Scram.Sha512)
    assert(ok.sameElements(stored))
    val wrong = Scram.storedKey(Scram.clientKey(
      Scram.hi("hunter3", "s".getBytes(UTF_8), 512, Scram.Sha512), Scram.Sha512), Scram.Sha512)
    assert(!wrong.sameElements(stored))
  }

  test("handshake: enabled mechanisms get error 0, others UNSUPPORTED_SASL_MECHANISM") {
    import spark.implicits._
    val reqs = Seq(("c1", "SCRAM-SHA-256"), ("c2", "SCRAM-SHA-512"),
      ("c3", "PLAIN"), ("c4", "GSSAPI"))
      .toDF("client", "mechanism")
    val got = Scram.handshake(reqs, Seq("SCRAM-SHA-256", "SCRAM-SHA-512"))
      .select("client", "error_code", "enabled_mechanisms")
      .as[(String, Int, String)].collect().toSet
    val enabled = "SCRAM-SHA-256,SCRAM-SHA-512"
    assert(got === Set(("c1", 0, enabled), ("c2", 0, enabled),
      ("c3", Scram.UnsupportedMechanism, enabled),
      ("c4", Scram.UnsupportedMechanism, enabled)))
  }

  test("credential log compacts LWW per (user, mechanism); describe hides key material") {
    import spark.implicits._
    def cred(seq: Long, user: String, mech: Scram.Mechanism, pw: String, iters: Int) = {
      val (salt, stored, server, i) =
        Scram.makeCredential(pw, s"salt_$user".getBytes(UTF_8), iters, mech)
      (seq, user, mech.name, salt, stored, server, i, false)
    }
    // a delete is a tombstone marker — no key material to derive
    def tomb(seq: Long, user: String, mech: Scram.Mechanism) =
      (seq, user, mech.name, Array.empty[Byte], Array.empty[Byte], Array.empty[Byte], 0, true)
    val log = Seq(
      cred(1L, "alice", Scram.Sha256, "old-password", 1024),
      cred(2L, "bob", Scram.Sha256, "b0b", 1024),
      cred(3L, "alice", Scram.Sha256, "new-password", 2048), // rotate
      cred(4L, "carol", Scram.Sha512, "c", 1024),
      tomb(5L, "bob", Scram.Sha256))                          // delete_user
      .toDF("seq", "user", "mechanism", "salt", "stored_key", "server_key",
        "iterations", "deleted")
    val live = Scram.currentCredentials(log)
    val desc = Scram.describeCredentials(live).orderBy("user").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(desc === Array(("alice", "SCRAM-SHA-256", 2048), ("carol", "SCRAM-SHA-512", 1024)))
    assert(!Scram.describeCredentials(live).columns.exists(
      c => c.contains("key") || c.contains("salt")))
    // the rotated credential verifies the NEW password, not the old
    val auth = Scram.authenticate(
      Seq(("alice", "SCRAM-SHA-256", "new-password"),
        ("alice", "SCRAM-SHA-256", "old-password"),
        ("bob", "SCRAM-SHA-256", "b0b"))
        .toDF("user", "mechanism", "password"),
      live)
    val dec = auth.orderBy("user", "decision").collect().map(_.getString(2))
    assert(dec === Array("authenticated", "failed", "unknown_user"))
  }
}
