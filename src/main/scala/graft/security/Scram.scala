package graft.security

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Mac, SecretKeyFactory}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.log.Compaction

/**
 * SASL/SCRAM authentication (SURVEY §2.10: SASL handshake/authenticate,
 * alter/describe_user_scram_credentials).
 *
 * Reference: credentials are (salt, server_key, stored_key, iterations)
 * per user (`security/scram_credential.h:27-33`), derived by the RFC
 * 5802 algorithm — `Hi` = PBKDF2-HMAC, client/server keys, stored key =
 * H(client_key) (`security/scram_algorithm.h:236-246,280-297`); the
 * authenticator verifies the client proof by recovering the client key
 * from proof XOR signature and hashing it
 * (`scram_algorithm.h:264-270`, `scram_authenticator.cc`). Credentials
 * live in the controller log keyed by user.
 *
 * Spark design: the credential store is the same compacted command-log
 * shape as topic configs and ACLs — LWW per (user, mechanism) with
 * delete tombstones — and batch authentication is a broadcast join of
 * the (tiny) credential set against the attempt stream plus a per-row
 * crypto kernel. The kernel is a deterministic Scala closure rather
 * than a Catalyst expression: per-row PBKDF2 at hundreds-to-thousands
 * of iterations dwarfs row-boundary overhead, so codegen would buy
 * nothing measurable.
 */
object Scram {

  /** A SCRAM mechanism = the hash/HMAC pair and output width.
    * (`scram_algorithm.h:194` instantiates SHA-256 and SHA-512.) */
  final case class Mechanism(name: String, mac: String, hash: String, pbkdf2: String, keyBits: Int)
  val Sha256: Mechanism =
    Mechanism("SCRAM-SHA-256", "HmacSHA256", "SHA-256", "PBKDF2WithHmacSHA256", 256)
  val Sha512: Mechanism =
    Mechanism("SCRAM-SHA-512", "HmacSHA512", "SHA-512", "PBKDF2WithHmacSHA512", 512)
  def mechanism(name: String): Mechanism = name match {
    case "SCRAM-SHA-256" => Sha256
    case "SCRAM-SHA-512" => Sha512
    case other => throw new IllegalArgumentException(s"unknown SCRAM mechanism: $other")
  }

  /** RFC 5802 `Hi(str, salt, i)` — PBKDF2 with the mechanism's HMAC,
    * dkLen = hash length (`scram_algorithm.h:280`). */
  def hi(password: String, salt: Array[Byte], iterations: Int, mech: Mechanism): Array[Byte] =
    SecretKeyFactory.getInstance(mech.pbkdf2)
      .generateSecret(new PBEKeySpec(password.toCharArray, salt, iterations, mech.keyBits))
      .getEncoded

  def hmac(key: Array[Byte], msg: Array[Byte], mech: Mechanism): Array[Byte] = {
    val m = Mac.getInstance(mech.mac)
    m.init(new SecretKeySpec(key, mech.mac))
    m.doFinal(msg)
  }

  def digest(bytes: Array[Byte], mech: Mechanism): Array[Byte] =
    MessageDigest.getInstance(mech.hash).digest(bytes)

  def clientKey(salted: Array[Byte], mech: Mechanism): Array[Byte] =
    hmac(salted, "Client Key".getBytes(UTF_8), mech)
  def storedKey(clientK: Array[Byte], mech: Mechanism): Array[Byte] =
    digest(clientK, mech)
  def serverKey(salted: Array[Byte], mech: Mechanism): Array[Byte] =
    hmac(salted, "Server Key".getBytes(UTF_8), mech)

  /** Derive the stored credential from a password
    * (`scram_algorithm.h:236`: make_credentials). */
  def makeCredential(password: String, salt: Array[Byte], iterations: Int,
      mech: Mechanism): (Array[Byte], Array[Byte], Array[Byte], Int) = {
    val salted = hi(password, salt, iterations, mech)
    (salt, storedKey(clientKey(salted, mech), mech), serverKey(salted, mech), iterations)
  }

  /** Client side of the exchange: proof = ClientKey XOR
    * HMAC(StoredKey, AuthMessage) (RFC 5802 §3). */
  def clientProof(salted: Array[Byte], authMessage: String, mech: Mechanism): Array[Byte] = {
    val ck = clientKey(salted, mech)
    val sig = hmac(storedKey(ck, mech), authMessage.getBytes(UTF_8), mech)
    ck.zip(sig).map { case (a, b) => (a ^ b).toByte }
  }

  /** Server-side proof check (`scram_algorithm.h:264-270`): recover the
    * client key as proof XOR HMAC(StoredKey, AuthMessage); authentic iff
    * H(recovered) equals the stored key. The password itself never
    * reaches the server. */
  def verifyProof(stored: Array[Byte], authMessage: String, proof: Array[Byte],
      mech: Mechanism): Boolean = {
    val sig = hmac(stored, authMessage.getBytes(UTF_8), mech)
    val recovered = proof.zip(sig).map { case (a, b) => (a ^ b).toByte }
    MessageDigest.isEqual(digest(recovered, mech), stored)
  }

  /** server_signature = HMAC(ServerKey, AuthMessage) — what the client
    * checks to authenticate the server (mutual auth). */
  def serverSignature(serverK: Array[Byte], authMessage: String, mech: Mechanism): Array[Byte] =
    hmac(serverK, authMessage.getBytes(UTF_8), mech)

  // ---- credential store (alter/describe_user_scram_credentials) ----

  /**
   * Live credentials from the alter command log
   * (seq, user, mechanism, salt, stored_key, server_key, iterations,
   * deleted): last write per (user, mechanism) wins, tombstones drop the
   * credential — the controller-log storage shape of the reference.
   */
  def currentCredentials(credLog: DataFrame): DataFrame =
    Compaction.compact(credLog, Seq("user", "mechanism"), "seq")
      .where(!col("deleted"))
      .drop("deleted", "seq")

  /** describe_user_scram_credentials: mechanism + iteration count only —
    * salts and keys are never returned to clients. */
  def describeCredentials(creds: DataFrame): DataFrame =
    creds.select("user", "mechanism", "iterations")

  /** UNSUPPORTED_SASL_MECHANISM (Kafka error code 33). */
  val UnsupportedMechanism = 33

  /**
   * SASL handshake (`kafka/server/handlers/sasl_handshake.cc`): the
   * client names a mechanism; the broker answers error 0 when it is
   * enabled, else UNSUPPORTED_SASL_MECHANISM plus the enabled list (the
   * client retries with one of those). A batch of handshakes is one
   * narrow codegen'd projection — the enabled set folds to a literal.
   */
  def handshake(requests: DataFrame, enabled: Seq[String]): DataFrame =
    requests
      .withColumn("error_code",
        when(col("mechanism").isin(enabled: _*), lit(0))
          .otherwise(lit(UnsupportedMechanism)))
      .withColumn("enabled_mechanisms", lit(enabled.mkString(",")))

  /**
   * SASL/PLAIN (`security/plain_authenticator.h:19` /
   * `plain_authenticator.cc:26-100`): the client sends one wire blob
   * `[authzid] NUL authcid NUL password`; the broker rejects a present
   * authzid ("[authorization identity] not supported"), a missing
   * separator, an empty or over-255-byte username/password, an unknown
   * user — and otherwise validates the password against the user's
   * STORED SCRAM credential (PBKDF2 re-derivation, exactly
   * `validate_scram_credential`). The reference collapses every
   * failure to invalid_credentials on the wire; the detailed ladder is
   * surfaced here as `decision` (the wire view is
   * `decision != 'authenticated'`).
   *
   * Shape: the parse ladder is one codegen'd projection; the
   * credential store broadcasts (control-plane-bounded) and the only
   * per-row kernel is the same PBKDF2 check SCRAM uses. A user may
   * hold credentials for both mechanisms — the store is keyed by user
   * in the reference (`credential_store.h`), so any stored credential
   * validating the password authenticates; the deterministic fold is
   * max(verified) over the user's credentials.
   */
  def authenticatePlain(attempts: DataFrame, creds: DataFrame): DataFrame = {
    val verify = udf { (password: String, mechName: String, salt: Array[Byte],
        stored: Array[Byte], iterations: Int) =>
      password != null && salt != null && {
        val mech = mechanism(mechName)
        val derived = storedKey(clientKey(hi(password, salt, iterations, mech), mech), mech)
        MessageDigest.isEqual(derived, stored)
      }
    }
    val attemptCols = attempts.columns.filterNot(_ == "auth_bytes")
    val s = decode(col("auth_bytes"), "UTF-8")
    val sep = "\u0000"
    val parsed = attempts
      .withColumn("__s", s)
      // authzid present (does not start with NUL) or no second NUL
      .withColumn("__wellformed",
        col("__s").startsWith(sep) &&
          instr(col("__s").substr(lit(2), length(col("__s"))), sep) > 0)
      .withColumn("__rest", col("__s").substr(lit(2), length(col("__s"))))
      .withColumn("__user", substring_index(col("__rest"), sep, 1))
      .withColumn("__pass",
        col("__rest").substr(length(col("__user")) + 2, length(col("__rest"))))
    val c = broadcast(creds.select(
      col("user").as("c_user"), col("mechanism").as("c_mech"),
      col("salt").as("c_salt"), col("stored_key").as("c_stored"),
      col("iterations").as("c_iterations")))
    val joined = parsed.join(c, col("__user") === col("c_user"), "left")
      .withColumn("__ok", verify(col("__pass"), col("c_mech"), col("c_salt"),
        col("c_stored"), col("c_iterations")))
    // fold multi-mechanism users back to one row per attempt
    joined
      .groupBy((attemptCols.map(col) ++ Seq(col("__wellformed"), col("__user"),
        col("__pass"))): _*)
      .agg(max(col("c_user").isNotNull).as("__known"),
        max(coalesce(col("__ok"), lit(false))).as("__verified"))
      .withColumn("decision",
        when(!col("__wellformed"), "malformed")
          .when(length(col("__user")) === 0 || length(col("__user")) > 255 ||
            length(col("__pass")) === 0 || length(col("__pass")) > 255, "malformed")
          .when(!col("__known"), "unknown_user")
          .when(col("__verified"), "authenticated")
          .otherwise("failed"))
      .select(attemptCols.map(col).toIndexedSeq :+ col("decision"): _*)
  }

  /**
   * Batch-authenticate password attempts against the live credential
   * set: per attempt (user, mechanism, password) recompute the salted
   * password with the STORED salt/iterations and compare the derived
   * stored key — the same check the SASL exchange establishes, minus
   * the nonce plumbing (covered by the proof-level spec tests).
   * Decisions: 'authenticated' | 'failed' | 'unknown_user'.
   */
  def authenticate(attempts: DataFrame, creds: DataFrame): DataFrame = {
    val verify = udf { (password: String, mechName: String, salt: Array[Byte],
        stored: Array[Byte], iterations: Int) =>
      // null-safe: a null password is a failed attempt, not a job failure
      password != null && {
        val mech = mechanism(mechName)
        val derived = storedKey(clientKey(hi(password, salt, iterations, mech), mech), mech)
        MessageDigest.isEqual(derived, stored)
      }
    }
    val c = broadcast(creds.select(
      col("user").as("c_user"), col("mechanism").as("c_mech"),
      col("salt").as("c_salt"), col("stored_key").as("c_stored"),
      col("iterations").as("c_iterations")))
    attempts.join(c,
        col("c_user") === col("user") && col("c_mech") === col("mechanism"), "left")
      .withColumn("decision",
        when(col("c_user").isNull, "unknown_user")
          .when(verify(col("password"), col("mechanism"), col("c_salt"),
            col("c_stored"), col("c_iterations")), "authenticated")
          .otherwise("failed"))
      .select(attempts.columns.map(col).toIndexedSeq :+ col("decision"): _*)
      .drop("password")
  }
}
