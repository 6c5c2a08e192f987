package graft.functions

import java.nio.ByteBuffer

/**
 * Kafka request/response FRAMING — the layer above the record-batch
 * envelope ([[RecordBatchCodec]]): size-prefixed frames, the request
 * header, the response header, and the ApiVersions message as the
 * representative flexible-version serde (compact arrays, unsigned
 * varints, tagged fields).
 *
 * Layout per the reference's protocol stack:
 *  - request header (`kafka/server/protocol_utils.cc:23-96`
 *    `parse_v1_header`/`parse_header`): api_key int16 BE, api_version
 *    int16 BE, correlation int32 BE, client_id as a LEGACY nullable
 *    string (int16 length, -1 = null — KIP-482 proposed a compact
 *    string here but Kafka kept the legacy form; the reference cites
 *    apache/kafka#7479), then for FLEXIBLE api versions a tagged-field
 *    buffer (uvarint count, then per tag: uvarint key, uvarint size,
 *    bytes — `parse_tags`).
 *  - response frame (`protocol_utils.cc:98-120`
 *    `response_as_scattered`): int32 size (correlation + body), int32
 *    correlation, tags when the response header is flexible.
 *  - ApiVersions response (`protocol/schemata/api_versions_response
 *    .json`): v0 = error int16 + int32-count array of (key, min, max);
 *    v1+ adds throttle_time int32 AFTER the array; v3 is flexible —
 *    compact array (uvarint len+1), per-entry and trailing tag
 *    buffers — but its response HEADER stays v0 ("the length of the
 *    header must not change", the bootstrap-API quirk).
 *
 * Scalar JVM codecs (control-plane framing, not a data-path kernel);
 * the CORRECTNESS entry drives them through a DataFrame and pins the
 * byte-size laws against an independently-computed oracle.
 */
object WireHeaders {

  // --------------------------------------------------------- primitives

  /** Unsigned LEB128 (the protocol's UNSIGNED_VARINT — no zigzag). */
  def putUvarint(b: ByteBuffer, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"uvarint of negative $v")
    while ((v & ~0x7fL) != 0) { b.put(((v & 0x7f) | 0x80).toByte); v >>>= 7 }
    b.put(v.toByte)
  }

  def getUvarint(b: ByteBuffer): Long = {
    var u = 0L; var shift = 0; var cur = 0
    do {
      if (shift >= 70) throw new IllegalArgumentException("overlong uvarint")
      cur = b.get() & 0xff
      if (shift < 64) u |= (cur & 0x7fL) << shift
      shift += 7
    } while ((cur & 0x80) != 0)
    u
  }

  def uvarintSize(v0: Long): Int = {
    var v = v0; var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  /** One empty tagged-field buffer (uvarint 0). Non-empty tag sets are
    * (count, then per tag: uvarint key, uvarint size, raw bytes). */
  def putEmptyTags(b: ByteBuffer): Unit = putUvarint(b, 0L)

  /** Skip/collect a tag buffer; returns (tagKey -> bytes) in order. */
  def getTags(b: ByteBuffer): Seq[(Long, Array[Byte])] = {
    val n = getUvarint(b)
    (0L until n).map { _ =>
      val key = getUvarint(b)
      val size = getUvarint(b).toInt
      val bytes = new Array[Byte](size); b.get(bytes)
      (key, bytes)
    }
  }

  // ----------------------------------------------------- request header

  final case class RequestHeader(apiKey: Short, apiVersion: Short,
      correlationId: Int, clientId: Option[String],
      tags: Seq[(Long, Array[Byte])] = Nil)

  /** Encode a size-prefixed request frame: header + payload. `flexible`
    * appends the header tag buffer (KIP-482 request header v2). */
  def encodeRequestFrame(h: RequestHeader, payload: Array[Byte],
      flexible: Boolean): Array[Byte] = {
    val cid = h.clientId.map(_.getBytes("UTF-8"))
    val tagBytes = if (!flexible) 0
      else uvarintSize(h.tags.size.toLong) + h.tags.map { case (k, v) =>
        uvarintSize(k) + uvarintSize(v.length.toLong) + v.length
      }.sum
    val headerLen = 2 + 2 + 4 + 2 + cid.map(_.length).getOrElse(0) + tagBytes
    val b = ByteBuffer.allocate(4 + headerLen + payload.length)
    b.putInt(headerLen + payload.length)
    b.putShort(h.apiKey)
    b.putShort(h.apiVersion)
    b.putInt(h.correlationId)
    cid match {
      case None      => b.putShort(-1) // null client id (protocol_utils.cc:25,52)
      case Some(bts) => b.putShort(bts.length.toShort); b.put(bts)
    }
    if (flexible) {
      putUvarint(b, h.tags.size.toLong)
      h.tags.foreach { case (k, v) =>
        putUvarint(b, k); putUvarint(b, v.length.toLong); b.put(v)
      }
    }
    b.put(payload)
    b.array()
  }

  /** Decode a size-prefixed request frame → (header, payload bytes). */
  def decodeRequestFrame(bytes: Array[Byte], flexible: Boolean): (RequestHeader, Array[Byte]) = {
    val b = ByteBuffer.wrap(bytes)
    val size = b.getInt()
    require(size == bytes.length - 4, s"frame size $size != ${bytes.length - 4}")
    val key = b.getShort(); val ver = b.getShort(); val corr = b.getInt()
    val cidLen = b.getShort()
    val cid =
      if (cidLen == -1) None
      else if (cidLen < 0)
        throw new IllegalArgumentException(s"Invalid client_id size $cidLen")
      else { val a = new Array[Byte](cidLen); b.get(a); Some(new String(a, "UTF-8")) }
    val tags = if (flexible) getTags(b) else Nil
    val payload = new Array[Byte](b.remaining()); b.get(payload)
    (RequestHeader(key, ver, corr, cid, tags), payload)
  }

  // ---------------------------------------------------- response frame

  /** Response frame: int32 size (correlation + body), int32
    * correlation, then the body; `flexibleHeader` inserts the header
    * tag buffer (NOT used by ApiVersions — header stays v0). */
  def encodeResponseFrame(correlationId: Int, body: Array[Byte],
      flexibleHeader: Boolean = false): Array[Byte] = {
    val tagLen = if (flexibleHeader) 1 else 0
    val b = ByteBuffer.allocate(4 + 4 + tagLen + body.length)
    b.putInt(4 + tagLen + body.length)
    b.putInt(correlationId)
    if (flexibleHeader) putEmptyTags(b)
    b.put(body)
    b.array()
  }

  def decodeResponseFrame(bytes: Array[Byte],
      flexibleHeader: Boolean = false): (Int, Array[Byte]) = {
    val b = ByteBuffer.wrap(bytes)
    val size = b.getInt()
    require(size == bytes.length - 4, s"frame size $size != ${bytes.length - 4}")
    val corr = b.getInt()
    if (flexibleHeader) getTags(b)
    val body = new Array[Byte](b.remaining()); b.get(body)
    (corr, body)
  }

  // ------------------------------------------------ ApiVersions serde

  final case class ApiRange(apiKey: Short, minVersion: Short, maxVersion: Short)

  final case class ApiVersionsResponse(errorCode: Short, apis: Seq[ApiRange],
      throttleMs: Int)

  /** Body size in bytes for a given serde version — the law the
    * CORRECTNESS oracle recomputes independently. */
  def apiVersionsBodySize(version: Int, n: Int): Int = version match {
    case 0          => 2 + 4 + n * 6
    case 1 | 2      => 2 + 4 + n * 6 + 4
    case v if v >= 3 => 2 + uvarintSize(n + 1L) + n * 7 + 4 + 1
  }

  def encodeApiVersions(r: ApiVersionsResponse, version: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(apiVersionsBodySize(version, r.apis.size))
    b.putShort(r.errorCode)
    if (version >= 3) {
      // compact array: uvarint(len + 1); 0 encodes null
      putUvarint(b, r.apis.size + 1L)
      r.apis.foreach { a =>
        b.putShort(a.apiKey); b.putShort(a.minVersion); b.putShort(a.maxVersion)
        putEmptyTags(b) // per-entry tag buffer
      }
      b.putInt(r.throttleMs)
      putEmptyTags(b) // trailing body tags (SupportedFeatures etc. absent)
    } else {
      b.putInt(r.apis.size)
      r.apis.foreach { a =>
        b.putShort(a.apiKey); b.putShort(a.minVersion); b.putShort(a.maxVersion)
      }
      if (version >= 1) b.putInt(r.throttleMs)
    }
    b.array()
  }

  // ------------------------------------------------ ListOffsets serde

  /** Legacy (non-compact) string: int16 length + bytes. */
  private def putLegacyString(b: ByteBuffer, s: String): Unit = {
    val bts = s.getBytes("UTF-8")
    b.putShort(bts.length.toShort); b.put(bts)
  }
  private def getLegacyString(b: ByteBuffer): String = {
    val n = b.getShort()
    require(n >= 0, s"null string where non-null expected ($n)")
    val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8")
  }

  /** ListOffsets (api key 2) v5 — the reference supports 0-5 with NO
    * flexible versions (`schemata/list_offset_request.json`
    * validVersions 0-5, flexibleVersions none), so arrays are
    * int32-counted and strings legacy. Special request timestamps:
    * -2 earliest, -1 latest (`list_offsets.cc:112-133`). */
  object ListOffsets {
    val EarliestTimestamp: Long = -2L
    val LatestTimestamp: Long = -1L

    final case class Part(partitionIndex: Int, currentLeaderEpoch: Int,
        timestamp: Long)
    final case class Topic(name: String, partitions: Seq[Part])
    final case class Request(replicaId: Int, isolationLevel: Byte,
        topics: Seq[Topic])
    final case class RespPart(partitionIndex: Int, errorCode: Short,
        timestamp: Long, offset: Long, leaderEpoch: Int)
    final case class RespTopic(name: String, partitions: Seq[RespPart])
    final case class Response(throttleMs: Int, topics: Seq[RespTopic])

    def requestBodySize(r: Request): Int =
      4 + 1 + 4 + r.topics.map(t =>
        2 + t.name.getBytes("UTF-8").length + 4 + t.partitions.size * 16).sum

    def responseBodySize(r: Response): Int =
      4 + 4 + r.topics.map(t =>
        2 + t.name.getBytes("UTF-8").length + 4 + t.partitions.size * 26).sum

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(requestBodySize(r))
      b.putInt(r.replicaId)
      b.put(r.isolationLevel)
      b.putInt(r.topics.size)
      r.topics.foreach { t =>
        putLegacyString(b, t.name)
        b.putInt(t.partitions.size)
        t.partitions.foreach { p =>
          b.putInt(p.partitionIndex); b.putInt(p.currentLeaderEpoch)
          b.putLong(p.timestamp)
        }
      }
      b.array()
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val replica = b.getInt(); val iso = b.get()
      val topics = (0 until b.getInt()).map { _ =>
        val name = getLegacyString(b)
        Topic(name, (0 until b.getInt()).map(_ =>
          Part(b.getInt(), b.getInt(), b.getLong())))
      }
      Request(replica, iso, topics)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(responseBodySize(r))
      b.putInt(r.throttleMs)
      b.putInt(r.topics.size)
      r.topics.foreach { t =>
        putLegacyString(b, t.name)
        b.putInt(t.partitions.size)
        t.partitions.foreach { p =>
          b.putInt(p.partitionIndex); b.putShort(p.errorCode)
          b.putLong(p.timestamp); b.putLong(p.offset); b.putInt(p.leaderEpoch)
        }
      }
      b.array()
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until b.getInt()).map { _ =>
        val name = getLegacyString(b)
        RespTopic(name, (0 until b.getInt()).map(_ =>
          RespPart(b.getInt(), b.getShort(), b.getLong(), b.getLong(), b.getInt())))
      }
      Response(throttle, topics)
    }
  }

  def decodeApiVersions(bytes: Array[Byte], version: Int): ApiVersionsResponse = {
    val b = ByteBuffer.wrap(bytes)
    val err = b.getShort()
    if (version >= 3) {
      val n = getUvarint(b).toInt - 1
      require(n >= 0, "null api array")
      val apis = (0 until n).map { _ =>
        val a = ApiRange(b.getShort(), b.getShort(), b.getShort())
        getTags(b); a
      }
      val throttle = b.getInt()
      getTags(b)
      ApiVersionsResponse(err, apis, throttle)
    } else {
      val n = b.getInt()
      val apis = (0 until n).map(_ => ApiRange(b.getShort(), b.getShort(), b.getShort()))
      val throttle = if (version >= 1) b.getInt() else 0
      ApiVersionsResponse(err, apis, throttle)
    }
  }
}
