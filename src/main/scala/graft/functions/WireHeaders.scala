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

  /** Bounds-checked legacy reads: a truncated or corrupt frame reports
    * a clean length error instead of BufferUnderflow/NegativeArraySize
    * from blind allocation (the adapter-style gate the record-batch
    * codec applies before parsing). */
  def readLegacyString(b: ByteBuffer): String = {
    val n = b.getShort()
    require(n >= 0 && n <= b.remaining(), s"legacy string length $n exceeds frame")
    val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8")
  }
  def readLegacyBytes(b: ByteBuffer, n: Int): Array[Byte] = {
    require(n >= 0 && n <= b.remaining(), s"legacy bytes length $n exceeds frame")
    val a = new Array[Byte](n); b.get(a); a
  }

  /** One empty tagged-field buffer (uvarint 0). Non-empty tag sets are
    * (count, then per tag: uvarint key, uvarint size, raw bytes). */
  def putEmptyTags(b: ByteBuffer): Unit = putUvarint(b, 0L)

  /** Skip/collect a tag buffer; returns (tagKey -> bytes) in order. */
  def getTags(b: ByteBuffer): Seq[(Long, Array[Byte])] = {
    val n = getUvarint(b)
    // a tag costs >= 2 bytes (key + size uvarints), so the count is
    // bounded by the remaining frame — a corrupt count must raise a
    // clean length error, not drive a huge range / allocation
    require(n >= 0 && n <= b.remaining() / 2,
      s"tagged-field count $n exceeds frame")
    (0L until n).map { _ =>
      val key = getUvarint(b)
      val size = getUvarint(b).toInt
      require(size >= 0 && size <= b.remaining(),
        s"tagged-field size $size exceeds frame")
      val bytes = new Array[Byte](size); b.get(bytes)
      (key, bytes)
    }
  }

  // ---------------------------------------------- flexible (compact) helpers

  /** COMPACT_STRING: uvarint(len + 1) then bytes (KIP-482). */
  def putCompactString(b: ByteBuffer, s: String): Unit = {
    val bts = s.getBytes("UTF-8")
    putUvarint(b, bts.length + 1L); b.put(bts)
  }
  def getCompactString(b: ByteBuffer): String = {
    val n = getUvarint(b)
    require(n > 0, "null compact string where non-null expected")
    require(n - 1 <= b.remaining(), s"compact string length ${n - 1} exceeds frame")
    val a = new Array[Byte](n.toInt - 1); b.get(a); new String(a, "UTF-8")
  }
  /** COMPACT_NULLABLE_STRING: uvarint 0 = null. */
  def putCompactNullableString(b: ByteBuffer, s: Option[String]): Unit =
    s match {
      case None => putUvarint(b, 0L)
      case Some(v) => putCompactString(b, v)
    }
  def getCompactNullableString(b: ByteBuffer): Option[String] = {
    val n = getUvarint(b)
    if (n == 0) None
    else {
      require(n - 1 <= b.remaining(), s"compact string length ${n - 1} exceeds frame")
      val a = new Array[Byte](n.toInt - 1); b.get(a)
      Some(new String(a, "UTF-8"))
    }
  }
  /** COMPACT_ARRAY length prefix: uvarint(n + 1). */
  def putCompactArrayLen(b: ByteBuffer, n: Int): Unit = putUvarint(b, n + 1L)
  def getCompactArrayLen(b: ByteBuffer): Int = {
    val n = getUvarint(b)
    require(n > 0, "null compact array where non-null expected")
    // every element costs >= 1 byte: reject lengths a truncated or
    // corrupt frame cannot hold instead of allocating on them
    require(n - 1 <= b.remaining(), s"compact array length ${n - 1} exceeds frame")
    n.toInt - 1
  }
  def compactStringSize(s: String): Int = {
    val n = s.getBytes("UTF-8").length; uvarintSize(n + 1L) + n
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

  // --------------------------------------------------- Produce v8 serde

  /** Produce (api key 0) v8 — the reference pins 0-8 with NO flexible
    * versions (`schemata/produce_request.json`): legacy int16 strings,
    * int32 arrays, and partition `records` as NULLABLE_BYTES carrying
    * raw record-batch v2 envelopes (the kafka_batch_adapter input).
    * v8 adds per-batch `record_errors` + `error_message` to the
    * response. */
  object Produce {
    final case class Request(transactionalId: Option[String], acks: Short,
        timeoutMs: Int,
        topics: Seq[(String, Seq[(Int, Option[Array[Byte]])])])
    final case class RespPart(partitionIndex: Int, errorCode: Short,
        baseOffset: Long, logAppendTimeMs: Long, logStartOffset: Long,
        recordErrors: Seq[(Int, Option[String])], errorMessage: Option[String])
    final case class Response(responses: Seq[(String, Seq[RespPart])],
        throttleMs: Int)

    private def putLegacyNullable(b: ByteBuffer, s: Option[String]): Unit =
      s match {
        case None => b.putShort(-1)
        case Some(v) =>
          val bts = v.getBytes("UTF-8")
          b.putShort(bts.length.toShort); b.put(bts)
      }
    private def getLegacyNullable(b: ByteBuffer): Option[String] = {
      val n = b.getShort()
      if (n < 0) None
      else { val a = new Array[Byte](n); b.get(a); Some(new String(a, "UTF-8")) }
    }

    def encodeRequest(r: Request): Array[Byte] = {
      val size = 2 + r.transactionalId.map(_.getBytes("UTF-8").length).getOrElse(0) +
        2 + 4 + 4 + r.topics.map { case (n, ps) =>
          2 + n.getBytes("UTF-8").length + 4 +
            ps.map { case (_, recs) => 4 + 4 + recs.map(_.length).getOrElse(0) }.sum
        }.sum
      val b = ByteBuffer.allocate(size)
      putLegacyNullable(b, r.transactionalId)
      b.putShort(r.acks); b.putInt(r.timeoutMs)
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        val nb = name.getBytes("UTF-8")
        b.putShort(nb.length.toShort); b.put(nb)
        b.putInt(parts.size)
        parts.foreach { case (idx, recs) =>
          b.putInt(idx)
          recs match {
            case None => b.putInt(-1)
            case Some(bytes) => b.putInt(bytes.length); b.put(bytes)
          }
        }
      }
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val tid = getLegacyNullable(b)
      val acks = b.getShort(); val timeout = b.getInt()
      val topics = (0 until b.getInt()).map { _ =>
        val name = readLegacyString(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt()
          val len = b.getInt()
          val recs = if (len < 0) None
            else Some(readLegacyBytes(b, len))
          (idx, recs)
        }
        (name, parts: Seq[(Int, Option[Array[Byte]])])
      }
      Request(tid, acks, timeout, topics)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val size = 4 + r.responses.map { case (n, ps) =>
        2 + n.getBytes("UTF-8").length + 4 + ps.map { p =>
          34 + 4 + p.recordErrors.map { case (_, m) =>
            4 + 2 + m.map(_.getBytes("UTF-8").length).getOrElse(0) }.sum +
            2 + p.errorMessage.map(_.getBytes("UTF-8").length).getOrElse(0)
        }.sum
      }.sum + 4
      val b = ByteBuffer.allocate(size)
      b.putInt(r.responses.size)
      r.responses.foreach { case (name, parts) =>
        val nb = name.getBytes("UTF-8")
        b.putShort(nb.length.toShort); b.put(nb)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putShort(p.errorCode)
          b.putLong(p.baseOffset); b.putLong(p.logAppendTimeMs)
          b.putLong(p.logStartOffset)
          b.putInt(p.recordErrors.size)
          p.recordErrors.foreach { case (i, m) =>
            b.putInt(i); putLegacyNullable(b, m)
          }
          putLegacyNullable(b, p.errorMessage)
        }
      }
      b.putInt(r.throttleMs)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val responses = (0 until b.getInt()).map { _ =>
        val name = readLegacyString(b)
        val parts = (0 until b.getInt()).map { _ =>
          RespPart(b.getInt(), b.getShort(), b.getLong(), b.getLong(),
            b.getLong(),
            (0 until b.getInt()).map(_ => (b.getInt(), getLegacyNullable(b))),
            getLegacyNullable(b))
        }
        (name, parts: Seq[RespPart])
      }
      Response(responses, b.getInt())
    }
  }

  // ----------------------------------------------------- Fetch v11 serde

  /** Fetch (api key 1) v11 — the reference pins 0-11, never flexible
    * (`schemata/fetch_request.json`): v7+ incremental-session fields,
    * v11 rack_id + preferred_read_replica; partition `records` are
    * NULLABLE_BYTES of raw record-batch v2 envelopes (the log served
    * back as stored bytes). */
  object Fetch {
    final case class ReqPart(partitionIndex: Int, currentLeaderEpoch: Int,
        fetchOffset: Long, logStartOffset: Long, maxBytes: Int)
    final case class Request(replicaId: Int, maxWaitMs: Int, minBytes: Int,
        maxBytes: Int, isolationLevel: Byte, sessionId: Int, sessionEpoch: Int,
        topics: Seq[(String, Seq[ReqPart])],
        forgotten: Seq[(String, Seq[Int])], rackId: String)
    final case class Aborted(producerId: Long, firstOffset: Long)
    final case class RespPart(partitionIndex: Int, errorCode: Short,
        highWatermark: Long, lastStableOffset: Long, logStartOffset: Long,
        aborted: Option[Seq[Aborted]], preferredReadReplica: Int,
        records: Option[Array[Byte]])
    final case class Response(throttleMs: Int, errorCode: Short,
        sessionId: Int, topics: Seq[(String, Seq[RespPart])])

    private def legacyStr(s: String): Array[Byte] = s.getBytes("UTF-8")

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + legacyStr(r.rackId).length +
        r.topics.map { case (n, ps) => 8 + legacyStr(n).length + ps.size * 28 }.sum +
        r.forgotten.map { case (n, ps) => 8 + legacyStr(n).length + 4 * ps.size }.sum)
      b.putInt(r.replicaId); b.putInt(r.maxWaitMs); b.putInt(r.minBytes)
      b.putInt(r.maxBytes); b.put(r.isolationLevel)
      b.putInt(r.sessionId); b.putInt(r.sessionEpoch)
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        val nb = legacyStr(name)
        b.putShort(nb.length.toShort); b.put(nb)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putInt(p.currentLeaderEpoch)
          b.putLong(p.fetchOffset); b.putLong(p.logStartOffset)
          b.putInt(p.maxBytes)
        }
      }
      b.putInt(r.forgotten.size)
      r.forgotten.foreach { case (name, ps) =>
        val nb = legacyStr(name)
        b.putShort(nb.length.toShort); b.put(nb)
        b.putInt(ps.size); ps.foreach(b.putInt)
      }
      val rb = legacyStr(r.rackId)
      b.putShort(rb.length.toShort); b.put(rb)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      def str(): String = {
        readLegacyString(b)
      }
      val (rep, wait, minB, maxB) = (b.getInt(), b.getInt(), b.getInt(), b.getInt())
      val iso = b.get(); val sid = b.getInt(); val sep = b.getInt()
      val topics = (0 until b.getInt()).map { _ =>
        val name = str()
        (name, (0 until b.getInt()).map(_ => ReqPart(b.getInt(), b.getInt(),
          b.getLong(), b.getLong(), b.getInt())): Seq[ReqPart])
      }
      val forgotten = (0 until b.getInt()).map { _ =>
        val name = str()
        (name, (0 until b.getInt()).map(_ => b.getInt()): Seq[Int])
      }
      Request(rep, wait, minB, maxB, iso, sid, sep, topics, forgotten, str())
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + r.topics.map { case (n, ps) =>
        8 + legacyStr(n).length + ps.map(p => 48 +
          p.aborted.map(_.size * 16).getOrElse(0) +
          p.records.map(_.length).getOrElse(0)).sum }.sum)
      b.putInt(r.throttleMs); b.putShort(r.errorCode); b.putInt(r.sessionId)
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        val nb = legacyStr(name)
        b.putShort(nb.length.toShort); b.put(nb)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putShort(p.errorCode)
          b.putLong(p.highWatermark); b.putLong(p.lastStableOffset)
          b.putLong(p.logStartOffset)
          p.aborted match {
            case None => b.putInt(-1)
            case Some(as) =>
              b.putInt(as.size)
              as.foreach(a => { b.putLong(a.producerId); b.putLong(a.firstOffset) })
          }
          b.putInt(p.preferredReadReplica)
          p.records match {
            case None => b.putInt(-1)
            case Some(bytes) => b.putInt(bytes.length); b.put(bytes)
          }
        }
      }
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort(); val sid = b.getInt()
      val topics = (0 until b.getInt()).map { _ =>
        val name = readLegacyString(b)
        val parts = (0 until b.getInt()).map { _ =>
          val (idx, perr) = (b.getInt(), b.getShort())
          val (hwm, lso, lstart) = (b.getLong(), b.getLong(), b.getLong())
          val nAborted = b.getInt()
          val aborted = if (nAborted < 0) None
            else Some((0 until nAborted).map(_ => Aborted(b.getLong(), b.getLong())): Seq[Aborted])
          val prr = b.getInt()
          val recLen = b.getInt()
          val recs = if (recLen < 0) None
            else Some(readLegacyBytes(b, recLen))
          RespPart(idx, perr, hwm, lso, lstart, aborted, prr, recs)
        }
        (name, parts: Seq[RespPart])
      }
      Response(throttle, err, sid, topics)
    }
  }

  // ------------------------------------------------ Metadata v9 serde

  /** Metadata (api key 3) v9 — the reference's first FLEXIBLE version
    * (`schemata/metadata_request.json` validVersions 0-9, flexible 9+):
    * compact strings/arrays, nullable rack/cluster_id, per-struct tag
    * buffers. Topic authorized-operations default to INT32_MIN_VALUE
    * (-2147483648) when not requested, as the schema's default. */
  object Metadata {
    final case class Request(topics: Seq[String], allowAutoTopicCreation: Boolean,
        includeClusterAuthorizedOps: Boolean, includeTopicAuthorizedOps: Boolean)
    final case class Broker(nodeId: Int, host: String, port: Int, rack: Option[String])
    final case class Part(errorCode: Short, partitionIndex: Int, leaderId: Int,
        leaderEpoch: Int, replicas: Seq[Int], isr: Seq[Int], offline: Seq[Int])
    final case class Topic(errorCode: Short, name: String, isInternal: Boolean,
        partitions: Seq[Part], topicAuthorizedOps: Int = Int.MinValue)
    final case class Response(throttleMs: Int, brokers: Seq[Broker],
        clusterId: Option[String], controllerId: Int, topics: Seq[Topic],
        clusterAuthorizedOps: Int = Int.MinValue)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + r.topics.map(compactStringSize).sum)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t => putCompactString(b, t); putEmptyTags(b) }
      b.put(if (r.allowAutoTopicCreation) 1.toByte else 0.toByte)
      b.put(if (r.includeClusterAuthorizedOps) 1.toByte else 0.toByte)
      b.put(if (r.includeTopicAuthorizedOps) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val n = getCompactString(b); getTags(b); n
      }
      val auto = b.get() == 1; val ic = b.get() == 1; val it = b.get() == 1
      getTags(b)
      Request(topics, auto, ic, it)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(256 + r.brokers.size * 64 +
        r.topics.map(t => 64 + compactStringSize(t.name) +
          t.partitions.map(p => 32 +
            4 * (p.replicas.size + p.isr.size + p.offline.size)).sum).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.brokers.size)
      r.brokers.foreach { br =>
        b.putInt(br.nodeId); putCompactString(b, br.host); b.putInt(br.port)
        putCompactNullableString(b, br.rack); putEmptyTags(b)
      }
      putCompactNullableString(b, r.clusterId)
      b.putInt(r.controllerId)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t =>
        b.putShort(t.errorCode); putCompactString(b, t.name)
        b.put(if (t.isInternal) 1.toByte else 0.toByte)
        putCompactArrayLen(b, t.partitions.size)
        t.partitions.foreach { p =>
          b.putShort(p.errorCode); b.putInt(p.partitionIndex)
          b.putInt(p.leaderId); b.putInt(p.leaderEpoch)
          def ints(xs: Seq[Int]): Unit = {
            putCompactArrayLen(b, xs.size); xs.foreach(b.putInt)
          }
          ints(p.replicas); ints(p.isr); ints(p.offline)
          putEmptyTags(b)
        }
        b.putInt(t.topicAuthorizedOps); putEmptyTags(b)
      }
      b.putInt(r.clusterAuthorizedOps)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val brokers = (0 until getCompactArrayLen(b)).map { _ =>
        val br = Broker(b.getInt(), getCompactString(b), b.getInt(),
          getCompactNullableString(b))
        getTags(b); br
      }
      val clusterId = getCompactNullableString(b)
      val controller = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val err = b.getShort(); val name = getCompactString(b)
        val internal = b.get() == 1
        val parts = (0 until getCompactArrayLen(b)).map { _ =>
          def ints(): Seq[Int] =
            (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          val p = Part(b.getShort(), b.getInt(), b.getInt(), b.getInt(),
            ints(), ints(), ints())
          getTags(b); p
        }
        val ops = b.getInt(); getTags(b)
        Topic(err, name, internal, parts, ops)
      }
      val cops = b.getInt(); getTags(b)
      Response(throttle, brokers, clusterId, controller, topics, cops)
    }
  }

  // ---------------------------------------------- OffsetFetch v7 serde

  /** OffsetFetch (api key 9) v7 — flexible from v6
    * (`schemata/offset_fetch_request.json` validVersions 0-7, flexible
    * 6+); v7 adds require_stable (KIP-447). Missing partitions answer
    * committed_offset -1 / no error, per the handler. */
  object OffsetFetch {
    final case class Request(groupId: String,
        topics: Seq[(String, Seq[Int])], requireStable: Boolean)
    final case class RespPart(partitionIndex: Int, committedOffset: Long,
        committedLeaderEpoch: Int, metadata: Option[String], errorCode: Short)
    final case class RespTopic(name: String, partitions: Seq[RespPart])
    final case class Response(throttleMs: Int, topics: Seq[RespTopic],
        errorCode: Short)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.groupId) +
        r.topics.map { case (n, ps) => 16 + compactStringSize(n) + 4 * ps.size }.sum)
      putCompactString(b, r.groupId)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putCompactString(b, name)
        putCompactArrayLen(b, parts.size)
        parts.foreach(b.putInt)
        putEmptyTags(b)
      }
      b.put(if (r.requireStable) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val gid = getCompactString(b)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val parts = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
        getTags(b)
        (name, parts: Seq[Int])
      }
      val stable = b.get() == 1
      getTags(b)
      Request(gid, topics, stable)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + r.topics.map { t =>
        16 + compactStringSize(t.name) + t.partitions.map(p =>
          24 + p.metadata.map(compactStringSize).getOrElse(1)).sum }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t =>
        putCompactString(b, t.name)
        putCompactArrayLen(b, t.partitions.size)
        t.partitions.foreach { p =>
          b.putInt(p.partitionIndex); b.putLong(p.committedOffset)
          b.putInt(p.committedLeaderEpoch)
          putCompactNullableString(b, p.metadata)
          b.putShort(p.errorCode); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.putShort(r.errorCode)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val parts = (0 until getCompactArrayLen(b)).map { _ =>
          val p = RespPart(b.getInt(), b.getLong(), b.getInt(),
            getCompactNullableString(b), b.getShort())
          getTags(b); p
        }
        getTags(b)
        RespTopic(name, parts)
      }
      val err = b.getShort(); getTags(b)
      Response(throttle, topics, err)
    }
  }

  // --------------------------------------------- OffsetCommit v8 serde

  /** OffsetCommit (api key 8) v8 — flexible from v8
    * (`schemata/offset_commit_request.json` validVersions 0-8); v7+
    * carries the nullable static-membership group_instance_id,
    * retention_time_ms is gone after v4. */
  object OffsetCommit {
    final case class ReqPart(partitionIndex: Int, committedOffset: Long,
        committedLeaderEpoch: Int, metadata: Option[String])
    final case class Request(groupId: String, generationId: Int,
        memberId: String, groupInstanceId: Option[String],
        topics: Seq[(String, Seq[ReqPart])])
    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[(Int, Short)])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.groupId) +
        compactStringSize(r.memberId) +
        r.groupInstanceId.map(compactStringSize).getOrElse(1) +
        r.topics.map { case (n, ps) => 16 + compactStringSize(n) +
          ps.map(p => 24 + p.metadata.map(compactStringSize).getOrElse(1)).sum }.sum)
      putCompactString(b, r.groupId)
      b.putInt(r.generationId)
      putCompactString(b, r.memberId)
      putCompactNullableString(b, r.groupInstanceId)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putCompactString(b, name)
        putCompactArrayLen(b, parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putLong(p.committedOffset)
          b.putInt(p.committedLeaderEpoch)
          putCompactNullableString(b, p.metadata)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val gid = getCompactString(b)
      val gen = b.getInt()
      val member = getCompactString(b)
      val inst = getCompactNullableString(b)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val parts = (0 until getCompactArrayLen(b)).map { _ =>
          val p = ReqPart(b.getInt(), b.getLong(), b.getInt(),
            getCompactNullableString(b))
          getTags(b); p
        }
        getTags(b)
        (name, parts: Seq[ReqPart])
      }
      getTags(b)
      Request(gid, gen, member, inst, topics)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(32 + r.topics.map { case (n, ps) =>
        16 + compactStringSize(n) + ps.size * 8 }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putCompactString(b, name)
        putCompactArrayLen(b, parts.size)
        parts.foreach { case (idx, err) =>
          b.putInt(idx); b.putShort(err); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val parts = (0 until getCompactArrayLen(b)).map { _ =>
          val p = (b.getInt(), b.getShort()); getTags(b); p
        }
        getTags(b)
        (name, parts: Seq[(Int, Short)])
      }
      getTags(b)
      Response(throttle, topics)
    }
  }

  // ------------------------------------------ FindCoordinator v3 serde

  /** FindCoordinator (api key 10) v3 — flexible
    * (`schemata/find_coordinator_request.json` validVersions 0-3);
    * key_type 0 = consumer group, 1 = transaction id. */
  object FindCoordinator {
    final case class Request(key: String, keyType: Byte)
    final case class Response(throttleMs: Int, errorCode: Short,
        errorMessage: Option[String], nodeId: Int, host: String, port: Int)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + compactStringSize(r.key))
      putCompactString(b, r.key); b.put(r.keyType); putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val r = Request(getCompactString(b), b.get()); getTags(b); r
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(32 + compactStringSize(r.host) +
        r.errorMessage.map(compactStringSize).getOrElse(1))
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      putCompactNullableString(b, r.errorMessage)
      b.putInt(r.nodeId); putCompactString(b, r.host); b.putInt(r.port)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val r = Response(b.getInt(), b.getShort(), getCompactNullableString(b),
        b.getInt(), getCompactString(b), b.getInt())
      getTags(b); r
    }
  }

  // ------------------------------------- JoinGroup v6 / SyncGroup v4

  /** The rebalance pair (api keys 11/14) at their first flexible
    * versions (`schemata/join_group_request.json` 0-6 flexible 6+,
    * `sync_group_request.json` 0-4 flexible 4+). Protocol metadata and
    * assignments ride as COMPACT_BYTES blobs in the classic consumer
    * protocol layout — see [[ConsumerProtocol]]. */
  object JoinGroup {
    final case class Protocol(name: String, metadata: Array[Byte])
    final case class Request(groupId: String, sessionTimeoutMs: Int,
        rebalanceTimeoutMs: Int, memberId: String,
        groupInstanceId: Option[String], protocolType: String,
        protocols: Seq[Protocol])
    final case class Member(memberId: String, groupInstanceId: Option[String],
        metadata: Array[Byte])
    final case class Response(throttleMs: Int, errorCode: Short,
        generationId: Int, protocolName: String, leader: String,
        memberId: String, members: Seq[Member])

    private def putCompactBytes(b: ByteBuffer, bytes: Array[Byte]): Unit = {
      putUvarint(b, bytes.length + 1L); b.put(bytes)
    }
    private[WireHeaders] def getCompactBytes(b: ByteBuffer): Array[Byte] = {
      val n = getUvarint(b)
      require(n > 0, "null compact bytes where non-null expected")
      require(n - 1 <= b.remaining(), s"compact bytes length ${n - 1} exceeds frame")
      val a = new Array[Byte](n.toInt - 1); b.get(a); a
    }

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.groupId) +
        compactStringSize(r.memberId) + compactStringSize(r.protocolType) +
        r.groupInstanceId.map(compactStringSize).getOrElse(1) +
        r.protocols.map(p => 8 + compactStringSize(p.name) + p.metadata.length).sum)
      putCompactString(b, r.groupId)
      b.putInt(r.sessionTimeoutMs); b.putInt(r.rebalanceTimeoutMs)
      putCompactString(b, r.memberId)
      putCompactNullableString(b, r.groupInstanceId)
      putCompactString(b, r.protocolType)
      putCompactArrayLen(b, r.protocols.size)
      r.protocols.foreach { p =>
        putCompactString(b, p.name); putCompactBytes(b, p.metadata)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val gid = getCompactString(b)
      val st = b.getInt(); val rt = b.getInt()
      val mid = getCompactString(b)
      val inst = getCompactNullableString(b)
      val ptype = getCompactString(b)
      val protos = (0 until getCompactArrayLen(b)).map { _ =>
        val p = Protocol(getCompactString(b), getCompactBytes(b))
        getTags(b); p
      }
      getTags(b)
      Request(gid, st, rt, mid, inst, ptype, protos)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.protocolName) +
        compactStringSize(r.leader) + compactStringSize(r.memberId) +
        r.members.map(m => 8 + compactStringSize(m.memberId) +
          m.groupInstanceId.map(compactStringSize).getOrElse(1) +
          m.metadata.length).sum)
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      b.putInt(r.generationId)
      putCompactString(b, r.protocolName)
      putCompactString(b, r.leader)
      putCompactString(b, r.memberId)
      putCompactArrayLen(b, r.members.size)
      r.members.foreach { m =>
        putCompactString(b, m.memberId)
        putCompactNullableString(b, m.groupInstanceId)
        putCompactBytes(b, m.metadata)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort(); val gen = b.getInt()
      val proto = getCompactString(b); val leader = getCompactString(b)
      val mid = getCompactString(b)
      val members = (0 until getCompactArrayLen(b)).map { _ =>
        val m = Member(getCompactString(b), getCompactNullableString(b),
          getCompactBytes(b))
        getTags(b); m
      }
      getTags(b)
      Response(throttle, err, gen, proto, leader, mid, members)
    }
  }

  object SyncGroup {
    final case class Request(groupId: String, generationId: Int,
        memberId: String, groupInstanceId: Option[String],
        assignments: Seq[(String, Array[Byte])])
    final case class Response(throttleMs: Int, errorCode: Short,
        assignment: Array[Byte])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.groupId) +
        compactStringSize(r.memberId) +
        r.groupInstanceId.map(compactStringSize).getOrElse(1) +
        r.assignments.map { case (m, a) => 8 + compactStringSize(m) + a.length }.sum)
      putCompactString(b, r.groupId)
      b.putInt(r.generationId)
      putCompactString(b, r.memberId)
      putCompactNullableString(b, r.groupInstanceId)
      putCompactArrayLen(b, r.assignments.size)
      r.assignments.foreach { case (m, a) =>
        putCompactString(b, m)
        putUvarint(b, a.length + 1L); b.put(a)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val gid = getCompactString(b)
      val gen = b.getInt()
      val mid = getCompactString(b)
      val inst = getCompactNullableString(b)
      val assigns = (0 until getCompactArrayLen(b)).map { _ =>
        val p = (getCompactString(b), JoinGroup.getCompactBytes(b))
        getTags(b); p
      }
      getTags(b)
      Request(gid, gen, mid, inst, assigns)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.assignment.length)
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      putUvarint(b, r.assignment.length + 1L); b.put(r.assignment)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val r = Response(b.getInt(), b.getShort(), JoinGroup.getCompactBytes(b))
      getTags(b); r
    }
  }

  /** Heartbeat (api key 12) v4 / LeaveGroup (api key 13) v4 — both
    * flexible at v4; LeaveGroup v3+ batches member identities (KIP-345)
    * with per-member error codes in the response. */
  object Heartbeat {
    final case class Request(groupId: String, generationId: Int,
        memberId: String, groupInstanceId: Option[String])
    final case class Response(throttleMs: Int, errorCode: Short)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + compactStringSize(r.groupId) +
        compactStringSize(r.memberId) +
        r.groupInstanceId.map(compactStringSize).getOrElse(1))
      putCompactString(b, r.groupId); b.putInt(r.generationId)
      putCompactString(b, r.memberId)
      putCompactNullableString(b, r.groupInstanceId)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val r = Request(getCompactString(b), b.getInt(), getCompactString(b),
        getCompactNullableString(b))
      getTags(b); r
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(8)
      b.putInt(r.throttleMs); b.putShort(r.errorCode); putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val r = Response(b.getInt(), b.getShort()); getTags(b); r
    }
  }

  object LeaveGroup {
    final case class Request(groupId: String,
        members: Seq[(String, Option[String])])
    final case class MemberResp(memberId: String,
        groupInstanceId: Option[String], errorCode: Short)
    final case class Response(throttleMs: Int, errorCode: Short,
        members: Seq[MemberResp])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + compactStringSize(r.groupId) +
        r.members.map { case (m, i) => 4 + compactStringSize(m) +
          i.map(compactStringSize).getOrElse(1) }.sum)
      putCompactString(b, r.groupId)
      putCompactArrayLen(b, r.members.size)
      r.members.foreach { case (m, inst) =>
        putCompactString(b, m); putCompactNullableString(b, inst)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val gid = getCompactString(b)
      val members = (0 until getCompactArrayLen(b)).map { _ =>
        val p = (getCompactString(b), getCompactNullableString(b))
        getTags(b); p
      }
      getTags(b)
      Request(gid, members)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.members.map(m =>
        8 + compactStringSize(m.memberId) +
          m.groupInstanceId.map(compactStringSize).getOrElse(1)).sum)
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      putCompactArrayLen(b, r.members.size)
      r.members.foreach { m =>
        putCompactString(b, m.memberId)
        putCompactNullableString(b, m.groupInstanceId)
        b.putShort(m.errorCode); putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val members = (0 until getCompactArrayLen(b)).map { _ =>
        val m = MemberResp(getCompactString(b), getCompactNullableString(b),
          b.getShort())
        getTags(b); m
      }
      getTags(b)
      Response(throttle, err, members)
    }
  }

  /** InitProducerId (api key 22) v3 / EndTxn (api key 26) v3 — the txn
    * coordinator's entry and exit (flexible 2+/3+); v3 init carries the
    * KIP-360 producer_id/epoch the client already holds (-1 = none). */
  object InitProducerId {
    final case class Request(transactionalId: Option[String],
        transactionTimeoutMs: Int, producerId: Long, producerEpoch: Short)
    final case class Response(throttleMs: Int, errorCode: Short,
        producerId: Long, producerEpoch: Short)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(32 +
        r.transactionalId.map(compactStringSize).getOrElse(1))
      putCompactNullableString(b, r.transactionalId)
      b.putInt(r.transactionTimeoutMs)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val r = Request(getCompactNullableString(b), b.getInt(), b.getLong(),
        b.getShort())
      getTags(b); r
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(24)
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val r = Response(b.getInt(), b.getShort(), b.getLong(), b.getShort())
      getTags(b); r
    }
  }

  object EndTxn {
    final case class Request(transactionalId: String, producerId: Long,
        producerEpoch: Short, committed: Boolean)
    final case class Response(throttleMs: Int, errorCode: Short)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(24 + compactStringSize(r.transactionalId))
      putCompactString(b, r.transactionalId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      b.put(if (r.committed) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val r = Request(getCompactString(b), b.getLong(), b.getShort(),
        b.get() == 1)
      getTags(b); r
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(12)
      b.putInt(r.throttleMs); b.putShort(r.errorCode); putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val r = Response(b.getInt(), b.getShort()); getTags(b); r
    }
  }

  /** AddPartitionsToTxn (api key 24) v3 — flexible from v3
    * (`add_partitions_to_txn_request.json`): the producer declares
    * which topic-partitions its open transaction will write, the
    * coordinator answers a per-partition error grid. */
  object AddPartitionsToTxn {
    final case class Request(transactionalId: String, producerId: Long,
        producerEpoch: Short, topics: Seq[(String, Seq[Int])])
    final case class Response(throttleMs: Int,
        results: Seq[(String, Seq[(Int, Short)])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.transactionalId) +
        r.topics.map { case (t, ps) => compactStringSize(t) + 2 + 4 * ps.size }.sum)
      putCompactString(b, r.transactionalId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach(b.putInt)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val tid = getCompactString(b)
      val pid = b.getLong(); val epoch = b.getShort()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
        getTags(b)
        (t, ps: Seq[Int])
      }
      getTags(b)
      Request(tid, pid, epoch, topics)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 +
        r.results.map { case (t, ps) => compactStringSize(t) + 2 + 8 * ps.size }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { case (idx, err) =>
          b.putInt(idx); b.putShort(err); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val r = (b.getInt(), b.getShort()); getTags(b); r
        }
        getTags(b)
        (t, ps: Seq[(Int, Short)])
      }
      getTags(b)
      Response(throttle, results)
    }
  }

  /** AddOffsetsToTxn (api key 25) v1 — NEVER flexible (reference pins
    * 0-1): ties a consumer group's offsets topic into the transaction
    * before TxnOffsetCommit may land. */
  object AddOffsetsToTxn {
    final case class Request(transactionalId: String, producerId: Long,
        producerEpoch: Short, groupId: String)
    final case class Response(throttleMs: Int, errorCode: Short)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(14 +
        r.transactionalId.getBytes("UTF-8").length +
        r.groupId.getBytes("UTF-8").length)
      putLegacyString(b, r.transactionalId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      putLegacyString(b, r.groupId)
      b.array()
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      Request(readLegacyString(b), b.getLong(), b.getShort(), readLegacyString(b))
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(6)
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      b.array()
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      Response(b.getInt(), b.getShort())
    }
  }

  /** TxnOffsetCommit (api key 28) v3 — flexible from v3; v3 adds the
    * group-fencing fields (generation, member, group instance,
    * KIP-447). Offsets land PENDING and only become fetchable when the
    * transaction's EndTxn commit marker seals them
    * (`group::handle_txn_offset_commit` / `commit_tx`). */
  object TxnOffsetCommit {
    final case class ReqPartition(partition: Int, offset: Long,
        leaderEpoch: Int, metadata: Option[String])
    final case class Request(transactionalId: String, groupId: String,
        producerId: Long, producerEpoch: Short, generationId: Int,
        memberId: String, groupInstanceId: Option[String],
        topics: Seq[(String, Seq[ReqPartition])])
    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[(Int, Short)])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(64 + compactStringSize(r.transactionalId) +
        compactStringSize(r.groupId) + compactStringSize(r.memberId) +
        r.groupInstanceId.map(compactStringSize).getOrElse(1) +
        r.topics.map { case (t, ps) =>
          compactStringSize(t) + 2 +
            ps.map(p => 18 + p.metadata.map(compactStringSize).getOrElse(1)).sum
        }.sum)
      putCompactString(b, r.transactionalId)
      putCompactString(b, r.groupId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      b.putInt(r.generationId)
      putCompactString(b, r.memberId)
      putCompactNullableString(b, r.groupInstanceId)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putInt(p.partition); b.putLong(p.offset); b.putInt(p.leaderEpoch)
          putCompactNullableString(b, p.metadata)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val tid = getCompactString(b)
      val gid = getCompactString(b)
      val pid = b.getLong(); val epoch = b.getShort()
      val gen = b.getInt()
      val member = getCompactString(b)
      val inst = getCompactNullableString(b)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val p = ReqPartition(b.getInt(), b.getLong(), b.getInt(),
            getCompactNullableString(b))
          getTags(b); p
        }
        getTags(b)
        (t, ps: Seq[ReqPartition])
      }
      getTags(b)
      Request(tid, gid, pid, epoch, gen, member, inst, topics)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 +
        r.topics.map { case (t, ps) => compactStringSize(t) + 2 + 8 * ps.size }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { case (idx, err) =>
          b.putInt(idx); b.putShort(err); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val r = (b.getInt(), b.getShort()); getTags(b); r
        }
        getTags(b)
        (t, ps: Seq[(Int, Short)])
      }
      getTags(b)
      Response(throttle, topics)
    }
  }

  /** DeleteRecords (api key 21) v2 — flexible; truncation to an offset
    * per partition, -1 = the high watermark. */
  object DeleteRecords {
    final case class Request(topics: Seq[(String, Seq[(Int, Long)])],
        timeoutMs: Int)
    final case class RespPart(partitionIndex: Int, lowWatermark: Long,
        errorCode: Short)
    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[RespPart])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map { case (n, ps) =>
        8 + compactStringSize(n) + ps.size * 16 }.sum)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putCompactString(b, name)
        putCompactArrayLen(b, parts.size)
        parts.foreach { case (p, off) =>
          b.putInt(p); b.putLong(off); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.putInt(r.timeoutMs)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val parts = (0 until getCompactArrayLen(b)).map { _ =>
          val p = (b.getInt(), b.getLong()); getTags(b); p
        }
        getTags(b)
        (name, parts: Seq[(Int, Long)])
      }
      val timeout = b.getInt(); getTags(b)
      Request(topics, timeout)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map { case (n, ps) =>
        8 + compactStringSize(n) + ps.size * 16 }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putCompactString(b, name)
        putCompactArrayLen(b, parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putLong(p.lowWatermark)
          b.putShort(p.errorCode); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val parts = (0 until getCompactArrayLen(b)).map { _ =>
          val p = RespPart(b.getInt(), b.getLong(), b.getShort())
          getTags(b); p
        }
        getTags(b)
        (name, parts: Seq[RespPart])
      }
      getTags(b)
      Response(throttle, topics)
    }
  }

  /** CreateTopics (api key 19) v7 — flexible from v5; the response's
    * topic_config_error_code is a TAGGED field (tag 0, emitted only
    * when non-zero, KIP-482), num_partitions/replication_factor echo
    * the effective values (-1 on error), configs nullable. */
  object CreateTopics {
    final case class ReqTopic(name: String, numPartitions: Int,
        replicationFactor: Short, configs: Seq[(String, Option[String])])
    final case class Request(topics: Seq[ReqTopic], timeoutMs: Int,
        validateOnly: Boolean)
    final case class RespTopic(name: String, topicId: Array[Byte],
        errorCode: Short, errorMessage: Option[String],
        topicConfigErrorCode: Short, numPartitions: Int,
        replicationFactor: Short, configs: Option[Seq[(String, Option[String])]])
    final case class Response(throttleMs: Int, topics: Seq[RespTopic])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(32 + r.topics.map(t =>
        24 + compactStringSize(t.name) + t.configs.map { case (k, v) =>
          4 + compactStringSize(k) + v.map(compactStringSize).getOrElse(1) }.sum).sum)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t =>
        putCompactString(b, t.name)
        b.putInt(t.numPartitions); b.putShort(t.replicationFactor)
        putCompactArrayLen(b, 0) // assignments: broker placement unused here
        putCompactArrayLen(b, t.configs.size)
        t.configs.foreach { case (k, v) =>
          putCompactString(b, k); putCompactNullableString(b, v)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.putInt(r.timeoutMs)
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val np = b.getInt(); val rf = b.getShort()
        val nAssign = getCompactArrayLen(b)
        require(nAssign == 0, "manual assignments unsupported")
        val configs = (0 until getCompactArrayLen(b)).map { _ =>
          val p = (getCompactString(b), getCompactNullableString(b))
          getTags(b); p
        }
        getTags(b)
        ReqTopic(name, np, rf, configs)
      }
      val timeout = b.getInt(); val vo = b.get() == 1
      getTags(b)
      Request(topics, timeout, vo)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(32 + r.topics.map(t =>
        64 + compactStringSize(t.name) +
          t.errorMessage.map(compactStringSize).getOrElse(1) +
          t.configs.map(_.map { case (k, v) => 8 + compactStringSize(k) +
            v.map(compactStringSize).getOrElse(1) }.sum).getOrElse(0)).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t =>
        putCompactString(b, t.name)
        b.put(t.topicId, 0, 16)
        b.putShort(t.errorCode)
        putCompactNullableString(b, t.errorMessage)
        b.putInt(t.numPartitions); b.putShort(t.replicationFactor)
        t.configs match {
          case None => putUvarint(b, 0L)
          case Some(cs) =>
            putCompactArrayLen(b, cs.size)
            cs.foreach { case (k, v) =>
              putCompactString(b, k); putCompactNullableString(b, v)
              b.put(0.toByte)    // read_only
              b.put(5.toByte)    // config source: DEFAULT_CONFIG
              b.put(0.toByte)    // is_sensitive
              putEmptyTags(b)
            }
        }
        if (t.topicConfigErrorCode != 0) {
          // one tagged field: key 0, two bytes of int16
          putUvarint(b, 1L); putUvarint(b, 0L); putUvarint(b, 2L)
          b.putShort(t.topicConfigErrorCode)
        } else putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val id = new Array[Byte](16); b.get(id)
        val err = b.getShort()
        val msg = getCompactNullableString(b)
        val np = b.getInt(); val rf = b.getShort()
        val nCfg = getUvarint(b)
        val configs =
          if (nCfg == 0) None
          else Some((0L until nCfg - 1).map { _ =>
            val k = getCompactString(b); val v = getCompactNullableString(b)
            b.get(); b.get(); b.get() // read_only, source, sensitive
            getTags(b)
            (k, v)
          }: Seq[(String, Option[String])])
        val tags = getTags(b)
        val cfgErr = tags.find(_._1 == 0L)
          .map(t => ByteBuffer.wrap(t._2).getShort()).getOrElse(0.toShort)
        RespTopic(name, id, err, msg, cfgErr, np, rf, configs)
      }
      getTags(b)
      Response(throttle, topics)
    }
  }

  /** DescribeClientQuotas (api key 48) v1 / AlterClientQuotas (api
    * key 49) v1 — both flexible from v1 (KIP-546). Entities are
    * (entity_type, nullable entity_name — null names the default);
    * quota values are float64; REMOVE tombstones an override. */
  object ClientQuotas {
    final case class Entity(entityType: String, entityName: Option[String])
    final case class DescribeComponent(entityType: String, matchType: Byte,
        matchName: Option[String])
    final case class DescribeRequest(components: Seq[DescribeComponent],
        strict: Boolean)
    final case class Entry(entity: Seq[Entity], values: Seq[(String, Double)])
    final case class DescribeResponse(throttleMs: Int, errorCode: Short,
        errorMessage: Option[String], entries: Seq[Entry])
    final case class Op(key: String, value: Double, remove: Boolean)
    final case class AlterEntry(entity: Seq[Entity], ops: Seq[Op])
    final case class AlterRequest(entries: Seq[AlterEntry], validateOnly: Boolean)
    final case class AlterResult(errorCode: Short, errorMessage: Option[String],
        entity: Seq[Entity])
    final case class AlterResponse(throttleMs: Int, results: Seq[AlterResult])

    private def putEntity(b: ByteBuffer, es: Seq[Entity]): Unit = {
      putCompactArrayLen(b, es.size)
      es.foreach { e =>
        putCompactString(b, e.entityType)
        putCompactNullableString(b, e.entityName)
        putEmptyTags(b)
      }
    }
    private def getEntity(b: ByteBuffer): Seq[Entity] =
      (0 until getCompactArrayLen(b)).map { _ =>
        val e = Entity(getCompactString(b), getCompactNullableString(b))
        getTags(b); e
      }

    def encodeDescribeRequest(r: DescribeRequest): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.components.map(c =>
        8 + compactStringSize(c.entityType) +
          c.matchName.map(compactStringSize).getOrElse(1)).sum)
      putCompactArrayLen(b, r.components.size)
      r.components.foreach { c =>
        putCompactString(b, c.entityType)
        b.put(c.matchType)
        putCompactNullableString(b, c.matchName)
        putEmptyTags(b)
      }
      b.put(if (r.strict) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeDescribeRequest(bytes: Array[Byte]): DescribeRequest = {
      val b = ByteBuffer.wrap(bytes)
      val comps = (0 until getCompactArrayLen(b)).map { _ =>
        val c = DescribeComponent(getCompactString(b), b.get(),
          getCompactNullableString(b))
        getTags(b); c
      }
      val strict = b.get() == 1
      getTags(b)
      DescribeRequest(comps, strict)
    }
    def encodeDescribeResponse(r: DescribeResponse): Array[Byte] = {
      val b = ByteBuffer.allocate(24 +
        r.errorMessage.map(compactStringSize).getOrElse(1) +
        r.entries.map(e => 8 +
          e.entity.map(x => 4 + compactStringSize(x.entityType) +
            x.entityName.map(compactStringSize).getOrElse(1)).sum +
          e.values.map(v => 12 + compactStringSize(v._1)).sum).sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactNullableString(b, r.errorMessage)
      putCompactArrayLen(b, r.entries.size)
      r.entries.foreach { e =>
        putEntity(b, e.entity)
        putCompactArrayLen(b, e.values.size)
        e.values.foreach { case (k, v) =>
          putCompactString(b, k); b.putDouble(v); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeDescribeResponse(bytes: Array[Byte]): DescribeResponse = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val msg = getCompactNullableString(b)
      val entries = (0 until getCompactArrayLen(b)).map { _ =>
        val entity = getEntity(b)
        val values = (0 until getCompactArrayLen(b)).map { _ =>
          val v = (getCompactString(b), b.getDouble()); getTags(b); v
        }
        getTags(b)
        Entry(entity, values)
      }
      getTags(b)
      DescribeResponse(throttle, err, msg, entries)
    }
    def encodeAlterRequest(r: AlterRequest): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.entries.map(e => 4 +
        e.entity.map(x => 4 + compactStringSize(x.entityType) +
          x.entityName.map(compactStringSize).getOrElse(1)).sum +
        e.ops.map(o => 13 + compactStringSize(o.key)).sum).sum)
      putCompactArrayLen(b, r.entries.size)
      r.entries.foreach { e =>
        putEntity(b, e.entity)
        putCompactArrayLen(b, e.ops.size)
        e.ops.foreach { o =>
          putCompactString(b, o.key)
          b.putDouble(o.value)
          b.put(if (o.remove) 1.toByte else 0.toByte)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeAlterRequest(bytes: Array[Byte]): AlterRequest = {
      val b = ByteBuffer.wrap(bytes)
      val entries = (0 until getCompactArrayLen(b)).map { _ =>
        val entity = getEntity(b)
        val ops = (0 until getCompactArrayLen(b)).map { _ =>
          val o = Op(getCompactString(b), b.getDouble(), b.get() == 1)
          getTags(b); o
        }
        getTags(b)
        AlterEntry(entity, ops)
      }
      val vo = b.get() == 1
      getTags(b)
      AlterRequest(entries, vo)
    }
    def encodeAlterResponse(r: AlterResponse): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.results.map(x => 8 +
        x.errorMessage.map(compactStringSize).getOrElse(1) +
        x.entity.map(e => 4 + compactStringSize(e.entityType) +
          e.entityName.map(compactStringSize).getOrElse(1)).sum).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { x =>
        b.putShort(x.errorCode)
        putCompactNullableString(b, x.errorMessage)
        putEntity(b, x.entity)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeAlterResponse(bytes: Array[Byte]): AlterResponse = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val err = b.getShort()
        val msg = getCompactNullableString(b)
        val entity = getEntity(b)
        getTags(b)
        AlterResult(err, msg, entity)
      }
      getTags(b)
      AlterResponse(throttle, results)
    }
  }

  /** AlterConfigs (api key 33) v2 — the FULL-REPLACE legacy sibling of
    * IncrementalAlterConfigs: every config of the resource is replaced
    * by the request's set (absent keys revert to defaults). Flexible
    * from v2. */
  object AlterConfigs {
    final case class ReqResource(resourceType: Byte, resourceName: String,
        configs: Seq[(String, Option[String])])
    final case class Request(resources: Seq[ReqResource], validateOnly: Boolean)
    final case class RespResource(errorCode: Short,
        errorMessage: Option[String], resourceType: Byte, resourceName: String)
    final case class Response(throttleMs: Int, responses: Seq[RespResource])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.resources.map(res =>
        8 + compactStringSize(res.resourceName) + res.configs.map(c =>
          4 + compactStringSize(c._1) +
            c._2.map(compactStringSize).getOrElse(1)).sum).sum)
      putCompactArrayLen(b, r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putCompactString(b, res.resourceName)
        putCompactArrayLen(b, res.configs.size)
        res.configs.foreach { case (k, v) =>
          putCompactString(b, k)
          putCompactNullableString(b, v)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val resources = (0 until getCompactArrayLen(b)).map { _ =>
        val rt = b.get()
        val rn = getCompactString(b)
        val configs = (0 until getCompactArrayLen(b)).map { _ =>
          val c = (getCompactString(b), getCompactNullableString(b))
          getTags(b); c
        }
        getTags(b)
        ReqResource(rt, rn, configs)
      }
      val vo = b.get() == 1
      getTags(b)
      Request(resources, vo)
    }
    def encodeResponse(r: Response): Array[Byte] =
      IncrementalAlterConfigs.encodeResponse(IncrementalAlterConfigs.Response(
        r.throttleMs, r.responses.map(x =>
          IncrementalAlterConfigs.RespResource(x.errorCode, x.errorMessage,
            x.resourceType, x.resourceName))))
    def decodeResponse(bytes: Array[Byte]): Response = {
      val d = IncrementalAlterConfigs.decodeResponse(bytes)
      Response(d.throttleMs, d.responses.map(x =>
        RespResource(x.errorCode, x.errorMessage, x.resourceType,
          x.resourceName)))
    }
  }

  /** DescribeLogDirs (api key 35) v4 — flexible from v2; v4 adds
    * total/usable bytes per dir. */
  object DescribeLogDirs {
    final case class Request(topics: Option[Seq[(String, Seq[Int])]])
    final case class Partition(partitionIndex: Int, partitionSize: Long,
        offsetLag: Long, isFutureKey: Boolean)
    final case class DirResult(errorCode: Short, logDir: String,
        topics: Seq[(String, Seq[Partition])], totalBytes: Long,
        usableBytes: Long)
    final case class Response(throttleMs: Int, errorCode: Short,
        results: Seq[DirResult])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.topics.map(_.map { case (t, ps) =>
        4 + compactStringSize(t) + 4 * ps.size }.sum).getOrElse(0))
      r.topics match {
        case None => putUvarint(b, 0L)
        case Some(ts) =>
          putCompactArrayLen(b, ts.size)
          ts.foreach { case (t, ps) =>
            putCompactString(b, t)
            putCompactArrayLen(b, ps.size)
            ps.foreach(b.putInt)
            putEmptyTags(b)
          }
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val n = getUvarint(b)
      val topics =
        if (n == 0) None
        else Some((0L until n - 1).map { _ =>
          val t = getCompactString(b)
          val ps = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          getTags(b)
          (t, ps: Seq[Int])
        }: Seq[(String, Seq[Int])])
      getTags(b)
      Request(topics)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(24 + r.results.map(d =>
        24 + compactStringSize(d.logDir) + d.topics.map { case (t, ps) =>
          4 + compactStringSize(t) + 22 * ps.size }.sum).sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { d =>
        b.putShort(d.errorCode)
        putCompactString(b, d.logDir)
        putCompactArrayLen(b, d.topics.size)
        d.topics.foreach { case (t, ps) =>
          putCompactString(b, t)
          putCompactArrayLen(b, ps.size)
          ps.foreach { p =>
            b.putInt(p.partitionIndex); b.putLong(p.partitionSize)
            b.putLong(p.offsetLag)
            b.put(if (p.isFutureKey) 1.toByte else 0.toByte)
            putEmptyTags(b)
          }
          putEmptyTags(b)
        }
        b.putLong(d.totalBytes)
        b.putLong(d.usableBytes)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val derr = b.getShort()
        val dir = getCompactString(b)
        val topics = (0 until getCompactArrayLen(b)).map { _ =>
          val t = getCompactString(b)
          val ps = (0 until getCompactArrayLen(b)).map { _ =>
            val p = Partition(b.getInt(), b.getLong(), b.getLong(),
              b.get() == 1)
            getTags(b); p
          }
          getTags(b)
          (t, ps: Seq[Partition])
        }
        val total = b.getLong(); val usable = b.getLong()
        getTags(b)
        DirResult(derr, dir, topics, total, usable)
      }
      getTags(b)
      Response(throttle, err, results)
    }
  }

  /** AlterPartitionReassignments (api key 45) v0 /
    * ListPartitionReassignments (api key 46) v0 — both flexible from
    * v0 (KIP-455). A null replica list in an alter CANCELS the pending
    * reassignment; list shows in-flight targets with adding/removing
    * deltas. */
  object PartitionReassignments {
    final case class AlterPartition(partitionIndex: Int,
        replicas: Option[Seq[Int]])
    final case class AlterRequest(timeoutMs: Int,
        topics: Seq[(String, Seq[AlterPartition])])
    final case class PartResult(partitionIndex: Int, errorCode: Short,
        errorMessage: Option[String])
    final case class AlterResponse(throttleMs: Int, errorCode: Short,
        errorMessage: Option[String], responses: Seq[(String, Seq[PartResult])])
    final case class ListRequest(timeoutMs: Int,
        topics: Option[Seq[(String, Seq[Int])]])
    final case class Ongoing(partitionIndex: Int, replicas: Seq[Int],
        adding: Seq[Int], removing: Seq[Int])
    final case class ListResponse(throttleMs: Int, errorCode: Short,
        errorMessage: Option[String], topics: Seq[(String, Seq[Ongoing])])

    def encodeAlterRequest(r: AlterRequest): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map { case (t, ps) =>
        4 + compactStringSize(t) + ps.map(p =>
          8 + p.replicas.map(4 * _.size + 2).getOrElse(1)).sum }.sum)
      b.putInt(r.timeoutMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putInt(p.partitionIndex)
          p.replicas match {
            case None => putUvarint(b, 0L)
            case Some(rs) => putCompactArrayLen(b, rs.size); rs.foreach(b.putInt)
          }
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeAlterRequest(bytes: Array[Byte]): AlterRequest = {
      val b = ByteBuffer.wrap(bytes)
      val timeout = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val idx = b.getInt()
          val n = getUvarint(b)
          val reps =
            if (n == 0) None
            else Some((0L until n - 1).map(_ => b.getInt()): Seq[Int])
          getTags(b)
          AlterPartition(idx, reps)
        }
        getTags(b)
        (t, ps: Seq[AlterPartition])
      }
      getTags(b)
      AlterRequest(timeout, topics)
    }
    def encodeAlterResponse(r: AlterResponse): Array[Byte] = {
      val b = ByteBuffer.allocate(24 +
        r.errorMessage.map(compactStringSize).getOrElse(1) +
        r.responses.map { case (t, ps) => 4 + compactStringSize(t) +
          ps.map(p => 8 + p.errorMessage.map(compactStringSize).getOrElse(1)).sum }.sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactNullableString(b, r.errorMessage)
      putCompactArrayLen(b, r.responses.size)
      r.responses.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putInt(p.partitionIndex)
          b.putShort(p.errorCode)
          putCompactNullableString(b, p.errorMessage)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeAlterResponse(bytes: Array[Byte]): AlterResponse = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val msg = getCompactNullableString(b)
      val responses = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val p = PartResult(b.getInt(), b.getShort(),
            getCompactNullableString(b))
          getTags(b); p
        }
        getTags(b)
        (t, ps: Seq[PartResult])
      }
      getTags(b)
      AlterResponse(throttle, err, msg, responses)
    }
    def encodeListRequest(r: ListRequest): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map(_.map { case (t, ps) =>
        4 + compactStringSize(t) + 4 * ps.size }.sum).getOrElse(0))
      b.putInt(r.timeoutMs)
      r.topics match {
        case None => putUvarint(b, 0L)
        case Some(ts) =>
          putCompactArrayLen(b, ts.size)
          ts.foreach { case (t, ps) =>
            putCompactString(b, t)
            putCompactArrayLen(b, ps.size)
            ps.foreach(b.putInt)
            putEmptyTags(b)
          }
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeListRequest(bytes: Array[Byte]): ListRequest = {
      val b = ByteBuffer.wrap(bytes)
      val timeout = b.getInt()
      val n = getUvarint(b)
      val topics =
        if (n == 0) None
        else Some((0L until n - 1).map { _ =>
          val t = getCompactString(b)
          val ps = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          getTags(b)
          (t, ps: Seq[Int])
        }: Seq[(String, Seq[Int])])
      getTags(b)
      ListRequest(timeout, topics)
    }
    def encodeListResponse(r: ListResponse): Array[Byte] = {
      val b = ByteBuffer.allocate(24 +
        r.errorMessage.map(compactStringSize).getOrElse(1) +
        r.topics.map { case (t, ps) => 4 + compactStringSize(t) +
          ps.map(p => 16 + 4 * (p.replicas.size + p.adding.size +
            p.removing.size)).sum }.sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactNullableString(b, r.errorMessage)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putInt(p.partitionIndex)
          putCompactArrayLen(b, p.replicas.size); p.replicas.foreach(b.putInt)
          putCompactArrayLen(b, p.adding.size); p.adding.foreach(b.putInt)
          putCompactArrayLen(b, p.removing.size); p.removing.foreach(b.putInt)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeListResponse(bytes: Array[Byte]): ListResponse = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val msg = getCompactNullableString(b)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val idx = b.getInt()
          val reps = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          val add = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          val rem = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          getTags(b)
          Ongoing(idx, reps, add, rem)
        }
        getTags(b)
        (t, ps: Seq[Ongoing])
      }
      getTags(b)
      ListResponse(throttle, err, msg, topics)
    }
  }

  /** ListTransactions (api key 66) v0 — flexible from v0 (KIP-664).
    * Unknown state filters are echoed back in unknown_state_filters
    * and simply never match; producer-id filters intersect. */
  object ListTransactions {
    final case class Request(stateFilters: Seq[String],
        producerIdFilters: Seq[Long])
    final case class TxnState(transactionalId: String, producerId: Long,
        transactionState: String)
    final case class Response(throttleMs: Int, errorCode: Short,
        unknownStateFilters: Seq[String], states: Seq[TxnState])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.stateFilters.map(compactStringSize).sum
        + 8 * r.producerIdFilters.size)
      putCompactArrayLen(b, r.stateFilters.size)
      r.stateFilters.foreach(putCompactString(b, _))
      putCompactArrayLen(b, r.producerIdFilters.size)
      r.producerIdFilters.foreach(b.putLong)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val states = (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      val pids = (0 until getCompactArrayLen(b)).map(_ => b.getLong())
      getTags(b)
      Request(states, pids)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(24 +
        r.unknownStateFilters.map(compactStringSize).sum +
        r.states.map(s => 12 + compactStringSize(s.transactionalId) +
          compactStringSize(s.transactionState)).sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactArrayLen(b, r.unknownStateFilters.size)
      r.unknownStateFilters.foreach(putCompactString(b, _))
      putCompactArrayLen(b, r.states.size)
      r.states.foreach { s =>
        putCompactString(b, s.transactionalId)
        b.putLong(s.producerId)
        putCompactString(b, s.transactionState)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val unknown = (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      val states = (0 until getCompactArrayLen(b)).map { _ =>
        val s = TxnState(getCompactString(b), b.getLong(), getCompactString(b))
        getTags(b); s
      }
      getTags(b)
      Response(throttle, err, unknown, states)
    }
  }

  /** DescribeTransactions (api key 65) v0 — flexible from v0. Unknown
    * transactional ids answer 105 transactional_id_not_found; known
    * ones carry the coordinator's state plus the touched
    * topic-partition set. */
  object DescribeTransactions {
    final case class Request(transactionalIds: Seq[String])
    final case class TxnState(errorCode: Short, transactionalId: String,
        transactionState: String, transactionTimeoutMs: Int,
        transactionStartTimeMs: Long, producerId: Long,
        producerEpoch: Short, topics: Seq[(String, Seq[Int])])
    final case class Response(throttleMs: Int, states: Seq[TxnState])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.transactionalIds.map(compactStringSize).sum)
      putCompactArrayLen(b, r.transactionalIds.size)
      r.transactionalIds.foreach(putCompactString(b, _))
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val ids = (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      getTags(b)
      Request(ids)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.states.map(s =>
        32 + compactStringSize(s.transactionalId) +
          compactStringSize(s.transactionState) +
          s.topics.map { case (t, ps) =>
            4 + compactStringSize(t) + 4 * ps.size }.sum).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.states.size)
      r.states.foreach { s =>
        b.putShort(s.errorCode)
        putCompactString(b, s.transactionalId)
        putCompactString(b, s.transactionState)
        b.putInt(s.transactionTimeoutMs)
        b.putLong(s.transactionStartTimeMs)
        b.putLong(s.producerId)
        b.putShort(s.producerEpoch)
        putCompactArrayLen(b, s.topics.size)
        s.topics.foreach { case (t, ps) =>
          putCompactString(b, t)
          putCompactArrayLen(b, ps.size)
          ps.foreach(b.putInt)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val states = (0 until getCompactArrayLen(b)).map { _ =>
        val err = b.getShort()
        val tid = getCompactString(b)
        val state = getCompactString(b)
        val timeout = b.getInt()
        val start = b.getLong()
        val pid = b.getLong()
        val epoch = b.getShort()
        val topics = (0 until getCompactArrayLen(b)).map { _ =>
          val t = getCompactString(b)
          val ps = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
          getTags(b)
          (t, ps: Seq[Int])
        }
        getTags(b)
        TxnState(err, tid, state, timeout, start, pid, epoch, topics)
      }
      getTags(b)
      Response(throttle, states)
    }
  }

  /** DescribeProducers (api key 61) v0 — flexible from v0 (KIP-664):
    * per requested partition, the rm_stm's active producer states —
    * epoch, last offset, and the open transaction's first offset (-1
    * when none). */
  object DescribeProducers {
    final case class Producer(producerId: Long, producerEpoch: Int,
        lastSequence: Int, lastTimestamp: Long, coordinatorEpoch: Int,
        currentTxnStartOffset: Long)
    final case class RespPartition(partitionIndex: Int, errorCode: Short,
        errorMessage: Option[String], activeProducers: Seq[Producer])
    final case class Request(topics: Seq[(String, Seq[Int])])
    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[RespPartition])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.topics.map { case (t, ps) =>
        4 + compactStringSize(t) + 4 * ps.size }.sum)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach(b.putInt)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
        getTags(b)
        (t, ps: Seq[Int])
      }
      getTags(b)
      Request(topics)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map { case (t, ps) =>
        4 + compactStringSize(t) + ps.map(p =>
          12 + p.errorMessage.map(compactStringSize).getOrElse(1) +
            37 * p.activeProducers.size).sum }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putInt(p.partitionIndex)
          b.putShort(p.errorCode)
          putCompactNullableString(b, p.errorMessage)
          putCompactArrayLen(b, p.activeProducers.size)
          p.activeProducers.foreach { ap =>
            b.putLong(ap.producerId); b.putInt(ap.producerEpoch)
            b.putInt(ap.lastSequence); b.putLong(ap.lastTimestamp)
            b.putInt(ap.coordinatorEpoch); b.putLong(ap.currentTxnStartOffset)
            putEmptyTags(b)
          }
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val idx = b.getInt()
          val err = b.getShort()
          val msg = getCompactNullableString(b)
          val producers = (0 until getCompactArrayLen(b)).map { _ =>
            val p = Producer(b.getLong(), b.getInt(), b.getInt(), b.getLong(),
              b.getInt(), b.getLong())
            getTags(b); p
          }
          getTags(b)
          RespPartition(idx, err, msg, producers)
        }
        getTags(b)
        (t, ps: Seq[RespPartition])
      }
      getTags(b)
      Response(throttle, topics)
    }
  }

  /** CreatePartitions (api key 37) v3 — flexible from v2. The
    * handler's partition-validate chain
    * (`create_partitions.cc:50-263`): duplicated topics 42, unknown
    * topic 17 "Topic does not exist", count not above current 42,
    * custom assignments unsupported 42 — each with the handler's
    * message text (typos included). */
  object CreatePartitions {
    final case class ReqTopic(name: String, count: Int,
        assignments: Option[Seq[Seq[Int]]])
    final case class Request(topics: Seq[ReqTopic], timeoutMs: Int,
        validateOnly: Boolean)
    final case class Result(name: String, errorCode: Short,
        errorMessage: Option[String])
    final case class Response(throttleMs: Int, results: Seq[Result])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(24 + r.topics.map(t =>
        12 + compactStringSize(t.name) +
          t.assignments.map(_.map(a => 2 + 4 * a.size).sum + 2).getOrElse(1)).sum)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t =>
        putCompactString(b, t.name)
        b.putInt(t.count)
        t.assignments match {
          case None => putUvarint(b, 0L) // null compact array
          case Some(as) =>
            putCompactArrayLen(b, as.size)
            as.foreach { brokers =>
              putCompactArrayLen(b, brokers.size)
              brokers.foreach(b.putInt)
              putEmptyTags(b)
            }
        }
        putEmptyTags(b)
      }
      b.putInt(r.timeoutMs)
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactString(b)
        val count = b.getInt()
        val n = getUvarint(b)
        val assignments =
          if (n == 0) None
          else Some((0L until n - 1).map { _ =>
            val brokers = (0 until getCompactArrayLen(b)).map(_ => b.getInt())
            getTags(b)
            brokers: Seq[Int]
          }: Seq[Seq[Int]])
        getTags(b)
        ReqTopic(name, count, assignments)
      }
      val timeout = b.getInt(); val vo = b.get() == 1
      getTags(b)
      Request(topics, timeout, vo)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.results.map(x =>
        4 + compactStringSize(x.name) +
          x.errorMessage.map(compactStringSize).getOrElse(1)).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { x =>
        putCompactString(b, x.name)
        b.putShort(x.errorCode)
        putCompactNullableString(b, x.errorMessage)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val r = Result(getCompactString(b), b.getShort(),
          getCompactNullableString(b))
        getTags(b); r
      }
      getTags(b)
      Response(throttle, results)
    }
  }

  /** DeleteTopics (api key 20) v6 — flexible from v4; v6 replaces the
    * name list with (nullable name, topic id) states so topics delete
    * by either handle. Unknown name 3 unknown_topic_or_partition,
    * unknown id 100 unknown_topic_id. */
  object DeleteTopics {
    final case class ReqTopic(name: Option[String], topicId: Array[Byte])
    final case class Request(topics: Seq[ReqTopic], timeoutMs: Int)
    final case class Result(name: Option[String], topicId: Array[Byte],
        errorCode: Short, errorMessage: Option[String])
    final case class Response(throttleMs: Int, responses: Seq[Result])

    val ZeroUuid: Array[Byte] = new Array[Byte](16)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map(t =>
        18 + t.name.map(compactStringSize).getOrElse(1)).sum)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { t =>
        putCompactNullableString(b, t.name)
        require(t.topicId.length == 16, "uuid must be 16 bytes")
        b.put(t.topicId)
        putEmptyTags(b)
      }
      b.putInt(r.timeoutMs)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactNullableString(b)
        val id = new Array[Byte](16); b.get(id)
        getTags(b)
        ReqTopic(name, id)
      }
      val timeout = b.getInt()
      getTags(b)
      Request(topics, timeout)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.responses.map(t =>
        20 + t.name.map(compactStringSize).getOrElse(1) +
          t.errorMessage.map(compactStringSize).getOrElse(1)).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.responses.size)
      r.responses.foreach { t =>
        putCompactNullableString(b, t.name)
        b.put(t.topicId)
        b.putShort(t.errorCode)
        putCompactNullableString(b, t.errorMessage)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val responses = (0 until getCompactArrayLen(b)).map { _ =>
        val name = getCompactNullableString(b)
        val id = new Array[Byte](16); b.get(id)
        val err = b.getShort()
        val msg = getCompactNullableString(b)
        getTags(b)
        Result(name, id, err, msg)
      }
      getTags(b)
      Response(throttle, responses)
    }
  }

  /** OffsetForLeaderEpoch (api key 23) v4 — flexible from v4
    * (KIP-320). Per-partition: the optional current_leader_epoch gate
    * (`details/leader_epoch.h:20-36` — above the partition's epoch 75
    * unknown_leader_epoch, below it 74 fenced_leader_epoch), then the
    * epoch end offset = first offset of the next epoch / log end for
    * the latest / -1 when the epoch was never led
    * (`offset_for_leader_epoch.cc:52-57`). */
  object OffsetForLeaderEpoch {
    final case class ReqPartition(partition: Int, currentLeaderEpoch: Int,
        leaderEpoch: Int)
    final case class Request(replicaId: Int,
        topics: Seq[(String, Seq[ReqPartition])])
    final case class RespPartition(errorCode: Short, partition: Int,
        leaderEpoch: Int, endOffset: Long)
    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[RespPartition])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map { case (t, ps) =>
        4 + compactStringSize(t) + 13 * ps.size }.sum)
      b.putInt(r.replicaId)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putInt(p.partition); b.putInt(p.currentLeaderEpoch)
          b.putInt(p.leaderEpoch); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val replica = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val p = ReqPartition(b.getInt(), b.getInt(), b.getInt())
          getTags(b); p
        }
        getTags(b)
        (t, ps: Seq[ReqPartition])
      }
      getTags(b)
      Request(replica, topics)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.topics.map { case (t, ps) =>
        4 + compactStringSize(t) + 19 * ps.size }.sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putCompactString(b, t)
        putCompactArrayLen(b, ps.size)
        ps.foreach { p =>
          b.putShort(p.errorCode); b.putInt(p.partition)
          b.putInt(p.leaderEpoch); b.putLong(p.endOffset); putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val topics = (0 until getCompactArrayLen(b)).map { _ =>
        val t = getCompactString(b)
        val ps = (0 until getCompactArrayLen(b)).map { _ =>
          val p = RespPartition(b.getShort(), b.getInt(), b.getInt(),
            b.getLong())
          getTags(b); p
        }
        getTags(b)
        (t, ps: Seq[RespPartition])
      }
      getTags(b)
      Response(throttle, topics)
    }
  }

  /** DescribeConfigs (api key 32) v4 — flexible from v4. Per-resource
    * ladder (`describe_configs.cc:100-180`): invalid topic name 17,
    * unknown topic 3, broker_logger 42; configs carry value, source
    * (1 dynamic topic / 5 default) and sensitivity. */
  object DescribeConfigs {
    final case class ReqResource(resourceType: Byte, resourceName: String,
        configurationKeys: Option[Seq[String]])
    final case class Request(resources: Seq[ReqResource],
        includeSynonyms: Boolean, includeDocumentation: Boolean)
    final case class Config(name: String, value: Option[String],
        readOnly: Boolean, configSource: Byte, isSensitive: Boolean,
        configType: Byte, documentation: Option[String])
    final case class Result(errorCode: Short, errorMessage: Option[String],
        resourceType: Byte, resourceName: String, configs: Seq[Config])
    final case class Response(throttleMs: Int, results: Seq[Result])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.resources.map(res =>
        8 + compactStringSize(res.resourceName) +
          res.configurationKeys.map(_.map(compactStringSize).sum + 2).getOrElse(1)).sum)
      putCompactArrayLen(b, r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putCompactString(b, res.resourceName)
        res.configurationKeys match {
          case None => putUvarint(b, 0L) // null compact array
          case Some(keys) =>
            putCompactArrayLen(b, keys.size)
            keys.foreach(putCompactString(b, _))
        }
        putEmptyTags(b)
      }
      b.put(if (r.includeSynonyms) 1.toByte else 0.toByte)
      b.put(if (r.includeDocumentation) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val resources = (0 until getCompactArrayLen(b)).map { _ =>
        val rt = b.get()
        val rn = getCompactString(b)
        val n = getUvarint(b)
        val keys =
          if (n == 0) None
          else Some((0L until n - 1).map(_ => getCompactString(b)): Seq[String])
        getTags(b)
        ReqResource(rt, rn, keys)
      }
      val syn = b.get() == 1; val doc = b.get() == 1
      getTags(b)
      Request(resources, syn, doc)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.results.map(res =>
        16 + res.errorMessage.map(compactStringSize).getOrElse(1) +
          compactStringSize(res.resourceName) +
          res.configs.map(c => 16 + compactStringSize(c.name) +
            c.value.map(compactStringSize).getOrElse(1) +
            c.documentation.map(compactStringSize).getOrElse(1)).sum).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { res =>
        b.putShort(res.errorCode)
        putCompactNullableString(b, res.errorMessage)
        b.put(res.resourceType)
        putCompactString(b, res.resourceName)
        putCompactArrayLen(b, res.configs.size)
        res.configs.foreach { c =>
          putCompactString(b, c.name)
          putCompactNullableString(b, c.value)
          b.put(if (c.readOnly) 1.toByte else 0.toByte)
          b.put(c.configSource)
          b.put(if (c.isSensitive) 1.toByte else 0.toByte)
          putCompactArrayLen(b, 0) // synonyms omitted
          b.put(c.configType)
          putCompactNullableString(b, c.documentation)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val err = b.getShort()
        val msg = getCompactNullableString(b)
        val rt = b.get()
        val rn = getCompactString(b)
        val configs = (0 until getCompactArrayLen(b)).map { _ =>
          val name = getCompactString(b)
          val value = getCompactNullableString(b)
          val readOnly = b.get() == 1
          val source = b.get()
          val sensitive = b.get() == 1
          val nSyn = getCompactArrayLen(b)
          require(nSyn == 0, "synonyms not supported")
          val ctype = b.get()
          val doc = getCompactNullableString(b)
          getTags(b)
          Config(name, value, readOnly, source, sensitive, ctype, doc)
        }
        getTags(b)
        Result(err, msg, rt, rn, configs)
      }
      getTags(b)
      Response(throttle, results)
    }
  }

  /** IncrementalAlterConfigs (api key 44) v1 — flexible from v1.
    * Per-resource validation (`incremental_alter_configs.cc:76-160`):
    * append/subtract unsupported, set requires a value, remove
    * requires none, out-of-range op codes reject — all as
    * invalid_config (40) with the handler's message text. Op codes:
    * set 0, remove 1, append 2, subtract 3 (`protocol/types.h:243`). */
  object IncrementalAlterConfigs {
    final case class ReqConfig(name: String, configOperation: Byte,
        value: Option[String])
    final case class ReqResource(resourceType: Byte, resourceName: String,
        configs: Seq[ReqConfig])
    final case class Request(resources: Seq[ReqResource], validateOnly: Boolean)
    final case class RespResource(errorCode: Short,
        errorMessage: Option[String], resourceType: Byte, resourceName: String)
    final case class Response(throttleMs: Int, responses: Seq[RespResource])

    val OpNames: Map[Byte, String] = Map(0.toByte -> "set",
      1.toByte -> "remove", 2.toByte -> "append", 3.toByte -> "subtract")

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.resources.map(res =>
        8 + compactStringSize(res.resourceName) + res.configs.map(c =>
          8 + compactStringSize(c.name) +
            c.value.map(compactStringSize).getOrElse(1)).sum).sum)
      putCompactArrayLen(b, r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putCompactString(b, res.resourceName)
        putCompactArrayLen(b, res.configs.size)
        res.configs.foreach { c =>
          putCompactString(b, c.name)
          b.put(c.configOperation)
          putCompactNullableString(b, c.value)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val resources = (0 until getCompactArrayLen(b)).map { _ =>
        val rt = b.get()
        val rn = getCompactString(b)
        val configs = (0 until getCompactArrayLen(b)).map { _ =>
          val c = ReqConfig(getCompactString(b), b.get(),
            getCompactNullableString(b))
          getTags(b); c
        }
        getTags(b)
        ReqResource(rt, rn, configs)
      }
      val vo = b.get() == 1
      getTags(b)
      Request(resources, vo)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.responses.map(res =>
        8 + res.errorMessage.map(compactStringSize).getOrElse(1) +
          compactStringSize(res.resourceName)).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.responses.size)
      r.responses.foreach { res =>
        b.putShort(res.errorCode)
        putCompactNullableString(b, res.errorMessage)
        b.put(res.resourceType)
        putCompactString(b, res.resourceName)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val responses = (0 until getCompactArrayLen(b)).map { _ =>
        val r = RespResource(b.getShort(), getCompactNullableString(b),
          b.get(), getCompactString(b))
        getTags(b); r
      }
      getTags(b)
      Response(throttle, responses)
    }
  }

  /** ListGroups (api key 16) v4 — flexible from v3; v4 adds the
    * states filter (KIP-518) and the per-group state. An unparseable
    * state name fails the whole request with invalid_request
    * (`kafka/server/server.cc:612-640`). */
  object ListGroups {
    final case class Request(statesFilter: Seq[String])
    final case class Group(groupId: String, protocolType: String,
        groupState: String)
    final case class Response(throttleMs: Int, errorCode: Short,
        groups: Seq[Group])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.statesFilter.map(compactStringSize).sum)
      putCompactArrayLen(b, r.statesFilter.size)
      r.statesFilter.foreach(putCompactString(b, _))
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val states = (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      getTags(b)
      Request(states)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.groups.map(g =>
        4 + compactStringSize(g.groupId) + compactStringSize(g.protocolType) +
          compactStringSize(g.groupState)).sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactArrayLen(b, r.groups.size)
      r.groups.foreach { g =>
        putCompactString(b, g.groupId)
        putCompactString(b, g.protocolType)
        putCompactString(b, g.groupState)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val err = b.getShort()
      val groups = (0 until getCompactArrayLen(b)).map { _ =>
        val g = Group(getCompactString(b), getCompactString(b),
          getCompactString(b))
        getTags(b); g
      }
      getTags(b)
      Response(throttle, err, groups)
    }
  }

  /** DescribeGroups (api key 15) v5 — flexible from v5. Unknown groups
    * answer a DEAD shell with error 0
    * (`describe_groups.h:64-72` make_dead_described_group); stable
    * groups carry the protocol and member metadata, rebalancing ones
    * members-without-metadata (`group.cc:2532-2556`). */
  object DescribeGroups {
    final case class Request(groups: Seq[String],
        includeAuthorizedOperations: Boolean)
    final case class Member(memberId: String, groupInstanceId: Option[String],
        clientId: String, clientHost: String, metadata: Array[Byte],
        assignment: Array[Byte])
    final case class Group(errorCode: Short, groupId: String,
        groupState: String, protocolType: String, protocolData: String,
        members: Seq[Member], authorizedOperations: Int)
    final case class Response(throttleMs: Int, groups: Seq[Group])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.groups.map(compactStringSize).sum)
      putCompactArrayLen(b, r.groups.size)
      r.groups.foreach(putCompactString(b, _))
      b.put(if (r.includeAuthorizedOperations) 1.toByte else 0.toByte)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val groups = (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      val incl = b.get() == 1
      getTags(b)
      Request(groups, incl)
    }
    private def putCompactBytes(b: ByteBuffer, bytes: Array[Byte]): Unit = {
      putUvarint(b, bytes.length + 1L); b.put(bytes)
    }
    private def getCompactBytes(b: ByteBuffer): Array[Byte] = {
      val n = getUvarint(b)
      require(n > 0, "null compact bytes where non-null expected")
      require(n - 1 <= b.remaining(), s"compact bytes length ${n - 1} exceeds frame")
      val a = new Array[Byte](n.toInt - 1); b.get(a); a
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.groups.map(g =>
        16 + compactStringSize(g.groupId) + compactStringSize(g.groupState) +
          compactStringSize(g.protocolType) + compactStringSize(g.protocolData) +
          g.members.map(m => 8 + compactStringSize(m.memberId) +
            m.groupInstanceId.map(compactStringSize).getOrElse(1) +
            compactStringSize(m.clientId) + compactStringSize(m.clientHost) +
            m.metadata.length + m.assignment.length + 4).sum).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.groups.size)
      r.groups.foreach { g =>
        b.putShort(g.errorCode)
        putCompactString(b, g.groupId)
        putCompactString(b, g.groupState)
        putCompactString(b, g.protocolType)
        putCompactString(b, g.protocolData)
        putCompactArrayLen(b, g.members.size)
        g.members.foreach { m =>
          putCompactString(b, m.memberId)
          putCompactNullableString(b, m.groupInstanceId)
          putCompactString(b, m.clientId)
          putCompactString(b, m.clientHost)
          putCompactBytes(b, m.metadata)
          putCompactBytes(b, m.assignment)
          putEmptyTags(b)
        }
        b.putInt(g.authorizedOperations)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val groups = (0 until getCompactArrayLen(b)).map { _ =>
        val err = b.getShort()
        val gid = getCompactString(b)
        val state = getCompactString(b)
        val ptype = getCompactString(b)
        val pdata = getCompactString(b)
        val members = (0 until getCompactArrayLen(b)).map { _ =>
          val m = Member(getCompactString(b), getCompactNullableString(b),
            getCompactString(b), getCompactString(b), getCompactBytes(b),
            getCompactBytes(b))
          getTags(b); m
        }
        val authOps = b.getInt()
        getTags(b)
        Group(err, gid, state, ptype, pdata, members, authOps)
      }
      getTags(b)
      Response(throttle, groups)
    }
  }

  /** DeleteGroups (api key 42) v2 — flexible from v2. Per-group ladder
    * from `group::remove` (`group.cc:2580-2591`): dead/unknown 69
    * group_id_not_found, non-empty 68 non_empty_group, empty groups
    * tombstone their offsets and answer 0. */
  object DeleteGroups {
    final case class Request(groups: Seq[String])
    final case class Response(throttleMs: Int, results: Seq[(String, Short)])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.groups.map(compactStringSize).sum)
      putCompactArrayLen(b, r.groups.size)
      r.groups.foreach(putCompactString(b, _))
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val groups = (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      getTags(b)
      Request(groups)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.results.map(x =>
        4 + compactStringSize(x._1)).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { case (g, err) =>
        putCompactString(b, g); b.putShort(err); putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val r = (getCompactString(b), b.getShort()); getTags(b); r
      }
      getTags(b)
      Response(throttle, results)
    }
  }

  /** OffsetDelete (api key 47) v0 — NEVER flexible. Group ladder from
    * `group_manager::offset_delete` (`group_manager.cc:1523-1573`):
    * unknown/dead 69, non-empty non-consumer 68; per partition a live
    * subscription refuses with 86 group_subscribed_to_topic, the rest
    * delete. Response error_code comes FIRST (schema order). */
  object OffsetDelete {
    final case class Request(groupId: String, topics: Seq[(String, Seq[Int])])
    final case class Response(errorCode: Short, throttleMs: Int,
        topics: Seq[(String, Seq[(Int, Short)])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + r.groupId.getBytes("UTF-8").length +
        r.topics.map { case (t, ps) =>
          6 + t.getBytes("UTF-8").length + 4 * ps.size }.sum)
      putLegacyString(b, r.groupId)
      b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putLegacyString(b, t)
        b.putInt(ps.size)
        ps.foreach(b.putInt)
      }
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val gid = readLegacyString(b)
      val nt = b.getInt()
      require(nt >= 0 && nt <= b.remaining(), s"topic count $nt exceeds frame")
      Request(gid, (0 until nt).map { _ =>
        val t = readLegacyString(b)
        val np = b.getInt()
        require(np >= 0 && np * 4 <= b.remaining(), s"partition count $np exceeds frame")
        (t, (0 until np).map(_ => b.getInt()): Seq[Int])
      })
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(10 + r.topics.map { case (t, ps) =>
        6 + t.getBytes("UTF-8").length + 6 * ps.size }.sum)
      b.putShort(r.errorCode)
      b.putInt(r.throttleMs)
      b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putLegacyString(b, t)
        b.putInt(ps.size)
        ps.foreach { case (idx, err) => b.putInt(idx); b.putShort(err) }
      }
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val err = b.getShort()
      val throttle = b.getInt()
      val nt = b.getInt()
      require(nt >= 0 && nt <= b.remaining(), s"topic count $nt exceeds frame")
      Response(err, throttle, (0 until nt).map { _ =>
        val t = readLegacyString(b)
        val np = b.getInt()
        require(np >= 0 && np * 6 <= b.remaining(), s"partition count $np exceeds frame")
        (t, (0 until np).map(_ => (b.getInt(), b.getShort())): Seq[(Int, Short)])
      })
    }
  }

  /** Kafka ACL wire enum tables, exactly the reference's conversion
    * switches (`kafka/server/handlers/details/security.h:75-140`):
    * unknown codes throw with the reference's message text, which the
    * handlers surface as invalid_request (42). */
  object AclEnums {
    val ResourceTypes: Map[Byte, String] = Map(
      2.toByte -> "topic", 3.toByte -> "group", 4.toByte -> "cluster",
      5.toByte -> "transactional_id")
    val PatternTypes: Map[Byte, String] = Map(
      3.toByte -> "literal", 4.toByte -> "prefixed")
    val Operations: Map[Byte, String] = Map(
      2.toByte -> "all", 3.toByte -> "read", 4.toByte -> "write",
      5.toByte -> "create", 6.toByte -> "delete", 7.toByte -> "alter",
      8.toByte -> "describe", 9.toByte -> "cluster_action",
      10.toByte -> "describe_configs", 11.toByte -> "alter_configs",
      12.toByte -> "idempotent_write")
    val Permissions: Map[Byte, String] = Map(
      2.toByte -> "deny", 3.toByte -> "allow")

    def resourceType(b: Byte): String = ResourceTypes.getOrElse(b,
      throw new IllegalArgumentException(s"Invalid resource type: $b"))
    def patternType(b: Byte): String = PatternTypes.getOrElse(b,
      throw new IllegalArgumentException(s"Invalid resource pattern type: $b"))
    def operation(b: Byte): String = Operations.getOrElse(b,
      throw new IllegalArgumentException(s"Invalid operation: $b"))
    def permission(b: Byte): String = Permissions.getOrElse(b,
      throw new IllegalArgumentException(s"Invalid permission: $b"))

    /** `to_acl_principal` (security.h:33-60): "User:" or
      * "RedpandaRole:" prefix required, name non-empty, wildcard only
      * for users. */
    def validatePrincipal(p: String): String = {
      val usr = p.startsWith("User:")
      val rol = !usr && p.startsWith("RedpandaRole:")
      if (!usr && !rol)
        throw new IllegalArgumentException(s"Invalid principal name: {$p}")
      val name = p.substring(if (usr) 5 else 13)
      if (name.isEmpty)
        throw new IllegalArgumentException("Principal name cannot be empty")
      if (name == "*" && !rol) p
      else if (name == "*")
        throw new IllegalArgumentException(s"Illegal wildcard role: {$p}")
      else p
    }

    private def rev(m: Map[Byte, String]): Map[String, Byte] = m.map(_.swap)
    val ResourceTypeCodes: Map[String, Byte] = rev(ResourceTypes)
    val PatternTypeCodes: Map[String, Byte] = rev(PatternTypes)
    val OperationCodes: Map[String, Byte] = rev(Operations)
    val PermissionCodes: Map[String, Byte] = rev(Permissions)
  }

  /** CreateAcls (api key 30) v3 — flexible from v2
    * (`create_acls_request.json`): an array of creatable bindings in,
    * a per-creation (error, message) ladder out. */
  object CreateAcls {
    final case class Acl(resourceType: Byte, resourceName: String,
        patternType: Byte, principal: String, host: String,
        operation: Byte, permission: Byte)
    final case class Request(creations: Seq[Acl])
    final case class Response(throttleMs: Int,
        results: Seq[(Short, Option[String])])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.creations.map(a =>
        8 + compactStringSize(a.resourceName) +
          compactStringSize(a.principal) + compactStringSize(a.host)).sum)
      putCompactArrayLen(b, r.creations.size)
      r.creations.foreach { a =>
        b.put(a.resourceType)
        putCompactString(b, a.resourceName)
        b.put(a.patternType)
        putCompactString(b, a.principal)
        putCompactString(b, a.host)
        b.put(a.operation); b.put(a.permission)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val creations = (0 until getCompactArrayLen(b)).map { _ =>
        val a = Acl(b.get(), getCompactString(b), b.get(),
          getCompactString(b), getCompactString(b), b.get(), b.get())
        getTags(b); a
      }
      getTags(b)
      Request(creations)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.results.map(x =>
        4 + x._2.map(compactStringSize).getOrElse(1)).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { case (err, msg) =>
        b.putShort(err); putCompactNullableString(b, msg); putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val r = (b.getShort(), getCompactNullableString(b)); getTags(b); r
      }
      getTags(b)
      Response(throttle, results)
    }
  }

  /** DescribeAcls (api key 29) v3 — flexible from v2: a 7-leg binding
    * filter in, matching bindings grouped by resource out. */
  object DescribeAcls {
    final case class Request(resourceTypeFilter: Byte,
        resourceNameFilter: Option[String], patternTypeFilter: Byte,
        principalFilter: Option[String], hostFilter: Option[String],
        operation: Byte, permission: Byte)
    final case class RespAcl(principal: String, host: String,
        operation: Byte, permission: Byte)
    final case class Resource(resourceType: Byte, resourceName: String,
        patternType: Byte, acls: Seq[RespAcl])
    final case class Response(throttleMs: Int, errorCode: Short,
        errorMessage: Option[String], resources: Seq[Resource])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 +
        r.resourceNameFilter.map(compactStringSize).getOrElse(1) +
        r.principalFilter.map(compactStringSize).getOrElse(1) +
        r.hostFilter.map(compactStringSize).getOrElse(1))
      b.put(r.resourceTypeFilter)
      putCompactNullableString(b, r.resourceNameFilter)
      b.put(r.patternTypeFilter)
      putCompactNullableString(b, r.principalFilter)
      putCompactNullableString(b, r.hostFilter)
      b.put(r.operation); b.put(r.permission)
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val r = Request(b.get(), getCompactNullableString(b), b.get(),
        getCompactNullableString(b), getCompactNullableString(b),
        b.get(), b.get())
      getTags(b); r
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(32 +
        r.errorMessage.map(compactStringSize).getOrElse(1) +
        r.resources.map(res => 8 + compactStringSize(res.resourceName) +
          res.acls.map(a => 8 + compactStringSize(a.principal) +
            compactStringSize(a.host)).sum).sum)
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putCompactNullableString(b, r.errorMessage)
      putCompactArrayLen(b, r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putCompactString(b, res.resourceName)
        b.put(res.patternType)
        putCompactArrayLen(b, res.acls.size)
        res.acls.foreach { a =>
          putCompactString(b, a.principal)
          putCompactString(b, a.host)
          b.put(a.operation); b.put(a.permission)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val err = b.getShort()
      val msg = getCompactNullableString(b)
      val resources = (0 until getCompactArrayLen(b)).map { _ =>
        val rt = b.get(); val rn = getCompactString(b); val pt = b.get()
        val acls = (0 until getCompactArrayLen(b)).map { _ =>
          val a = RespAcl(getCompactString(b), getCompactString(b),
            b.get(), b.get())
          getTags(b); a
        }
        getTags(b)
        Resource(rt, rn, pt, acls)
      }
      getTags(b)
      Response(throttle, err, msg, resources)
    }
  }

  /** DeleteAcls (api key 31) v3 — flexible from v2: an array of binding
    * filters in; per filter, the MATCHING (now deleted) bindings out. */
  object DeleteAcls {
    final case class Filter(resourceTypeFilter: Byte,
        resourceNameFilter: Option[String], patternTypeFilter: Byte,
        principalFilter: Option[String], hostFilter: Option[String],
        operation: Byte, permission: Byte)
    final case class Request(filters: Seq[Filter])
    final case class MatchingAcl(errorCode: Short,
        errorMessage: Option[String], resourceType: Byte,
        resourceName: String, patternType: Byte, principal: String,
        host: String, operation: Byte, permission: Byte)
    final case class FilterResult(errorCode: Short,
        errorMessage: Option[String], matchingAcls: Seq[MatchingAcl])
    final case class Response(throttleMs: Int, results: Seq[FilterResult])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.filters.map(f => 8 +
        f.resourceNameFilter.map(compactStringSize).getOrElse(1) +
        f.principalFilter.map(compactStringSize).getOrElse(1) +
        f.hostFilter.map(compactStringSize).getOrElse(1)).sum)
      putCompactArrayLen(b, r.filters.size)
      r.filters.foreach { f =>
        b.put(f.resourceTypeFilter)
        putCompactNullableString(b, f.resourceNameFilter)
        b.put(f.patternTypeFilter)
        putCompactNullableString(b, f.principalFilter)
        putCompactNullableString(b, f.hostFilter)
        b.put(f.operation); b.put(f.permission)
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val filters = (0 until getCompactArrayLen(b)).map { _ =>
        val f = Filter(b.get(), getCompactNullableString(b), b.get(),
          getCompactNullableString(b), getCompactNullableString(b),
          b.get(), b.get())
        getTags(b); f
      }
      getTags(b)
      Request(filters)
    }
    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + r.results.map(fr => 8 +
        fr.errorMessage.map(compactStringSize).getOrElse(1) +
        fr.matchingAcls.map(m => 16 +
          m.errorMessage.map(compactStringSize).getOrElse(1) +
          compactStringSize(m.resourceName) +
          compactStringSize(m.principal) + compactStringSize(m.host)).sum).sum)
      b.putInt(r.throttleMs)
      putCompactArrayLen(b, r.results.size)
      r.results.foreach { fr =>
        b.putShort(fr.errorCode)
        putCompactNullableString(b, fr.errorMessage)
        putCompactArrayLen(b, fr.matchingAcls.size)
        fr.matchingAcls.foreach { m =>
          b.putShort(m.errorCode)
          putCompactNullableString(b, m.errorMessage)
          b.put(m.resourceType)
          putCompactString(b, m.resourceName)
          b.put(m.patternType)
          putCompactString(b, m.principal)
          putCompactString(b, m.host)
          b.put(m.operation); b.put(m.permission)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      putEmptyTags(b)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until getCompactArrayLen(b)).map { _ =>
        val err = b.getShort()
        val msg = getCompactNullableString(b)
        val matches = (0 until getCompactArrayLen(b)).map { _ =>
          val m = MatchingAcl(b.getShort(), getCompactNullableString(b),
            b.get(), getCompactString(b), b.get(), getCompactString(b),
            getCompactString(b), b.get(), b.get())
          getTags(b); m
        }
        getTags(b)
        FilterResult(err, msg, matches)
      }
      getTags(b)
      Response(throttle, results)
    }
  }

  /** SaslHandshake (api key 17) v1 — NEVER flexible (reference pins
    * 0-1, `sasl_handshake_request.json`): legacy string mechanism in;
    * int16 error + legacy string array of enabled mechanisms out
    * (`kafka/server/server.cc:683-743` answers the configured list on
    * both success and UNSUPPORTED_SASL_MECHANISM). */
  object SaslHandshake {
    final case class Request(mechanism: String)
    final case class Response(errorCode: Short, mechanisms: Seq[String])

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(2 + r.mechanism.getBytes("UTF-8").length)
      putLegacyString(b, r.mechanism)
      b.array()
    }
    def decodeRequest(bytes: Array[Byte]): Request =
      Request(readLegacyString(ByteBuffer.wrap(bytes)))

    def encodeResponse(r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(
        2 + 4 + r.mechanisms.map(2 + _.getBytes("UTF-8").length).sum)
      b.putShort(r.errorCode)
      b.putInt(r.mechanisms.size)
      r.mechanisms.foreach(putLegacyString(b, _))
      b.array()
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val err = b.getShort()
      val n = b.getInt()
      require(n >= 0 && n <= b.remaining() / 2, s"mechanism count $n exceeds frame")
      Response(err, (0 until n).map(_ => readLegacyString(b)))
    }
  }

  /** SaslAuthenticate (api key 36) v2 — flexible from v2
    * (`sasl_authenticate_request.json`). The request is one COMPACT_BYTES
    * auth blob; the response carries error, nullable message, the
    * server's SASL reply bytes, and session_lifetime_ms (v1+), exactly
    * the shape `sasl_authenticate_handler::handle` fills
    * (`kafka/server/server.cc:470-541`). */
  object SaslAuthenticate {
    final case class Request(authBytes: Array[Byte])
    final case class Response(errorCode: Short, errorMessage: Option[String],
        authBytes: Array[Byte], sessionLifetimeMs: Long)

    def encodeRequest(r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(
        uvarintSize(r.authBytes.length + 1L) + r.authBytes.length + 1)
      putUvarint(b, r.authBytes.length + 1L); b.put(r.authBytes)
      putEmptyTags(b)
      b.array()
    }
    def decodeRequest(bytes: Array[Byte]): Request = {
      val b = ByteBuffer.wrap(bytes)
      val n = getUvarint(b)
      require(n > 0, "null auth_bytes")
      require(n - 1 <= b.remaining(), s"auth_bytes length ${n - 1} exceeds frame")
      val a = new Array[Byte](n.toInt - 1); b.get(a)
      getTags(b)
      Request(a)
    }

    def encodeResponse(r: Response): Array[Byte] = {
      val msgLen = r.errorMessage.map(compactStringSize).getOrElse(1)
      val b = ByteBuffer.allocate(2 + msgLen +
        uvarintSize(r.authBytes.length + 1L) + r.authBytes.length + 8 + 1)
      b.putShort(r.errorCode)
      putCompactNullableString(b, r.errorMessage)
      putUvarint(b, r.authBytes.length + 1L); b.put(r.authBytes)
      b.putLong(r.sessionLifetimeMs)
      putEmptyTags(b)
      b.array()
    }
    def decodeResponse(bytes: Array[Byte]): Response = {
      val b = ByteBuffer.wrap(bytes)
      val err = b.getShort()
      val msg = getCompactNullableString(b)
      val n = getUvarint(b)
      require(n > 0, "null auth_bytes")
      require(n - 1 <= b.remaining(), s"auth_bytes length ${n - 1} exceeds frame")
      val a = new Array[Byte](n.toInt - 1); b.get(a)
      val lifetime = b.getLong()
      getTags(b)
      Response(err, msg, a, lifetime)
    }
  }

  /** The classic consumer embedded protocol (the bytes inside JoinGroup
    * metadata / SyncGroup assignments — Kafka's ConsumerProtocol,
    * legacy-encoded regardless of the enclosing message's flexibility):
    * Subscription v0 = version + topic list + nullable user data;
    * Assignment v0 = version + per-topic partition lists + user data. */
  object ConsumerProtocol {
    def encodeSubscription(topics: Seq[String]): Array[Byte] = {
      val b = ByteBuffer.allocate(16 + topics.map(_.length + 2).sum)
      b.putShort(0) // version
      b.putInt(topics.size)
      topics.foreach { t =>
        val tb = t.getBytes("UTF-8")
        b.putShort(tb.length.toShort); b.put(tb)
      }
      b.putInt(-1) // null user data
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeSubscription(bytes: Array[Byte]): Seq[String] = {
      val b = ByteBuffer.wrap(bytes)
      require(b.getShort() >= 0, "bad subscription version")
      (0 until b.getInt()).map { _ =>
        readLegacyString(b)
      }
    }
    def encodeAssignment(parts: Seq[(String, Seq[Int])]): Array[Byte] = {
      val b = ByteBuffer.allocate(16 +
        parts.map { case (t, ps) => 10 + t.length + 4 * ps.size }.sum)
      b.putShort(0)
      b.putInt(parts.size)
      parts.foreach { case (t, ps) =>
        val tb = t.getBytes("UTF-8")
        b.putShort(tb.length.toShort); b.put(tb)
        b.putInt(ps.size); ps.foreach(b.putInt)
      }
      b.putInt(-1)
      java.util.Arrays.copyOf(b.array(), b.position())
    }
    def decodeAssignment(bytes: Array[Byte]): Seq[(String, Seq[Int])] = {
      val b = ByteBuffer.wrap(bytes)
      require(b.getShort() >= 0, "bad assignment version")
      (0 until b.getInt()).map { _ =>
        val n = b.getShort(); val a = new Array[Byte](n); b.get(a)
        val topic = new String(a, "UTF-8")
        (topic, (0 until b.getInt()).map(_ => b.getInt()): Seq[Int])
      }
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
