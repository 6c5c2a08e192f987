package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/**
 * The big-five request serdes across their FULL declared version
 * ranges — the reference handles every version from min to max per
 * `kafka/server/handlers/handlers.h:71-112`, with the per-field
 * version gates declared in `kafka/protocol/schemata`:
 *
 *  - Produce 0-8 (no flexible): `transactional_id` v3+ (nullable).
 *  - Fetch 0-11 (no flexible): `max_bytes` v3+, `isolation_level`
 *    v4+, `session_id`/`session_epoch` v7+, per-partition
 *    `current_leader_epoch` v9+ and `log_start_offset` v5+,
 *    `forgotten_topics_data` v7+, `rack_id` v11+.
 *  - ListOffsets 0-5 (no flexible): `isolation_level` v2+,
 *    `current_leader_epoch` v4+, `max_num_offsets` v0 ONLY.
 *  - OffsetCommit 0-8 (flexible 8+): `generation_id`/`member_id` v1+,
 *    `group_instance_id` v7+ (nullable), `retention_time_ms` v2-4,
 *    per-partition `committed_leader_epoch` v6+ and
 *    `commit_timestamp` v1 only.
 *  - JoinGroup 0-6 (flexible 6+): `rebalance_timeout_ms` v1+,
 *    `group_instance_id` v5+ (nullable).
 *
 * Each serde decodes to a NORMALIZED superset request: fields absent
 * at a version come back as the schema's declared defaults (so an
 * old-client frame means exactly what the reference's handler would
 * see). Flexible versions switch strings/arrays to compact form and
 * add per-struct tag buffers (KIP-482).
 */
object WireVersions {

  // ----------------------------------------------------- legacy helpers

  private def putStr(b: ByteBuffer, s: String): Unit = {
    val bts = s.getBytes("UTF-8")
    b.putShort(bts.length.toShort); b.put(bts)
  }
  private def getStr(b: ByteBuffer): String = {
    val n = b.getShort()
    require(n >= 0 && n <= b.remaining(), s"string length $n exceeds frame")
    val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8")
  }
  private def putNullableStr(b: ByteBuffer, s: Option[String]): Unit = s match {
    case None => b.putShort(-1)
    case Some(v) => putStr(b, v)
  }
  private def getNullableStr(b: ByteBuffer): Option[String] = {
    val n = b.getShort()
    if (n < 0) None
    else {
      require(n <= b.remaining(), s"string length $n exceeds frame")
      val a = new Array[Byte](n); b.get(a); Some(new String(a, "UTF-8"))
    }
  }
  private def strSize(s: String): Int = 2 + s.getBytes("UTF-8").length
  private def nullableStrSize(s: Option[String]): Int =
    s.map(strSize).getOrElse(2)
  private def compactNullableStrSize(s: Option[String]): Int =
    s.map(compactStringSize).getOrElse(1)

  // -------------------------------------------------------- Produce 0-8

  object ProduceV {
    val ValidVersions: Range = 0 to 8

    def size(version: Int, r: WireHeaders.Produce.Request): Int = {
      require(ValidVersions.contains(version), s"produce version $version")
      (if (version >= 3) nullableStrSize(r.transactionalId) else 0) +
        2 + 4 + 4 + r.topics.map { case (n, ps) =>
          strSize(n) + 4 +
            ps.map { case (_, recs) => 4 + 4 + recs.map(_.length).getOrElse(0) }.sum
        }.sum
    }

    def encode(version: Int, r: WireHeaders.Produce.Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 3) putNullableStr(b, r.transactionalId)
      b.putShort(r.acks); b.putInt(r.timeoutMs)
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putStr(b, name)
        b.putInt(parts.size)
        parts.foreach { case (idx, recs) =>
          b.putInt(idx)
          recs match {
            case None => b.putInt(-1)
            case Some(bytes) => b.putInt(bytes.length); b.put(bytes)
          }
        }
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.Produce.Request = {
      require(ValidVersions.contains(version), s"produce version $version")
      val b = ByteBuffer.wrap(bytes)
      val tid = if (version >= 3) getNullableStr(b) else None
      val acks = b.getShort(); val timeout = b.getInt()
      val topics = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt()
          val len = b.getInt()
          (idx, if (len < 0) None else Some(readLegacyBytes(b, len)))
        }
        (name, parts: Seq[(Int, Option[Array[Byte]])])
      }
      require(!b.hasRemaining, "trailing bytes after produce request")
      WireHeaders.Produce.Request(tid, acks, timeout, topics)
    }
  }

  // --------------------------------------------------------- Fetch 0-11

  object FetchV {
    val ValidVersions: Range = 0 to 11

    final case class Part(partitionIndex: Int, currentLeaderEpoch: Int,
        fetchOffset: Long, logStartOffset: Long, maxBytes: Int)
    final case class Request(replicaId: Int, maxWaitMs: Int, minBytes: Int,
        maxBytes: Int, isolationLevel: Byte, sessionId: Int, sessionEpoch: Int,
        topics: Seq[(String, Seq[Part])],
        forgotten: Seq[(String, Seq[Int])], rackId: String)

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"fetch version $version")
      4 + 4 + 4 +
        (if (version >= 3) 4 else 0) +
        (if (version >= 4) 1 else 0) +
        (if (version >= 7) 8 else 0) +
        4 + r.topics.map { case (n, ps) =>
          strSize(n) + 4 + ps.size * (4 + (if (version >= 9) 4 else 0) +
            8 + (if (version >= 5) 8 else 0) + 4)
        }.sum +
        (if (version >= 7)
          4 + r.forgotten.map { case (n, is) => strSize(n) + 4 + 4 * is.size }.sum
         else 0) +
        (if (version >= 11) strSize(r.rackId) else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.replicaId); b.putInt(r.maxWaitMs); b.putInt(r.minBytes)
      if (version >= 3) b.putInt(r.maxBytes)
      if (version >= 4) b.put(r.isolationLevel)
      if (version >= 7) { b.putInt(r.sessionId); b.putInt(r.sessionEpoch) }
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putStr(b, name)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex)
          if (version >= 9) b.putInt(p.currentLeaderEpoch)
          b.putLong(p.fetchOffset)
          if (version >= 5) b.putLong(p.logStartOffset)
          b.putInt(p.maxBytes)
        }
      }
      if (version >= 7) {
        b.putInt(r.forgotten.size)
        r.forgotten.foreach { case (name, idxs) =>
          putStr(b, name)
          b.putInt(idxs.size); idxs.foreach(b.putInt)
        }
      }
      if (version >= 11) putStr(b, r.rackId)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"fetch version $version")
      val b = ByteBuffer.wrap(bytes)
      val replica = b.getInt(); val maxWait = b.getInt(); val minBytes = b.getInt()
      val maxBytes = if (version >= 3) b.getInt() else Int.MaxValue
      val iso = if (version >= 4) b.get() else 0.toByte
      val (sid, sepoch) = if (version >= 7) (b.getInt(), b.getInt()) else (0, -1)
      val topics = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt()
          val epoch = if (version >= 9) b.getInt() else -1
          val off = b.getLong()
          val lso = if (version >= 5) b.getLong() else -1L
          Part(idx, epoch, off, lso, b.getInt())
        }
        (name, parts: Seq[Part])
      }
      val forgotten = if (version >= 7)
        (0 until b.getInt()).map { _ =>
          val name = getStr(b)
          (name, (0 until b.getInt()).map(_ => b.getInt()): Seq[Int])
        }
      else Seq.empty
      val rack = if (version >= 11) getStr(b) else ""
      require(!b.hasRemaining, "trailing bytes after fetch request")
      Request(replica, maxWait, minBytes, maxBytes, iso, sid, sepoch,
        topics, forgotten, rack)
    }
  }

  // --------------------------------------------------- ListOffsets 0-5

  object ListOffsetsV {
    val ValidVersions: Range = 0 to 5

    final case class Part(partitionIndex: Int, currentLeaderEpoch: Int,
        timestamp: Long, maxNumOffsets: Int)
    final case class Request(replicaId: Int, isolationLevel: Byte,
        topics: Seq[(String, Seq[Part])])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"list_offsets version $version")
      4 + (if (version >= 2) 1 else 0) + 4 + r.topics.map { case (n, ps) =>
        strSize(n) + 4 + ps.size * (4 + (if (version >= 4) 4 else 0) + 8 +
          (if (version == 0) 4 else 0))
      }.sum
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.replicaId)
      if (version >= 2) b.put(r.isolationLevel)
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putStr(b, name)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex)
          if (version >= 4) b.putInt(p.currentLeaderEpoch)
          b.putLong(p.timestamp)
          if (version == 0) b.putInt(p.maxNumOffsets)
        }
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"list_offsets version $version")
      val b = ByteBuffer.wrap(bytes)
      val replica = b.getInt()
      val iso = if (version >= 2) b.get() else 0.toByte
      val topics = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt()
          val epoch = if (version >= 4) b.getInt() else -1
          val ts = b.getLong()
          val maxNum = if (version == 0) b.getInt() else 0
          Part(idx, epoch, ts, maxNum)
        }
        (name, parts: Seq[Part])
      }
      require(!b.hasRemaining, "trailing bytes after list_offsets request")
      Request(replica, iso, topics)
    }
  }

  // -------------------------------------------------- OffsetCommit 0-8

  object OffsetCommitV {
    val ValidVersions: Range = 0 to 8
    def flexible(version: Int): Boolean = version >= 8

    final case class Part(partitionIndex: Int, committedOffset: Long,
        committedLeaderEpoch: Int, commitTimestamp: Long,
        metadata: Option[String])
    final case class Request(groupId: String, generationId: Int,
        memberId: String, groupInstanceId: Option[String],
        retentionTimeMs: Long, topics: Seq[(String, Seq[Part])])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"offset_commit version $version")
      if (!flexible(version))
        strSize(r.groupId) +
          (if (version >= 1) 4 + strSize(r.memberId) else 0) +
          (if (version >= 7) nullableStrSize(r.groupInstanceId) else 0) +
          (if (version >= 2 && version <= 4) 8 else 0) +
          4 + r.topics.map { case (n, ps) =>
            strSize(n) + 4 + ps.map(p =>
              4 + 8 + (if (version >= 6) 4 else 0) + (if (version == 1) 8 else 0) +
                nullableStrSize(p.metadata)).sum
          }.sum
      else
        compactStringSize(r.groupId) + 4 + compactStringSize(r.memberId) +
          compactNullableStrSize(r.groupInstanceId) +
          uvarintSize(r.topics.size + 1L) + r.topics.map { case (n, ps) =>
            compactStringSize(n) + uvarintSize(ps.size + 1L) + ps.map(p =>
              4 + 8 + 4 + compactNullableStrSize(p.metadata) + 1).sum + 1
          }.sum + 1
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (!flexible(version)) {
        putStr(b, r.groupId)
        if (version >= 1) { b.putInt(r.generationId); putStr(b, r.memberId) }
        if (version >= 7) putNullableStr(b, r.groupInstanceId)
        if (version >= 2 && version <= 4) b.putLong(r.retentionTimeMs)
        b.putInt(r.topics.size)
        r.topics.foreach { case (name, parts) =>
          putStr(b, name)
          b.putInt(parts.size)
          parts.foreach { p =>
            b.putInt(p.partitionIndex); b.putLong(p.committedOffset)
            if (version >= 6) b.putInt(p.committedLeaderEpoch)
            if (version == 1) b.putLong(p.commitTimestamp)
            putNullableStr(b, p.metadata)
          }
        }
      } else {
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
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"offset_commit version $version")
      val b = ByteBuffer.wrap(bytes)
      val r =
        if (!flexible(version)) {
          val gid = getStr(b)
          val (gen, mid) = if (version >= 1) (b.getInt(), getStr(b)) else (-1, "")
          val gi = if (version >= 7) getNullableStr(b) else None
          val ret = if (version >= 2 && version <= 4) b.getLong() else -1L
          val topics = (0 until b.getInt()).map { _ =>
            val name = getStr(b)
            val parts = (0 until b.getInt()).map { _ =>
              val idx = b.getInt(); val off = b.getLong()
              val epoch = if (version >= 6) b.getInt() else -1
              val ts = if (version == 1) b.getLong() else -1L
              Part(idx, off, epoch, ts, getNullableStr(b))
            }
            (name, parts: Seq[Part])
          }
          Request(gid, gen, mid, gi, ret, topics)
        } else {
          val gid = getCompactString(b)
          val gen = b.getInt()
          val mid = getCompactString(b)
          val gi = getCompactNullableString(b)
          val topics = (0 until getCompactArrayLen(b)).map { _ =>
            val name = getCompactString(b)
            val parts = (0 until getCompactArrayLen(b)).map { _ =>
              val p = Part(b.getInt(), b.getLong(), b.getInt(), -1L,
                getCompactNullableString(b))
              getTags(b); p
            }
            getTags(b)
            (name, parts: Seq[Part])
          }
          getTags(b)
          Request(gid, gen, mid, gi, -1L, topics)
        }
      require(!b.hasRemaining, "trailing bytes after offset_commit request")
      r
    }
  }

  // ------------------------------------------------------ Metadata 0-9

  object MetadataV {
    val ValidVersions: Range = 0 to 9
    def flexible(version: Int): Boolean = version >= 9

    /** topics = None means "all topics" (nullable from v1). */
    final case class Request(topics: Option[Seq[String]],
        allowAutoTopicCreation: Boolean,
        includeClusterAuthorizedOperations: Boolean,
        includeTopicAuthorizedOperations: Boolean)

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"metadata version $version")
      if (!flexible(version))
        (r.topics match {
          case None if version >= 1 => 4 // null array = int32 -1
          case None => 4 // v0 cannot express null: encoded as empty
          case Some(ts) => 4 + ts.map(t => strSize(t)).sum
        }) + (if (version >= 4) 1 else 0) + (if (version >= 8) 2 else 0)
      else
        (r.topics match {
          case None => 1
          case Some(ts) =>
            uvarintSize(ts.size + 1L) +
              ts.map(t => compactStringSize(t) + 1).sum // + per-topic tags
        }) + 1 + 2 + 1 // auto-create + 2 include flags + top tags
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (!flexible(version)) {
        r.topics match {
          case None if version >= 1 => b.putInt(-1)
          case None => b.putInt(0)
          case Some(ts) =>
            b.putInt(ts.size); ts.foreach(t => putStr(b, t))
        }
        if (version >= 4) b.put(if (r.allowAutoTopicCreation) 1.toByte else 0.toByte)
        if (version >= 8) {
          b.put(if (r.includeClusterAuthorizedOperations) 1.toByte else 0.toByte)
          b.put(if (r.includeTopicAuthorizedOperations) 1.toByte else 0.toByte)
        }
      } else {
        r.topics match {
          case None => putUvarint(b, 0L)
          case Some(ts) =>
            putCompactArrayLen(b, ts.size)
            ts.foreach { t => putCompactString(b, t); putEmptyTags(b) }
        }
        b.put(if (r.allowAutoTopicCreation) 1.toByte else 0.toByte)
        b.put(if (r.includeClusterAuthorizedOperations) 1.toByte else 0.toByte)
        b.put(if (r.includeTopicAuthorizedOperations) 1.toByte else 0.toByte)
        putEmptyTags(b)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"metadata version $version")
      val b = ByteBuffer.wrap(bytes)
      val r =
        if (!flexible(version)) {
          val n = b.getInt()
          val topics =
            if (n < 0) None
            else Some((0 until n).map(_ => getStr(b)): Seq[String])
          val auto = if (version >= 4) b.get() != 0 else true
          val (ic, it) = if (version >= 8) (b.get() != 0, b.get() != 0)
            else (false, false)
          Request(topics, auto, ic, it)
        } else {
          val n = getUvarint(b)
          val topics =
            if (n == 0) None
            else Some((0 until (n - 1).toInt).map { _ =>
              val t = getCompactString(b); getTags(b); t
            }: Seq[String])
          val auto = b.get() != 0
          val ic = b.get() != 0; val it = b.get() != 0
          getTags(b)
          Request(topics, auto, ic, it)
        }
      require(!b.hasRemaining, "trailing bytes after metadata request")
      r
    }
  }

  object MetadataRespV {
    val ValidVersions: Range = 0 to 9
    def flexible(version: Int): Boolean = version >= 9

    final case class Part(errorCode: Short, partitionIndex: Int, leaderId: Int,
        leaderEpoch: Int, replicas: Seq[Int], isr: Seq[Int], offline: Seq[Int])
    final case class Topic(errorCode: Short, name: String, isInternal: Boolean,
        partitions: Seq[Part], authorizedOps: Int)
    final case class Response(throttleMs: Int,
        brokers: Seq[(Int, String, Int, Option[String])],
        clusterId: Option[String], controllerId: Int, topics: Seq[Topic],
        clusterAuthorizedOps: Int)

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"metadata_resp version $version")
      require(!flexible(version), "flexible size from the encoder position")
      (if (version >= 3) 4 else 0) +
        4 + r.brokers.map { case (_, h, _, rack) =>
          4 + strSize(h) + 4 + (if (version >= 1) nullableStrSize(rack) else 0)
        }.sum +
        (if (version >= 2) nullableStrSize(r.clusterId) else 0) +
        (if (version >= 1) 4 else 0) +
        4 + r.topics.map { t =>
          2 + strSize(t.name) + (if (version >= 1) 1 else 0) +
            4 + t.partitions.map { p =>
              2 + 4 + 4 + (if (version >= 7) 4 else 0) +
                4 + 4 * p.replicas.size + 4 + 4 * p.isr.size +
                (if (version >= 5) 4 + 4 * p.offline.size else 0)
            }.sum + (if (version >= 8) 4 else 0)
        }.sum + (if (version >= 8) 4 else 0)
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val cap = if (flexible(version)) 4096 else size(version, r)
      val b = ByteBuffer.allocate(cap)
      def arr(n: Int): Unit =
        if (flexible(version)) putCompactArrayLen(b, n) else b.putInt(n)
      def str(s: String): Unit =
        if (flexible(version)) putCompactString(b, s) else putStr(b, s)
      def nstr(s: Option[String]): Unit =
        if (flexible(version)) putCompactNullableString(b, s)
        else putNullableStr(b, s)
      def tags(): Unit = if (flexible(version)) putEmptyTags(b)
      if (version >= 3) b.putInt(r.throttleMs)
      arr(r.brokers.size)
      r.brokers.foreach { case (id, host, port, rack) =>
        b.putInt(id); str(host); b.putInt(port)
        if (version >= 1) nstr(rack)
        tags()
      }
      if (version >= 2) nstr(r.clusterId)
      if (version >= 1) b.putInt(r.controllerId)
      arr(r.topics.size)
      r.topics.foreach { t =>
        b.putShort(t.errorCode); str(t.name)
        if (version >= 1) b.put(if (t.isInternal) 1.toByte else 0.toByte)
        arr(t.partitions.size)
        t.partitions.foreach { p =>
          b.putShort(p.errorCode); b.putInt(p.partitionIndex)
          b.putInt(p.leaderId)
          if (version >= 7) b.putInt(p.leaderEpoch)
          arr(p.replicas.size); p.replicas.foreach(b.putInt)
          arr(p.isr.size); p.isr.foreach(b.putInt)
          if (version >= 5) { arr(p.offline.size); p.offline.foreach(b.putInt) }
          tags()
        }
        if (version >= 8) b.putInt(t.authorizedOps)
        tags()
      }
      if (version >= 8) b.putInt(r.clusterAuthorizedOps)
      tags()
      java.util.Arrays.copyOf(b.array(), b.position())
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"metadata_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      def arr(): Int =
        if (flexible(version)) getCompactArrayLen(b) else b.getInt()
      def str(): String =
        if (flexible(version)) getCompactString(b) else getStr(b)
      def nstr(): Option[String] =
        if (flexible(version)) getCompactNullableString(b) else getNullableStr(b)
      def tags(): Unit = if (flexible(version)) { getTags(b); () }
      val throttle = if (version >= 3) b.getInt() else 0
      val brokers = (0 until arr()).map { _ =>
        val id = b.getInt(); val host = str(); val port = b.getInt()
        val rack = if (version >= 1) nstr() else None
        tags()
        (id, host, port, rack)
      }
      val clusterId = if (version >= 2) nstr() else None
      val controllerId = if (version >= 1) b.getInt() else -1
      val topics = (0 until arr()).map { _ =>
        val err = b.getShort(); val name = str()
        val internal = if (version >= 1) b.get() != 0 else false
        val parts = (0 until arr()).map { _ =>
          val perr = b.getShort(); val idx = b.getInt(); val leader = b.getInt()
          val epoch = if (version >= 7) b.getInt() else -1
          val reps = (0 until arr()).map(_ => b.getInt())
          val isr = (0 until arr()).map(_ => b.getInt())
          val off = if (version >= 5) (0 until arr()).map(_ => b.getInt())
            else Seq.empty[Int]
          tags()
          Part(perr, idx, leader, epoch, reps, isr, off)
        }
        val ops = if (version >= 8) b.getInt() else Int.MinValue
        tags()
        Topic(err, name, internal, parts, ops)
      }
      val clusterOps = if (version >= 8) b.getInt() else Int.MinValue
      tags()
      require(!b.hasRemaining, "trailing bytes after metadata response")
      Response(throttle, brokers, clusterId, controllerId, topics, clusterOps)
    }
  }

  // ------------------------------------------------ Produce response 0-8

  object ProduceRespV {
    import WireHeaders.Produce.{Response, RespPart}
    val ValidVersions: Range = 0 to 8

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"produce_resp version $version")
      4 + r.responses.map { case (n, ps) =>
        strSize(n) + 4 + ps.map { p =>
          4 + 2 + 8 + (if (version >= 2) 8 else 0) + (if (version >= 5) 8 else 0) +
            (if (version >= 8)
              4 + p.recordErrors.map { case (_, m) => 4 + nullableStrSize(m) }.sum +
                nullableStrSize(p.errorMessage)
             else 0)
        }.sum
      }.sum + (if (version >= 1) 4 else 0)
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.responses.size)
      r.responses.foreach { case (name, parts) =>
        putStr(b, name)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putShort(p.errorCode)
          b.putLong(p.baseOffset)
          if (version >= 2) b.putLong(p.logAppendTimeMs)
          if (version >= 5) b.putLong(p.logStartOffset)
          if (version >= 8) {
            b.putInt(p.recordErrors.size)
            p.recordErrors.foreach { case (i, m) => b.putInt(i); putNullableStr(b, m) }
            putNullableStr(b, p.errorMessage)
          }
        }
      }
      if (version >= 1) b.putInt(r.throttleMs)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"produce_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val responses = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt(); val err = b.getShort(); val base = b.getLong()
          val lat = if (version >= 2) b.getLong() else -1L
          val lso = if (version >= 5) b.getLong() else -1L
          val (recErrs, errMsg) =
            if (version >= 8)
              ((0 until b.getInt()).map(_ => (b.getInt(), getNullableStr(b))),
                getNullableStr(b))
            else (Seq.empty, None)
          RespPart(idx, err, base, lat, lso, recErrs, errMsg)
        }
        (name, parts: Seq[RespPart])
      }
      val throttle = if (version >= 1) b.getInt() else 0
      require(!b.hasRemaining, "trailing bytes after produce response")
      Response(responses, throttle)
    }
  }

  // -------------------------------------------------- Fetch response 0-11

  object FetchRespV {
    val ValidVersions: Range = 0 to 11

    final case class Part(partitionIndex: Int, errorCode: Short,
        highWatermark: Long, lastStableOffset: Long, logStartOffset: Long,
        aborted: Option[Seq[(Long, Long)]], preferredReadReplica: Int,
        records: Option[Array[Byte]])
    final case class Response(throttleMs: Int, errorCode: Short,
        sessionId: Int, topics: Seq[(String, Seq[Part])])

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"fetch_resp version $version")
      (if (version >= 1) 4 else 0) + (if (version >= 7) 2 + 4 else 0) +
        4 + r.topics.map { case (n, ps) =>
          strSize(n) + 4 + ps.map { p =>
            4 + 2 + 8 + (if (version >= 4) 8 else 0) +
              (if (version >= 5) 8 else 0) +
              (if (version >= 4) 4 + p.aborted.map(_.size * 16).getOrElse(0) else 0) +
              (if (version >= 11) 4 else 0) +
              4 + p.records.map(_.length).getOrElse(0)
          }.sum
        }.sum
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 1) b.putInt(r.throttleMs)
      if (version >= 7) { b.putShort(r.errorCode); b.putInt(r.sessionId) }
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putStr(b, name)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putShort(p.errorCode)
          b.putLong(p.highWatermark)
          if (version >= 4) b.putLong(p.lastStableOffset)
          if (version >= 5) b.putLong(p.logStartOffset)
          if (version >= 4) p.aborted match {
            case None => b.putInt(-1)
            case Some(as) =>
              b.putInt(as.size)
              as.foreach { case (pid, off) => b.putLong(pid); b.putLong(off) }
          }
          if (version >= 11) b.putInt(p.preferredReadReplica)
          p.records match {
            case None => b.putInt(-1)
            case Some(bytes) => b.putInt(bytes.length); b.put(bytes)
          }
        }
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"fetch_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val throttle = if (version >= 1) b.getInt() else 0
      val (err, sid) = if (version >= 7) (b.getShort(), b.getInt())
        else (0.toShort, 0)
      val topics = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt(); val perr = b.getShort(); val hwm = b.getLong()
          val lso = if (version >= 4) b.getLong() else -1L
          val logStart = if (version >= 5) b.getLong() else -1L
          val aborted = if (version >= 4) {
            val n = b.getInt()
            if (n < 0) None
            else Some((0 until n).map(_ => (b.getLong(), b.getLong())): Seq[(Long, Long)])
          } else None
          val prr = if (version >= 11) b.getInt() else -1
          val rl = b.getInt()
          val recs = if (rl < 0) None else Some(readLegacyBytes(b, rl))
          Part(idx, perr, hwm, lso, logStart, aborted, prr, recs)
        }
        (name, parts: Seq[Part])
      }
      require(!b.hasRemaining, "trailing bytes after fetch response")
      Response(throttle, err, sid, topics)
    }
  }

  // -------------------------------------------- ListOffsets response 0-5

  object ListOffsetsRespV {
    val ValidVersions: Range = 0 to 5

    final case class Part(partitionIndex: Int, errorCode: Short,
        oldStyleOffsets: Seq[Long], timestamp: Long, offset: Long,
        leaderEpoch: Int)
    final case class Response(throttleMs: Int, topics: Seq[(String, Seq[Part])])

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"list_offsets_resp version $version")
      (if (version >= 2) 4 else 0) + 4 + r.topics.map { case (n, ps) =>
        strSize(n) + 4 + ps.map(p =>
          4 + 2 + (if (version == 0) 4 + 8 * p.oldStyleOffsets.size else 8 + 8) +
            (if (version >= 4) 4 else 0)).sum
      }.sum
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 2) b.putInt(r.throttleMs)
      b.putInt(r.topics.size)
      r.topics.foreach { case (name, parts) =>
        putStr(b, name)
        b.putInt(parts.size)
        parts.foreach { p =>
          b.putInt(p.partitionIndex); b.putShort(p.errorCode)
          if (version == 0) {
            b.putInt(p.oldStyleOffsets.size); p.oldStyleOffsets.foreach(b.putLong)
          } else { b.putLong(p.timestamp); b.putLong(p.offset) }
          if (version >= 4) b.putInt(p.leaderEpoch)
        }
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"list_offsets_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val throttle = if (version >= 2) b.getInt() else 0
      val topics = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val parts = (0 until b.getInt()).map { _ =>
          val idx = b.getInt(); val err = b.getShort()
          val (old, ts, off) =
            if (version == 0)
              (((0 until b.getInt()).map(_ => b.getLong())): Seq[Long], -1L, -1L)
            else (Seq.empty[Long], b.getLong(), b.getLong())
          val epoch = if (version >= 4) b.getInt() else -1
          Part(idx, err, old, ts, off, epoch)
        }
        (name, parts: Seq[Part])
      }
      require(!b.hasRemaining, "trailing bytes after list_offsets response")
      Response(throttle, topics)
    }
  }

  // ------------------------------------------- OffsetCommit response 0-8

  object OffsetCommitRespV {
    val ValidVersions: Range = 0 to 8
    def flexible(version: Int): Boolean = version >= 8

    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[(Int, Short)])])

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"offset_commit_resp version $version")
      if (!flexible(version))
        (if (version >= 3) 4 else 0) + 4 + r.topics.map { case (n, ps) =>
          strSize(n) + 4 + 6 * ps.size
        }.sum
      else
        4 + uvarintSize(r.topics.size + 1L) + r.topics.map { case (n, ps) =>
          compactStringSize(n) + uvarintSize(ps.size + 1L) + 7 * ps.size + 1
        }.sum + 1
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (!flexible(version)) {
        if (version >= 3) b.putInt(r.throttleMs)
        b.putInt(r.topics.size)
        r.topics.foreach { case (name, parts) =>
          putStr(b, name)
          b.putInt(parts.size)
          parts.foreach { case (idx, err) => b.putInt(idx); b.putShort(err) }
        }
      } else {
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
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"offset_commit_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val r =
        if (!flexible(version)) {
          val throttle = if (version >= 3) b.getInt() else 0
          Response(throttle, (0 until b.getInt()).map { _ =>
            val name = getStr(b)
            (name, (0 until b.getInt()).map(_ =>
              (b.getInt(), b.getShort())): Seq[(Int, Short)])
          })
        } else {
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
      require(!b.hasRemaining, "trailing bytes after offset_commit response")
      r
    }
  }

  // ---------------------------------------------- JoinGroup response 0-6

  object JoinGroupRespV {
    import WireHeaders.JoinGroup.{Response, Member}
    val ValidVersions: Range = 0 to 6
    def flexible(version: Int): Boolean = version >= 6

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"join_group_resp version $version")
      require(!flexible(version), "flexible size comes from the encoder")
      (if (version >= 2) 4 else 0) + 2 + 4 + strSize(r.protocolName) +
        strSize(r.leader) + strSize(r.memberId) + 4 + r.members.map(m =>
          strSize(m.memberId) +
            (if (version >= 5) nullableStrSize(m.groupInstanceId) else 0) +
            4 + m.metadata.length).sum
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      if (flexible(version)) return WireHeaders.JoinGroup.encodeResponse(r)
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 2) b.putInt(r.throttleMs)
      b.putShort(r.errorCode); b.putInt(r.generationId)
      putStr(b, r.protocolName); putStr(b, r.leader); putStr(b, r.memberId)
      b.putInt(r.members.size)
      r.members.foreach { m =>
        putStr(b, m.memberId)
        if (version >= 5) putNullableStr(b, m.groupInstanceId)
        b.putInt(m.metadata.length); b.put(m.metadata)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"join_group_resp version $version")
      if (flexible(version)) return WireHeaders.JoinGroup.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = if (version >= 2) b.getInt() else 0
      val err = b.getShort(); val gen = b.getInt()
      val proto = getStr(b); val leader = getStr(b); val mid = getStr(b)
      val members = (0 until b.getInt()).map { _ =>
        val m = getStr(b)
        val gi = if (version >= 5) getNullableStr(b) else None
        val n = b.getInt()
        Member(m, gi, readLegacyBytes(b, n))
      }
      require(!b.hasRemaining, "trailing bytes after join_group response")
      Response(throttle, err, gen, proto, leader, mid, members)
    }
  }

  // ----------------------------------------------------- JoinGroup 0-6

  object JoinGroupV {
    val ValidVersions: Range = 0 to 6
    def flexible(version: Int): Boolean = version >= 6

    def size(version: Int, r: WireHeaders.JoinGroup.Request): Int = {
      require(ValidVersions.contains(version), s"join_group version $version")
      if (!flexible(version))
        strSize(r.groupId) + 4 + (if (version >= 1) 4 else 0) +
          strSize(r.memberId) +
          (if (version >= 5) nullableStrSize(r.groupInstanceId) else 0) +
          strSize(r.protocolType) + 4 + r.protocols.map(p =>
            strSize(p.name) + 4 + p.metadata.length).sum
      else
        compactStringSize(r.groupId) + 4 + 4 + compactStringSize(r.memberId) +
          compactNullableStrSize(r.groupInstanceId) +
          compactStringSize(r.protocolType) +
          uvarintSize(r.protocols.size + 1L) + r.protocols.map(p =>
            compactStringSize(p.name) +
              uvarintSize(p.metadata.length + 1L) + p.metadata.length + 1).sum + 1
    }

    def encode(version: Int, r: WireHeaders.JoinGroup.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.JoinGroup.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      putStr(b, r.groupId)
      b.putInt(r.sessionTimeoutMs)
      if (version >= 1) b.putInt(r.rebalanceTimeoutMs)
      putStr(b, r.memberId)
      if (version >= 5) putNullableStr(b, r.groupInstanceId)
      putStr(b, r.protocolType)
      b.putInt(r.protocols.size)
      r.protocols.foreach { p =>
        putStr(b, p.name)
        b.putInt(p.metadata.length); b.put(p.metadata)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.JoinGroup.Request = {
      require(ValidVersions.contains(version), s"join_group version $version")
      if (flexible(version)) return WireHeaders.JoinGroup.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val gid = getStr(b)
      val st = b.getInt()
      val rt = if (version >= 1) b.getInt() else -1
      val mid = getStr(b)
      val gi = if (version >= 5) getNullableStr(b) else None
      val ptype = getStr(b)
      val protos = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val n = b.getInt()
        WireHeaders.JoinGroup.Protocol(name, readLegacyBytes(b, n))
      }
      require(!b.hasRemaining, "trailing bytes after join_group request")
      WireHeaders.JoinGroup.Request(gid, st, rt, mid, gi, ptype, protos)
    }
  }

  // =================================================================
  // Tier-2 keys: the next most-used handler ranges after the big six
  // (`kafka/server/handlers/handlers.h:71-112`). Same normalized-
  // superset discipline: OffsetFetch 0-8 (flexible 6+, KIP-709
  // batched groups at 8), FindCoordinator 0-4 (flexible 3+, KIP-699
  // batched keys at 4), SyncGroup 0-5 (flexible 4+), Heartbeat 0-4
  // (flexible 4+), LeaveGroup 0-5 (flexible 4+, batched members 3+),
  // ApiVersions request 0-3 (flexible 3+ adds client software
  // name/version; the response matrix lives in WireHeaders).
  // =================================================================

  private def putLegacyBytes(b: ByteBuffer, a: Array[Byte]): Unit = {
    b.putInt(a.length); b.put(a)
  }
  private def putCompactBytes(b: ByteBuffer, a: Array[Byte]): Unit = {
    putUvarint(b, a.length + 1L); b.put(a)
  }
  private def getCompactBytes(b: ByteBuffer): Array[Byte] = {
    val n = getUvarint(b).toInt - 1
    require(n >= 0 && n <= b.remaining(), s"bytes length $n exceeds frame")
    val a = new Array[Byte](n); b.get(a); a
  }
  private def compactBytesSize(a: Array[Byte]): Int =
    uvarintSize(a.length + 1L) + a.length

  // ------------------------------------------------- OffsetFetch 0-8

  object OffsetFetchV {
    val ValidVersions: Range = 0 to 8
    def flexible(version: Int): Boolean = version >= 6

    /** Normalized: one group per entry; v<8 frames carry exactly one.
      * `topics = None` means "all topics" (nullable 2+ / 8+). */
    final case class Group(groupId: String,
        topics: Option[Seq[(String, Seq[Int])]])
    final case class Request(groups: Seq[Group], requireStable: Boolean)

    private def topicSize(flex: Boolean, t: (String, Seq[Int])): Int =
      if (flex) compactStringSize(t._1) + uvarintSize(t._2.size + 1L) +
        t._2.size * 4 + 1
      else strSize(t._1) + 4 + t._2.size * 4

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"offset_fetch version $version")
      val flex = flexible(version)
      if (version < 8) {
        val g = r.groups.head
        val gid = if (flex) compactStringSize(g.groupId) else strSize(g.groupId)
        val topics = g.topics match {
          case None =>
            require(version >= 2, "all-topics (null) needs v2+")
            if (flex) 1 else 4
          case Some(ts) =>
            (if (flex) uvarintSize(ts.size + 1L) else 4) +
              ts.map(topicSize(flex, _)).sum
        }
        gid + topics + (if (version >= 7) 1 else 0) + (if (flex) 1 else 0)
      } else {
        uvarintSize(r.groups.size + 1L) + r.groups.map { g =>
          compactStringSize(g.groupId) + (g.topics match {
            case None => 1
            case Some(ts) => uvarintSize(ts.size + 1L) +
              ts.map(topicSize(flex = true, _)).sum
          }) + 1
        }.sum + 1 + 1
      }
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def putTopic(t: (String, Seq[Int])): Unit = {
        if (flex) putCompactString(b, t._1) else putStr(b, t._1)
        if (flex) putCompactArrayLen(b, t._2.size) else b.putInt(t._2.size)
        t._2.foreach(b.putInt)
        if (flex) putEmptyTags(b)
      }
      if (version < 8) {
        val g = r.groups.head
        if (flex) putCompactString(b, g.groupId) else putStr(b, g.groupId)
        g.topics match {
          case None => if (flex) putUvarint(b, 0L) else b.putInt(-1)
          case Some(ts) =>
            if (flex) putCompactArrayLen(b, ts.size) else b.putInt(ts.size)
            ts.foreach(putTopic)
        }
        if (version >= 7) b.put(if (r.requireStable) 1.toByte else 0.toByte)
        if (flex) putEmptyTags(b)
      } else {
        putCompactArrayLen(b, r.groups.size)
        r.groups.foreach { g =>
          putCompactString(b, g.groupId)
          g.topics match {
            case None => putUvarint(b, 0L)
            case Some(ts) => putCompactArrayLen(b, ts.size); ts.foreach(putTopic)
          }
          putEmptyTags(b)
        }
        b.put(if (r.requireStable) 1.toByte else 0.toByte)
        putEmptyTags(b)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"offset_fetch version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def getTopic(): (String, Seq[Int]) = {
        val name = if (flex) getCompactString(b) else getStr(b)
        val n = if (flex) getCompactArrayLen(b) else b.getInt()
        val ps = (0 until n).map(_ => b.getInt())
        if (flex) getTags(b)
        (name, ps)
      }
      val r = if (version < 8) {
        val gid = if (flex) getCompactString(b) else getStr(b)
        val rawN = if (flex) getUvarint(b).toInt - 1 else b.getInt()
        val topics =
          if (rawN < 0) None
          else Some((0 until rawN).map(_ => getTopic()))
        val stable = if (version >= 7) b.get() != 0 else false
        if (flex) getTags(b)
        Request(Seq(Group(gid, topics)), stable)
      } else {
        val groups = (0 until getCompactArrayLen(b)).map { _ =>
          val gid = getCompactString(b)
          val rawN = getUvarint(b).toInt - 1
          val topics =
            if (rawN < 0) None else Some((0 until rawN).map(_ => getTopic()))
          getTags(b)
          Group(gid, topics)
        }
        val stable = b.get() != 0
        getTags(b)
        Request(groups, stable)
      }
      require(!b.hasRemaining, "trailing bytes after offset_fetch request")
      r
    }
  }

  // ---------------------------------------- OffsetFetch response 0-8

  object OffsetFetchRespV {
    val ValidVersions: Range = 0 to 8
    def flexible(version: Int): Boolean = version >= 6

    final case class Part(partitionIndex: Int, committedOffset: Long,
        committedLeaderEpoch: Int, metadata: Option[String], errorCode: Short)
    /** Normalized: per-group rows; v<8 carries one group whose
      * group-level error is the top-level error_code (v2+). */
    final case class Group(groupId: String,
        topics: Seq[(String, Seq[Part])], errorCode: Short)
    final case class Response(throttleMs: Int, groups: Seq[Group])

    private def partSize(version: Int, p: Part): Int = {
      val flex = flexible(version)
      4 + 8 + (if (version >= 5 || version == 8) 4 else 0) +
        (if (flex) compactNullableStrSize(p.metadata)
         else nullableStrSize(p.metadata)) + 2 + (if (flex) 1 else 0)
    }
    private def topicsSize(version: Int, ts: Seq[(String, Seq[Part])]): Int = {
      val flex = flexible(version)
      (if (flex) uvarintSize(ts.size + 1L) else 4) + ts.map { case (n, ps) =>
        (if (flex) compactStringSize(n) else strSize(n)) +
          (if (flex) uvarintSize(ps.size + 1L) else 4) +
          ps.map(partSize(version, _)).sum + (if (flex) 1 else 0)
      }.sum
    }

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"offset_fetch_resp version $version")
      val flex = flexible(version)
      (if (version >= 3) 4 else 0) +
        (if (version < 8) {
          val g = r.groups.head
          topicsSize(version, g.topics) + (if (version >= 2) 2 else 0)
        } else {
          uvarintSize(r.groups.size + 1L) + r.groups.map { g =>
            compactStringSize(g.groupId) + topicsSize(version, g.topics) + 2 + 1
          }.sum
        }) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def putTopics(ts: Seq[(String, Seq[Part])]): Unit = {
        if (flex) putCompactArrayLen(b, ts.size) else b.putInt(ts.size)
        ts.foreach { case (n, ps) =>
          if (flex) putCompactString(b, n) else putStr(b, n)
          if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
          ps.foreach { p =>
            b.putInt(p.partitionIndex); b.putLong(p.committedOffset)
            if (version >= 5 || version == 8) b.putInt(p.committedLeaderEpoch)
            if (flex) putCompactNullableString(b, p.metadata)
            else putNullableStr(b, p.metadata)
            b.putShort(p.errorCode)
            if (flex) putEmptyTags(b)
          }
          if (flex) putEmptyTags(b)
        }
      }
      if (version >= 3) b.putInt(r.throttleMs)
      if (version < 8) {
        val g = r.groups.head
        putTopics(g.topics)
        if (version >= 2) b.putShort(g.errorCode)
      } else {
        putCompactArrayLen(b, r.groups.size)
        r.groups.foreach { g =>
          putCompactString(b, g.groupId)
          putTopics(g.topics)
          b.putShort(g.errorCode)
          putEmptyTags(b)
        }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"offset_fetch_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def getTopics(): Seq[(String, Seq[Part])] = {
        val n = if (flex) getCompactArrayLen(b) else b.getInt()
        (0 until n).map { _ =>
          val name = if (flex) getCompactString(b) else getStr(b)
          val np = if (flex) getCompactArrayLen(b) else b.getInt()
          val ps = (0 until np).map { _ =>
            val idx = b.getInt(); val off = b.getLong()
            val epoch = if (version >= 5 || version == 8) b.getInt() else -1
            val md = if (flex) getCompactNullableString(b) else getNullableStr(b)
            val ec = b.getShort()
            if (flex) getTags(b)
            Part(idx, off, epoch, md, ec)
          }
          if (flex) getTags(b)
          (name, ps: Seq[Part])
        }
      }
      val throttle = if (version >= 3) b.getInt() else 0
      val r = if (version < 8) {
        val topics = getTopics()
        val ec = if (version >= 2) b.getShort() else 0.toShort
        if (flex) getTags(b)
        Response(throttle, Seq(Group("", topics, ec)))
      } else {
        val groups = (0 until getCompactArrayLen(b)).map { _ =>
          val gid = getCompactString(b)
          val topics = getTopics()
          val ec = b.getShort()
          getTags(b)
          Group(gid, topics, ec)
        }
        getTags(b)
        Response(throttle, groups)
      }
      require(!b.hasRemaining, "trailing bytes after offset_fetch response")
      r
    }
  }

  // --------------------------------------------- FindCoordinator 0-4

  object FindCoordinatorV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 3

    /** Normalized: keys is the batched v4 list; v<4 frames carry one. */
    final case class Request(keyType: Byte, keys: Seq[String])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"find_coordinator version $version")
      val flex = flexible(version)
      (if (version < 4)
        (if (flex) compactStringSize(r.keys.head) else strSize(r.keys.head))
      else uvarintSize(r.keys.size + 1L) + r.keys.map(compactStringSize).sum) +
        (if (version >= 1) 1 else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (version < 4) {
        if (flex) putCompactString(b, r.keys.head) else putStr(b, r.keys.head)
      }
      if (version >= 1) b.put(r.keyType)
      if (version >= 4) {
        putCompactArrayLen(b, r.keys.size)
        r.keys.foreach(putCompactString(b, _))
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"find_coordinator version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val single = if (version < 4)
        Some(if (flex) getCompactString(b) else getStr(b)) else None
      val kt = if (version >= 1) b.get() else 0.toByte
      val keys = single match {
        case Some(k) => Seq(k)
        case None =>
          (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after find_coordinator request")
      Request(kt, keys)
    }
  }

  // ------------------------------------ FindCoordinator response 0-4

  object FindCoordinatorRespV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 3

    final case class Coord(key: String, nodeId: Int, host: String, port: Int,
        errorCode: Short, errorMessage: Option[String])
    final case class Response(throttleMs: Int, coordinators: Seq[Coord])

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"find_coordinator_resp version $version")
      val flex = flexible(version)
      (if (version >= 1) 4 else 0) +
        (if (version < 4) {
          val c = r.coordinators.head
          2 + (if (version >= 1) {
            if (flex) compactNullableStrSize(c.errorMessage)
            else nullableStrSize(c.errorMessage)
          } else 0) +
            4 + (if (flex) compactStringSize(c.host) else strSize(c.host)) + 4
        } else {
          uvarintSize(r.coordinators.size + 1L) + r.coordinators.map { c =>
            compactStringSize(c.key) + 4 + compactStringSize(c.host) + 4 + 2 +
              compactNullableStrSize(c.errorMessage) + 1
          }.sum
        }) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (version >= 1) b.putInt(r.throttleMs)
      if (version < 4) {
        val c = r.coordinators.head
        b.putShort(c.errorCode)
        if (version >= 1) {
          if (flex) putCompactNullableString(b, c.errorMessage)
          else putNullableStr(b, c.errorMessage)
        }
        b.putInt(c.nodeId)
        if (flex) putCompactString(b, c.host) else putStr(b, c.host)
        b.putInt(c.port)
      } else {
        putCompactArrayLen(b, r.coordinators.size)
        r.coordinators.foreach { c =>
          putCompactString(b, c.key)
          b.putInt(c.nodeId)
          putCompactString(b, c.host)
          b.putInt(c.port)
          b.putShort(c.errorCode)
          putCompactNullableString(b, c.errorMessage)
          putEmptyTags(b)
        }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"find_coordinator_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = if (version >= 1) b.getInt() else 0
      val r = if (version < 4) {
        val ec = b.getShort()
        val em = if (version >= 1) {
          if (flex) getCompactNullableString(b) else getNullableStr(b)
        } else None
        val nid = b.getInt()
        val host = if (flex) getCompactString(b) else getStr(b)
        val port = b.getInt()
        if (flex) getTags(b)
        Response(throttle, Seq(Coord("", nid, host, port, ec, em)))
      } else {
        val cs = (0 until getCompactArrayLen(b)).map { _ =>
          val key = getCompactString(b)
          val nid = b.getInt()
          val host = getCompactString(b)
          val port = b.getInt()
          val ec = b.getShort()
          val em = getCompactNullableString(b)
          getTags(b)
          Coord(key, nid, host, port, ec, em)
        }
        getTags(b)
        Response(throttle, cs)
      }
      require(!b.hasRemaining, "trailing bytes after find_coordinator response")
      r
    }
  }

  // ------------------------------------------------- SyncGroup 0-5

  object SyncGroupV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 4

    final case class Request(groupId: String, generationId: Int,
        memberId: String, groupInstanceId: Option[String],
        protocolType: Option[String], protocolName: Option[String],
        assignments: Seq[(String, Array[Byte])])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"sync_group version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      str(r.groupId) + 4 + str(r.memberId) +
        (if (version >= 3) nstr(r.groupInstanceId) else 0) +
        (if (version >= 5) nstr(r.protocolType) + nstr(r.protocolName) else 0) +
        (if (flex) uvarintSize(r.assignments.size + 1L) else 4) +
        r.assignments.map { case (m, a) =>
          str(m) + (if (flex) compactBytesSize(a) + 1 else 4 + a.length)
        }.sum + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def str(s: String): Unit = if (flex) putCompactString(b, s) else putStr(b, s)
      def nstr(s: Option[String]): Unit =
        if (flex) putCompactNullableString(b, s) else putNullableStr(b, s)
      str(r.groupId); b.putInt(r.generationId); str(r.memberId)
      if (version >= 3) nstr(r.groupInstanceId)
      if (version >= 5) { nstr(r.protocolType); nstr(r.protocolName) }
      if (flex) putCompactArrayLen(b, r.assignments.size)
      else b.putInt(r.assignments.size)
      r.assignments.foreach { case (m, a) =>
        str(m)
        if (flex) { putCompactBytes(b, a); putEmptyTags(b) }
        else putLegacyBytes(b, a)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"sync_group version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def str() = if (flex) getCompactString(b) else getStr(b)
      def nstr() = if (flex) getCompactNullableString(b) else getNullableStr(b)
      val gid = str(); val gen = b.getInt(); val mid = str()
      val gi = if (version >= 3) nstr() else None
      val (pt, pn) = if (version >= 5) (nstr(), nstr()) else (None, None)
      val n = if (flex) getCompactArrayLen(b) else b.getInt()
      val assigns = (0 until n).map { _ =>
        val m = str()
        val a = if (flex) { val x = getCompactBytes(b); getTags(b); x }
                else readLegacyBytes(b, b.getInt())
        (m, a)
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after sync_group request")
      Request(gid, gen, mid, gi, pt, pn, assigns)
    }
  }

  // ------------------------------------------ SyncGroup response 0-5

  object SyncGroupRespV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 4

    final case class Response(throttleMs: Int, errorCode: Short,
        protocolType: Option[String], protocolName: Option[String],
        assignment: Array[Byte])

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"sync_group_resp version $version")
      val flex = flexible(version)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      (if (version >= 1) 4 else 0) + 2 +
        (if (version >= 5) nstr(r.protocolType) + nstr(r.protocolName) else 0) +
        (if (flex) compactBytesSize(r.assignment) else 4 + r.assignment.length) +
        (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (version >= 1) b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      if (version >= 5) {
        if (flex) {
          putCompactNullableString(b, r.protocolType)
          putCompactNullableString(b, r.protocolName)
        } else {
          putNullableStr(b, r.protocolType); putNullableStr(b, r.protocolName)
        }
      }
      if (flex) putCompactBytes(b, r.assignment)
      else putLegacyBytes(b, r.assignment)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"sync_group_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = if (version >= 1) b.getInt() else 0
      val ec = b.getShort()
      val (pt, pn) = if (version >= 5) {
        if (flex) (getCompactNullableString(b), getCompactNullableString(b))
        else (getNullableStr(b), getNullableStr(b))
      } else (None, None)
      val a = if (flex) getCompactBytes(b) else readLegacyBytes(b, b.getInt())
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after sync_group response")
      Response(throttle, ec, pt, pn, a)
    }
  }

  // ------------------------------------------------- Heartbeat 0-4

  object HeartbeatV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 4

    final case class Request(groupId: String, generationId: Int,
        memberId: String, groupInstanceId: Option[String])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"heartbeat version $version")
      val flex = flexible(version)
      (if (flex) compactStringSize(r.groupId) else strSize(r.groupId)) + 4 +
        (if (flex) compactStringSize(r.memberId) else strSize(r.memberId)) +
        (if (version >= 3) {
          if (flex) compactNullableStrSize(r.groupInstanceId)
          else nullableStrSize(r.groupInstanceId)
        } else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (flex) putCompactString(b, r.groupId) else putStr(b, r.groupId)
      b.putInt(r.generationId)
      if (flex) putCompactString(b, r.memberId) else putStr(b, r.memberId)
      if (version >= 3) {
        if (flex) putCompactNullableString(b, r.groupInstanceId)
        else putNullableStr(b, r.groupInstanceId)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"heartbeat version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val gid = if (flex) getCompactString(b) else getStr(b)
      val gen = b.getInt()
      val mid = if (flex) getCompactString(b) else getStr(b)
      val gi = if (version >= 3) {
        if (flex) getCompactNullableString(b) else getNullableStr(b)
      } else None
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after heartbeat request")
      Request(gid, gen, mid, gi)
    }
  }

  // ------------------------------------------------ LeaveGroup 0-5

  object LeaveGroupV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 4

    final case class Member(memberId: String, groupInstanceId: Option[String],
        reason: Option[String])
    /** Normalized: batched members (3+); a v<3 frame carries one. */
    final case class Request(groupId: String, members: Seq[Member])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"leave_group version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      str(r.groupId) +
        (if (version < 3) str(r.members.head.memberId)
         else (if (flex) uvarintSize(r.members.size + 1L) else 4) +
           r.members.map { m =>
             str(m.memberId) + nstr(m.groupInstanceId) +
               (if (version >= 5) nstr(m.reason) else 0) + (if (flex) 1 else 0)
           }.sum) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def str(s: String): Unit = if (flex) putCompactString(b, s) else putStr(b, s)
      def nstr(s: Option[String]): Unit =
        if (flex) putCompactNullableString(b, s) else putNullableStr(b, s)
      str(r.groupId)
      if (version < 3) str(r.members.head.memberId)
      else {
        if (flex) putCompactArrayLen(b, r.members.size) else b.putInt(r.members.size)
        r.members.foreach { m =>
          str(m.memberId); nstr(m.groupInstanceId)
          if (version >= 5) nstr(m.reason)
          if (flex) putEmptyTags(b)
        }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"leave_group version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def str() = if (flex) getCompactString(b) else getStr(b)
      def nstr() = if (flex) getCompactNullableString(b) else getNullableStr(b)
      val gid = str()
      val members =
        if (version < 3) Seq(Member(str(), None, None))
        else {
          val n = if (flex) getCompactArrayLen(b) else b.getInt()
          (0 until n).map { _ =>
            val m = Member(str(), nstr(), if (version >= 5) nstr() else None)
            if (flex) getTags(b)
            m
          }
        }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after leave_group request")
      Request(gid, members)
    }
  }

  // ------------------------------------------ LeaveGroup response 0-5

  object LeaveGroupRespV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 4

    final case class MemberResp(memberId: String,
        groupInstanceId: Option[String], errorCode: Short)
    final case class Response(throttleMs: Int, errorCode: Short,
        members: Seq[MemberResp])

    def size(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"leave_group_resp version $version")
      val flex = flexible(version)
      (if (version >= 1) 4 else 0) + 2 +
        (if (version >= 3)
          (if (flex) uvarintSize(r.members.size + 1L) else 4) +
            r.members.map { m =>
              (if (flex) compactStringSize(m.memberId) else strSize(m.memberId)) +
                (if (flex) compactNullableStrSize(m.groupInstanceId)
                 else nullableStrSize(m.groupInstanceId)) + 2 +
                (if (flex) 1 else 0)
            }.sum
         else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (version >= 1) b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      if (version >= 3) {
        if (flex) putCompactArrayLen(b, r.members.size) else b.putInt(r.members.size)
        r.members.foreach { m =>
          if (flex) putCompactString(b, m.memberId) else putStr(b, m.memberId)
          if (flex) putCompactNullableString(b, m.groupInstanceId)
          else putNullableStr(b, m.groupInstanceId)
          b.putShort(m.errorCode)
          if (flex) putEmptyTags(b)
        }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"leave_group_resp version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = if (version >= 1) b.getInt() else 0
      val ec = b.getShort()
      val members = if (version >= 3) {
        val n = if (flex) getCompactArrayLen(b) else b.getInt()
        (0 until n).map { _ =>
          val mid = if (flex) getCompactString(b) else getStr(b)
          val gi = if (flex) getCompactNullableString(b) else getNullableStr(b)
          val mec = b.getShort()
          if (flex) getTags(b)
          MemberResp(mid, gi, mec)
        }
      } else Nil
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after leave_group response")
      Response(throttle, ec, members)
    }
  }

  // =================================================================
  // Tier-3 keys: the TRANSACTION family across its full ranges
  // (`kafka/server/handlers/handlers.h`) — InitProducerId 0-5
  // (flexible 2+, KIP-360 producer identity at 3), AddPartitionsToTxn
  // 0-5 (flexible 3+, KIP-890 batched transactions at 4),
  // AddOffsetsToTxn 0-4 / EndTxn 0-4 / TxnOffsetCommit 0-4 (flexible
  // 3+; TxnOffsetCommit gains the KIP-447 group-fencing triplet at
  // 3 and per-partition leader epoch at 2) — plus DeleteRecords 0-2
  // (flexible 2+) and the SASL pair: Handshake 0-1 (never flexible),
  // Authenticate 0-2 (flexible 2+, session lifetime at 1).
  // =================================================================

  // ----------------------------------------------- InitProducerId 0-5

  object InitProducerIdV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.InitProducerId.Request): Int = {
      require(ValidVersions.contains(version), s"init_producer_id version $version")
      val flex = flexible(version)
      (if (flex) compactNullableStrSize(r.transactionalId)
       else nullableStrSize(r.transactionalId)) + 4 +
        (if (version >= 3) 10 else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.InitProducerId.Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (flex) putCompactNullableString(b, r.transactionalId)
      else putNullableStr(b, r.transactionalId)
      b.putInt(r.transactionTimeoutMs)
      if (version >= 3) { b.putLong(r.producerId); b.putShort(r.producerEpoch) }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.InitProducerId.Request = {
      require(ValidVersions.contains(version), s"init_producer_id version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val tid = if (flex) getCompactNullableString(b) else getNullableStr(b)
      val timeout = b.getInt()
      val (pid, epoch) =
        if (version >= 3) (b.getLong(), b.getShort()) else (-1L, (-1).toShort)
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after init_producer_id request")
      WireHeaders.InitProducerId.Request(tid, timeout, pid, epoch)
    }

    def sizeResp(version: Int): Int =
      4 + 2 + 8 + 2 + (if (flexible(version)) 1 else 0)

    def encodeResp(version: Int, r: WireHeaders.InitProducerId.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"init_producer_id version $version")
      val b = ByteBuffer.allocate(sizeResp(version))
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      if (flexible(version)) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.InitProducerId.Response = {
      require(ValidVersions.contains(version), s"init_producer_id version $version")
      val b = ByteBuffer.wrap(bytes)
      val r = WireHeaders.InitProducerId.Response(b.getInt(), b.getShort(),
        b.getLong(), b.getShort())
      if (flexible(version)) getTags(b)
      require(!b.hasRemaining, "trailing bytes after init_producer_id response")
      r
    }
  }

  // ------------------------------------------- AddPartitionsToTxn 0-5

  object AddPartitionsToTxnV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 3

    /** Normalized: batched transactions (4+); v<4 frames carry one. */
    final case class Txn(transactionalId: String, producerId: Long,
        producerEpoch: Short, verifyOnly: Boolean,
        topics: Seq[(String, Seq[Int])])
    final case class Request(transactions: Seq[Txn])

    private def topicsSize(flex: Boolean, ts: Seq[(String, Seq[Int])]): Int =
      (if (flex) uvarintSize(ts.size + 1L) else 4) + ts.map { case (t, ps) =>
        (if (flex) compactStringSize(t) else strSize(t)) +
          (if (flex) uvarintSize(ps.size + 1L) else 4) + 4 * ps.size +
          (if (flex) 1 else 0)
      }.sum

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"add_partitions_txn version $version")
      val flex = flexible(version)
      if (version < 4) {
        val t = r.transactions.head
        (if (flex) compactStringSize(t.transactionalId)
         else strSize(t.transactionalId)) + 8 + 2 +
          topicsSize(flex, t.topics) + (if (flex) 1 else 0)
      } else
        uvarintSize(r.transactions.size + 1L) + r.transactions.map { t =>
          compactStringSize(t.transactionalId) + 8 + 2 + 1 +
            topicsSize(flex = true, t.topics) + 1
        }.sum + 1
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def putTopics(ts: Seq[(String, Seq[Int])]): Unit = {
        if (flex) putCompactArrayLen(b, ts.size) else b.putInt(ts.size)
        ts.foreach { case (t, ps) =>
          if (flex) putCompactString(b, t) else putStr(b, t)
          if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
          ps.foreach(b.putInt)
          if (flex) putEmptyTags(b)
        }
      }
      if (version < 4) {
        val t = r.transactions.head
        if (flex) putCompactString(b, t.transactionalId)
        else putStr(b, t.transactionalId)
        b.putLong(t.producerId); b.putShort(t.producerEpoch)
        putTopics(t.topics)
        if (flex) putEmptyTags(b)
      } else {
        putCompactArrayLen(b, r.transactions.size)
        r.transactions.foreach { t =>
          putCompactString(b, t.transactionalId)
          b.putLong(t.producerId); b.putShort(t.producerEpoch)
          b.put(if (t.verifyOnly) 1.toByte else 0.toByte)
          putTopics(t.topics)
          putEmptyTags(b)
        }
        putEmptyTags(b)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"add_partitions_txn version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def getTopics(): Seq[(String, Seq[Int])] = {
        val n = if (flex) getCompactArrayLen(b) else b.getInt()
        (0 until n).map { _ =>
          val t = if (flex) getCompactString(b) else getStr(b)
          val np = if (flex) getCompactArrayLen(b) else b.getInt()
          val ps = (0 until np).map(_ => b.getInt())
          if (flex) getTags(b)
          (t, ps: Seq[Int])
        }
      }
      val r = if (version < 4) {
        val tid = if (flex) getCompactString(b) else getStr(b)
        val pid = b.getLong(); val epoch = b.getShort()
        val topics = getTopics()
        if (flex) getTags(b)
        Request(Seq(Txn(tid, pid, epoch, verifyOnly = false, topics)))
      } else {
        val txns = (0 until getCompactArrayLen(b)).map { _ =>
          val tid = getCompactString(b)
          val pid = b.getLong(); val epoch = b.getShort()
          val vo = b.get() != 0
          val topics = getTopics()
          getTags(b)
          Txn(tid, pid, epoch, vo, topics)
        }
        getTags(b)
        Request(txns)
      }
      require(!b.hasRemaining, "trailing bytes after add_partitions_txn request")
      r
    }

    /** Normalized response: per-transaction result grids; v<4 carries
      * one anonymous transaction, v4+ adds the top-level error_code. */
    final case class RespTxn(transactionalId: String,
        results: Seq[(String, Seq[(Int, Short)])])
    final case class Response(throttleMs: Int, errorCode: Short,
        transactions: Seq[RespTxn])

    private def gridSize(flex: Boolean,
        rs: Seq[(String, Seq[(Int, Short)])]): Int =
      (if (flex) uvarintSize(rs.size + 1L) else 4) + rs.map { case (t, ps) =>
        (if (flex) compactStringSize(t) else strSize(t)) +
          (if (flex) uvarintSize(ps.size + 1L) else 4) +
          ps.size * (6 + (if (flex) 1 else 0)) + (if (flex) 1 else 0)
      }.sum

    def sizeResp(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"add_partitions_txn version $version")
      val flex = flexible(version)
      4 + (if (version < 4) gridSize(flex, r.transactions.head.results)
           else 2 + uvarintSize(r.transactions.size + 1L) +
             r.transactions.map(t => compactStringSize(t.transactionalId) +
               gridSize(flex = true, t.results) + 1).sum) +
        (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      def putGrid(rs: Seq[(String, Seq[(Int, Short)])]): Unit = {
        if (flex) putCompactArrayLen(b, rs.size) else b.putInt(rs.size)
        rs.foreach { case (t, ps) =>
          if (flex) putCompactString(b, t) else putStr(b, t)
          if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
          ps.foreach { case (idx, ec) =>
            b.putInt(idx); b.putShort(ec)
            if (flex) putEmptyTags(b)
          }
          if (flex) putEmptyTags(b)
        }
      }
      b.putInt(r.throttleMs)
      if (version < 4) putGrid(r.transactions.head.results)
      else {
        b.putShort(r.errorCode)
        putCompactArrayLen(b, r.transactions.size)
        r.transactions.foreach { t =>
          putCompactString(b, t.transactionalId)
          putGrid(t.results)
          putEmptyTags(b)
        }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"add_partitions_txn version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def getGrid(): Seq[(String, Seq[(Int, Short)])] = {
        val n = if (flex) getCompactArrayLen(b) else b.getInt()
        (0 until n).map { _ =>
          val t = if (flex) getCompactString(b) else getStr(b)
          val np = if (flex) getCompactArrayLen(b) else b.getInt()
          val ps = (0 until np).map { _ =>
            val p = (b.getInt(), b.getShort())
            if (flex) getTags(b)
            p
          }
          if (flex) getTags(b)
          (t, ps: Seq[(Int, Short)])
        }
      }
      val throttle = b.getInt()
      val r = if (version < 4) {
        val grid = getGrid()
        if (flex) getTags(b)
        Response(throttle, 0, Seq(RespTxn("", grid)))
      } else {
        val ec = b.getShort()
        val txns = (0 until getCompactArrayLen(b)).map { _ =>
          val tid = getCompactString(b)
          val grid = getGrid()
          getTags(b)
          RespTxn(tid, grid)
        }
        getTags(b)
        Response(throttle, ec, txns)
      }
      require(!b.hasRemaining, "trailing bytes after add_partitions_txn response")
      r
    }
  }

  // --------------------------------------------- AddOffsetsToTxn 0-4

  object AddOffsetsToTxnV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 3

    def size(version: Int, r: WireHeaders.AddOffsetsToTxn.Request): Int = {
      require(ValidVersions.contains(version), s"add_offsets_txn version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      str(r.transactionalId) + 8 + 2 + str(r.groupId) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.AddOffsetsToTxn.Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (flex) putCompactString(b, r.transactionalId)
      else putStr(b, r.transactionalId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      if (flex) putCompactString(b, r.groupId) else putStr(b, r.groupId)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.AddOffsetsToTxn.Request = {
      require(ValidVersions.contains(version), s"add_offsets_txn version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val tid = if (flex) getCompactString(b) else getStr(b)
      val pid = b.getLong(); val epoch = b.getShort()
      val gid = if (flex) getCompactString(b) else getStr(b)
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after add_offsets_txn request")
      WireHeaders.AddOffsetsToTxn.Request(tid, pid, epoch, gid)
    }
  }

  // ------------------------------------------------------ EndTxn 0-4

  object EndTxnV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 3

    def size(version: Int, r: WireHeaders.EndTxn.Request): Int = {
      require(ValidVersions.contains(version), s"end_txn version $version")
      val flex = flexible(version)
      (if (flex) compactStringSize(r.transactionalId)
       else strSize(r.transactionalId)) + 8 + 2 + 1 + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.EndTxn.Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (flex) putCompactString(b, r.transactionalId)
      else putStr(b, r.transactionalId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      b.put(if (r.committed) 1.toByte else 0.toByte)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.EndTxn.Request = {
      require(ValidVersions.contains(version), s"end_txn version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val tid = if (flex) getCompactString(b) else getStr(b)
      val r = WireHeaders.EndTxn.Request(tid, b.getLong(), b.getShort(),
        b.get() == 1)
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after end_txn request")
      r
    }

    def sizeResp(version: Int): Int = 4 + 2 + (if (flexible(version)) 1 else 0)

    def encodeResp(version: Int, r: WireHeaders.EndTxn.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"end_txn version $version")
      val b = ByteBuffer.allocate(sizeResp(version))
      b.putInt(r.throttleMs); b.putShort(r.errorCode)
      if (flexible(version)) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.EndTxn.Response = {
      require(ValidVersions.contains(version), s"end_txn version $version")
      val b = ByteBuffer.wrap(bytes)
      val r = WireHeaders.EndTxn.Response(b.getInt(), b.getShort())
      if (flexible(version)) getTags(b)
      require(!b.hasRemaining, "trailing bytes after end_txn response")
      r
    }
  }

  // --------------------------------------------- TxnOffsetCommit 0-4

  object TxnOffsetCommitV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 3

    final case class Part(partition: Int, offset: Long, leaderEpoch: Int,
        metadata: Option[String])
    final case class Request(transactionalId: String, groupId: String,
        producerId: Long, producerEpoch: Short, generationId: Int,
        memberId: String, groupInstanceId: Option[String],
        topics: Seq[(String, Seq[Part])])

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"txn_offset_commit version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      str(r.transactionalId) + str(r.groupId) + 8 + 2 +
        (if (version >= 3) 4 + str(r.memberId) + nstr(r.groupInstanceId) else 0) +
        (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { case (t, ps) =>
          str(t) + (if (flex) uvarintSize(ps.size + 1L) else 4) +
            ps.map(p => 4 + 8 + (if (version >= 2) 4 else 0) +
              nstr(p.metadata) + (if (flex) 1 else 0)).sum +
            (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def str(s: String): Unit = if (flex) putCompactString(b, s) else putStr(b, s)
      def nstr(s: Option[String]): Unit =
        if (flex) putCompactNullableString(b, s) else putNullableStr(b, s)
      str(r.transactionalId); str(r.groupId)
      b.putLong(r.producerId); b.putShort(r.producerEpoch)
      if (version >= 3) {
        b.putInt(r.generationId); str(r.memberId); nstr(r.groupInstanceId)
      }
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        str(t)
        if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
        ps.foreach { p =>
          b.putInt(p.partition); b.putLong(p.offset)
          if (version >= 2) b.putInt(p.leaderEpoch)
          nstr(p.metadata)
          if (flex) putEmptyTags(b)
        }
        if (flex) putEmptyTags(b)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"txn_offset_commit version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def str() = if (flex) getCompactString(b) else getStr(b)
      def nstr() = if (flex) getCompactNullableString(b) else getNullableStr(b)
      val tid = str(); val gid = str()
      val pid = b.getLong(); val epoch = b.getShort()
      val (gen, mid, gi) =
        if (version >= 3) (b.getInt(), str(), nstr()) else (-1, "", None)
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        val t = str()
        val np = if (flex) getCompactArrayLen(b) else b.getInt()
        val ps = (0 until np).map { _ =>
          val idx = b.getInt(); val off = b.getLong()
          val epochP = if (version >= 2) b.getInt() else -1
          val md = nstr()
          if (flex) getTags(b)
          Part(idx, off, epochP, md)
        }
        if (flex) getTags(b)
        (t, ps: Seq[Part])
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after txn_offset_commit request")
      Request(tid, gid, pid, epoch, gen, mid, gi, topics)
    }

    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[(Int, Short)])])

    def sizeResp(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"txn_offset_commit version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { case (t, ps) =>
          (if (flex) compactStringSize(t) else strSize(t)) +
            (if (flex) uvarintSize(ps.size + 1L) else 4) +
            ps.size * (6 + (if (flex) 1 else 0)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      b.putInt(r.throttleMs)
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        if (flex) putCompactString(b, t) else putStr(b, t)
        if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
        ps.foreach { case (idx, ec) =>
          b.putInt(idx); b.putShort(ec)
          if (flex) putEmptyTags(b)
        }
        if (flex) putEmptyTags(b)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"txn_offset_commit version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = b.getInt()
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        val t = if (flex) getCompactString(b) else getStr(b)
        val np = if (flex) getCompactArrayLen(b) else b.getInt()
        val ps = (0 until np).map { _ =>
          val p = (b.getInt(), b.getShort())
          if (flex) getTags(b)
          p
        }
        if (flex) getTags(b)
        (t, ps: Seq[(Int, Short)])
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after txn_offset_commit response")
      Response(throttle, topics)
    }
  }

  // ----------------------------------------------- DeleteRecords 0-2

  object DeleteRecordsV {
    val ValidVersions: Range = 0 to 2
    def flexible(version: Int): Boolean = version >= 2

    final case class Request(topics: Seq[(String, Seq[(Int, Long)])],
        timeoutMs: Int)

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"delete_records version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { case (t, ps) =>
          (if (flex) compactStringSize(t) else strSize(t)) +
            (if (flex) uvarintSize(ps.size + 1L) else 4) +
            ps.size * (12 + (if (flex) 1 else 0)) + (if (flex) 1 else 0)
        }.sum + 4 + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        if (flex) putCompactString(b, t) else putStr(b, t)
        if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
        ps.foreach { case (idx, off) =>
          b.putInt(idx); b.putLong(off)
          if (flex) putEmptyTags(b)
        }
        if (flex) putEmptyTags(b)
      }
      b.putInt(r.timeoutMs)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"delete_records version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        val t = if (flex) getCompactString(b) else getStr(b)
        val np = if (flex) getCompactArrayLen(b) else b.getInt()
        val ps = (0 until np).map { _ =>
          val p = (b.getInt(), b.getLong())
          if (flex) getTags(b)
          p
        }
        if (flex) getTags(b)
        (t, ps: Seq[(Int, Long)])
      }
      val timeout = b.getInt()
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after delete_records request")
      Request(topics, timeout)
    }

    final case class Response(throttleMs: Int,
        topics: Seq[(String, Seq[(Int, Long, Short)])])

    def sizeResp(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"delete_records version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { case (t, ps) =>
          (if (flex) compactStringSize(t) else strSize(t)) +
            (if (flex) uvarintSize(ps.size + 1L) else 4) +
            ps.size * (14 + (if (flex) 1 else 0)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      b.putInt(r.throttleMs)
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        if (flex) putCompactString(b, t) else putStr(b, t)
        if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
        ps.foreach { case (idx, lwm, ec) =>
          b.putInt(idx); b.putLong(lwm); b.putShort(ec)
          if (flex) putEmptyTags(b)
        }
        if (flex) putEmptyTags(b)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"delete_records version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = b.getInt()
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        val t = if (flex) getCompactString(b) else getStr(b)
        val np = if (flex) getCompactArrayLen(b) else b.getInt()
        val ps = (0 until np).map { _ =>
          val p = (b.getInt(), b.getLong(), b.getShort())
          if (flex) getTags(b)
          p
        }
        if (flex) getTags(b)
        (t, ps: Seq[(Int, Long, Short)])
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after delete_records response")
      Response(throttle, topics)
    }
  }

  // ---------------------------------------------- SASL pair 0-1 / 0-2

  object SaslHandshakeV {
    val ValidVersions: Range = 0 to 1 // never flexible

    def size(version: Int, mechanism: String): Int = {
      require(ValidVersions.contains(version), s"sasl_handshake version $version")
      strSize(mechanism)
    }
    def encode(version: Int, mechanism: String): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, mechanism))
      putStr(b, mechanism); b.array()
    }
    def decode(version: Int, bytes: Array[Byte]): String = {
      require(ValidVersions.contains(version), s"sasl_handshake version $version")
      val b = ByteBuffer.wrap(bytes)
      val m = getStr(b)
      require(!b.hasRemaining, "trailing bytes after sasl_handshake request")
      m
    }
    def sizeResp(version: Int, mechanisms: Seq[String]): Int =
      2 + 4 + mechanisms.map(strSize).sum
    def encodeResp(version: Int, errorCode: Short,
        mechanisms: Seq[String]): Array[Byte] = {
      require(ValidVersions.contains(version), s"sasl_handshake version $version")
      val b = ByteBuffer.allocate(sizeResp(version, mechanisms))
      b.putShort(errorCode)
      b.putInt(mechanisms.size)
      mechanisms.foreach(putStr(b, _))
      b.array()
    }
    def decodeResp(version: Int, bytes: Array[Byte]): (Short, Seq[String]) = {
      require(ValidVersions.contains(version), s"sasl_handshake version $version")
      val b = ByteBuffer.wrap(bytes)
      val ec = b.getShort()
      val ms = (0 until b.getInt()).map(_ => getStr(b))
      require(!b.hasRemaining, "trailing bytes after sasl_handshake response")
      (ec, ms)
    }
  }

  object SaslAuthenticateV {
    val ValidVersions: Range = 0 to 2
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, authBytes: Array[Byte]): Int = {
      require(ValidVersions.contains(version), s"sasl_authenticate version $version")
      (if (flexible(version)) compactBytesSize(authBytes) + 1
       else 4 + authBytes.length)
    }
    def encode(version: Int, authBytes: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, authBytes))
      if (flexible(version)) { putCompactBytes(b, authBytes); putEmptyTags(b) }
      else putLegacyBytes(b, authBytes)
      b.array()
    }
    def decode(version: Int, bytes: Array[Byte]): Array[Byte] = {
      require(ValidVersions.contains(version), s"sasl_authenticate version $version")
      val b = ByteBuffer.wrap(bytes)
      val a = if (flexible(version)) { val x = getCompactBytes(b); getTags(b); x }
              else readLegacyBytes(b, b.getInt())
      require(!b.hasRemaining, "trailing bytes after sasl_authenticate request")
      a
    }

    final case class Response(errorCode: Short, errorMessage: Option[String],
        authBytes: Array[Byte], sessionLifetimeMs: Long)

    def sizeResp(version: Int, r: Response): Int = {
      require(ValidVersions.contains(version), s"sasl_authenticate version $version")
      val flex = flexible(version)
      2 + (if (flex) compactNullableStrSize(r.errorMessage)
           else nullableStrSize(r.errorMessage)) +
        (if (flex) compactBytesSize(r.authBytes) else 4 + r.authBytes.length) +
        (if (version >= 1) 8 else 0) + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: Response): Array[Byte] = {
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      b.putShort(r.errorCode)
      if (flex) putCompactNullableString(b, r.errorMessage)
      else putNullableStr(b, r.errorMessage)
      if (flex) putCompactBytes(b, r.authBytes)
      else putLegacyBytes(b, r.authBytes)
      if (version >= 1) b.putLong(r.sessionLifetimeMs)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): Response = {
      require(ValidVersions.contains(version), s"sasl_authenticate version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val ec = b.getShort()
      val em = if (flex) getCompactNullableString(b) else getNullableStr(b)
      val ab = if (flex) getCompactBytes(b) else readLegacyBytes(b, b.getInt())
      val sl = if (version >= 1) b.getLong() else 0L
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after sasl_authenticate response")
      Response(ec, em, ab, sl)
    }
  }

  // =================================================================
  // Tier-4 keys: topic lifecycle + group admin across full ranges —
  // CreateTopics 0-7 (flexible 5+, topic_id at 7, config report +
  // tagged config-error at 5), DeleteTopics 0-6 (flexible 4+, KIP-516
  // name-or-id states at 6), CreatePartitions 0-3 (flexible 2+),
  // DescribeGroups 0-5 (flexible 5+, authorized ops at 3, instance
  // ids at 4), ListGroups 0-4 (flexible 3+, states filter at 4),
  // DeleteGroups 0-2 (flexible 2+).
  // =================================================================

  // -------------------------------------------------- CreateTopics 0-7

  object CreateTopicsV {
    val ValidVersions: Range = 0 to 7
    def flexible(version: Int): Boolean = version >= 5

    def size(version: Int, r: WireHeaders.CreateTopics.Request): Int = {
      require(ValidVersions.contains(version), s"create_topics version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { t =>
          str(t.name) + 4 + 2 + (if (flex) 1 else 4) /* empty assignments */ +
            (if (flex) uvarintSize(t.configs.size + 1L) else 4) +
            t.configs.map { case (k, v) =>
              str(k) + nstr(v) + (if (flex) 1 else 0)
            }.sum + (if (flex) 1 else 0)
        }.sum + 4 + (if (version >= 1) 1 else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.CreateTopics.Request): Array[Byte] = {
      require(ValidVersions.contains(version), s"create_topics version $version")
      // v7 IS the pinned WireHeaders layout
      if (version == 7) return WireHeaders.CreateTopics.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      def str(s: String): Unit = if (flex) putCompactString(b, s) else putStr(b, s)
      def nstr(s: Option[String]): Unit =
        if (flex) putCompactNullableString(b, s) else putNullableStr(b, s)
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { t =>
        str(t.name)
        b.putInt(t.numPartitions); b.putShort(t.replicationFactor)
        if (flex) putCompactArrayLen(b, 0) else b.putInt(0) // assignments
        if (flex) putCompactArrayLen(b, t.configs.size) else b.putInt(t.configs.size)
        t.configs.foreach { case (k, v) =>
          str(k); nstr(v)
          if (flex) putEmptyTags(b)
        }
        if (flex) putEmptyTags(b)
      }
      b.putInt(r.timeoutMs)
      if (version >= 1) b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.CreateTopics.Request = {
      require(ValidVersions.contains(version), s"create_topics version $version")
      if (version >= 7) return WireHeaders.CreateTopics.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def str() = if (flex) getCompactString(b) else getStr(b)
      def nstr() = if (flex) getCompactNullableString(b) else getNullableStr(b)
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        val name = str()
        val np = b.getInt(); val rf = b.getShort()
        val na = if (flex) getCompactArrayLen(b) else b.getInt()
        require(na == 0, "manual assignments unsupported")
        val nc = if (flex) getCompactArrayLen(b) else b.getInt()
        val configs = (0 until nc).map { _ =>
          val p = (str(), nstr())
          if (flex) getTags(b)
          p
        }
        if (flex) getTags(b)
        WireHeaders.CreateTopics.ReqTopic(name, np, rf, configs)
      }
      val timeout = b.getInt()
      val vo = if (version >= 1) b.get() == 1 else false
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after create_topics request")
      WireHeaders.CreateTopics.Request(topics, timeout, vo)
    }

    def sizeResp(version: Int, r: WireHeaders.CreateTopics.Response): Int = {
      require(ValidVersions.contains(version), s"create_topics version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      (if (version >= 2) 4 else 0) +
        (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { t =>
          str(t.name) + (if (version >= 7) 16 else 0) + 2 +
            (if (version >= 1) nstr(t.errorMessage) else 0) +
            (if (version >= 5) {
              4 + 2 + t.configs.map(cs => uvarintSize(cs.size + 1L) +
                cs.map { case (k, v) =>
                  compactStringSize(k) + compactNullableStrSize(v) + 3 + 1
                }.sum).getOrElse(1) +
                (if (t.topicConfigErrorCode != 0) 1 + 1 + 1 + 2 else 1)
            } else 0) +
            (if (flex && version < 5) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.CreateTopics.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"create_topics version $version")
      if (version == 7) return WireHeaders.CreateTopics.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      if (version >= 2) b.putInt(r.throttleMs)
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { t =>
        if (flex) putCompactString(b, t.name) else putStr(b, t.name)
        b.putShort(t.errorCode)
        if (version >= 1) {
          if (flex) putCompactNullableString(b, t.errorMessage)
          else putNullableStr(b, t.errorMessage)
        }
        if (version >= 5) {
          b.putInt(t.numPartitions); b.putShort(t.replicationFactor)
          t.configs match {
            case None => putUvarint(b, 0L)
            case Some(cs) =>
              putCompactArrayLen(b, cs.size)
              cs.foreach { case (k, v) =>
                putCompactString(b, k); putCompactNullableString(b, v)
                b.put(0.toByte); b.put(5.toByte); b.put(0.toByte)
                putEmptyTags(b)
              }
          }
          if (t.topicConfigErrorCode != 0) {
            putUvarint(b, 1L); putUvarint(b, 0L); putUvarint(b, 2L)
            b.putShort(t.topicConfigErrorCode)
          } else putEmptyTags(b)
        }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.CreateTopics.Response = {
      require(ValidVersions.contains(version), s"create_topics version $version")
      if (version == 7) return WireHeaders.CreateTopics.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = if (version >= 2) b.getInt() else 0
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        val name = if (flex) getCompactString(b) else getStr(b)
        val err = b.getShort()
        val msg = if (version >= 1) {
          if (flex) getCompactNullableString(b) else getNullableStr(b)
        } else None
        if (version >= 5) {
          val np = b.getInt(); val rf = b.getShort()
          val nCfg = getUvarint(b)
          val configs =
            if (nCfg == 0) None
            else Some((0L until nCfg - 1).map { _ =>
              val k = getCompactString(b); val v = getCompactNullableString(b)
              b.get(); b.get(); b.get()
              getTags(b)
              (k, v)
            }: Seq[(String, Option[String])])
          val tags = getTags(b)
          val cfgErr = tags.find(_._1 == 0L)
            .map(x => ByteBuffer.wrap(x._2).getShort()).getOrElse(0.toShort)
          WireHeaders.CreateTopics.RespTopic(name,
            WireHeaders.DeleteTopics.ZeroUuid, err, msg, cfgErr, np, rf, configs)
        } else
          WireHeaders.CreateTopics.RespTopic(name,
            WireHeaders.DeleteTopics.ZeroUuid, err, msg, 0, -1, -1, None)
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after create_topics response")
      WireHeaders.CreateTopics.Response(throttle, topics)
    }
  }

  // -------------------------------------------------- DeleteTopics 0-6

  object DeleteTopicsV {
    val ValidVersions: Range = 0 to 6
    def flexible(version: Int): Boolean = version >= 4

    def size(version: Int, r: WireHeaders.DeleteTopics.Request): Int = {
      require(ValidVersions.contains(version), s"delete_topics version $version")
      val flex = flexible(version)
      (if (version >= 6)
        uvarintSize(r.topics.size + 1L) + r.topics.map(t =>
          compactNullableStrSize(t.name) + 16 + 1).sum
      else
        (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
          r.topics.map(t => if (flex) compactStringSize(t.name.get)
            else strSize(t.name.get)).sum) +
        4 + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.DeleteTopics.Request): Array[Byte] = {
      if (version == 6) return WireHeaders.DeleteTopics.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      val flex = flexible(version)
      if (flex) putCompactArrayLen(b, r.topics.size) else b.putInt(r.topics.size)
      r.topics.foreach { t =>
        if (flex) putCompactString(b, t.name.get) else putStr(b, t.name.get)
      }
      b.putInt(r.timeoutMs)
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.DeleteTopics.Request = {
      require(ValidVersions.contains(version), s"delete_topics version $version")
      if (version == 6) return WireHeaders.DeleteTopics.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val topics = (0 until nt).map { _ =>
        WireHeaders.DeleteTopics.ReqTopic(
          Some(if (flex) getCompactString(b) else getStr(b)),
          WireHeaders.DeleteTopics.ZeroUuid)
      }
      val timeout = b.getInt()
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after delete_topics request")
      WireHeaders.DeleteTopics.Request(topics, timeout)
    }

    def sizeResp(version: Int, r: WireHeaders.DeleteTopics.Response): Int = {
      require(ValidVersions.contains(version), s"delete_topics version $version")
      val flex = flexible(version)
      (if (version >= 1) 4 else 0) +
        (if (flex) uvarintSize(r.responses.size + 1L) else 4) +
        r.responses.map { t =>
          (if (version >= 6) compactNullableStrSize(t.name) + 16
           else if (flex) compactStringSize(t.name.get)
           else strSize(t.name.get)) + 2 +
            (if (version >= 5) compactNullableStrSize(t.errorMessage) else 0) +
            (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.DeleteTopics.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"delete_topics version $version")
      if (version == 6) return WireHeaders.DeleteTopics.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      if (version >= 1) b.putInt(r.throttleMs)
      if (flex) putCompactArrayLen(b, r.responses.size)
      else b.putInt(r.responses.size)
      r.responses.foreach { t =>
        if (flex) putCompactString(b, t.name.get) else putStr(b, t.name.get)
        b.putShort(t.errorCode)
        if (version >= 5) putCompactNullableString(b, t.errorMessage)
        if (flex) putEmptyTags(b)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.DeleteTopics.Response = {
      require(ValidVersions.contains(version), s"delete_topics version $version")
      if (version == 6) return WireHeaders.DeleteTopics.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = if (version >= 1) b.getInt() else 0
      val nt = if (flex) getCompactArrayLen(b) else b.getInt()
      val rs = (0 until nt).map { _ =>
        val name = if (flex) getCompactString(b) else getStr(b)
        val err = b.getShort()
        val msg = if (version >= 5) getCompactNullableString(b) else None
        if (flex) getTags(b)
        WireHeaders.DeleteTopics.Result(Some(name),
          WireHeaders.DeleteTopics.ZeroUuid, err, msg)
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after delete_topics response")
      WireHeaders.DeleteTopics.Response(throttle, rs)
    }
  }

  // ---------------------------------------------- CreatePartitions 0-3

  object CreatePartitionsV {
    val ValidVersions: Range = 0 to 3
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.CreatePartitions.Request): Int = {
      require(ValidVersions.contains(version), s"create_partitions version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { t =>
          (if (flex) compactStringSize(t.name) else strSize(t.name)) + 4 +
            (t.assignments match {
              case None => if (flex) 1 else 4
              case Some(as) =>
                (if (flex) uvarintSize(as.size + 1L) else 4) +
                  as.map(a => (if (flex) uvarintSize(a.size + 1L) else 4) +
                    4 * a.size + (if (flex) 1 else 0)).sum
            }) + (if (flex) 1 else 0)
        }.sum + 4 + 1 + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.CreatePartitions.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.CreatePartitions.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.topics.size)
      r.topics.foreach { t =>
        putStr(b, t.name)
        b.putInt(t.count)
        t.assignments match {
          case None => b.putInt(-1)
          case Some(as) =>
            b.putInt(as.size)
            as.foreach { brokers =>
              b.putInt(brokers.size); brokers.foreach(b.putInt)
            }
        }
      }
      b.putInt(r.timeoutMs)
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.CreatePartitions.Request = {
      require(ValidVersions.contains(version), s"create_partitions version $version")
      if (flexible(version)) return WireHeaders.CreatePartitions.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val topics = (0 until b.getInt()).map { _ =>
        val name = getStr(b)
        val count = b.getInt()
        val na = b.getInt()
        val assignments =
          if (na < 0) None
          else Some((0 until na).map { _ =>
            (0 until b.getInt()).map(_ => b.getInt()): Seq[Int]
          }: Seq[Seq[Int]])
        WireHeaders.CreatePartitions.ReqTopic(name, count, assignments)
      }
      val timeout = b.getInt(); val vo = b.get() == 1
      require(!b.hasRemaining, "trailing bytes after create_partitions request")
      WireHeaders.CreatePartitions.Request(topics, timeout, vo)
    }

    def sizeResp(version: Int, r: WireHeaders.CreatePartitions.Response): Int = {
      require(ValidVersions.contains(version), s"create_partitions version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(r.results.size + 1L) else 4) +
        r.results.map { x =>
          (if (flex) compactStringSize(x.name) else strSize(x.name)) + 2 +
            (if (flex) compactNullableStrSize(x.errorMessage)
             else nullableStrSize(x.errorMessage)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.CreatePartitions.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"create_partitions version $version")
      if (flexible(version)) return WireHeaders.CreatePartitions.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      b.putInt(r.throttleMs)
      b.putInt(r.results.size)
      r.results.foreach { x =>
        putStr(b, x.name); b.putShort(x.errorCode)
        putNullableStr(b, x.errorMessage)
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.CreatePartitions.Response = {
      require(ValidVersions.contains(version), s"create_partitions version $version")
      if (flexible(version)) return WireHeaders.CreatePartitions.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val rs = (0 until b.getInt()).map { _ =>
        WireHeaders.CreatePartitions.Result(getStr(b), b.getShort(),
          getNullableStr(b))
      }
      require(!b.hasRemaining, "trailing bytes after create_partitions response")
      WireHeaders.CreatePartitions.Response(throttle, rs)
    }
  }

  // ------------------------------------------------ DescribeGroups 0-5

  object DescribeGroupsV {
    val ValidVersions: Range = 0 to 5
    def flexible(version: Int): Boolean = version >= 5

    def size(version: Int, r: WireHeaders.DescribeGroups.Request): Int = {
      require(ValidVersions.contains(version), s"describe_groups version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(r.groups.size + 1L) else 4) +
        r.groups.map(g => if (flex) compactStringSize(g) else strSize(g)).sum +
        (if (version >= 3) 1 else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.DescribeGroups.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.DescribeGroups.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.groups.size)
      r.groups.foreach(putStr(b, _))
      if (version >= 3)
        b.put(if (r.includeAuthorizedOperations) 1.toByte else 0.toByte)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.DescribeGroups.Request = {
      require(ValidVersions.contains(version), s"describe_groups version $version")
      if (flexible(version)) return WireHeaders.DescribeGroups.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val groups = (0 until b.getInt()).map(_ => getStr(b))
      val incl = if (version >= 3) b.get() == 1 else false
      require(!b.hasRemaining, "trailing bytes after describe_groups request")
      WireHeaders.DescribeGroups.Request(groups, incl)
    }

    def sizeResp(version: Int, r: WireHeaders.DescribeGroups.Response): Int = {
      require(ValidVersions.contains(version), s"describe_groups version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      (if (version >= 1) 4 else 0) +
        (if (flex) uvarintSize(r.groups.size + 1L) else 4) +
        r.groups.map { g =>
          2 + str(g.groupId) + str(g.groupState) + str(g.protocolType) +
            str(g.protocolData) +
            (if (flex) uvarintSize(g.members.size + 1L) else 4) +
            g.members.map { m =>
              str(m.memberId) +
                (if (version >= 4) {
                  if (flex) compactNullableStrSize(m.groupInstanceId)
                  else nullableStrSize(m.groupInstanceId)
                } else 0) +
                str(m.clientId) + str(m.clientHost) +
                (if (flex) compactBytesSize(m.metadata) else 4 + m.metadata.length) +
                (if (flex) compactBytesSize(m.assignment) else 4 + m.assignment.length) +
                (if (flex) 1 else 0)
            }.sum +
            (if (version >= 3) 4 else 0) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.DescribeGroups.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"describe_groups version $version")
      if (flexible(version)) return WireHeaders.DescribeGroups.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      if (version >= 1) b.putInt(r.throttleMs)
      b.putInt(r.groups.size)
      r.groups.foreach { g =>
        b.putShort(g.errorCode)
        putStr(b, g.groupId); putStr(b, g.groupState)
        putStr(b, g.protocolType); putStr(b, g.protocolData)
        b.putInt(g.members.size)
        g.members.foreach { m =>
          putStr(b, m.memberId)
          if (version >= 4) putNullableStr(b, m.groupInstanceId)
          putStr(b, m.clientId); putStr(b, m.clientHost)
          putLegacyBytes(b, m.metadata)
          putLegacyBytes(b, m.assignment)
        }
        if (version >= 3) b.putInt(g.authorizedOperations)
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.DescribeGroups.Response = {
      require(ValidVersions.contains(version), s"describe_groups version $version")
      if (flexible(version)) return WireHeaders.DescribeGroups.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = if (version >= 1) b.getInt() else 0
      val groups = (0 until b.getInt()).map { _ =>
        val ec = b.getShort()
        val gid = getStr(b); val state = getStr(b)
        val ptype = getStr(b); val pdata = getStr(b)
        val members = (0 until b.getInt()).map { _ =>
          val mid = getStr(b)
          val gi = if (version >= 4) getNullableStr(b) else None
          val cid = getStr(b); val host = getStr(b)
          val md = readLegacyBytes(b, b.getInt())
          val asg = readLegacyBytes(b, b.getInt())
          WireHeaders.DescribeGroups.Member(mid, gi, cid, host, md, asg)
        }
        val ops = if (version >= 3) b.getInt() else Int.MinValue
        WireHeaders.DescribeGroups.Group(ec, gid, state, ptype, pdata,
          members, ops)
      }
      require(!b.hasRemaining, "trailing bytes after describe_groups response")
      WireHeaders.DescribeGroups.Response(throttle, groups)
    }
  }

  // --------------------------------------------------- ListGroups 0-4

  object ListGroupsV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 3

    def size(version: Int, r: WireHeaders.ListGroups.Request): Int = {
      require(ValidVersions.contains(version), s"list_groups version $version")
      val flex = flexible(version)
      (if (version >= 4)
        uvarintSize(r.statesFilter.size + 1L) +
          r.statesFilter.map(compactStringSize).sum
      else 0) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.ListGroups.Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 4) {
        putCompactArrayLen(b, r.statesFilter.size)
        r.statesFilter.foreach(putCompactString(b, _))
      }
      if (flexible(version)) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.ListGroups.Request = {
      require(ValidVersions.contains(version), s"list_groups version $version")
      val b = ByteBuffer.wrap(bytes)
      val states =
        if (version >= 4)
          (0 until getCompactArrayLen(b)).map(_ => getCompactString(b))
        else Nil
      if (flexible(version)) getTags(b)
      require(!b.hasRemaining, "trailing bytes after list_groups request")
      WireHeaders.ListGroups.Request(states)
    }

    def sizeResp(version: Int, r: WireHeaders.ListGroups.Response): Int = {
      require(ValidVersions.contains(version), s"list_groups version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      (if (version >= 1) 4 else 0) + 2 +
        (if (flex) uvarintSize(r.groups.size + 1L) else 4) +
        r.groups.map { g =>
          str(g.groupId) + str(g.protocolType) +
            (if (version >= 4) str(g.groupState) else 0) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.ListGroups.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"list_groups version $version")
      if (version == 4) return WireHeaders.ListGroups.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      if (version >= 1) b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      if (flex) putCompactArrayLen(b, r.groups.size) else b.putInt(r.groups.size)
      r.groups.foreach { g =>
        if (flex) {
          putCompactString(b, g.groupId); putCompactString(b, g.protocolType)
          putEmptyTags(b)
        } else { putStr(b, g.groupId); putStr(b, g.protocolType) }
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.ListGroups.Response = {
      require(ValidVersions.contains(version), s"list_groups version $version")
      if (version == 4) return WireHeaders.ListGroups.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = if (version >= 1) b.getInt() else 0
      val ec = b.getShort()
      val n = if (flex) getCompactArrayLen(b) else b.getInt()
      val groups = (0 until n).map { _ =>
        val g = WireHeaders.ListGroups.Group(
          if (flex) getCompactString(b) else getStr(b),
          if (flex) getCompactString(b) else getStr(b), "")
        if (flex) getTags(b)
        g
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after list_groups response")
      WireHeaders.ListGroups.Response(throttle, ec, groups)
    }
  }

  // -------------------------------------------------- DeleteGroups 0-2

  object DeleteGroupsV {
    val ValidVersions: Range = 0 to 2
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, groups: Seq[String]): Int = {
      require(ValidVersions.contains(version), s"delete_groups version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(groups.size + 1L) else 4) +
        groups.map(g => if (flex) compactStringSize(g) else strSize(g)).sum +
        (if (flex) 1 else 0)
    }

    def encode(version: Int, groups: Seq[String]): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, groups))
      val flex = flexible(version)
      if (flex) putCompactArrayLen(b, groups.size) else b.putInt(groups.size)
      groups.foreach(g => if (flex) putCompactString(b, g) else putStr(b, g))
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Seq[String] = {
      require(ValidVersions.contains(version), s"delete_groups version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val n = if (flex) getCompactArrayLen(b) else b.getInt()
      val gs = (0 until n).map(_ =>
        if (flex) getCompactString(b) else getStr(b))
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after delete_groups request")
      gs
    }

    def sizeResp(version: Int, results: Seq[(String, Short)]): Int = {
      require(ValidVersions.contains(version), s"delete_groups version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(results.size + 1L) else 4) +
        results.map { case (g, _) =>
          (if (flex) compactStringSize(g) else strSize(g)) + 2 +
            (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, throttleMs: Int,
        results: Seq[(String, Short)]): Array[Byte] = {
      require(ValidVersions.contains(version), s"delete_groups version $version")
      val b = ByteBuffer.allocate(sizeResp(version, results))
      val flex = flexible(version)
      b.putInt(throttleMs)
      if (flex) putCompactArrayLen(b, results.size) else b.putInt(results.size)
      results.foreach { case (g, ec) =>
        if (flex) putCompactString(b, g) else putStr(b, g)
        b.putShort(ec)
        if (flex) putEmptyTags(b)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): (Int, Seq[(String, Short)]) = {
      require(ValidVersions.contains(version), s"delete_groups version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      val throttle = b.getInt()
      val n = if (flex) getCompactArrayLen(b) else b.getInt()
      val rs = (0 until n).map { _ =>
        val r = ((if (flex) getCompactString(b) else getStr(b)), b.getShort())
        if (flex) getTags(b)
        r
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after delete_groups response")
      (throttle, rs)
    }
  }

  // =================================================================
  // Tier-5 keys: configs + ACLs + leader-epoch full ranges —
  // OffsetForLeaderEpoch 0-4 (flexible 4+, replica_id at 3, current
  // epoch at 2), DescribeConfigs 0-4 (flexible 4+, synonyms/source at
  // 1, type/documentation at 3, v0-only is_default), AlterConfigs
  // 0-2 / DescribeAcls / CreateAcls / DeleteAcls 0-3 (flexible 2+,
  // ACL pattern types at 1), IncrementalAlterConfigs 0-1.
  // =================================================================

  // --------------------------------------- OffsetForLeaderEpoch 0-4

  object OffsetForLeaderEpochV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 4

    def size(version: Int, r: WireHeaders.OffsetForLeaderEpoch.Request): Int = {
      require(ValidVersions.contains(version), s"offset_for_leader_epoch version $version")
      val flex = flexible(version)
      (if (version >= 3) 4 else 0) +
        (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { case (t, ps) =>
          (if (flex) compactStringSize(t) else strSize(t)) +
            (if (flex) uvarintSize(ps.size + 1L) else 4) +
            ps.size * (4 + (if (version >= 2) 4 else 0) + 4 +
              (if (flex) 1 else 0)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.OffsetForLeaderEpoch.Request): Array[Byte] = {
      if (version == 4) return WireHeaders.OffsetForLeaderEpoch.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 3) b.putInt(r.replicaId)
      b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putStr(b, t)
        b.putInt(ps.size)
        ps.foreach { p =>
          b.putInt(p.partition)
          if (version >= 2) b.putInt(p.currentLeaderEpoch)
          b.putInt(p.leaderEpoch)
        }
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.OffsetForLeaderEpoch.Request = {
      require(ValidVersions.contains(version), s"offset_for_leader_epoch version $version")
      if (version == 4) return WireHeaders.OffsetForLeaderEpoch.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val replica = if (version >= 3) b.getInt() else -2
      val topics = (0 until b.getInt()).map { _ =>
        val t = getStr(b)
        val ps = (0 until b.getInt()).map { _ =>
          val idx = b.getInt()
          val cur = if (version >= 2) b.getInt() else -1
          WireHeaders.OffsetForLeaderEpoch.ReqPartition(idx, cur, b.getInt())
        }
        (t, ps: Seq[WireHeaders.OffsetForLeaderEpoch.ReqPartition])
      }
      require(!b.hasRemaining, "trailing bytes after offset_for_leader_epoch request")
      WireHeaders.OffsetForLeaderEpoch.Request(replica, topics)
    }

    def sizeResp(version: Int, r: WireHeaders.OffsetForLeaderEpoch.Response): Int = {
      require(ValidVersions.contains(version), s"offset_for_leader_epoch version $version")
      val flex = flexible(version)
      (if (version >= 2) 4 else 0) +
        (if (flex) uvarintSize(r.topics.size + 1L) else 4) +
        r.topics.map { case (t, ps) =>
          (if (flex) compactStringSize(t) else strSize(t)) +
            (if (flex) uvarintSize(ps.size + 1L) else 4) +
            ps.size * (2 + 4 + (if (version >= 1) 4 else 0) + 8 +
              (if (flex) 1 else 0)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.OffsetForLeaderEpoch.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"offset_for_leader_epoch version $version")
      if (version == 4) return WireHeaders.OffsetForLeaderEpoch.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      if (version >= 2) b.putInt(r.throttleMs)
      b.putInt(r.topics.size)
      r.topics.foreach { case (t, ps) =>
        putStr(b, t)
        b.putInt(ps.size)
        ps.foreach { p =>
          b.putShort(p.errorCode); b.putInt(p.partition)
          if (version >= 1) b.putInt(p.leaderEpoch)
          b.putLong(p.endOffset)
        }
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.OffsetForLeaderEpoch.Response = {
      require(ValidVersions.contains(version), s"offset_for_leader_epoch version $version")
      if (version == 4) return WireHeaders.OffsetForLeaderEpoch.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = if (version >= 2) b.getInt() else 0
      val topics = (0 until b.getInt()).map { _ =>
        val t = getStr(b)
        val ps = (0 until b.getInt()).map { _ =>
          val ec = b.getShort(); val idx = b.getInt()
          val epoch = if (version >= 1) b.getInt() else -1
          WireHeaders.OffsetForLeaderEpoch.RespPartition(ec, idx, epoch,
            b.getLong())
        }
        (t, ps: Seq[WireHeaders.OffsetForLeaderEpoch.RespPartition])
      }
      require(!b.hasRemaining, "trailing bytes after offset_for_leader_epoch response")
      WireHeaders.OffsetForLeaderEpoch.Response(throttle, topics)
    }
  }

  // ------------------------------------------------ DescribeConfigs 0-4

  object DescribeConfigsV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 4

    def size(version: Int, r: WireHeaders.DescribeConfigs.Request): Int = {
      require(ValidVersions.contains(version), s"describe_configs version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(r.resources.size + 1L) else 4) +
        r.resources.map { res =>
          1 + (if (flex) compactStringSize(res.resourceName)
               else strSize(res.resourceName)) +
            (res.configurationKeys match {
              case None => if (flex) 1 else 4
              case Some(ks) =>
                (if (flex) uvarintSize(ks.size + 1L) else 4) +
                  ks.map(k => if (flex) compactStringSize(k) else strSize(k)).sum
            }) + (if (flex) 1 else 0)
        }.sum + (if (version >= 1) 1 else 0) + (if (version >= 3) 1 else 0) +
        (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.DescribeConfigs.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.DescribeConfigs.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putStr(b, res.resourceName)
        res.configurationKeys match {
          case None => b.putInt(-1)
          case Some(ks) => b.putInt(ks.size); ks.foreach(putStr(b, _))
        }
      }
      if (version >= 1) b.put(if (r.includeSynonyms) 1.toByte else 0.toByte)
      if (version >= 3) b.put(if (r.includeDocumentation) 1.toByte else 0.toByte)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.DescribeConfigs.Request = {
      require(ValidVersions.contains(version), s"describe_configs version $version")
      if (flexible(version)) return WireHeaders.DescribeConfigs.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val resources = (0 until b.getInt()).map { _ =>
        val rt = b.get()
        val rn = getStr(b)
        val n = b.getInt()
        val keys = if (n < 0) None else Some((0 until n).map(_ => getStr(b)): Seq[String])
        WireHeaders.DescribeConfigs.ReqResource(rt, rn, keys)
      }
      val syn = if (version >= 1) b.get() == 1 else false
      val doc = if (version >= 3) b.get() == 1 else false
      require(!b.hasRemaining, "trailing bytes after describe_configs request")
      WireHeaders.DescribeConfigs.Request(resources, syn, doc)
    }

    def sizeResp(version: Int, r: WireHeaders.DescribeConfigs.Response): Int = {
      require(ValidVersions.contains(version), s"describe_configs version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      4 + (if (flex) uvarintSize(r.results.size + 1L) else 4) +
        r.results.map { res =>
          2 + nstr(res.errorMessage) + 1 + str(res.resourceName) +
            (if (flex) uvarintSize(res.configs.size + 1L) else 4) +
            res.configs.map { c =>
              str(c.name) + nstr(c.value) + 1 +
                (if (version == 0) 1 else 1) + // v0 is_default / v1+ source
                1 +
                (if (version >= 1) { if (flex) 1 else 4 } else 0) + // synonyms
                (if (version >= 3) 1 + nstr(c.documentation) else 0) +
                (if (flex) 1 else 0)
            }.sum + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.DescribeConfigs.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"describe_configs version $version")
      if (flexible(version)) return WireHeaders.DescribeConfigs.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      b.putInt(r.throttleMs)
      b.putInt(r.results.size)
      r.results.foreach { res =>
        b.putShort(res.errorCode)
        putNullableStr(b, res.errorMessage)
        b.put(res.resourceType)
        putStr(b, res.resourceName)
        b.putInt(res.configs.size)
        res.configs.foreach { c =>
          putStr(b, c.name)
          putNullableStr(b, c.value)
          b.put(if (c.readOnly) 1.toByte else 0.toByte)
          if (version == 0)
            b.put(if (c.configSource == 5) 1.toByte else 0.toByte) // is_default
          else b.put(c.configSource)
          b.put(if (c.isSensitive) 1.toByte else 0.toByte)
          if (version >= 1) b.putInt(0) // synonyms (empty)
          if (version >= 3) {
            b.put(c.configType)
            putNullableStr(b, c.documentation)
          }
        }
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.DescribeConfigs.Response = {
      require(ValidVersions.contains(version), s"describe_configs version $version")
      if (flexible(version)) return WireHeaders.DescribeConfigs.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until b.getInt()).map { _ =>
        val ec = b.getShort()
        val msg = getNullableStr(b)
        val rt = b.get()
        val rn = getStr(b)
        val configs = (0 until b.getInt()).map { _ =>
          val name = getStr(b)
          val value = getNullableStr(b)
          val ro = b.get() == 1
          val source =
            if (version == 0) { if (b.get() == 1) 5.toByte else 1.toByte }
            else b.get()
          val sensitive = b.get() == 1
          if (version >= 1) {
            val nSyn = b.getInt()
            require(nSyn == 0, "synonyms not supported")
          }
          val (ctype, doc) =
            if (version >= 3) (b.get(), getNullableStr(b))
            else (0.toByte, None)
          WireHeaders.DescribeConfigs.Config(name, value, ro, source,
            sensitive, ctype, doc)
        }
        WireHeaders.DescribeConfigs.Result(ec, msg, rt, rn, configs)
      }
      require(!b.hasRemaining, "trailing bytes after describe_configs response")
      WireHeaders.DescribeConfigs.Response(throttle, results)
    }
  }

  // -------------------------------- AlterConfigs 0-2 / Incremental 0-1

  object AlterConfigsV {
    val ValidVersions: Range = 0 to 2
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.AlterConfigs.Request): Int = {
      require(ValidVersions.contains(version), s"alter_configs version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      (if (flex) uvarintSize(r.resources.size + 1L) else 4) +
        r.resources.map { res =>
          1 + str(res.resourceName) +
            (if (flex) uvarintSize(res.configs.size + 1L) else 4) +
            res.configs.map { case (k, v) =>
              str(k) + nstr(v) + (if (flex) 1 else 0)
            }.sum + (if (flex) 1 else 0)
        }.sum + 1 + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.AlterConfigs.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.AlterConfigs.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putStr(b, res.resourceName)
        b.putInt(res.configs.size)
        res.configs.foreach { case (k, v) =>
          putStr(b, k); putNullableStr(b, v)
        }
      }
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.AlterConfigs.Request = {
      require(ValidVersions.contains(version), s"alter_configs version $version")
      if (flexible(version)) return WireHeaders.AlterConfigs.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val resources = (0 until b.getInt()).map { _ =>
        val rt = b.get()
        val rn = getStr(b)
        val configs = (0 until b.getInt()).map(_ => (getStr(b), getNullableStr(b)))
        WireHeaders.AlterConfigs.ReqResource(rt, rn, configs)
      }
      val vo = b.get() == 1
      require(!b.hasRemaining, "trailing bytes after alter_configs request")
      WireHeaders.AlterConfigs.Request(resources, vo)
    }

    def sizeResp(version: Int, r: WireHeaders.AlterConfigs.Response): Int = {
      require(ValidVersions.contains(version), s"alter_configs version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(r.responses.size + 1L) else 4) +
        r.responses.map { res =>
          2 + (if (flex) compactNullableStrSize(res.errorMessage)
               else nullableStrSize(res.errorMessage)) + 1 +
            (if (flex) compactStringSize(res.resourceName)
             else strSize(res.resourceName)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.AlterConfigs.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"alter_configs version $version")
      if (flexible(version)) return WireHeaders.AlterConfigs.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      b.putInt(r.throttleMs)
      b.putInt(r.responses.size)
      r.responses.foreach { res =>
        b.putShort(res.errorCode)
        putNullableStr(b, res.errorMessage)
        b.put(res.resourceType)
        putStr(b, res.resourceName)
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.AlterConfigs.Response = {
      require(ValidVersions.contains(version), s"alter_configs version $version")
      if (flexible(version)) return WireHeaders.AlterConfigs.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val rs = (0 until b.getInt()).map { _ =>
        WireHeaders.AlterConfigs.RespResource(b.getShort(), getNullableStr(b),
          b.get(), getStr(b))
      }
      require(!b.hasRemaining, "trailing bytes after alter_configs response")
      WireHeaders.AlterConfigs.Response(throttle, rs)
    }
  }

  object IncrementalAlterConfigsV {
    val ValidVersions: Range = 0 to 1
    def flexible(version: Int): Boolean = version >= 1

    def size(version: Int, r: WireHeaders.IncrementalAlterConfigs.Request): Int = {
      require(ValidVersions.contains(version), s"incremental_alter version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      (if (flex) uvarintSize(r.resources.size + 1L) else 4) +
        r.resources.map { res =>
          1 + str(res.resourceName) +
            (if (flex) uvarintSize(res.configs.size + 1L) else 4) +
            res.configs.map(c =>
              str(c.name) + 1 + nstr(c.value) + (if (flex) 1 else 0)).sum +
            (if (flex) 1 else 0)
        }.sum + 1 + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.IncrementalAlterConfigs.Request): Array[Byte] = {
      if (flexible(version))
        return WireHeaders.IncrementalAlterConfigs.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putStr(b, res.resourceName)
        b.putInt(res.configs.size)
        res.configs.foreach { c =>
          putStr(b, c.name); b.put(c.configOperation)
          putNullableStr(b, c.value)
        }
      }
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.IncrementalAlterConfigs.Request = {
      require(ValidVersions.contains(version), s"incremental_alter version $version")
      if (flexible(version))
        return WireHeaders.IncrementalAlterConfigs.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val resources = (0 until b.getInt()).map { _ =>
        val rt = b.get()
        val rn = getStr(b)
        val configs = (0 until b.getInt()).map(_ =>
          WireHeaders.IncrementalAlterConfigs.ReqConfig(getStr(b), b.get(),
            getNullableStr(b)))
        WireHeaders.IncrementalAlterConfigs.ReqResource(rt, rn, configs)
      }
      val vo = b.get() == 1
      require(!b.hasRemaining, "trailing bytes after incremental_alter request")
      WireHeaders.IncrementalAlterConfigs.Request(resources, vo)
    }
  }

  // --------------------------------------------------- ACL trio 0-3

  object DescribeAclsV {
    val ValidVersions: Range = 0 to 3
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.DescribeAcls.Request): Int = {
      require(ValidVersions.contains(version), s"describe_acls version $version")
      val flex = flexible(version)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      1 + nstr(r.resourceNameFilter) + (if (version >= 1) 1 else 0) +
        nstr(r.principalFilter) + nstr(r.hostFilter) + 2 +
        (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.DescribeAcls.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.DescribeAcls.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.put(r.resourceTypeFilter)
      putNullableStr(b, r.resourceNameFilter)
      if (version >= 1) b.put(r.patternTypeFilter)
      putNullableStr(b, r.principalFilter)
      putNullableStr(b, r.hostFilter)
      b.put(r.operation); b.put(r.permission)
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.DescribeAcls.Request = {
      require(ValidVersions.contains(version), s"describe_acls version $version")
      if (flexible(version)) return WireHeaders.DescribeAcls.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val rt = b.get()
      val rn = getNullableStr(b)
      val pt = if (version >= 1) b.get() else 3.toByte // LITERAL
      val r = WireHeaders.DescribeAcls.Request(rt, rn, pt, getNullableStr(b),
        getNullableStr(b), b.get(), b.get())
      require(!b.hasRemaining, "trailing bytes after describe_acls request")
      r
    }

    def sizeResp(version: Int, r: WireHeaders.DescribeAcls.Response): Int = {
      require(ValidVersions.contains(version), s"describe_acls version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      4 + 2 + (if (flex) compactNullableStrSize(r.errorMessage)
               else nullableStrSize(r.errorMessage)) +
        (if (flex) uvarintSize(r.resources.size + 1L) else 4) +
        r.resources.map { res =>
          1 + str(res.resourceName) + (if (version >= 1) 1 else 0) +
            (if (flex) uvarintSize(res.acls.size + 1L) else 4) +
            res.acls.map(a => str(a.principal) + str(a.host) + 2 +
              (if (flex) 1 else 0)).sum + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.DescribeAcls.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"describe_acls version $version")
      if (flexible(version)) return WireHeaders.DescribeAcls.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putNullableStr(b, r.errorMessage)
      b.putInt(r.resources.size)
      r.resources.foreach { res =>
        b.put(res.resourceType)
        putStr(b, res.resourceName)
        if (version >= 1) b.put(res.patternType)
        b.putInt(res.acls.size)
        res.acls.foreach { a =>
          putStr(b, a.principal); putStr(b, a.host)
          b.put(a.operation); b.put(a.permission)
        }
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.DescribeAcls.Response = {
      require(ValidVersions.contains(version), s"describe_acls version $version")
      if (flexible(version)) return WireHeaders.DescribeAcls.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val ec = b.getShort()
      val msg = getNullableStr(b)
      val resources = (0 until b.getInt()).map { _ =>
        val rt = b.get()
        val rn = getStr(b)
        val pt = if (version >= 1) b.get() else 3.toByte
        val acls = (0 until b.getInt()).map(_ =>
          WireHeaders.DescribeAcls.RespAcl(getStr(b), getStr(b), b.get(), b.get()))
        WireHeaders.DescribeAcls.Resource(rt, rn, pt, acls)
      }
      require(!b.hasRemaining, "trailing bytes after describe_acls response")
      WireHeaders.DescribeAcls.Response(throttle, ec, msg, resources)
    }
  }

  object CreateAclsV {
    val ValidVersions: Range = 0 to 3
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.CreateAcls.Request): Int = {
      require(ValidVersions.contains(version), s"create_acls version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      (if (flex) uvarintSize(r.creations.size + 1L) else 4) +
        r.creations.map { a =>
          1 + str(a.resourceName) + (if (version >= 1) 1 else 0) +
            str(a.principal) + str(a.host) + 2 + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.CreateAcls.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.CreateAcls.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.creations.size)
      r.creations.foreach { a =>
        b.put(a.resourceType)
        putStr(b, a.resourceName)
        if (version >= 1) b.put(a.patternType)
        putStr(b, a.principal); putStr(b, a.host)
        b.put(a.operation); b.put(a.permission)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.CreateAcls.Request = {
      require(ValidVersions.contains(version), s"create_acls version $version")
      if (flexible(version)) return WireHeaders.CreateAcls.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val creations = (0 until b.getInt()).map { _ =>
        val rt = b.get()
        val rn = getStr(b)
        val pt = if (version >= 1) b.get() else 3.toByte
        WireHeaders.CreateAcls.Acl(rt, rn, pt, getStr(b), getStr(b),
          b.get(), b.get())
      }
      require(!b.hasRemaining, "trailing bytes after create_acls request")
      WireHeaders.CreateAcls.Request(creations)
    }

    def sizeResp(version: Int, r: WireHeaders.CreateAcls.Response): Int = {
      require(ValidVersions.contains(version), s"create_acls version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(r.results.size + 1L) else 4) +
        r.results.map { case (_, msg) =>
          2 + (if (flex) compactNullableStrSize(msg)
               else nullableStrSize(msg)) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.CreateAcls.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"create_acls version $version")
      if (flexible(version)) return WireHeaders.CreateAcls.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      b.putInt(r.throttleMs)
      b.putInt(r.results.size)
      r.results.foreach { case (ec, msg) =>
        b.putShort(ec); putNullableStr(b, msg)
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.CreateAcls.Response = {
      require(ValidVersions.contains(version), s"create_acls version $version")
      if (flexible(version)) return WireHeaders.CreateAcls.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val rs = (0 until b.getInt()).map(_ => (b.getShort(), getNullableStr(b)))
      require(!b.hasRemaining, "trailing bytes after create_acls response")
      WireHeaders.CreateAcls.Response(throttle, rs)
    }
  }

  object DeleteAclsV {
    val ValidVersions: Range = 0 to 3
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.DeleteAcls.Request): Int = {
      require(ValidVersions.contains(version), s"delete_acls version $version")
      val flex = flexible(version)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      (if (flex) uvarintSize(r.filters.size + 1L) else 4) +
        r.filters.map { f =>
          1 + nstr(f.resourceNameFilter) + (if (version >= 1) 1 else 0) +
            nstr(f.principalFilter) + nstr(f.hostFilter) + 2 +
            (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.DeleteAcls.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.DeleteAcls.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      b.putInt(r.filters.size)
      r.filters.foreach { f =>
        b.put(f.resourceTypeFilter)
        putNullableStr(b, f.resourceNameFilter)
        if (version >= 1) b.put(f.patternTypeFilter)
        putNullableStr(b, f.principalFilter)
        putNullableStr(b, f.hostFilter)
        b.put(f.operation); b.put(f.permission)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.DeleteAcls.Request = {
      require(ValidVersions.contains(version), s"delete_acls version $version")
      if (flexible(version)) return WireHeaders.DeleteAcls.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val filters = (0 until b.getInt()).map { _ =>
        val rt = b.get()
        val rn = getNullableStr(b)
        val pt = if (version >= 1) b.get() else 3.toByte
        WireHeaders.DeleteAcls.Filter(rt, rn, pt, getNullableStr(b),
          getNullableStr(b), b.get(), b.get())
      }
      require(!b.hasRemaining, "trailing bytes after delete_acls request")
      WireHeaders.DeleteAcls.Request(filters)
    }

    def sizeResp(version: Int, r: WireHeaders.DeleteAcls.Response): Int = {
      require(ValidVersions.contains(version), s"delete_acls version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      def nstr(s: Option[String]) =
        if (flex) compactNullableStrSize(s) else nullableStrSize(s)
      4 + (if (flex) uvarintSize(r.results.size + 1L) else 4) +
        r.results.map { fr =>
          2 + nstr(fr.errorMessage) +
            (if (flex) uvarintSize(fr.matchingAcls.size + 1L) else 4) +
            fr.matchingAcls.map { m =>
              2 + nstr(m.errorMessage) + 1 + str(m.resourceName) +
                (if (version >= 1) 1 else 0) + str(m.principal) +
                str(m.host) + 2 + (if (flex) 1 else 0)
            }.sum + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.DeleteAcls.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"delete_acls version $version")
      if (flexible(version)) return WireHeaders.DeleteAcls.encodeResponse(r)
      val b = ByteBuffer.allocate(sizeResp(version, r))
      b.putInt(r.throttleMs)
      b.putInt(r.results.size)
      r.results.foreach { fr =>
        b.putShort(fr.errorCode)
        putNullableStr(b, fr.errorMessage)
        b.putInt(fr.matchingAcls.size)
        fr.matchingAcls.foreach { m =>
          b.putShort(m.errorCode)
          putNullableStr(b, m.errorMessage)
          b.put(m.resourceType)
          putStr(b, m.resourceName)
          if (version >= 1) b.put(m.patternType)
          putStr(b, m.principal); putStr(b, m.host)
          b.put(m.operation); b.put(m.permission)
        }
      }
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.DeleteAcls.Response = {
      require(ValidVersions.contains(version), s"delete_acls version $version")
      if (flexible(version)) return WireHeaders.DeleteAcls.decodeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until b.getInt()).map { _ =>
        val ec = b.getShort()
        val msg = getNullableStr(b)
        val matches = (0 until b.getInt()).map { _ =>
          val mec = b.getShort()
          val mmsg = getNullableStr(b)
          val rt = b.get()
          val rn = getStr(b)
          val pt = if (version >= 1) b.get() else 3.toByte
          WireHeaders.DeleteAcls.MatchingAcl(mec, mmsg, rt, rn, pt,
            getStr(b), getStr(b), b.get(), b.get())
        }
        WireHeaders.DeleteAcls.FilterResult(ec, msg, matches)
      }
      require(!b.hasRemaining, "trailing bytes after delete_acls response")
      WireHeaders.DeleteAcls.Response(throttle, results)
    }
  }

  // =================================================================
  // Tier-6 (the last multi-version keys in the handler registry):
  // DescribeLogDirs 0-4 (flexible 2+, top error_code at 3,
  // total/usable bytes at 4), DescribeClientQuotas /
  // AlterClientQuotas 0-1 (flexible 1+).
  // =================================================================

  object DescribeLogDirsV {
    val ValidVersions: Range = 0 to 4
    def flexible(version: Int): Boolean = version >= 2

    def size(version: Int, r: WireHeaders.DescribeLogDirs.Request): Int = {
      require(ValidVersions.contains(version), s"describe_log_dirs version $version")
      val flex = flexible(version)
      (r.topics match {
        case None => if (flex) 1 else 4
        case Some(ts) =>
          (if (flex) uvarintSize(ts.size + 1L) else 4) +
            ts.map { case (t, ps) =>
              (if (flex) compactStringSize(t) else strSize(t)) +
                (if (flex) uvarintSize(ps.size + 1L) else 4) + 4 * ps.size +
                (if (flex) 1 else 0)
            }.sum
      }) + (if (flex) 1 else 0)
    }

    def encode(version: Int, r: WireHeaders.DescribeLogDirs.Request): Array[Byte] = {
      if (flexible(version)) return WireHeaders.DescribeLogDirs.encodeRequest(r)
      val b = ByteBuffer.allocate(size(version, r))
      r.topics match {
        case None => b.putInt(-1)
        case Some(ts) =>
          b.putInt(ts.size)
          ts.foreach { case (t, ps) =>
            putStr(b, t); b.putInt(ps.size); ps.foreach(b.putInt)
          }
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): WireHeaders.DescribeLogDirs.Request = {
      require(ValidVersions.contains(version), s"describe_log_dirs version $version")
      if (flexible(version)) return WireHeaders.DescribeLogDirs.decodeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val n = b.getInt()
      val topics =
        if (n < 0) None
        else Some((0 until n).map { _ =>
          val t = getStr(b)
          (t, (0 until b.getInt()).map(_ => b.getInt()): Seq[Int])
        }: Seq[(String, Seq[Int])])
      require(!b.hasRemaining, "trailing bytes after describe_log_dirs request")
      WireHeaders.DescribeLogDirs.Request(topics)
    }

    def sizeResp(version: Int, r: WireHeaders.DescribeLogDirs.Response): Int = {
      require(ValidVersions.contains(version), s"describe_log_dirs version $version")
      val flex = flexible(version)
      def str(s: String) = if (flex) compactStringSize(s) else strSize(s)
      4 + (if (version >= 3) 2 else 0) +
        (if (flex) uvarintSize(r.results.size + 1L) else 4) +
        r.results.map { d =>
          2 + str(d.logDir) +
            (if (flex) uvarintSize(d.topics.size + 1L) else 4) +
            d.topics.map { case (t, ps) =>
              str(t) + (if (flex) uvarintSize(ps.size + 1L) else 4) +
                ps.size * (21 + (if (flex) 1 else 0)) + (if (flex) 1 else 0)
            }.sum + (if (version >= 4) 16 else 0) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeResp(version: Int, r: WireHeaders.DescribeLogDirs.Response): Array[Byte] = {
      require(ValidVersions.contains(version), s"describe_log_dirs version $version")
      val b = ByteBuffer.allocate(sizeResp(version, r))
      val flex = flexible(version)
      def str(s: String): Unit = if (flex) putCompactString(b, s) else putStr(b, s)
      b.putInt(r.throttleMs)
      if (version >= 3) b.putShort(r.errorCode)
      if (flex) putCompactArrayLen(b, r.results.size) else b.putInt(r.results.size)
      r.results.foreach { d =>
        b.putShort(d.errorCode)
        str(d.logDir)
        if (flex) putCompactArrayLen(b, d.topics.size) else b.putInt(d.topics.size)
        d.topics.foreach { case (t, ps) =>
          str(t)
          if (flex) putCompactArrayLen(b, ps.size) else b.putInt(ps.size)
          ps.foreach { p =>
            b.putInt(p.partitionIndex); b.putLong(p.partitionSize)
            b.putLong(p.offsetLag)
            b.put(if (p.isFutureKey) 1.toByte else 0.toByte)
            if (flex) putEmptyTags(b)
          }
          if (flex) putEmptyTags(b)
        }
        if (version >= 4) { b.putLong(d.totalBytes); b.putLong(d.usableBytes) }
        if (flex) putEmptyTags(b)
      }
      if (flex) putEmptyTags(b)
      b.array()
    }

    def decodeResp(version: Int, bytes: Array[Byte]): WireHeaders.DescribeLogDirs.Response = {
      require(ValidVersions.contains(version), s"describe_log_dirs version $version")
      val b = ByteBuffer.wrap(bytes)
      val flex = flexible(version)
      def str() = if (flex) getCompactString(b) else getStr(b)
      val throttle = b.getInt()
      val ec = if (version >= 3) b.getShort() else 0.toShort
      val nd = if (flex) getCompactArrayLen(b) else b.getInt()
      val results = (0 until nd).map { _ =>
        val derr = b.getShort()
        val dir = str()
        val nt = if (flex) getCompactArrayLen(b) else b.getInt()
        val topics = (0 until nt).map { _ =>
          val t = str()
          val np = if (flex) getCompactArrayLen(b) else b.getInt()
          val ps = (0 until np).map { _ =>
            val p = WireHeaders.DescribeLogDirs.Partition(b.getInt(),
              b.getLong(), b.getLong(), b.get() == 1)
            if (flex) getTags(b)
            p
          }
          if (flex) getTags(b)
          (t, ps: Seq[WireHeaders.DescribeLogDirs.Partition])
        }
        val (total, usable) =
          if (version >= 4) (b.getLong(), b.getLong()) else (-1L, -1L)
        if (flex) getTags(b)
        WireHeaders.DescribeLogDirs.DirResult(derr, dir, topics, total, usable)
      }
      if (flex) getTags(b)
      require(!b.hasRemaining, "trailing bytes after describe_log_dirs response")
      WireHeaders.DescribeLogDirs.Response(throttle, ec, results)
    }
  }

  object ClientQuotasV {
    val ValidVersions: Range = 0 to 1
    def flexible(version: Int): Boolean = version >= 1

    private def entitySize(flex: Boolean,
        es: Seq[WireHeaders.ClientQuotas.Entity]): Int =
      (if (flex) uvarintSize(es.size + 1L) else 4) + es.map { e =>
        (if (flex) compactStringSize(e.entityType) else strSize(e.entityType)) +
          (if (flex) compactNullableStrSize(e.entityName)
           else nullableStrSize(e.entityName)) + (if (flex) 1 else 0)
      }.sum

    private def putEntityV(b: ByteBuffer, flex: Boolean,
        es: Seq[WireHeaders.ClientQuotas.Entity]): Unit = {
      if (flex) putCompactArrayLen(b, es.size) else b.putInt(es.size)
      es.foreach { e =>
        if (flex) {
          putCompactString(b, e.entityType)
          putCompactNullableString(b, e.entityName)
          putEmptyTags(b)
        } else { putStr(b, e.entityType); putNullableStr(b, e.entityName) }
      }
    }

    private def getEntityV(b: ByteBuffer, flex: Boolean):
        Seq[WireHeaders.ClientQuotas.Entity] = {
      val n = if (flex) getCompactArrayLen(b) else b.getInt()
      (0 until n).map { _ =>
        val e = WireHeaders.ClientQuotas.Entity(
          if (flex) getCompactString(b) else getStr(b),
          if (flex) getCompactNullableString(b) else getNullableStr(b))
        if (flex) getTags(b)
        e
      }
    }

    def sizeDescribe(version: Int,
        r: WireHeaders.ClientQuotas.DescribeRequest): Int = {
      require(ValidVersions.contains(version), s"describe_client_quotas version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(r.components.size + 1L) else 4) +
        r.components.map { c =>
          (if (flex) compactStringSize(c.entityType) else strSize(c.entityType)) +
            1 + (if (flex) compactNullableStrSize(c.matchName)
                 else nullableStrSize(c.matchName)) + (if (flex) 1 else 0)
        }.sum + 1 + (if (flex) 1 else 0)
    }

    def encodeDescribe(version: Int,
        r: WireHeaders.ClientQuotas.DescribeRequest): Array[Byte] = {
      if (flexible(version))
        return WireHeaders.ClientQuotas.encodeDescribeRequest(r)
      val b = ByteBuffer.allocate(sizeDescribe(version, r))
      b.putInt(r.components.size)
      r.components.foreach { c =>
        putStr(b, c.entityType)
        b.put(c.matchType)
        putNullableStr(b, c.matchName)
      }
      b.put(if (r.strict) 1.toByte else 0.toByte)
      b.array()
    }

    def decodeDescribe(version: Int, bytes: Array[Byte]):
        WireHeaders.ClientQuotas.DescribeRequest = {
      require(ValidVersions.contains(version), s"describe_client_quotas version $version")
      if (flexible(version))
        return WireHeaders.ClientQuotas.decodeDescribeRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val comps = (0 until b.getInt()).map { _ =>
        WireHeaders.ClientQuotas.DescribeComponent(getStr(b), b.get(),
          getNullableStr(b))
      }
      val strict = b.get() == 1
      require(!b.hasRemaining, "trailing bytes after describe_client_quotas request")
      WireHeaders.ClientQuotas.DescribeRequest(comps, strict)
    }

    def sizeDescribeResp(version: Int,
        r: WireHeaders.ClientQuotas.DescribeResponse): Int = {
      require(ValidVersions.contains(version), s"describe_client_quotas version $version")
      val flex = flexible(version)
      4 + 2 + (if (flex) compactNullableStrSize(r.errorMessage)
               else nullableStrSize(r.errorMessage)) +
        (if (flex) uvarintSize(r.entries.size + 1L) else 4) +
        r.entries.map { e =>
          entitySize(flex, e.entity) +
            (if (flex) uvarintSize(e.values.size + 1L) else 4) +
            e.values.map { case (k, _) =>
              (if (flex) compactStringSize(k) else strSize(k)) + 8 +
                (if (flex) 1 else 0)
            }.sum + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeDescribeResp(version: Int,
        r: WireHeaders.ClientQuotas.DescribeResponse): Array[Byte] = {
      require(ValidVersions.contains(version), s"describe_client_quotas version $version")
      if (flexible(version))
        return WireHeaders.ClientQuotas.encodeDescribeResponse(r)
      val b = ByteBuffer.allocate(sizeDescribeResp(version, r))
      b.putInt(r.throttleMs)
      b.putShort(r.errorCode)
      putNullableStr(b, r.errorMessage)
      b.putInt(r.entries.size)
      r.entries.foreach { e =>
        putEntityV(b, flex = false, e.entity)
        b.putInt(e.values.size)
        e.values.foreach { case (k, v) => putStr(b, k); b.putDouble(v) }
      }
      b.array()
    }

    def decodeDescribeResp(version: Int, bytes: Array[Byte]):
        WireHeaders.ClientQuotas.DescribeResponse = {
      require(ValidVersions.contains(version), s"describe_client_quotas version $version")
      if (flexible(version))
        return WireHeaders.ClientQuotas.decodeDescribeResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt(); val ec = b.getShort()
      val msg = getNullableStr(b)
      val entries = (0 until b.getInt()).map { _ =>
        val entity = getEntityV(b, flex = false)
        val values = (0 until b.getInt()).map(_ => (getStr(b), b.getDouble()))
        WireHeaders.ClientQuotas.Entry(entity, values)
      }
      require(!b.hasRemaining, "trailing bytes after describe_client_quotas response")
      WireHeaders.ClientQuotas.DescribeResponse(throttle, ec, msg, entries)
    }

    def sizeAlter(version: Int,
        r: WireHeaders.ClientQuotas.AlterRequest): Int = {
      require(ValidVersions.contains(version), s"alter_client_quotas version $version")
      val flex = flexible(version)
      (if (flex) uvarintSize(r.entries.size + 1L) else 4) +
        r.entries.map { e =>
          entitySize(flex, e.entity) +
            (if (flex) uvarintSize(e.ops.size + 1L) else 4) +
            e.ops.map { o =>
              (if (flex) compactStringSize(o.key) else strSize(o.key)) + 9 +
                (if (flex) 1 else 0)
            }.sum + (if (flex) 1 else 0)
        }.sum + 1 + (if (flex) 1 else 0)
    }

    def encodeAlter(version: Int,
        r: WireHeaders.ClientQuotas.AlterRequest): Array[Byte] = {
      if (flexible(version))
        return WireHeaders.ClientQuotas.encodeAlterRequest(r)
      val b = ByteBuffer.allocate(sizeAlter(version, r))
      b.putInt(r.entries.size)
      r.entries.foreach { e =>
        putEntityV(b, flex = false, e.entity)
        b.putInt(e.ops.size)
        e.ops.foreach { o =>
          putStr(b, o.key); b.putDouble(o.value)
          b.put(if (o.remove) 1.toByte else 0.toByte)
        }
      }
      b.put(if (r.validateOnly) 1.toByte else 0.toByte)
      b.array()
    }

    def decodeAlter(version: Int, bytes: Array[Byte]):
        WireHeaders.ClientQuotas.AlterRequest = {
      require(ValidVersions.contains(version), s"alter_client_quotas version $version")
      if (flexible(version))
        return WireHeaders.ClientQuotas.decodeAlterRequest(bytes)
      val b = ByteBuffer.wrap(bytes)
      val entries = (0 until b.getInt()).map { _ =>
        val entity = getEntityV(b, flex = false)
        val ops = (0 until b.getInt()).map(_ =>
          WireHeaders.ClientQuotas.Op(getStr(b), b.getDouble(), b.get() == 1))
        WireHeaders.ClientQuotas.AlterEntry(entity, ops)
      }
      val vo = b.get() == 1
      require(!b.hasRemaining, "trailing bytes after alter_client_quotas request")
      WireHeaders.ClientQuotas.AlterRequest(entries, vo)
    }

    def sizeAlterResp(version: Int,
        r: WireHeaders.ClientQuotas.AlterResponse): Int = {
      require(ValidVersions.contains(version), s"alter_client_quotas version $version")
      val flex = flexible(version)
      4 + (if (flex) uvarintSize(r.results.size + 1L) else 4) +
        r.results.map { x =>
          2 + (if (flex) compactNullableStrSize(x.errorMessage)
               else nullableStrSize(x.errorMessage)) +
            entitySize(flex, x.entity) + (if (flex) 1 else 0)
        }.sum + (if (flex) 1 else 0)
    }

    def encodeAlterResp(version: Int,
        r: WireHeaders.ClientQuotas.AlterResponse): Array[Byte] = {
      require(ValidVersions.contains(version), s"alter_client_quotas version $version")
      if (flexible(version))
        return WireHeaders.ClientQuotas.encodeAlterResponse(r)
      val b = ByteBuffer.allocate(sizeAlterResp(version, r))
      b.putInt(r.throttleMs)
      b.putInt(r.results.size)
      r.results.foreach { x =>
        b.putShort(x.errorCode)
        putNullableStr(b, x.errorMessage)
        putEntityV(b, flex = false, x.entity)
      }
      b.array()
    }

    def decodeAlterResp(version: Int, bytes: Array[Byte]):
        WireHeaders.ClientQuotas.AlterResponse = {
      require(ValidVersions.contains(version), s"alter_client_quotas version $version")
      if (flexible(version))
        return WireHeaders.ClientQuotas.decodeAlterResponse(bytes)
      val b = ByteBuffer.wrap(bytes)
      val throttle = b.getInt()
      val results = (0 until b.getInt()).map { _ =>
        val ec = b.getShort()
        val msg = getNullableStr(b)
        val entity = getEntityV(b, flex = false)
        WireHeaders.ClientQuotas.AlterResult(ec, msg, entity)
      }
      require(!b.hasRemaining, "trailing bytes after alter_client_quotas response")
      WireHeaders.ClientQuotas.AlterResponse(throttle, results)
    }
  }

  // ------------------------------------------ ApiVersions request 0-3

  object ApiVersionsReqV {
    val ValidVersions: Range = 0 to 3
    def flexible(version: Int): Boolean = version >= 3

    /** v0-2 bodies are EMPTY; v3 (KIP-511) adds the client software
      * name/version pair (the response matrix is WireHeaders'
      * encodeApiVersions 0-3, exercised by p6_wire_framing). */
    final case class Request(clientSoftwareName: String,
        clientSoftwareVersion: String)

    def size(version: Int, r: Request): Int = {
      require(ValidVersions.contains(version), s"api_versions version $version")
      if (version < 3) 0
      else compactStringSize(r.clientSoftwareName) +
        compactStringSize(r.clientSoftwareVersion) + 1
    }

    def encode(version: Int, r: Request): Array[Byte] = {
      val b = ByteBuffer.allocate(size(version, r))
      if (version >= 3) {
        putCompactString(b, r.clientSoftwareName)
        putCompactString(b, r.clientSoftwareVersion)
        putEmptyTags(b)
      }
      b.array()
    }

    def decode(version: Int, bytes: Array[Byte]): Request = {
      require(ValidVersions.contains(version), s"api_versions version $version")
      val b = ByteBuffer.wrap(bytes)
      val r = if (version < 3) Request("", "")
        else {
          val n = getCompactString(b); val v = getCompactString(b)
          getTags(b)
          Request(n, v)
        }
      require(!b.hasRemaining, "trailing bytes after api_versions request")
      r
    }
  }
}
