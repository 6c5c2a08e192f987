package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/** Data-plane serdes: Produce / Fetch / ListOffsets (+ responses), Metadata, DeleteRecords, OffsetForLeaderEpoch, ApiVersions.
  *
  * Part of the [[WireVersions]] per-version serde registry (pure move
  * out of the single object in round 17; every inner object is
  * byte-identical to its former spelling). */
private[functions] trait WireVersionsIngest extends WireVersionsBase {
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
