package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/** Consumer-group serdes: OffsetCommit/Fetch, Join/Sync/Heartbeat/Leave, coordinator lookup, group admin (+ responses).
  *
  * Part of the [[WireVersions]] per-version serde registry (pure move
  * out of the single object in round 17; every inner object is
  * byte-identical to its former spelling). */
private[functions] trait WireVersionsGroups extends WireVersionsBase {
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

}
