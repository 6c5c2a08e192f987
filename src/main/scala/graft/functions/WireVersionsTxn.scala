package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/** Transaction serdes: InitProducerId, AddPartitionsToTxn, AddOffsetsToTxn, EndTxn, TxnOffsetCommit.
  *
  * Part of the [[WireVersions]] per-version serde registry (pure move
  * out of the single object in round 17; every inner object is
  * byte-identical to its former spelling). */
private[functions] trait WireVersionsTxn extends WireVersionsBase {
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

}
