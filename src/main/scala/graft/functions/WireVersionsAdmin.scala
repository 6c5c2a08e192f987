package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/** Admin-plane serdes: SASL, topic/partition lifecycle, configs, ACLs, log dirs, client quotas.
  *
  * Part of the [[WireVersions]] per-version serde registry (pure move
  * out of the single object in round 17; every inner object is
  * byte-identical to its former spelling). */
private[functions] trait WireVersionsAdmin extends WireVersionsBase {
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

}
