package graft.functions

import java.nio.ByteBuffer
import java.util.zip.CRC32C

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Kafka record-batch v2 wire envelope codec — the §5 protocol-golden
 * leg. Layout per the reference's adapter (`kafka/protocol/
 * kafka_batch_adapter.h:25-41` pins the 61-byte header;
 * `kafka_batch_adapter.cc:31-96` the big-endian field order;
 * `model/record.h:426-508` the header fields kept below the CRC):
 *
 * {{{
 *   baseOffset           int64  BE
 *   batchLength          int32  BE   (bytes AFTER this field)
 *   partitionLeaderEpoch int32  BE
 *   magic                int8        (= 2)
 *   crc                  uint32 BE   CRC32-C of everything below
 *   attributes           int16  BE   -- checksummed region starts here
 *   lastOffsetDelta      int32  BE
 *   firstTimestamp       int64  BE
 *   maxTimestamp         int64  BE
 *   producerId           int64  BE
 *   producerEpoch        int16  BE
 *   baseSequence         int32  BE
 *   recordCount          int32  BE
 *   records…                         (zigzag-varint framed, below)
 * }}}
 *
 * Each record (`model/record.h` / `utils/vint.h` — every integer is a
 * ZIGZAG varint): length, attributes int8, timestampDelta, offsetDelta,
 * keyLength (-1 = null) + key, valueLength + value, headerCount +
 * (headerKeyLen + key + headerValLen + val)*.
 *
 * The CRC is CRC32-C (Castagnoli) over the region starting at
 * `attributes` — `kafka_batch_adapter.cc:98-121` skips exactly the
 * first 21 bytes (8 offset + 4 length + 4 epoch + 1 magic + 4 crc).
 *
 * The expressions are CodegenFallback: this is the protocol-golden
 * certification leg (cold control-plane path), not a hot query kernel.
 */
object RecordBatchCodec {

  /** Fixed header size: kafka_batch_adapter.h:25-41. */
  val HeaderSize = 61
  /** Bytes of the header NOT counted by batchLength (offset + length). */
  val LengthFieldOffset = 12
  /** Bytes skipped before the checksummed region (adapter.cc:111). */
  val CrcDataStart = 21

  final case class Header(baseOffset: Long, batchLength: Int,
      partitionLeaderEpoch: Int, magic: Byte, crc: Long, attributes: Short,
      lastOffsetDelta: Int, firstTimestamp: Long, maxTimestamp: Long,
      producerId: Long, producerEpoch: Short, baseSequence: Int,
      recordCount: Int)

  final case class Rec(offsetDelta: Int, tsDelta: Long,
      key: Array[Byte], value: Array[Byte], headers: Seq[(String, Array[Byte])])

  // ---------------------------------------------------------- varints

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1)

  def varintSize(v: Long): Int = {
    var u = zigzag(v); var n = 1
    while ((u & ~0x7fL) != 0) { u >>>= 7; n += 1 }
    n
  }

  private def putVarint(b: ByteBuffer, v: Long): Unit = {
    var u = zigzag(v)
    while ((u & ~0x7fL) != 0) { b.put(((u & 0x7f) | 0x80).toByte); u >>>= 7 }
    b.put(u.toByte)
  }

  private def getVarint(b: ByteBuffer): Long = {
    // Bounded like the reference's vint parsing (utils/vint.h caps at
    // 10 continuation bytes): past shift 63 Scala's `<<` masks the
    // shift amount and would silently wrap corrupt input into garbage.
    var u = 0L; var shift = 0; var cur = 0
    do {
      if (shift >= 70)
        throw new IllegalArgumentException("overlong varint (>10 bytes)")
      cur = b.get() & 0xff
      if (shift < 64) u |= (cur & 0x7fL) << shift
      shift += 7
    } while ((cur & 0x80) != 0)
    unzigzag(u)
  }

  /** CRC32-C over `bytes[from, until)`. */
  def crc32c(bytes: Array[Byte], from: Int, until: Int): Long = {
    val c = new CRC32C
    c.update(bytes, from, until - from)
    c.getValue
  }

  // ------------------------------------------------------ compression

  /** Batch compression codecs, attribute bits 0-2
    * (`model/compression.h:36-48`): 0 none, 1 gzip, 2 snappy (xerial
    * java framing — the reference notes it is NOT raw google snappy),
    * 3 lz4 (frame format), 4 zstd. Only the RECORDS section compresses;
    * the 61-byte header stays plain (`storage/parser_utils.cc:50-66`
    * decompresses the body then clears the attribute bits). */
  val CompressionMask = 0x7

  def compress(codec: Int, raw: Array[Byte]): Array[Byte] = codec match {
    case 0 => raw
    case _ =>
      val bos = new java.io.ByteArrayOutputStream()
      val out: java.io.OutputStream = codec match {
        case 1 => new java.util.zip.GZIPOutputStream(bos)
        case 2 => new org.xerial.snappy.SnappyOutputStream(bos)
        case 3 => new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        case 4 => new com.github.luben.zstd.ZstdOutputStream(bos)
        case other => throw new IllegalArgumentException(s"codec $other")
      }
      out.write(raw); out.close()
      bos.toByteArray
  }

  def decompress(codec: Int, body: Array[Byte]): Array[Byte] = codec match {
    case 0 => body
    case _ =>
      val bis = new java.io.ByteArrayInputStream(body)
      val in: java.io.InputStream = codec match {
        case 1 => new java.util.zip.GZIPInputStream(bis)
        case 2 => new org.xerial.snappy.SnappyInputStream(bis)
        case 3 => new net.jpountz.lz4.LZ4FrameInputStream(bis)
        case 4 => new com.github.luben.zstd.ZstdInputStream(bis)
        case other => throw new IllegalArgumentException(s"codec $other")
      }
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
  }

  // ----------------------------------------------------------- encode

  private def recordBodySize(r: Rec): Int = {
    val keyLen = if (r.key == null) -1 else r.key.length
    val valLen = if (r.value == null) -1 else r.value.length
    1 + varintSize(r.tsDelta) + varintSize(r.offsetDelta.toLong) +
      varintSize(keyLen.toLong) + math.max(keyLen, 0) +
      varintSize(valLen.toLong) + math.max(valLen, 0) +
      varintSize(r.headers.size.toLong) +
      r.headers.map { case (k, v) =>
        val kb = k.getBytes("UTF-8")
        varintSize(kb.length.toLong) + kb.length +
          (if (v == null) varintSize(-1L)
           else varintSize(v.length.toLong) + v.length)
      }.sum
  }

  /** The plain (uncompressed) records section. */
  private def encodeRecords(records: Seq[Rec]): Array[Byte] = {
    val bodies = records.map(recordBodySize)
    val buf = ByteBuffer.allocate(
      records.zip(bodies).map { case (_, b) => varintSize(b.toLong) + b }.sum)
    records.zip(bodies).foreach { case (r, body) =>
      putVarint(buf, body.toLong)
      buf.put(0.toByte) // record attributes: unused by the protocol
      putVarint(buf, r.tsDelta)
      putVarint(buf, r.offsetDelta.toLong)
      if (r.key == null) putVarint(buf, -1L)
      else { putVarint(buf, r.key.length.toLong); buf.put(r.key) }
      if (r.value == null) putVarint(buf, -1L)
      else { putVarint(buf, r.value.length.toLong); buf.put(r.value) }
      putVarint(buf, r.headers.size.toLong)
      r.headers.foreach { case (k, v) =>
        val kb = k.getBytes("UTF-8")
        putVarint(buf, kb.length.toLong); buf.put(kb)
        if (v == null) putVarint(buf, -1L)
        else { putVarint(buf, v.length.toLong); buf.put(v) }
      }
    }
    buf.array()
  }

  def encode(baseOffset: Long, partitionLeaderEpoch: Int, attributes: Short,
      firstTimestamp: Long, maxTimestamp: Long, producerId: Long,
      producerEpoch: Short, baseSequence: Int, records: Seq[Rec],
      codec: Int = 0): Array[Byte] = {
    val recBytes = compress(codec, encodeRecords(records))
    val total = HeaderSize + recBytes.length
    val buf = ByteBuffer.allocate(total)
    buf.putLong(baseOffset)
    buf.putInt(total - LengthFieldOffset) // batchLength: bytes after this field
    buf.putInt(partitionLeaderEpoch)
    buf.put(2.toByte)                     // magic
    val crcPos = buf.position()
    buf.putInt(0)                         // crc placeholder
    buf.putShort(((attributes & ~CompressionMask) | codec).toShort)
    buf.putInt(if (records.isEmpty) 0 else records.map(_.offsetDelta).max)
    buf.putLong(firstTimestamp)
    buf.putLong(maxTimestamp)
    buf.putLong(producerId)
    buf.putShort(producerEpoch)
    buf.putInt(baseSequence)
    buf.putInt(records.size)
    buf.put(recBytes)
    val out = buf.array()
    val crc = crc32c(out, CrcDataStart, total)
    ByteBuffer.wrap(out, crcPos, 4).putInt(crc.toInt)
    out
  }

  // ----------------------------------------------------------- decode

  def decodeHeader(bytes: Array[Byte]): Header = {
    val b = ByteBuffer.wrap(bytes)
    Header(
      baseOffset = b.getLong(),
      batchLength = b.getInt(),
      partitionLeaderEpoch = b.getInt(),
      magic = b.get(),
      crc = b.getInt() & 0xffffffffL,
      attributes = b.getShort(),
      lastOffsetDelta = b.getInt(),
      firstTimestamp = b.getLong(),
      maxTimestamp = b.getLong(),
      producerId = b.getLong(),
      producerEpoch = b.getShort(),
      baseSequence = b.getInt(),
      recordCount = b.getInt())
  }

  /** The records section of a wire batch, decompressed per the
    * attribute codec bits. */
  def recordsRegion(bytes: Array[Byte]): Array[Byte] = {
    val h = decodeHeader(bytes)
    decompress(h.attributes & CompressionMask,
      java.util.Arrays.copyOfRange(bytes, HeaderSize, bytes.length))
  }

  /** Parse `count` records from a PLAIN records section. */
  def decodeRecords(recordsBytes: Array[Byte], count: Int): Seq[Rec] = {
    val b = ByteBuffer.wrap(recordsBytes)
    (0 until count).map { _ =>
      getVarint(b) // record body length (framing; fields are self-describing)
      b.get()      // record attributes
      val tsDelta = getVarint(b)
      val offsetDelta = getVarint(b).toInt
      def readBytes(): Array[Byte] = {
        val n = getVarint(b).toInt
        if (n < 0) null
        else { val a = new Array[Byte](n); b.get(a); a }
      }
      val key = readBytes()
      val value = readBytes()
      val nHeaders = getVarint(b).toInt
      val headers = (0 until nHeaders).map { _ =>
        val kn = getVarint(b).toInt
        val ka = new Array[Byte](kn); b.get(ka)
        (new String(ka, "UTF-8"), readBytes())
      }
      Rec(offsetDelta, tsDelta, key, value, headers)
    }
  }

  /** Well-formedness gate the reference's adapter applies BEFORE any
    * field parse (`kafka_batch_adapter.cc:31-47` checks size then
    * magic): at least a full 61-byte header, v2 magic, and a
    * batchLength consistent with the buffer. */
  def wellFormed(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= HeaderSize &&
      bytes(16) == 2.toByte && // magic byte at offset 8+4+4
      ByteBuffer.wrap(bytes, BatchLengthOffset, 4).getInt ==
        bytes.length - LengthFieldOffset

  /** Recomputed-CRC validity, as verify_crc (adapter.cc:98-128). */
  def crcValid(bytes: Array[Byte]): Boolean =
    bytes.length >= HeaderSize &&
      decodeHeader(bytes).crc == crc32c(bytes, CrcDataStart, bytes.length)

  // ---------------------------------------------------- normalization

  /** Byte offset of the attributes field (start of the CRC region). */
  private val AttributesOffset = CrcDataStart
  /** Byte offset of the crc field (after 8+4+4+1 header bytes). */
  private val CrcFieldOffset = 17
  /** Byte offset of the batchLength field. */
  private val BatchLengthOffset = 8

  /** Stamp `batchLength` and re-CRC a fully-assembled wire batch —
    * `storage/parser_utils.cc:110-117` `reset_size_checksum_metadata`
    * (size, then payload crc; the reference's separate header-only crc
    * is an internal storage field, not part of the wire envelope). */
  private def resetSizeChecksum(out: Array[Byte]): Array[Byte] = {
    ByteBuffer.wrap(out, BatchLengthOffset, 4)
      .putInt(out.length - LengthFieldOffset)
    val crc = crc32c(out, CrcDataStart, out.length)
    ByteBuffer.wrap(out, CrcFieldOffset, 4).putInt(crc.toInt)
    out
  }

  /** Header bytes + a new records section, length/CRC re-stamped. */
  private def withRecordsSection(bytes: Array[Byte], attributes: Short,
      section: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](HeaderSize + section.length)
    System.arraycopy(bytes, 0, out, 0, HeaderSize)
    ByteBuffer.wrap(out, AttributesOffset, 2).putShort(attributes)
    System.arraycopy(section, 0, out, HeaderSize, section.length)
    resetSizeChecksum(out)
  }

  /** Decompress-normalize a wire batch, per `storage/parser_utils.cc:
    * 50-66` (`maybe_decompress_batch_sync`): decompress the records
    * section, clear the compression attribute bits ("must remove
    * compression first!"), then reset size + checksum. The result is
    * byte-identical to encoding the same logical batch uncompressed.
    * Already-plain batches pass through untouched
    * (`decompress_batch_sync`'s `!b.compressed()` early-out). */
  def normalize(bytes: Array[Byte]): Array[Byte] = {
    val h = decodeHeader(bytes)
    val codec = h.attributes & CompressionMask
    if (codec == 0) bytes
    else withRecordsSection(bytes, (h.attributes & ~CompressionMask).toShort,
      decompress(codec,
        java.util.Arrays.copyOfRange(bytes, HeaderSize, bytes.length)))
  }

  /** Threshold-gated recompression, per `storage/parser_utils.cc:68-86`
    * (`compress_batch_consumer`): batches whose total wire size is
    * below the threshold stay as-is; larger ones get their (plain)
    * records section compressed under `codec`, attribute bits set
    * BEFORE the size/checksum reset (`compress_batch`'s "compression
    * bit must be set first!"). Input must be a plain batch, mirroring
    * the reference's `none`-compression vassert. */
  def recompress(bytes: Array[Byte], codec: Int, threshold: Int): Array[Byte] = {
    val h = decodeHeader(bytes)
    require((h.attributes & CompressionMask) == 0,
      s"recompress expects a plain batch, got codec ${h.attributes & CompressionMask}")
    if (codec == 0 || bytes.length < threshold) bytes
    else withRecordsSection(bytes, ((h.attributes & ~CompressionMask) | codec).toShort,
      compress(codec,
        java.util.Arrays.copyOfRange(bytes, HeaderSize, bytes.length)))
  }

  // ------------------------------------------------------ spark types

  val HeaderStructType: StructType = StructType(Seq(
    StructField("header_key", StringType), StructField("header_value", BinaryType)))

  val RecordStructType: StructType = StructType(Seq(
    StructField("offset_delta", IntegerType),
    StructField("ts_delta", LongType),
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("headers", ArrayType(HeaderStructType))))

  /** kafka_batch_encode's input struct contract (fields by NAME). */
  val EncodeInputType: StructType = StructType(Seq(
    StructField("base_offset", LongType),
    StructField("partition_leader_epoch", IntegerType),
    StructField("attributes", IntegerType),
    StructField("first_timestamp", LongType),
    StructField("max_timestamp", LongType),
    StructField("producer_id", LongType),
    StructField("producer_epoch", IntegerType),
    StructField("base_sequence", IntegerType),
    StructField("records", ArrayType(RecordStructType))))

  val DecodeOutputType: StructType = StructType(Seq(
    StructField("base_offset", LongType),
    StructField("batch_length", IntegerType),
    StructField("partition_leader_epoch", IntegerType),
    StructField("magic", IntegerType),
    StructField("crc", LongType),
    StructField("attributes", IntegerType),
    StructField("last_offset_delta", IntegerType),
    StructField("first_timestamp", LongType),
    StructField("max_timestamp", LongType),
    StructField("producer_id", LongType),
    StructField("producer_epoch", IntegerType),
    StructField("base_sequence", IntegerType),
    StructField("record_count", IntegerType),
    StructField("crc_valid", BooleanType),
    StructField("records", ArrayType(RecordStructType))))

  private[functions] def recsFromArrayData(arr: ArrayData): Seq[Rec] =
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 5)
      val hs = if (r.isNullAt(4)) Seq.empty[(String, Array[Byte])] else {
        val ha = r.getArray(4)
        (0 until ha.numElements()).map { j =>
          val h = ha.getStruct(j, 2)
          (h.getUTF8String(0).toString,
            if (h.isNullAt(1)) null else h.getBinary(1))
        }
      }
      Rec(r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getBinary(2),
        if (r.isNullAt(3)) null else r.getBinary(3), hs)
    }

  private[functions] def recsToArrayData(recs: Seq[Rec]): GenericArrayData =
    new GenericArrayData(recs.map { r =>
      InternalRow(r.offsetDelta, r.tsDelta, r.key, r.value,
        new GenericArrayData(r.headers.map { case (k, v) =>
          InternalRow(UTF8String.fromString(k), v)
        }.toArray[Any]))
    }.toArray[Any])
}

/** `kafka_batch_encode(struct[, codec])` → the v2 wire bytes, CRC32-C
  * stamped; `codec` (attribute bits 0-2) compresses the records
  * section. */
case class KafkaBatchEncode(child: Expression, codec: Int = 0)
    extends UnaryExpression with CodegenFallback {
  import RecordBatchCodec._

  override def dataType: DataType = BinaryType
  override def prettyName: String = "kafka_batch_encode"

  private lazy val pos: Map[String, Int] =
    child.dataType.asInstanceOf[StructType].fieldNames.zipWithIndex.toMap

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    def i(n: String) = row.getInt(pos(n))
    def l(n: String) = row.getLong(pos(n))
    encode(l("base_offset"), i("partition_leader_epoch"),
      i("attributes").toShort, l("first_timestamp"), l("max_timestamp"),
      l("producer_id"), i("producer_epoch").toShort, i("base_sequence"),
      recsFromArrayData(row.getArray(pos("records"))), codec)
  }

  override protected def withNewChildInternal(newChild: Expression): KafkaBatchEncode =
    copy(child = newChild)
}

/** `kafka_batch_decode(binary)` → header fields + records + crc_valid. */
case class KafkaBatchDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import RecordBatchCodec._

  override def dataType: DataType = DecodeOutputType
  override def prettyName: String = "kafka_batch_decode"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    // The reference adapter gates on size/magic before parsing
    // (kafka_batch_adapter.cc:31-47); a truncated or non-Kafka buffer
    // yields a crc_valid=false row instead of a BufferUnderflow crash.
    if (bytes == null || bytes.length < HeaderSize)
      return InternalRow(null, null, null,
        if (bytes != null && bytes.length > 16) bytes(16).toInt else null,
        null, null, null, null, null, null, null, null, null,
        false, recsToArrayData(Seq.empty))
    val h = decodeHeader(bytes)
    // A CRC-corrupt body may not even varint-parse; surface it as the
    // crc_valid=false row with no records rather than a thrown task.
    val recs =
      if (h.magic == 2)
        try decodeRecords(recordsRegion(bytes), h.recordCount)
        catch { case _: RuntimeException | _: java.io.IOException => Seq.empty }
      else Seq.empty
    InternalRow(h.baseOffset, h.batchLength, h.partitionLeaderEpoch,
      h.magic.toInt, h.crc, h.attributes.toInt, h.lastOffsetDelta,
      h.firstTimestamp, h.maxTimestamp, h.producerId, h.producerEpoch.toInt,
      h.baseSequence, h.recordCount, crcValid(bytes), recsToArrayData(recs))
  }

  override protected def withNewChildInternal(newChild: Expression): KafkaBatchDecode =
    copy(child = newChild)
}

/** `kafka_batch_normalize(binary)` → the batch with its records section
  * decompressed, compression attribute bits cleared, and length + CRC
  * re-stamped (`storage/parser_utils.cc:50-66,110-117`). Byte-identical
  * to the uncompressed encoding of the same logical batch. */
case class KafkaBatchNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kafka_batch_normalize"
  override protected def nullSafeEval(input: Any): Any =
    RecordBatchCodec.normalize(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): KafkaBatchNormalize =
    copy(child = newChild)
}

/** `kafka_batch_recompress(binary, codec, threshold)` → the
  * threshold-gated compression pass of `storage/parser_utils.cc:68-86`:
  * plain batches at least `threshold` wire bytes get their records
  * section compressed under `codec` (a per-row column); smaller ones
  * pass through. */
case class KafkaBatchRecompress(left: Expression, right: Expression, threshold: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kafka_batch_recompress"
  // Reject a non-binary batch / non-int codec at analysis time instead
  // of a ClassCastException mid-execution.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, INT) arguments, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override protected def nullSafeEval(bytes: Any, codec: Any): Any =
    RecordBatchCodec.recompress(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[Int], threshold)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KafkaBatchRecompress =
    copy(left = newLeft, right = newRight)
}
