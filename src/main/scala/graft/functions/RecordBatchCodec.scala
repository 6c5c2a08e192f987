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
    var u = 0L; var shift = 0; var cur = 0
    do {
      cur = b.get() & 0xff
      u |= (cur & 0x7fL) << shift
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

  def encode(baseOffset: Long, partitionLeaderEpoch: Int, attributes: Short,
      firstTimestamp: Long, maxTimestamp: Long, producerId: Long,
      producerEpoch: Short, baseSequence: Int, records: Seq[Rec]): Array[Byte] = {
    val bodies = records.map(recordBodySize)
    val recBytes = records.zip(bodies).map { case (r, b) => varintSize(b.toLong) + b }.sum
    val total = HeaderSize + recBytes
    val buf = ByteBuffer.allocate(total)
    buf.putLong(baseOffset)
    buf.putInt(total - LengthFieldOffset) // batchLength: bytes after this field
    buf.putInt(partitionLeaderEpoch)
    buf.put(2.toByte)                     // magic
    val crcPos = buf.position()
    buf.putInt(0)                         // crc placeholder
    buf.putShort(attributes)
    buf.putInt(if (records.isEmpty) 0 else records.map(_.offsetDelta).max)
    buf.putLong(firstTimestamp)
    buf.putLong(maxTimestamp)
    buf.putLong(producerId)
    buf.putShort(producerEpoch)
    buf.putInt(baseSequence)
    buf.putInt(records.size)
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

  def decodeRecords(bytes: Array[Byte], count: Int): Seq[Rec] = {
    val b = ByteBuffer.wrap(bytes)
    b.position(HeaderSize)
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

  /** Recomputed-CRC validity, as verify_crc (adapter.cc:98-128). */
  def crcValid(bytes: Array[Byte]): Boolean =
    decodeHeader(bytes).crc == crc32c(bytes, CrcDataStart, bytes.length)

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

/** `kafka_batch_encode(struct)` → the v2 wire bytes, CRC32-C stamped. */
case class KafkaBatchEncode(child: Expression)
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
      recsFromArrayData(row.getArray(pos("records"))))
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
    val h = decodeHeader(bytes)
    val recs =
      if (h.magic == 2) decodeRecords(bytes, h.recordCount) else Seq.empty
    InternalRow(h.baseOffset, h.batchLength, h.partitionLeaderEpoch,
      h.magic.toInt, h.crc, h.attributes.toInt, h.lastOffsetDelta,
      h.firstTimestamp, h.maxTimestamp, h.producerId, h.producerEpoch.toInt,
      h.baseSequence, h.recordCount, crcValid(bytes), recsToArrayData(recs))
  }

  override protected def withNewChildInternal(newChild: Expression): KafkaBatchDecode =
    copy(child = newChild)
}
