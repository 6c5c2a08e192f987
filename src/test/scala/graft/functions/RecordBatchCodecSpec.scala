package graft.functions

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the Kafka record-batch v2 wire codec
  * (kafka_batch_adapter.h:25-41, kafka_batch_adapter.cc:31-128). */
class RecordBatchCodecSpec extends AnyFunSuite {
  import RecordBatchCodec._

  test("CRC32-C family check value") {
    // the Castagnoli polynomial's standard check: crc32c("123456789")
    val b = "123456789".getBytes("ASCII")
    assert(crc32c(b, 0, b.length) === 0xE3069283L)
  }

  test("zigzag varints round-trip and match the Kafka sizes") {
    assert(zigzag(0L) === 0L && zigzag(-1L) === 1L && zigzag(1L) === 2L)
    assert(unzigzag(zigzag(-64L)) === -64L)
    assert(varintSize(0L) === 1)   // zigzag 0 -> 1 byte
    assert(varintSize(63L) === 1)  // zigzag 126
    assert(varintSize(64L) === 2)  // zigzag 128
    assert(varintSize(-1L) === 1)  // zigzag 1
    assert(varintSize(8191L) === 2)
    assert(varintSize(8192L) === 3)
  }

  test("decode of a hand-assembled one-record batch") {
    // independently spelled wire bytes: 61-byte header + one record
    // {tsDelta=5, offsetDelta=0, key="k", value="val", no headers}
    val body = 1 + 1 + 1 + 1 + 1 + 1 + 3 + 1 // attr,ts,od,klen,k,vlen,val,hdrs
    val buf = ByteBuffer.allocate(61 + 1 + body)
    buf.putLong(1000L)              // baseOffset
    buf.putInt(61 + 1 + body - 12)  // batchLength
    buf.putInt(7)                   // partitionLeaderEpoch
    buf.put(2.toByte)               // magic
    val crcPos = buf.position()
    buf.putInt(0)                   // crc (stamped below)
    buf.putShort(0.toShort)         // attributes
    buf.putInt(0)                   // lastOffsetDelta
    buf.putLong(500L)               // firstTimestamp
    buf.putLong(505L)               // maxTimestamp
    buf.putLong(42L)                // producerId
    buf.putShort(3.toShort)         // producerEpoch
    buf.putInt(17)                  // baseSequence
    buf.putInt(1)                   // recordCount
    buf.put((body * 2).toByte)      // record length, zigzag varint
    buf.put(0.toByte)               // record attributes
    buf.put(10.toByte)              // tsDelta 5, zigzag
    buf.put(0.toByte)               // offsetDelta 0
    buf.put(2.toByte)               // keyLen 1, zigzag
    buf.put('k'.toByte)
    buf.put(6.toByte)               // valLen 3, zigzag
    buf.put("val".getBytes("ASCII"))
    buf.put(0.toByte)               // headerCount 0
    val bytes = buf.array()
    val crc = crc32c(bytes, 21, bytes.length)
    ByteBuffer.wrap(bytes, crcPos, 4).putInt(crc.toInt)

    val h = decodeHeader(bytes)
    assert(h.baseOffset === 1000L && h.magic === 2 && h.recordCount === 1)
    assert(h.partitionLeaderEpoch === 7 && h.producerId === 42L)
    assert(h.firstTimestamp === 500L && h.maxTimestamp === 505L)
    assert(h.baseSequence === 17 && h.producerEpoch === 3)
    assert(crcValid(bytes))
    val recs = decodeRecords(recordsRegion(bytes), 1)
    assert(recs.head.tsDelta === 5L && recs.head.offsetDelta === 0)
    assert(new String(recs.head.key, "ASCII") === "k")
    assert(new String(recs.head.value, "ASCII") === "val")
    // ... and the codec's own encoder reproduces the same bytes
    val enc = encode(1000L, 7, 0, 500L, 505L, 42L, 3, 17,
      Seq(Rec(0, 5L, "k".getBytes, "val".getBytes, Seq.empty)))
    assert(enc.toSeq === bytes.toSeq)
  }

  test("round-trip: encode -> decode -> re-encode is byte-identical") {
    val recs = Seq(
      Rec(0, 0L, "a".getBytes, ("x" * 200).getBytes,
        Seq(("trace", Array[Byte](1, 2, 3)))),
      Rec(1, 64L, null, "second".getBytes, Seq.empty),
      Rec(2, 8192L, "key3".getBytes, null, Seq(("h", null))))
    val enc = encode(5000L, 3, 0, 100L, 8292L, 99L, 1, 0, recs)
    assert(crcValid(enc))
    val h = decodeHeader(enc)
    assert(h.recordCount === 3 && h.lastOffsetDelta === 2)
    assert(h.batchLength === enc.length - 12)
    val back = decodeRecords(recordsRegion(enc), 3)
    val re = encode(h.baseOffset, h.partitionLeaderEpoch, h.attributes,
      h.firstTimestamp, h.maxTimestamp, h.producerId, h.producerEpoch,
      h.baseSequence, back)
    assert(re.toSeq === enc.toSeq)
  }

  test("compressed batches: every codec round-trips, attributes carry the bits") {
    // gzip=1, snappy(xerial framing)=2, lz4(frame)=3, zstd=4 — the
    // model/compression.h numbering; only the records section
    // compresses, the 61-byte header stays plain
    val recs = (0 until 50).map(i =>
      Rec(i, i.toLong, s"key$i".getBytes, ("the quick brown fox " * 10).getBytes, Seq.empty))
    val plain = encode(100L, 1, 0, 0L, 49L, 7L, 0, 0, recs)
    for (codec <- 1 to 4) {
      val enc = encode(100L, 1, 0, 0L, 49L, 7L, 0, 0, recs, codec)
      val h = decodeHeader(enc)
      assert((h.attributes & CompressionMask) === codec)
      assert(crcValid(enc), s"codec $codec CRC")
      assert(enc.length < plain.length, s"codec $codec should shrink this payload")
      val back = decodeRecords(recordsRegion(enc), h.recordCount)
      assert(back.map(r => (r.offsetDelta, r.tsDelta, r.key.toSeq, r.value.toSeq)) ===
        recs.map(r => (r.offsetDelta, r.tsDelta, r.key.toSeq, r.value.toSeq)))
    }
  }

  test("normalize: decompress + clear bits + re-CRC is byte-identical to plain") {
    // parser_utils.cc:50-66 maybe_decompress_batch_sync semantics
    val recs = (0 until 40).map(i =>
      Rec(i, i * 2L, s"k$i".getBytes, ("lorem ipsum dolor " * 8).getBytes, Seq.empty))
    val plain = encode(7L, 2, 0, 10L, 90L, 55L, 1, 3, recs)
    for (codec <- 1 to 4) {
      val norm = normalize(encode(7L, 2, 0, 10L, 90L, 55L, 1, 3, recs, codec))
      assert(norm.toSeq === plain.toSeq, s"codec $codec normalize")
    }
    // plain batches pass through untouched (the !compressed() early-out)
    assert(normalize(plain) eq plain)
  }

  test("recompress: threshold gates; set-bits-then-reset matches direct encode") {
    val recs = (0 until 40).map(i =>
      Rec(i, i.toLong, null, ("abcdefgh" * 16).getBytes, Seq.empty))
    val plain = encode(0L, 0, 0, 0L, 39L, -1L, -1, -1, recs)
    // below threshold: unchanged
    assert(recompress(plain, 4, plain.length + 1) eq plain)
    // at/above threshold: identical to encoding compressed directly
    for (codec <- 1 to 4) {
      val direct = encode(0L, 0, 0, 0L, 39L, -1L, -1, -1, recs, codec)
      assert(recompress(plain, codec, plain.length).toSeq === direct.toSeq,
        s"codec $codec recompress")
    }
    // compressed input is rejected (the reference's vassert)
    val gz = encode(0L, 0, 0, 0L, 39L, -1L, -1, -1, recs, 1)
    intercept[IllegalArgumentException](recompress(gz, 2, 0))
  }

  test("corruption flips crc_valid") {
    val enc = encode(0L, 0, 0, 0L, 0L, -1L, -1, -1,
      Seq(Rec(0, 0L, null, "payload".getBytes, Seq.empty)))
    assert(crcValid(enc))
    enc(enc.length - 1) = (enc(enc.length - 1) ^ 0x01).toByte
    assert(!crcValid(enc))
    // corrupting a pre-CRC header byte does NOT break the kafka CRC
    // (only bytes below the crc field are checksummed, record.h:487-489)
    val enc2 = encode(0L, 0, 0, 0L, 0L, -1L, -1, -1,
      Seq(Rec(0, 0L, null, "payload".getBytes, Seq.empty)))
    enc2(3) = 0x7f.toByte // inside baseOffset
    assert(crcValid(enc2))
  }
}
