package graft.analytics

import graft.SparkSpec
import graft.analytics.Multimodal.HeaderParser

/** Container-header byte parsing: offsets, endianness, marker walk. */
class HeaderParserSpec extends SparkSpec {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("png header: big-endian dims and bit depth at the IHDR offsets") {
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++ bytes(
      0, 0, 0x01, 0x00, // width 256
      0, 0, 0, 0x11,    // height 17
      16, 6, 0, 0, 0,   // depth 16, rgba
      0, 0, 0, 0)
    assert(HeaderParser.parse(png) === (("png", 256, 17, 16)))
  }

  test("gif header: little-endian dims") {
    val gif = "GIF87a".getBytes ++ bytes(0x34, 0x12, 0x08, 0x00, 0, 0, 0)
    assert(HeaderParser.parse(gif) === (("gif", 0x1234, 8, 8)))
  }

  test("jpeg marker walk skips APPn and quant segments to the SOF") {
    val jpeg = bytes(0xff, 0xd8) ++
      bytes(0xff, 0xe1, 0x00, 0x04, 0, 0) ++       // APP1, len 4
      bytes(0xff, 0xdb, 0x00, 0x05, 1, 2, 3) ++    // DQT, len 5
      bytes(0xff, 0xc2, 0x00, 0x0b, 8,             // SOF2 (progressive)
        0x00, 0x2a,  // height 42
        0x01, 0x00,  // width 256
        1, 1, 0x11, 0)
    assert(HeaderParser.parse(jpeg) === (("jpeg", 256, 42, 8)))
  }

  test("jpeg walk handles length-less markers: TEM, RSTn, fill bytes, early EOI") {
    // TEM and RST4 carry no length field; a 0xFF fill byte pads before
    // a marker — none of these may be misread as segment lengths.
    val jpeg = bytes(0xff, 0xd8) ++
      bytes(0xff, 0x01) ++                         // TEM, standalone
      bytes(0xff, 0xd4) ++                         // RST4, standalone
      bytes(0xff, 0xff, 0xe0, 0x00, 0x04, 0, 0) ++ // fill byte + APP0 len 4
      bytes(0xff, 0xc0, 0x00, 0x0b, 8,
        0x00, 0x07,  // height 7
        0x00, 0x15,  // width 21
        1, 1, 0x11, 0)
    assert(HeaderParser.parse(jpeg) === (("jpeg", 21, 7, 8)))
    // EOI before any SOF: a headerless (but valid) stream, not corrupt
    val eoiFirst = bytes(0xff, 0xd8, 0xff, 0xd9, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(HeaderParser.parse(eoiFirst)._1 === "jpeg_nosof")
  }

  test("corrupt jpeg (non-marker byte mid-walk) and unknown magic are flagged") {
    val corrupt = bytes(0xff, 0xd8, 0x00, 0x11, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(HeaderParser.parse(corrupt)._1 === "jpeg_corrupt")
    assert(HeaderParser.parse("notanimage-------".getBytes)._1 === "unknown")
  }

  test("synthesized media round-trips its planted dimensions") {
    implicit val sp = spark
    import spark.implicits._
    val ids = spark.range(0, 30).select($"id".as[java.lang.Long])
    val got = Multimodal.parseHeaders(Multimodal.synthesizeMedia(ids))
      .collect().sortBy(_.doc_id)
    got.foreach { h =>
      val id = h.doc_id
      assert(h.width === 16 + (id % 1000).toInt, s"doc $id")
      assert(h.height === 9 + (id % 700).toInt, s"doc $id")
      assert(h.format === Seq("png", "gif", "jpeg")((id % 3).toInt), s"doc $id")
      assert(h.byte_len === (if (id % 3 == 1) 13 else 33) + (id % 50).toInt, s"doc $id")
    }
  }

  test("WAV: RIFF chunk walk with a skipped LIST chunk and odd-size padding") {
    import graft.analytics.Multimodal.AvHeaderParser
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    out.write("RIFF".getBytes); le32(0); out.write("WAVE".getBytes)
    // a LIST chunk with an ODD payload size: the walk must pad to even
    out.write("LIST".getBytes); le32(3); u8(1); u8(2); u8(3); u8(0)
    out.write("fmt ".getBytes); le32(16)
    le16(1); le16(2); le32(44100); le32(44100 * 2 * 2); le16(4); le16(16)
    out.write("data".getBytes); le32(44100 * 2 * 2 * 3) // exactly 3 s
    val parsed = AvHeaderParser.parse(out.toByteArray)
    assert(parsed === (("wav", "pcm", 2, 44100, 16, 3000L)))
    // missing fmt chunk
    val bad = new java.io.ByteArrayOutputStream()
    bad.write("RIFF".getBytes)
    bad.write(Array[Byte](0, 0, 0, 0)); bad.write("WAVE".getBytes)
    bad.write("data".getBytes); bad.write(Array[Byte](4, 0, 0, 0, 1, 2, 3, 4))
    bad.write(Array.fill[Byte](20)(0))
    assert(AvHeaderParser.parse(bad.toByteArray)._1 === "wav_nofmt")
  }

  test("WAV: a malformed near-0xFFFFFFFF chunk size terminates (no hang), classifies wav_nofmt") {
    import graft.analytics.Multimodal.AvHeaderParser
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    out.write("RIFF".getBytes); le32(0); out.write("WAVE".getBytes)
    // size 0xFFFFFFF8: the old int-truncated advance was 8 + (-8) = 0
    // — an infinite loop; the long-arithmetic walk must cap and exit
    out.write("JUNK".getBytes); le32(0xFFFFFFF8.toInt)
    out.write(Array.fill[Byte](24)(0))
    assert(AvHeaderParser.parse(out.toByteArray)._1 === "wav_nofmt")
  }

  test("MP4: an mvhd header at a truncated buffer edge classifies, never reads past the array") {
    import graft.analytics.Multimodal.AvHeaderParser
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be32(v: Int): Unit = { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
    be32(16); out.write("ftyp".getBytes); out.write("mp42".getBytes); be32(512)
    // moov claims 108 payload bytes but the buffer ends 12 bytes in:
    // the mvhd box header parses, its version/timescale fields do not
    be32(8 + 108); out.write("moov".getBytes)
    be32(108); out.write("mvhd".getBytes)
    assert(AvHeaderParser.parse(out.toByteArray)._1 === "mp4_truncated")
  }

  test("MP4: box walk skips a leading free box; mvhd v1 and no-moov arms") {
    import graft.analytics.Multimodal.AvHeaderParser
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be32(v: Int): Unit = { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
    be32(16); out.write("ftyp".getBytes); out.write("mp42".getBytes); be32(512)
    be32(12); out.write("free".getBytes); be32(0) // skipped filler box
    be32(8 + 8 + 100); out.write("moov".getBytes)
    be32(108); out.write("mvhd".getBytes)
    be32(0); be32(0); be32(0)       // v0+flags, creation, modification
    be32(90000); be32(90000 * 7 + 45000) // timescale, duration = 7.5 s
    (0 until 80).foreach(_ => u8(0))
    val parsed = AvHeaderParser.parse(out.toByteArray)
    assert(parsed === (("mp4", "mp42", 0, 0, 0, 7500L)))
    // version-1 mvhd is recognized and refused (64-bit fields)
    val v1 = out.toByteArray.clone()
    v1(16 + 12 + 8 + 8) = 1 // mvhd version byte
    assert(AvHeaderParser.parse(v1)._1 === "mp4_mvhd_v1")
    val nomoov = new java.io.ByteArrayOutputStream()
    def b32(v: Int): Unit = { nomoov.write(v >> 24); nomoov.write((v >> 16) & 0xff); nomoov.write((v >> 8) & 0xff); nomoov.write(v & 0xff) }
    b32(16); nomoov.write("ftyp".getBytes); nomoov.write("isom".getBytes); b32(0)
    assert(AvHeaderParser.parse(nomoov.toByteArray)._1 === "mp4_nomoov")
  }

  test("synthesized AV corpus round-trips every planted field") {
    import graft.analytics.Multimodal
    implicit val s = spark
    import s.implicits._
    val ids = spark.range(0, 64).map(java.lang.Long.valueOf(_))
    val parsed = Multimodal.parseAvHeaders(Multimodal.synthesizeAvMedia(ids))
      .collect().sortBy(_.doc_id)
    parsed.foreach { h =>
      val id = h.doc_id; val k = id / 2
      if (id % 2 == 0) {
        assert(h.format === "wav", s"doc $id")
        assert(h.channels === 1 + (k % 2).toInt)
        assert(h.sample_rate === 8000 * (1 + (k % 3).toInt))
        assert(h.duration_ms === (1000 + k % 4000) * 1000 / (8000 * (1 + k % 3)))
        assert(h.byte_len === 44 + (k % 7).toInt)
      } else {
        assert(h.format === "mp4" && h.brand === "isom", s"doc $id")
        assert(h.duration_ms === (3000 + k % 9000) * 1000 / (600 * (1 + k % 4)))
        assert(h.byte_len === 140 + (k % 7).toInt)
      }
    }
  }

  test("GIF animation walk: frames, GCE delays, NETSCAPE loop, skips") {
    (0L to 40L).foreach { id =>
      val (w, h, f, d, l) = Multimodal.parseGifAnim(Multimodal.gifAnimBytes(id))
      val cls = id % 64; val nf = 2 + (id % 9).toInt
      assert((w, h) === (16 + (id % 100).toInt, 9 + (id % 80).toInt), s"id $id")
      assert(f === nf && l === (id % 4).toInt, s"id $id")
      assert(d === (0 until nf).map(i => 10 + (cls * 3 + 7L * i) % 50).sum, s"id $id")
    }
    // a GIF with a global color table and a plain-text extension the
    // walk must skip (sub-block lengths, not content)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    out.write("GIF89a".getBytes); u8(5); u8(0); u8(4); u8(0)
    u8(0x80 | 1) // global color table, size bits 1 -> 3*2^2 = 12 bytes
    u8(0); u8(0); (0 until 12).foreach(_ => u8(0x55))
    u8(0x21); u8(0x01); u8(12); (0 until 12).foreach(_ => u8(0)); u8(0) // plain text
    u8(0x2c); (0 until 8).foreach(_ => u8(0)); u8(0); u8(0) // descriptor, no LCT
    u8(2); u8(1); u8(0); u8(0) // LZW + one sub-block + terminator
    u8(0x3b)
    assert(Multimodal.parseGifAnim(out.toByteArray) === ((5, 4, 1, 0L, 0)))
    // truncation fails loudly
    intercept[IllegalArgumentException](
      Multimodal.parseGifAnim(out.toByteArray.dropRight(3)))
    intercept[IllegalArgumentException](
      Multimodal.parseGifAnim("GIF87a......".getBytes))
  }
}
