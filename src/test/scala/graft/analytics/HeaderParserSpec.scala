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
}
