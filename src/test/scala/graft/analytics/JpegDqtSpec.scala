package graft.analytics

import org.scalatest.funsuite.AnyFunSuite

class JpegDqtSpec extends AnyFunSuite {

  test("IJG scaling law matches libjpeg reference points") {
    // jpeg_quality_scaling: q=50 -> 100% (tables = Annex K verbatim)
    assert(JpegDqt.scaleFactor(50) === 100)
    assert(JpegDqt.tablesFor(50)._1.toSeq === JpegDqt.LumaBase.toSeq)
    assert(JpegDqt.tablesFor(50)._2.toSeq === JpegDqt.ChromaBase.toSeq)
    // q=100 -> scale 0 -> all entries clamp to 1 (lossless-ish tables)
    assert(JpegDqt.tablesFor(100)._1.forall(_ == 1))
    // q=25 -> scale 200 -> doubled (unclamped range)
    assert(JpegDqt.scaledEntry(16, 25) === 32)
    // q=1 -> scale 5000 -> everything clamps to 255
    assert(JpegDqt.tablesFor(1)._1.forall(_ == 255))
  }

  test("scaled-table family is injective over q in 1..100") {
    val all = (1 to 100).map(q => JpegDqt.tablesFor(q) match {
      case (l, c) => (l.toSeq, c.toSeq)
    })
    assert(all.distinct.size === 100)
  }

  test("estimateQuality inverts jpegBytes exactly for every q") {
    (1 to 100).foreach { q =>
      val b = JpegDqt.jpegBytes(q, 36, 32)
      assert(JpegDqt.estimateQuality(b) === q, s"quality $q")
    }
  }

  test("DQT walk: multi-table segment, replacement, and graceful rejects") {
    // jpegBytes writes two single-table segments; fuse them into ONE
    // segment carrying both blocks — the other legal layout
    val (lt, ct) = JpegDqt.tablesFor(77)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    u8(0xff); u8(0xd8)
    u8(0xff); u8(0xdb); u8(0); u8(2 + 130)
    u8(0x00); lt.foreach(u8)
    u8(0x01); ct.foreach(u8)
    u8(0xff); u8(0xd9)
    val t = JpegDqt.parseDqt(out.toByteArray)
    assert(t.keySet === Set(0, 1))
    assert(JpegDqt.estimateQuality(out.toByteArray) === 77)
    // later definition of the same table id replaces the earlier one
    val redef = JpegDqt.jpegBytes(30, 8, 8) ++ Array.emptyByteArray
    val t30 = JpegDqt.parseDqt(redef)
    assert(t30(0).toSeq === JpegDqt.tablesFor(30)._1.toSeq)
    // non-JPEG and table-less JPEG estimate -1, never throw
    assert(JpegDqt.estimateQuality("not a jpeg".getBytes) === -1)
    assert(JpegDqt.estimateQuality(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) === -1)
    // non-IJG tables (valid layout, wrong values) estimate -1
    val bogus = JpegDqt.jpegBytes(40, 8, 8)
    // corrupt one luminance entry in place (offset: SOI 2 + APP0 18 +
    // DQT header 4 + PqTq 1 = 25)
    bogus(25) = (bogus(25) ^ 0x7f).toByte
    assert(JpegDqt.estimateQuality(bogus) === -1)
  }
}
