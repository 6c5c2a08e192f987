package graft.analytics

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The PNG codec is cross-validated against the JDK's ImageIO PNG
  * implementation — an INDEPENDENT codec — in both directions, so a
  * symmetric encoder/decoder bug pair cannot cancel out the way a pure
  * roundtrip test would allow. */
class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  private def law(cls: Long)(x: Int, y: Int): Int = PngCodec.classPixel(cls, x, y)

  test("roundtrip: encode then decode reproduces every pixel, all five filters") {
    val (w, h) = (36, 32) // 32 rows => filters 0..4 each used >= 6 times
    val img = PngCodec.decodeGray(PngCodec.encodeGray(w, h, law(7)))
    assert(img.width === w && img.height === h)
    assert(img.bitDepth === 8 && img.colorType === 0)
    assert(img.crcOk)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.pixels(y * w + x) === law(7)(x, y), s"pixel ($x,$y)")
  }

  test("our decoder reads ImageIO-encoded PNGs pixel-exactly") {
    val (w, h) = (23, 17) // odd dims: exercises non-aligned scanlines
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, law(3)(x, y))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(bi, "png", bos))
    val img = PngCodec.decodeGray(bos.toByteArray)
    assert(img.width === w && img.height === h && img.crcOk)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.pixels(y * w + x) === law(3)(x, y), s"pixel ($x,$y)")
  }

  test("ImageIO reads our encoder's PNGs pixel-exactly") {
    val (w, h) = (36, 32)
    val bytes = PngCodec.encodeGray(w, h, law(11))
    val bi = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(bi != null, "ImageIO rejected our PNG")
    assert(bi.getWidth === w && bi.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(bi.getRaster.getSample(x, y, 0) === law(11)(x, y), s"pixel ($x,$y)")
  }

  test("corrupted chunk fails the CRC gate but still decodes structurally") {
    val bytes = PngCodec.encodeGray(36, 32, law(5))
    // flip one bit inside the IDAT payload region's CRC trailer: find IEND
    // and corrupt the 4 bytes before it (the IDAT CRC)
    val idx = bytes.length - 13 // IEND chunk is 12 bytes; byte before it ends IDAT CRC
    bytes(idx) = (bytes(idx) ^ 0x01).toByte
    val img = PngCodec.decodeGray(bytes)
    assert(!img.crcOk)
  }

  test("unsupported layouts fail loudly") {
    val bi = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, "png", bos)
    intercept[IllegalArgumentException](PngCodec.decodeGray(bos.toByteArray))
    intercept[IllegalArgumentException](PngCodec.decodeGray("not a png".getBytes))
  }

  test("dHash: identical classes collide, banding finds planted dups, hamming exact") {
    implicit val sp = spark
    val ids = spark.createDataset((0L until 40L).map(i => java.lang.Long.valueOf(i * 5)))
    val media = PngCodec.synthPngMedia(ids, classes = 16)
    val hashes = PngCodec.dHash(media).toDF()
    // same class (id % 16 after the *5 spacing) => identical image => equal hash
    val h = hashes.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val sameClass = h.keys.toSeq.combinations(2)
      .filter { case Seq(a, b) => (a / 5 % 16) == (b / 5 % 16) }
    sameClass.foreach { case Seq(a, b) => assert(h(a) === h(b), s"$a vs $b") }
    val pairs = PngCodec.phashDedup(hashes, maxHamming = 3).collect()
    // every same-class pair must be found with hamming 0
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    sameClass.foreach { case Seq(a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      assert(found.contains((lo, hi)), s"missing planted dup ($lo,$hi)")
    }
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val ham = r.getInt(2)
      val (xa, xb) = (h(a), h(b))
      val exact = Integer.bitCount(xa._1 ^ xb._1) + Integer.bitCount(xa._2 ^ xb._2) +
        Integer.bitCount(xa._3 ^ xb._3) + Integer.bitCount(xa._4 ^ xb._4)
      assert(ham === exact && ham <= 3)
    }
  }

  test("decodeStats matches the closed-form pixel law on the synthetic corpus") {
    implicit val sp = spark
    val ids = spark.createDataset(Seq(0L, 65L, 130L).map(java.lang.Long.valueOf))
    val stats = PngCodec.decodeStats(PngCodec.synthPngMedia(ids)).collect()
    stats.foreach { st =>
      val cls = st.doc_id % 64
      val expSum = (for (y <- 0 until 32; x <- 0 until 36) yield law(cls)(x, y).toLong).sum
      assert(st.width === 36 && st.height === 32 && st.crc_ok)
      assert(st.px_sum === expSum)
      assert(st.px_first === law(cls)(0, 0))
      assert(st.px_mid === law(cls)(18, 16))
      assert(st.px_last === law(cls)(35, 31))
    }
  }
}
