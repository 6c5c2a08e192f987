package graft.analytics

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.analytics.Multimodal.MediaRecord

/**
 * JPEG quantization-table parsing + IJG quality estimation — the
 * standard cheap image-quality gate that needs NO pixel decode: a
 * JPEG's DQT tables are the encoder's quality knob made visible, and
 * libjpeg's public scaling law (`jpeg_quality_scaling`) maps a quality
 * factor q ∈ [1,100] to a deterministic scaling of the ISO/IEC 10918-1
 * Annex K reference tables. Inverting that law from the parsed tables
 * recovers the encode quality — the pre-decode reject a crawl-scale
 * image funnel runs before paying for any inflate/IDCT.
 *
 * Estimator: exact inversion — the smallest q whose IJG-scaled Annex K
 * tables equal the parsed (luminance, chrominance) pair position-wise.
 * Exact-match (rather than nearest-sum) keeps the estimate integer,
 * deterministic, and oracle-replayable; non-IJG tables estimate -1 and
 * a caller gates them by policy.
 */
object JpegDqt {

  /** Annex K.1 luminance reference table (row-major). */
  val LumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance reference table (row-major). */
  val ChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** libjpeg's `jpeg_quality_scaling`: percent scaling of the reference
    * tables for quality q. */
  def scaleFactor(q: Int): Int = {
    require(q >= 1 && q <= 100, s"quality out of range: $q")
    if (q < 50) 5000 / q else 200 - 2 * q
  }

  /** One scaled table entry (libjpeg `jpeg_add_quant_table`):
    * `clamp((base·scale + 50) / 100, 1, 255)`. */
  def scaledEntry(base: Int, q: Int): Int =
    math.max(1, math.min(255, (base * scaleFactor(q) + 50) / 100))

  /** Both Annex K tables scaled for quality q. */
  def tablesFor(q: Int): (Array[Int], Array[Int]) =
    (LumaBase.map(scaledEntry(_, q)), ChromaBase.map(scaledEntry(_, q)))

  /**
   * Exact-inversion quality estimate: the smallest q ∈ [1,100] whose
   * IJG-scaled Annex K pair equals the parsed pair position-wise, or
   * -1 if none matches (non-IJG tables). The scaled-table family is
   * injective over q (verified in JpegDqtSpec: 100 distinct pairs), so
   * an IJG-encoded file estimates exactly its encode quality.
   */
  def estimateQuality(luma: Array[Int], chroma: Array[Int]): Int = {
    if (luma.length != 64 || chroma.length != 64) return -1
    var q = 1
    while (q <= 100) {
      var i = 0
      var ok = true
      while (ok && i < 64) {
        ok = scaledEntry(LumaBase(i), q) == luma(i) &&
          scaledEntry(ChromaBase(i), q) == chroma(i)
        i += 1
      }
      if (ok) return q
      q += 1
    }
    -1
  }

  /**
   * Parse every DQT table from a JPEG's marker walk (same walk as
   * [[Multimodal.HeaderParser]]): each DQT segment (FFDB) carries one
   * or more `[PqTq][64 bytes]` blocks; Pq=0 (8-bit) only — 16-bit
   * tables (Pq=1) abort the parse (return empty) rather than misread.
   * Returns (tableId → 64 entries); later definitions of the same id
   * win, per the spec's "replaces" semantics.
   */
  def parseDqt(b: Array[Byte]): Map[Int, Array[Int]] = {
    val len = b.length
    def u8(i: Int) = b(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (len < 4 || u8(0) != 0xff || u8(1) != 0xd8) return Map.empty
    var tables = Map.empty[Int, Array[Int]]
    var i = 2
    while (i + 4 <= len) {
      if (u8(i) != 0xff) return tables
      val marker = u8(i + 1)
      if (marker == 0xff) i += 1
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else if (marker == 0xd9 || marker == 0xda) return tables // EOI / scan data
      else {
        val segLen = be16(i + 2)
        if (i + 2 + segLen > len) return tables
        if (marker == 0xdb) {
          var p = i + 4
          val end = i + 2 + segLen
          while (p < end) {
            val pq = u8(p) >> 4
            val tq = u8(p) & 0x0f
            if (pq != 0 || p + 65 > end) return tables // 16-bit / truncated
            tables = tables.updated(tq, Array.tabulate(64)(k => u8(p + 1 + k)))
            p += 65
          }
        }
        i += 2 + segLen
      }
    }
    tables
  }

  /** Quality estimate straight from the payload: table 0 = luminance,
    * table 1 = chrominance; -1 when either is absent or non-IJG. */
  def estimateQuality(b: Array[Byte]): Int = {
    val t = parseDqt(b)
    (t.get(0), t.get(1)) match {
      case (Some(l), Some(c)) => estimateQuality(l, c)
      case _ => -1
    }
  }

  /** A structurally genuine JPEG header for quality q: SOI, two DQT
    * segments (Tq=0 luminance, Tq=1 chrominance, both IJG-scaled), an
    * APP0 the walk must skip, SOF0 with the given dims, EOI. No
    * entropy-coded data — the gate under test never needs it. */
  def jpegBytes(q: Int, width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u8(0xff); u8(0xd8) // SOI
    u8(0xff); u8(0xe0); be16(16); out.write("JFIF".getBytes("US-ASCII"))
    (0 until 10).foreach(_ => u8(0))
    val (lt, ct) = tablesFor(q)
    u8(0xff); u8(0xdb); be16(2 + 65); u8(0x00); lt.foreach(u8)
    u8(0xff); u8(0xdb); be16(2 + 65); u8(0x01); ct.foreach(u8)
    u8(0xff); u8(0xc0); be16(11); u8(8); be16(height); be16(width); u8(1)
    u8(1); u8(0x11); u8(0)
    u8(0xff); u8(0xd9) // EOI
    out.toByteArray
  }

  /** Parsed-and-estimated quality row: oracle-checkable per file. */
  final case class JpegQuality(doc_id: Long, est_quality: Int,
      luma_sum: Int, chroma_sum: Int, n_tables: Int)

  /** Synthesize an IJG-encoded JPEG per id (quality `1 + id % 100`). */
  def synthJpegMedia(ids: Dataset[java.lang.Long])(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      it.map { boxed =>
        val id = boxed.longValue()
        val q = 1 + (id % 100).toInt
        MediaRecord(id, "image/jpeg",
          jpegBytes(q, 16 + (id % 1000).toInt, 9 + (id % 700).toInt))
      }
    }
  }

  /** Parse + estimate per payload — narrow mapPartitions, no pixel
    * decode, scales as a projection. */
  def qualityEstimates(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[JpegQuality] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val t = parseDqt(r.media)
        val est = (t.get(0), t.get(1)) match {
          case (Some(l), Some(c)) => estimateQuality(l, c)
          case _ => -1
        }
        JpegQuality(r.doc_id, est,
          t.get(0).map(_.sum).getOrElse(0), t.get(1).map(_.sum).getOrElse(0),
          t.size)
      }
    }
  }
}
