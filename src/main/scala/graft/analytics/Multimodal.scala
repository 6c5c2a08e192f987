package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video as opaque `binary` with typed
 * metadata, processed in partition-sized batches.
 *
 * Every decode in this file is REAL — pure-JVM parsers against the
 * public byte layouts: PNG pixels via [[PngCodec]], RIFF/WAVE samples
 * via [[AudioCodec]], ISO-BMFF sample tables below (ISO/IEC 14496-12).
 * [[extractMediaMeta]] dispatches on the container signature and
 * decodes pixels, samples, or sample tables; [[sampleFrames]] samples
 * frames from the real stts/stsz tables. (The round-16-era
 * deterministic stub codec is retired.)
 */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])

  /** Real decoded metadata, one row per media payload. `content_sum`
    * is modality-specific but always a reduction of genuinely decoded
    * content: pixel sum (png), signed PCM sample sum (wav),
    * sample-table byte total (mp4) — a wrong filter reconstruction,
    * sample sign, or table offset shows up as a sum mismatch. */
  final case class MediaMeta(doc_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, duration_ms: Long, content_sum: Long)

  /**
   * Batch metadata extraction with REAL codec dispatch: the container
   * signature picks the decoder (PNG magic → pixel decode; RIFF/WAVE →
   * PCM sample decode; ftyp → sample-table walk). `mapPartitions` so a
   * heavier codec can amortize per-batch init across the partition —
   * the Scala analogue of an Arrow-batched Python UDF. Narrow (no
   * shuffle); repartition upstream to size decode batches.
   */
  def extractMediaMeta(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        val b = r.media
        def cc4(i: Int) = if (b.length >= i + 4) new String(b, i, 4, "US-ASCII") else ""
        if (b.length >= 8 && (b(0) & 0xff) == 0x89 && cc4(1).startsWith("PNG")) {
          val img = PngCodec.decodeGray(b)
          var s = 0L; var i = 0
          while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
          MediaMeta(r.doc_id, "png", img.width, img.height, 1, 0L, s)
        } else if (cc4(0) == "RIFF" && cc4(8) == "WAVE") {
          val (sr, samples) = AudioCodec.decodeWavWithRate(b)
          var s = 0L; var i = 0
          while (i < samples.length) { s += samples(i); i += 1 }
          MediaMeta(r.doc_id, "wav", 0, 0, samples.length,
            if (sr > 0) samples.length * 1000L / sr else 0L, s)
        } else if (cc4(4) == "ftyp") {
          val t = mp4Table(b)
          MediaMeta(r.doc_id, "mp4", 0, 0, t.nSamples,
            if (t.timescale > 0) t.totalTicks * 1000L / t.timescale else 0L,
            t.totalBytes)
        } else MediaMeta(r.doc_id, "unknown", 0, 0, 0, 0L, 0L)
      }
    }
  }

  /** One sampled frame: parent doc, sample index, REAL presentation
    * timestamp (cumulative stts deltas over the mdhd timescale), and
    * the frame's byte size from the stsz table. */
  final case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long, frame_bytes: Int)

  /**
   * Frame sampling — every k-th sample of each MP4 payload, the 1->N
   * expansion a real extractor performs, driven by the REAL decoded
   * sample tables: frame count from stts, timestamps from the
   * cumulative time-to-sample deltas, sizes from stsz. flatMap inside
   * `mapPartitions`, no shuffle, output cardinality data-dependent.
   */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    require(everyK > 0, "everyK must be positive")
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.flatMap { r =>
        val t = mp4Table(r.media)
        var ticks = 0L
        var run = 0; var inRun = 0
        // zero-count stts runs are degenerate but within spec: skip
        // them up front and after every advance — an equality check
        // would park the cursor on one forever and accrue its delta
        // into every remaining timestamp
        while (run + 1 < t.runCounts.length && t.runCounts(run) == 0) run += 1
        (0 until t.nSamples).iterator.map { i =>
          val out = FrameSample(r.doc_id, i,
            if (t.timescale > 0) ticks * 1000L / t.timescale else 0L,
            t.sizeOf(i))
          // advance the stts cursor one sample (runs are (count, delta))
          ticks += t.runDeltas(run)
          inRun += 1
          while (run + 1 < t.runCounts.length && inRun >= t.runCounts(run)) {
            run += 1; inRun = 0
          }
          out
        }.filter(_.frame_idx % everyK == 0)
      }
    }
  }

  /**
   * Caption–image alignment scoring — the CLIP-filter shape of a
   * multimodal pair-curation pipeline: per caption, score a bounded
   * candidate set of image embeddings and keep the best match. The
   * TEXT ENCODER IS A DECLARED STUB (this container ships no models):
   * a deterministic md5-basis bag-of-tokens vector over the caption's
   * first `nTokens` tokens — swap [[captionVector]] for a real encoder
   * without touching the dataflow. Everything around it is the real
   * thing: integer quantization, exact int64 alignment dots, bounded
   * per-caption candidate sets (never caption × corpus), one top-1
   * window. Fully oracle-replayable (md5 device + integer dots).
   */
  def captionVector(text: org.apache.spark.sql.Column, nTokens: Int = 8,
      dim: Int = 64): org.apache.spark.sql.Column = {
    val toks = slice(split(trim(lower(text)), "\\s+"), 1, nTokens)
    val dims = (0 until dim).map { j =>
      aggregate(toks, lit(0L), (acc, t) =>
        acc + (conv(substring(md5(concat(t, lit(s":$j")).cast("binary")), 1, 8),
          16, 10).cast("long") % 2001 - 1000))
    }
    array(dims: _*)
  }

  /** Score each caption against its `k` candidate images
    * (`vec_id = (doc_id + i·7) mod corpusSize`, i < k — the bounded
    * candidate-set shape an ANN stage would feed at scale) and keep the
    * best: exact int64 dot of the stub caption vector with the
    * micro-unit-quantized image embedding, ties to the smaller vec_id. */
  def captionAlign(captions: DataFrame, embeddings: DataFrame,
      k: Int = 4, scale: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpusSize = embeddings.count()
    val cap = captions.select(col("doc_id"), captionVector(col("text")).as("_cv"))
    val cand = cap.select(col("doc_id"), col("_cv"),
        explode(sequence(lit(0), lit(k - 1))).as("_i"))
      .withColumn("vec_id", (col("doc_id") + col("_i") * 7) % corpusSize)
    val qe = embeddings.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * scale + lit(0.5)).cast("long")).as("_qe"))
    val scored = cand.join(qe, Seq("vec_id"))
      .select(col("doc_id"), col("vec_id"),
        aggregate(zip_with(col("_cv"), col("_qe"), _ * _), lit(0L), _ + _)
          .as("iscore"))
    val w = Window.partitionBy("doc_id").orderBy(col("iscore").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select("doc_id", "vec_id", "iscore")
  }

  /** Parsed container-header metadata — REAL parsing (the part of a
    * media pipeline that needs no codec): format, pixel dimensions,
    * and sample precision straight from the byte layout. */
  final case class MediaHeader(doc_id: Long, format: String,
      width: Int, height: Int, bit_depth: Int, byte_len: Int)

  object HeaderParser {
    /**
     * Parse image container headers from raw bytes — NOT a stub: this
     * is the actual byte layout of each format, the metadata pass a
     * 100 TB media pipeline runs before any pixel decode.
     *  - PNG: 8-byte signature, then the IHDR chunk — width/height are
     *    big-endian u32 at offsets 16/20, bit depth the byte at 24.
     *  - GIF (87a/89a): logical screen descriptor — width/height are
     *    LITTLE-endian u16 at offsets 6/8.
     *  - JPEG: SOI then a marker walk (each segment FF xx + big-endian
     *    length that counts itself) until a start-of-frame marker
     *    (C0/C1/C2); SOF payload is precision u8, height u16, width
     *    u16. Skipping APPn/quant segments is what makes it a walk.
     */
    def parse(b: Array[Byte]): (String, Int, Int, Int) = {
      val len = b.length
      def u8(i: Int) = b(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      if (len >= 33 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
          u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
          u8(7) == 0x0a)
        ("png", be32(16), be32(20), u8(24))
      else if (len >= 13 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
          u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
        ("gif", le16(6), le16(8), 8)
      else if (len >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        var i = 2
        while (i + 9 < len) {
          if (u8(i) != 0xff) return ("jpeg_corrupt", 0, 0, 0)
          val marker = u8(i + 1)
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
            return ("jpeg", be16(i + 7), be16(i + 5), u8(i + 4))
          // Standalone markers carry NO length field: TEM (0x01),
          // RST0-7 (0xD0-0xD7), EOI (0xD9) — and 0xFF fill bytes before
          // a marker are legal padding. Reading a 2-byte length there
          // would misparse adjacent bytes as a segment size.
          if (marker == 0xff) i += 1
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
          else if (marker == 0xd9) return ("jpeg_nosof", 0, 0, 0) // EOI before SOF
          else i += 2 + be16(i + 2)
        }
        ("jpeg_nosof", 0, 0, 0)
      } else ("unknown", 0, 0, 0)
    }
  }

  /**
   * Real header-metadata extraction over binary media columns: the
   * same `mapPartitions` batch shape as [[extractMediaMeta]], but the
   * parse is the genuine article — synthesized or ingested PNG/GIF/
   * JPEG payloads yield their true planted dimensions. Narrow, no
   * shuffle, no UDF registry; scales as a projection.
   */
  def parseHeaders(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaHeader] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (fmt, w, h, d) = HeaderParser.parse(r.media)
        MediaHeader(r.doc_id, fmt, w, h, d, r.media.length)
      }
    }
  }

  /** Synthesize a VALID container header per doc id (format rotates
    * png/gif/jpeg by id%3; dims and padding are id-derived formulas an
    * oracle recomputes arithmetically). The JPEG leg includes an APP0
    * segment before the SOF so the parser's marker walk is exercised. */
  def synthesizeMedia(ids: Dataset[java.lang.Long])(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val w = 16 + (id % 1000).toInt
      val h = 9 + (id % 700).toInt
      val pad = (id % 50).toInt
      val depth = (8 * (1 + id % 2)).toInt
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xff)
      def be16(v: Int): Unit = { u8(v >> 8); u8(v) }
      def be32(v: Int): Unit = { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
      def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
      val fmt = id % 3 match {
        case 0 => // PNG: signature + IHDR (len, type, 13-byte payload, crc)
          Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).foreach(c => u8(c.toInt))
          be32(13); out.write("IHDR".getBytes)
          be32(w); be32(h); u8(depth); u8(2); u8(0); u8(0); u8(0)
          be32(0) // crc not validated by the header pass
          "image/png"
        case 1 => // GIF89a: signature + logical screen descriptor
          out.write("GIF89a".getBytes)
          le16(w); le16(h); u8(0); u8(0); u8(0)
          "image/gif"
        case _ => // JPEG: SOI, APP0 (skipped by the walk), SOF0
          u8(0xff); u8(0xd8)
          u8(0xff); u8(0xe0); be16(16); out.write("JFIF".getBytes)
          (0 until 10).foreach(_ => u8(0)) // len 16 = 2 len bytes + 14 payload
          u8(0xff); u8(0xc0); be16(11); u8(8); be16(h); be16(w); u8(1)
          u8(1); u8(0x11); u8(0)
          "image/jpeg"
      }
      (0 until pad).foreach(_ => u8(0))
      MediaRecord(id, fmt, out.toByteArray)
    }
  }

  final case class AvHeader(doc_id: Long, format: String, brand: String,
      channels: Int, sample_rate: Int, bits: Int, duration_ms: Long,
      byte_len: Int)

  object AvHeaderParser {
    /**
     * Parse audio/video container headers from raw bytes — the same
     * metadata-before-decode pass as [[HeaderParser]], over the two
     * dominant AV containers:
     *  - WAV (RIFF): "RIFF" + le32 riff size + "WAVE", then a chunk
     *    walk ([4cc id][le32 size][payload], sizes pad to even). The
     *    "fmt " chunk carries audio_format(le16, 1 = PCM),
     *    channels(le16), sample_rate(le32), byte_rate(le32),
     *    block_align(le16), bits(le16); the "data" chunk's size with
     *    byte_rate gives the duration. Skipping LIST/fact chunks is
     *    what makes it a walk.
     *  - MP4 (ISO BMFF): a box walk ([be32 size][4cc type]); "ftyp"
     *    yields the major brand, "moov" is walked recursively to
     *    "mvhd" whose version-0 payload is ver(1) flags(3)
     *    creation(4) modification(4) timescale(be32) duration(be32) —
     *    duration/timescale gives the presentation length.
     */
    def parse(b: Array[Byte]): (String, String, Int, Int, Int, Long) = {
      val len = b.length
      def u8(i: Int) = b(i) & 0xff
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def cc(i: Int) = new String(b, i, 4, "US-ASCII")
      if (len >= 44 && cc(0) == "RIFF" && cc(8) == "WAVE") {
        var i = 12
        var fmt: Option[(Int, Int, Int, Int, Int)] = None // af, ch, sr, br, bits
        var dataSize = -1L
        while (i + 8 <= len && (fmt.isEmpty || dataSize < 0)) {
          val id = cc(i); val size = le32(i + 4).toLong & 0xffffffffL
          if (id == "fmt " && i + 8 + 16 <= len)
            fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12),
              le32(i + 16), le16(i + 22)))
          if (id == "data") dataSize = size
          // chunk payloads pad to even length (RIFF alignment rule).
          // Advance in LONG arithmetic and cap at len: a malformed
          // size near 0xFFFFFFFF would otherwise truncate to a zero
          // or negative int advance and hang the walk (one corrupt
          // record must degrade to wav_nofmt, never spin a task).
          i = math.min(i.toLong + 8L + size + (size & 1L), len.toLong).toInt
        }
        fmt match {
          case None => ("wav_nofmt", "", 0, 0, 0, 0L)
          case Some((af, ch, sr, br, bits)) =>
            val dur = if (dataSize < 0 || br <= 0) 0L else dataSize * 1000L / br
            ("wav", if (af == 1) "pcm" else s"fmt$af", ch, sr, bits, dur)
        }
      } else if (len >= 16 && cc(4) == "ftyp") {
        val brand = cc(8)
        var i = 0
        while (i + 8 <= len) {
          val size = be32(i); val typ = cc(i + 4)
          if (typ == "moov") {
            // nested walk inside moov for the mvhd full box
            var j = i + 8
            val end = math.min(i + size, len)
            while (j + 8 <= end) {
              val bsize = be32(j)
              if (cc(j + 4) == "mvhd") {
                // the version byte + timescale + duration live at
                // j+8..j+27 — a truncated buffer must classify, not
                // index past the array
                if (j + 28 > len) return ("mp4_truncated", brand, 0, 0, 0, 0L)
                if (u8(j + 8) != 0) return ("mp4_mvhd_v1", brand, 0, 0, 0, 0L)
                val timescale = be32(j + 20)
                val duration = be32(j + 24).toLong & 0xffffffffL
                return ("mp4", brand, 0, 0, 0,
                  if (timescale <= 0) 0L else duration * 1000L / timescale)
              }
              j += math.max(bsize, 8)
            }
            return ("mp4_nomvhd", brand, 0, 0, 0, 0L)
          }
          i += math.max(size, 8)
        }
        ("mp4_nomoov", brand, 0, 0, 0, 0L)
      } else ("unknown", "", 0, 0, 0, 0L)
    }
  }

  /** Real AV header-metadata extraction — the audio/video twin of
    * [[parseHeaders]]: same mapPartitions shape, genuine RIFF chunk and
    * ISO-BMFF box walks, no UDF registry, scales as a projection. */
  def parseAvHeaders(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AvHeader] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (fmt, brand, ch, sr, bits, dur) = AvHeaderParser.parse(r.media)
        AvHeader(r.doc_id, fmt, brand, ch, sr, bits, dur, r.media.length)
      }
    }
  }

  /** Synthesize a VALID audio/video container header per doc id (WAV
    * for even ids, MP4 for odd; all fields are `k = id/2`-derived
    * formulas an oracle recomputes arithmetically). The WAV carries
    * only the header of its data chunk (the metadata pass never reads
    * samples); the MP4 includes a full 108-byte zero-padded mvhd and a
    * trailing `free` box so both walks skip real filler. */
  def synthesizeAvMedia(ids: Dataset[java.lang.Long])(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.map { boxed =>
      val id = boxed.longValue()
      val k = id / 2
      val pad = (k % 7).toInt
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Int): Unit = out.write(v & 0xff)
      def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
      def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
      def be32(v: Int): Unit = { u8(v >> 24); u8(v >> 16); u8(v >> 8); u8(v) }
      val mime = if (id % 2 == 0) {
        val channels = 1 + (k % 2).toInt
        val sampleRate = 8000 * (1 + (k % 3).toInt)
        val bits = 16
        val nSamples = 1000 + (k % 4000).toInt
        val dataSize = nSamples * channels * (bits / 8)
        val byteRate = sampleRate * channels * (bits / 8)
        out.write("RIFF".getBytes); le32(36 + dataSize)
        out.write("WAVE".getBytes)
        out.write("fmt ".getBytes); le32(16)
        le16(1); le16(channels); le32(sampleRate); le32(byteRate)
        le16(channels * (bits / 8)); le16(bits)
        out.write("data".getBytes); le32(dataSize) // samples not planted
        "audio/wav"
      } else {
        val timescale = 600 * (1 + (k % 4).toInt)
        val duration = 3000 + (k % 9000).toInt
        be32(16); out.write("ftyp".getBytes)
        out.write("isom".getBytes); be32(0)
        be32(116); out.write("moov".getBytes)
        be32(108); out.write("mvhd".getBytes)
        u8(0); u8(0); u8(0); u8(0)       // version 0 + flags
        be32(0); be32(0)                  // creation/modification
        be32(timescale); be32(duration)
        (0 until 80).foreach(_ => u8(0))  // rate/volume/matrix/... zeros
        be32(8 + pad); out.write("free".getBytes)
        "video/mp4"
      }
      (0 until pad).foreach(_ => u8(0))
      MediaRecord(id, mime, out.toByteArray)
    }
  }

  // ------------------------------------------- MP4 sample tables
  // The video-metadata decode a pipeline runs before any codec: the
  // ISO-BMFF sample tables (stts time-to-sample runs, stsz sizes) inside
  // moov→trak→mdia→minf→stbl, plus the mdhd timescale. Real nested box
  // walk — no codec required, every field byte-addressed per the
  // public ISO/IEC 14496-12 layout.

  /** Closed-form sample laws for the synthetic MP4 corpus (all
    * oracle-replayable): `n = 32 + cls` samples, stts = two runs
    * (16 × (512+cls), (16+cls) × (1024+cls)), stsz entry
    * `i → 100 + (cls·7 + 13i) mod 200`, mdhd timescale `1000 + 10·cls`. */
  def mp4SampleCount(cls: Long): Int = 32 + cls.toInt
  def mp4SampleSize(cls: Long, i: Int): Int =
    100 + ((cls * 7 + 13L * i) % 200).toInt

  /** One structurally genuine MP4 carrying the closed-form sample
    * tables for class `cls`: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd,
    * hdlr, minf(stbl(stsd, stts, stsc, stsz, stco))))) + an (empty)
    * mdat. */
  def mp4SampleBytes(cls: Long): Array[Byte] = {
    val n = mp4SampleCount(cls)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val sz = 8 + payload.length
      out.write(sz >> 24); out.write((sz >> 16) & 0xff)
      out.write((sz >> 8) & 0xff); out.write(sz & 0xff)
      out.write(typ.getBytes("US-ASCII"), 0, 4)
      out.write(payload, 0, payload.length)
      out.toByteArray
    }
    def be32s(vs: Int*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      vs.foreach { v =>
        out.write(v >> 24); out.write((v >> 16) & 0xff)
        out.write((v >> 8) & 0xff); out.write(v & 0xff)
      }
      out.toByteArray
    }
    val d1 = 512 + cls.toInt; val d2 = 1024 + cls.toInt
    val duration = 16 * d1 + (n - 16) * d2
    val timescale = 1000 + 10 * cls.toInt
    val stts = box("stts", be32s(0, 2, 16, d1, n - 16, d2))
    val sizes = (0 until n).map(i => mp4SampleSize(cls, i))
    val stsz = box("stsz", be32s(Seq(0, 0, n) ++ sizes: _*))
    val stsd = box("stsd", be32s(0, 0))
    val stsc = box("stsc", be32s(0, 0))
    val stco = box("stco", be32s(0, 0))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdhd = box("mdhd", be32s(0, 0, 0, timescale, duration) ++
      Array[Byte](0x55, 0xc4.toByte, 0, 0)) // language 'und' + predefined
    val hdlr = box("hdlr", be32s(0, 0) ++ "vide".getBytes("US-ASCII") ++
      new Array[Byte](13)) // reserved ×3 + empty name
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val tkhd = box("tkhd", be32s(0, 0, 0, 1) ++ new Array[Byte](76))
    val trak = box("trak", tkhd ++ mdia)
    val mvhd = box("mvhd", be32s(0, 0, 0, timescale, duration) ++
      new Array[Byte](80))
    val moov = box("moov", mvhd ++ trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32s(0))
    val mdat = box("mdat", Array.emptyByteArray)
    ftyp ++ moov ++ mdat
  }

  /** Structurally genuine MP4s over [[mp4SampleBytes]], one per input
    * id, class = id % `classes`. */
  def synthesizeMp4Samples(ids: Dataset[java.lang.Long], classes: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      it.map { id =>
        MediaRecord(id.longValue, "video/mp4",
          mp4SampleBytes(id.longValue % classes))
      }
    }
  }

  /** Parsed sample-table summary: oracle-checkable per-file stats. */
  final case class Mp4Samples(doc_id: Long, timescale: Int, n_samples: Int,
      total_duration: Long, total_bytes: Long, max_size: Int)

  /** Decoded ISO-BMFF sample tables: mdhd timescale, the stts runs
    * (parallel count/delta arrays), and stsz sizes (fixed-size or
    * per-sample). The shared decode behind [[parseMp4Samples]],
    * [[sampleFrames]], and [[extractMediaMeta]]'s video leg. */
  final case class Mp4Table(timescale: Int, runCounts: Array[Int],
      runDeltas: Array[Int], fixedSize: Int, stszCount: Int,
      sizes: Array[Int]) {
    def nSamples: Int = {
      var n = 0; var i = 0
      while (i < runCounts.length) { n += runCounts(i); i += 1 }
      n
    }
    def totalTicks: Long = {
      var d = 0L; var i = 0
      while (i < runCounts.length) { d += runCounts(i).toLong * runDeltas(i); i += 1 }
      d
    }
    /** Byte total per stsz's OWN sample count (which may legally
      * disagree with the stts total); -1 when the table is absent —
      * the explicit missing-table sentinel, never a silent 0. */
    def totalBytes: Long =
      if (stszCount < 0) -1L
      else if (fixedSize != 0) fixedSize.toLong * stszCount
      else { var s = 0L; var i = 0; while (i < sizes.length) { s += sizes(i); i += 1 }; s }
    def maxSize: Int =
      if (stszCount < 0) -1
      else if (fixedSize != 0) fixedSize
      else {
        var m = 0; var i = 0
        while (i < sizes.length) { if (sizes(i) > m) m = sizes(i); i += 1 }
        m
      }
    def sizeOf(i: Int): Int = if (fixedSize != 0) fixedSize else sizes(i)
  }

  /** Walk the box tree (moov→trak→mdia→minf→stbl) and decode the
    * sample tables: timescale from mdhd, time-to-sample runs from stts,
    * sizes from stsz. Throws on malformed box sizes or table counts
    * that exceed their enclosing box — no silent misparse. */
  def mp4Table(b: Array[Byte]): Mp4Table = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    var timescale = -1
    var runCounts: Array[Int] = null; var runDeltas: Array[Int] = null
    var fixedSize = 0; var stszCount = -1; var sizes: Array[Int] = null
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val sz = be32(pos); val typ = cc(pos + 4)
        require(sz >= 8 && pos + sz <= to, s"bad box $typ size $sz")
        typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            walk(pos + 8, pos + sz)
          case "mdhd" =>
            require(u8(pos + 8) == 0, "mdhd v1 unsupported")
            timescale = be32(pos + 20)
          case "stts" =>
            val entries = be32(pos + 12)
            // entry count must fit the enclosing box: a corrupt count
            // that stays within the file would otherwise read bytes of
            // subsequent boxes as deltas — silent misparse
            require(entries >= 0 && 16L + 8L * entries <= sz,
              s"stts entry count $entries exceeds box size $sz")
            runCounts = new Array[Int](entries)
            runDeltas = new Array[Int](entries)
            var e = 0
            while (e < entries) {
              runCounts(e) = be32(pos + 16 + 8 * e)
              runDeltas(e) = be32(pos + 20 + 8 * e)
              e += 1
            }
          case "stsz" =>
            fixedSize = be32(pos + 12)
            stszCount = be32(pos + 16)
            if (fixedSize == 0) {
              // same bound for the variable-size table (20-byte header
              // + 4 bytes per entry must fit the box)
              require(stszCount >= 0 && 20L + 4L * stszCount <= sz,
                s"stsz entry count $stszCount exceeds box size $sz")
              sizes = new Array[Int](stszCount)
              var i = 0
              while (i < stszCount) { sizes(i) = be32(pos + 20 + 4 * i); i += 1 }
            } else sizes = Array.emptyIntArray
          case _ => ()
        }
        pos += sz
      }
    }
    walk(0, b.length)
    require(timescale > 0 && runCounts != null, "missing mdhd/stts")
    if (sizes == null) sizes = Array.emptyIntArray
    Mp4Table(timescale, runCounts, runDeltas, fixedSize, stszCount, sizes)
  }

  /** Walk the box tree and reduce the sample tables to per-file stats
    * — full [[mp4Table]] decode per row, narrow, no shuffle. */
  def parseMp4Samples(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[Mp4Samples] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val t = mp4Table(r.media)
        Mp4Samples(r.doc_id, t.timescale, t.nSamples, t.totalTicks,
          t.totalBytes, t.maxSize)
      }
    }
  }

  // ------------------------------------------- animated GIF metadata
  // The third animation-metadata pass (after MP4 sample tables): frame
  // count, per-frame GCE delays, and the NETSCAPE loop count from a
  // REAL GIF89a block walk — extensions and image data are skipped by
  // their sub-block length prefixes per the public GIF89a spec, no LZW
  // decode needed for the metadata a curation gate reads.

  /** Parsed animation summary: oracle-checkable per file. */
  final case class GifAnim(doc_id: Long, width: Int, height: Int,
      n_frames: Int, total_delay_cs: Long, loop_count: Int)

  /** Walk a GIF89a: logical screen descriptor (+ global color table
    * skip), then blocks — 0x21 extensions (0xF9 graphic control:
    * centisecond delay; 0xFF application: NETSCAPE2.0 loop count),
    * 0x2C image descriptors (+ local color table + LZW sub-block
    * skip), 0x3B trailer. Throws on truncation — no silent misparse. */
  def parseGifAnim(b: Array[Byte]): (Int, Int, Int, Long, Int) = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    require(b.length >= 14 && new String(b, 0, 6, "US-ASCII") == "GIF89a",
      "not a GIF89a")
    val width = le16(6); val height = le16(8)
    val packed = u8(10)
    var pos = 13 + (if ((packed & 0x80) != 0) 3 << ((packed & 7) + 1) else 0)
    var frames = 0; var delay = 0L; var loop = 0
    def skipSubBlocks(): Unit = {
      while ({ require(pos < b.length, "truncated sub-blocks"); u8(pos) != 0 }) {
        pos += 1 + u8(pos)
      }
      pos += 1 // block terminator
    }
    var done = false
    while (!done) {
      require(pos < b.length, "missing trailer")
      u8(pos) match {
        case 0x3b => done = true
        case 0x21 =>
          val label = u8(pos + 1)
          pos += 2
          if (label == 0xf9 && u8(pos) >= 4) delay += le16(pos + 2)
          if (label == 0xff && u8(pos) == 11 &&
              new String(b, pos + 1, 11, "US-ASCII") == "NETSCAPE2.0") {
            // next sub-block: [3] 0x01 loop_le16
            val p2 = pos + 12
            if (u8(p2) == 3 && u8(p2 + 1) == 1) loop = le16(p2 + 2)
          }
          skipSubBlocks()
        case 0x2c =>
          frames += 1
          val lpacked = u8(pos + 9)
          pos += 10 + (if ((lpacked & 0x80) != 0) 3 << ((lpacked & 7) + 1) else 0)
          pos += 1 // LZW minimum code size
          skipSubBlocks()
        case other => sys.error(s"bad GIF block 0x${other.toHexString} at $pos")
      }
    }
    (width, height, frames, delay, loop)
  }

  /** Structurally genuine animated GIF89a for class laws: planted dims,
    * `2 + id mod 9` frames each behind a GCE with delay
    * `10 + (cls·3 + 7i) mod 50` cs, NETSCAPE loop `id mod 4`, dummy
    * 1-byte LZW payloads (the metadata pass never decodes pixels). */
  def gifAnimBytes(id: Long, classes: Int = 64): Array[Byte] = {
    val cls = id % classes
    val w = 16 + (id % 100).toInt; val h = 9 + (id % 80).toInt
    val nf = 2 + (id % 9).toInt
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h); u8(0); u8(0); u8(0) // no global color table
    u8(0x21); u8(0xff); u8(11); out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    u8(3); u8(1); le16((id % 4).toInt); u8(0)
    var i = 0
    while (i < nf) {
      u8(0x21); u8(0xf9); u8(4); u8(0)
      le16(10 + ((cls * 3 + 7L * i) % 50).toInt); u8(0); u8(0)
      u8(0x2c); le16(0); le16(0); le16(w); le16(h); u8(0) // no LCT
      u8(2) // LZW min code size
      u8(1); u8(0) // one dummy data sub-block
      u8(0) // block terminator
      i += 1
    }
    u8(0x3b)
    out.toByteArray
  }

  /** Synthesize + parse helpers for the entry: one animated GIF per
    * id, parsed back through the mapPartitions batch path. */
  def synthGifAnim(ids: Dataset[java.lang.Long])(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions(it => it.map(id =>
      MediaRecord(id.longValue, "image/gif", gifAnimBytes(id.longValue))))
  }

  def parseGifAnims(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[GifAnim] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, f, d, l) = parseGifAnim(r.media)
        GifAnim(r.doc_id, w, h, f, d, l)
      }
    }
  }

  /** Mixed-modality corpus: modality rotates by `doc_id % 3` — a real
    * PNG over [[PngCodec.classPixel]], a real WAV over
    * [[AudioCodec.classSample]], or a real MP4 over the closed-form
    * sample tables ([[mp4SampleCount]]/[[mp4SampleSize]]) — so one
    * entry exercises [[extractMediaMeta]]'s full dispatch. */
  def synthesizeMixedMedia(ids: Dataset[java.lang.Long], classes: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      it.map { boxed =>
        val id = boxed.longValue()
        val cls = id % classes
        id % 3 match {
          case 0 => MediaRecord(id, "image/png",
            PngCodec.encodeGray(PngCodec.SynthW, PngCodec.SynthH,
              (x, y) => PngCodec.classPixel(cls, x, y)))
          case 1 => MediaRecord(id, "audio/wav",
            AudioCodec.encodeWav(Array.tabulate(AudioCodec.NSamples)(i =>
              AudioCodec.classSample(cls, i))))
          case _ => MediaRecord(id, "video/mp4", mp4SampleBytes(cls))
        }
      }
    }
  }
}
