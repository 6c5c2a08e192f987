package graft.analytics

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.analytics.Multimodal.MediaRecord

/**
 * Real WAV PCM decode + audio feature extraction — the audio analogue
 * of [[PngCodec]]: the multimodal family's header parse
 * ([[Multimodal.AvHeaderParser]]) stops at the fmt chunk; this decodes
 * the sample data and reduces it to the integer features an audio
 * training pipeline filters on (peak, energy, zero crossings, DC
 * offset) before any model sees the clip.
 *
 * Decoder: genuine RIFF chunk walk (fmt validated: PCM, 16-bit, mono),
 * little-endian int16 samples from the data chunk. Encoder synthesizes
 * spec-correct WAVs over a closed-form sample law so the oracle
 * recomputes every feature arithmetically. Both directions are
 * cross-validated against the JDK's independent `javax.sound.sampled`
 * WAV codec in AudioCodecSpec.
 */
object AudioCodec {

  val SampleRate = 8000
  val NSamples = 2048

  /** Closed-form sample law: `s(i) = (cls·131 + i·37) mod 4001 − 2000`
    * — int16-safe, sign-alternating, oracle-replayable. */
  def classSample(cls: Long, i: Int): Int =
    ((cls * 131 + 37L * i) % 4001).toInt - 2000

  /** Encode mono 16-bit PCM as a real RIFF/WAVE file. */
  def encodeWav(samples: Array[Int], sampleRate: Int = SampleRate): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val dataLen = samples.length * 2
    cc("RIFF"); le32(36 + dataLen); cc("WAVE")
    cc("fmt "); le32(16)
    le16(1) // PCM
    le16(1) // mono
    le32(sampleRate)
    le32(sampleRate * 2) // byte rate
    le16(2) // block align
    le16(16) // bits per sample
    cc("data"); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  /** Decode a mono 16-bit PCM WAV: RIFF walk + fmt validation + LE
    * int16 samples. Throws on non-WAV or unsupported layouts. */
  def decodeWav(b: Array[Byte]): Array[Int] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    require(b.length > 44 && cc(0) == "RIFF" && cc(8) == "WAVE", "not a WAV")
    var pos = 12
    var fmtOk = false
    var samples: Array[Int] = null
    while (pos + 8 <= b.length && (samples == null || !fmtOk)) {
      val typ = cc(pos); val len = le32(pos + 4)
      require(len >= 0 && pos + 8 + len <= b.length, s"truncated chunk $typ")
      typ match {
        case "fmt " =>
          require(le16(pos + 8) == 1, "non-PCM WAV unsupported")
          require(le16(pos + 10) == 1, "non-mono WAV unsupported")
          require(le16(pos + 22) == 16, "non-16-bit WAV unsupported")
          fmtOk = true
        case "data" =>
          val n = len / 2
          samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            val v = le16(pos + 8 + 2 * i)
            samples(i) = if (v >= 0x8000) v - 0x10000 else v
            i += 1
          }
        case _ => ()
      }
      pos += 8 + len + (len & 1) // RIFF chunks pad to even
    }
    require(fmtOk && samples != null, "missing fmt/data chunk")
    samples
  }

  /** Real WAVs over the sample law, class = id % `classes`. */
  def synthWavMedia(ids: Dataset[java.lang.Long], classes: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      it.map { id =>
        val cls = id.longValue % classes
        MediaRecord(id.longValue, "audio/wav",
          encodeWav(Array.tabulate(NSamples)(i => classSample(cls, i))))
      }
    }
  }

  /** Integer audio features per clip: every field the oracle can
    * recompute from the sample law without division or floats. */
  final case class AudioFeatures(doc_id: Long, n_samples: Int,
      peak_abs: Int, sum_sq: Long, dc_sum: Long, zero_crossings: Int)

  /** Audio fingerprint band row — the [[PngCodec.DHashBands]] analogue:
    * 64 energy-difference bits over 32-sample blocks, split into four
    * 16-bit bands for hamming-bucketed dedup. */
  final case class AudioHashBands(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /**
   * Energy-profile fingerprint over the decoded samples: 65 blocks of
   * 32 samples (2048/32 + 1 boundary handled by comparing 64 adjacent
   * block pairs over the first 2080… NSamples yields exactly 64 blocks,
   * so bit i = energy(block i+1 mod 64) vs energy(block i) on the 64
   * cyclic pairs — division-free exact int64 sums of squares, one bit
   * per pair). Bit `i` lands in band `i div 16` at `i mod 16` — the
   * same banding the image dHash uses, so the same bucket-join dedup
   * machinery applies unchanged.
   */
  def audioHash(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioHashBands] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val s = decodeWav(r.media)
        val nBlocks = 64
        val bl = s.length / nBlocks
        require(bl > 0, s"clip too short for $nBlocks blocks: ${s.length}")
        val energy = Array.tabulate(nBlocks) { b =>
          var e = 0L; var i = 0
          while (i < bl) { val v = s(b * bl + i); e += v.toLong * v; i += 1 }
          e
        }
        val bands = new Array[Int](4)
        var i = 0
        while (i < 64) {
          if (energy((i + 1) % nBlocks) > energy(i)) bands(i / 16) |= 1 << (i % 16)
          i += 1
        }
        AudioHashBands(r.doc_id, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** Decode every payload and extract features — the filter pass of an
    * audio-corpus pipeline (silence/clipping gates run on these).
    * Narrow mapPartitions, no shuffle. */
  def features(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val s = decodeWav(r.media)
        var peak = 0; var sq = 0L; var dc = 0L; var zc = 0
        var i = 0
        while (i < s.length) {
          val v = s(i)
          val a = math.abs(v)
          if (a > peak) peak = a
          sq += v.toLong * v
          dc += v
          if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
          i += 1
        }
        AudioFeatures(r.doc_id, s.length, peak, sq, dc, zc)
      }
    }
  }
}
