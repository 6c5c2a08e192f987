package graft.analytics

import graft.Pins._
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

  /** Decode a mono 16-bit PCM WAV in ONE chunk walk, returning the
    * fmt chunk's sample rate alongside the samples (callers needing
    * durations would otherwise pay a second complete RIFF walk).
    * Throws on non-WAV or unsupported layouts. */
  def decodeWavWithRate(b: Array[Byte]): (Int, Array[Int]) = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = le16(i) | (le16(i + 2) << 16)
    def cc(i: Int) = new String(b, i, 4, "US-ASCII")
    require(b.length > 44 && cc(0) == "RIFF" && cc(8) == "WAVE", "not a WAV")
    var pos = 12
    var fmtOk = false
    var rate = 0
    var samples: Array[Int] = null
    while (pos + 8 <= b.length && (samples == null || !fmtOk)) {
      val typ = cc(pos); val len = le32(pos + 4)
      require(len >= 0 && pos + 8 + len <= b.length, s"truncated chunk $typ")
      typ match {
        case "fmt " =>
          require(le16(pos + 8) == 1, "non-PCM WAV unsupported")
          require(le16(pos + 10) == 1, "non-mono WAV unsupported")
          require(le16(pos + 22) == 16, "non-16-bit WAV unsupported")
          rate = le32(pos + 12)
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
    (rate, samples)
  }

  /** [[decodeWavWithRate]] without the rate. */
  def decodeWav(b: Array[Byte]): Array[Int] = decodeWavWithRate(b)._2

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

  /** 64 block energies (sum of squares over len/64-sample blocks) —
    * the shared frame reduction behind the fingerprint and the
    * spectral pass. Division-free exact int64. */
  private def blockEnergies(s: Array[Int]): Array[Long] = {
    val nBlocks = 64
    val bl = s.length / nBlocks
    require(bl > 0, s"clip too short for $nBlocks blocks: ${s.length}")
    Array.tabulate(nBlocks) { b =>
      var e = 0L; var i = 0
      while (i < bl) { val v = s(b * bl + i); e += v.toLong * v; i += 1 }
      e
    }
  }

  /** The 64 cyclic energy-difference bits packed into four 16-bit
    * bands — ONE definition shared by the standalone fingerprint and
    * the funnel (the dedup joins assume identical bands). */
  private def bandsOf(energy: Array[Long]): Array[Int] = {
    val bands = new Array[Int](4)
    var i = 0
    while (i < 64) {
      if (energy((i + 1) % 64) > energy(i)) bands(i / 16) |= 1 << (i % 16)
      i += 1
    }
    bands
  }

  /** One DCT-II coefficient of the energy envelope over the planted
    * fixed-point basis — shared by [[spectral]] and the funnel's
    * static-envelope gate. */
  private def dctCoeff(e: Array[Long], k: Int): Long = {
    var acc = 0L; var b = 0
    while (b < 64) { acc += e(b) * CosTab(((2 * b + 1) * k) % 256); b += 1 }
    acc
  }

  /**
   * Energy-profile fingerprint over the decoded samples: 64 blocks of
   * len/64 samples, bit i = energy(block i+1 mod 64) vs energy(block i)
   * on the 64 cyclic pairs — division-free exact int64 sums of squares,
   * one bit per pair. Bit `i` lands in band `i div 16` at `i mod 16` —
   * the same banding the image dHash uses, so the same bucket-join
   * dedup machinery applies unchanged.
   */
  def audioHash(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioHashBands] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bands = bandsOf(blockEnergies(decodeWav(r.media)))
        AudioHashBands(r.doc_id, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** 256-entry fixed-point cosine table, `CosTab(m) = round(4096 ·
    * cos(π·m/128))` — planted as integer LITERALS (never recomputed at
    * runtime), so the Spark kernel and the SQL oracle share the exact
    * basis with no cross-engine libm dependence. One full period: the
    * DCT-II angle index `(2b+1)·k` reduces mod 256. */
  val CosTab: Array[Int] = Array(
    4096, 4095, 4091, 4085, 4076, 4065, 4052, 4036, 4017, 3996, 3973, 3948,
    3920, 3889, 3857, 3822, 3784, 3745, 3703, 3659, 3612, 3564, 3513, 3461,
    3406, 3349, 3290, 3229, 3166, 3102, 3035, 2967, 2896, 2824, 2751, 2675,
    2598, 2520, 2440, 2359, 2276, 2191, 2106, 2019, 1931, 1842, 1751, 1660,
    1567, 1474, 1380, 1285, 1189, 1092, 995, 897, 799, 700, 601, 501, 401,
    301, 201, 101, 0, -101, -201, -301, -401, -501, -601, -700, -799, -897,
    -995, -1092, -1189, -1285, -1380, -1474, -1567, -1660, -1751, -1842,
    -1931, -2019, -2106, -2191, -2276, -2359, -2440, -2520, -2598, -2675,
    -2751, -2824, -2896, -2967, -3035, -3102, -3166, -3229, -3290, -3349,
    -3406, -3461, -3513, -3564, -3612, -3659, -3703, -3745, -3784, -3822,
    -3857, -3889, -3920, -3948, -3973, -3996, -4017, -4036, -4052, -4065,
    -4076, -4085, -4091, -4095, -4096, -4095, -4091, -4085, -4076, -4065,
    -4052, -4036, -4017, -3996, -3973, -3948, -3920, -3889, -3857, -3822,
    -3784, -3745, -3703, -3659, -3612, -3564, -3513, -3461, -3406, -3349,
    -3290, -3229, -3166, -3102, -3035, -2967, -2896, -2824, -2751, -2675,
    -2598, -2520, -2440, -2359, -2276, -2191, -2106, -2019, -1931, -1842,
    -1751, -1660, -1567, -1474, -1380, -1285, -1189, -1092, -995, -897,
    -799, -700, -601, -501, -401, -301, -201, -101, 0, 101, 201, 301, 401,
    501, 601, 700, 799, 897, 995, 1092, 1189, 1285, 1380, 1474, 1567, 1660,
    1751, 1842, 1931, 2019, 2106, 2191, 2276, 2359, 2440, 2520, 2598, 2675,
    2751, 2824, 2896, 2967, 3035, 3102, 3166, 3229, 3290, 3349, 3406, 3461,
    3513, 3564, 3612, 3659, 3703, 3745, 3784, 3822, 3857, 3889, 3920, 3948,
    3973, 3996, 4017, 4036, 4052, 4065, 4076, 4085, 4091, 4095)

  /** Spectral summary per clip: the first DCT-II coefficients over the
    * 64-block energy envelope plus low/high band magnitudes — the
    * silence / bandwidth / music-vs-speech gates of an audio curation
    * pass, all exact int64. */
  final case class AudioSpectral(doc_id: Long, s0: Long, s1: Long,
      s2: Long, s3: Long, low_band: Long, high_band: Long)

  /**
   * Fixed-point DCT-II over the block-energy envelope: `S_k = Σ_b
   * e_b · CosTab((2b+1)·k mod 256)` for k < 64 — an integer spectral
   * pass over the same frames the fingerprint uses. Magnitudes stay in
   * int64 (e_b ≤ 32·2000², ×4096, ×64 ≈ 3.4e13). Output: S_0..S_3 and
   * the summed |S_k| of the low (1..15) and high (48..63) bands.
   * Narrow mapPartitions — decode + DCT per row, no shuffle.
   */
  def spectral(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioSpectral] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val e = blockEnergies(decodeWav(r.media))
        val s = Array.tabulate(64)(k => dctCoeff(e, k))
        var low = 0L; var high = 0L
        var i = 1
        while (i < 64) {
          if (i <= 15) low += math.abs(s(i))
          if (i >= 48) high += math.abs(s(i))
          i += 1
        }
        AudioSpectral(r.doc_id, s(0), s(1), s(2), s(3), low, high)
      }
    }
  }

  // ------------------------------------------------- audio funnel

  /** Planted low-quality laws for the funnel corpus — each one fails
    * exactly one REAL gate (margins verified: silent peaks at 100 vs
    * the 500 floor; clipped saturates at 32768 vs the 32000 ceiling;
    * static's envelope DCT low band is exactly 0 vs the std law's
    * ≥ 8× the gate line). */
  def silentSample(cls: Long, i: Int): Int = ((cls + i) % 200).toInt - 100
  def clippedSample(cls: Long, i: Int): Int =
    math.max(-32768, math.min(32767, classSample(cls, i) * 20))
  def staticSample(cls: Long): Int = (cls % 97).toInt + 500

  /** Funnel corpus: ids with `id % 17 == 0` get the silent law, then
    * `id % 13 == 0` the clipped law, then `id % 11 == 0` the static
    * (constant-envelope hum) law; everyone else the standard class law
    * (planted duplicates via shared classes). All real WAVs. */
  def synthAudioFunnelMedia(ids: Dataset[java.lang.Long], classes: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      it.map { id =>
        val cls = id.longValue % classes
        val f: Int => Int =
          if (id.longValue % 17 == 0) i => silentSample(cls, i)
          else if (id.longValue % 13 == 0) i => clippedSample(cls, i)
          else if (id.longValue % 11 == 0) _ => staticSample(cls)
          else i => classSample(cls, i)
        MediaRecord(id.longValue, "audio/wav", encodeWav(Array.tabulate(NSamples)(f)))
      }
    }
  }

  /** One graded row per clip: the gate verdict (`silent` / `clipped` /
    * `static` / `ok`) plus, for keepers, the energy-difference
    * fingerprint bands — ONE decode per clip. */
  final case class GradedAudio(doc_id: Long, gate: String,
      b0: Int, b1: Int, b2: Int, b3: Int)

  /** Time-domain + spectral gates then fingerprint, from one decode:
    * peak floor (silence), peak ceiling (clipping), then the
    * fixed-point envelope DCT's low-band magnitude against the DC
    * coefficient (`low·100 < S_0` = static hum — no envelope
    * modulation). Integer comparisons only; clips failing a gate carry
    * zero bands and never reach the hash joins. */
  def gateAndHashAudio(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[GradedAudio] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val s = decodeWav(r.media)
        var peak = 0
        var i = 0
        while (i < s.length) {
          val a = math.abs(s(i)); if (a > peak) peak = a; i += 1
        }
        if (peak < 500) GradedAudio(r.doc_id, "silent", 0, 0, 0, 0)
        else if (peak >= 32000) GradedAudio(r.doc_id, "clipped", 0, 0, 0, 0)
        else {
          val e = blockEnergies(s)
          val s0 = dctCoeff(e, 0)
          var low = 0L
          var k = 1
          while (k < 16) { low += math.abs(dctCoeff(e, k)); k += 1 }
          if (low * 100 < s0) GradedAudio(r.doc_id, "static", 0, 0, 0, 0)
          else {
            val bands = bandsOf(e)
            GradedAudio(r.doc_id, "ok", bands(0), bands(1), bands(2), bands(3))
          }
        }
      }
    }
  }

  /** The audio-curation funnel — decode → silence/clipping/static gates
    * → fingerprint dedup, one verdict per clip (`silent` / `clipped` /
    * `static` / `dup` with `dup_of` = the smallest band-sharing lower
    * id within Hamming 3 / `kept`) — the audio twin of
    * [[PngCodec.imageFunnel]], sharing its banded dedup machinery. */
  def audioFunnel(media: Dataset[MediaRecord], maxHamming: Int = 3)(
      implicit spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val gh = gateAndHashAudio(media).toDF().pinned()
    val hashes = gh.where(col("gate") === "ok")
      .select("doc_id", "b0", "b1", "b2", "b3")
    val dupOf = PngCodec.phashDedup(hashes, maxHamming)
      .groupBy(col("img_b").as("doc_id"))
      .agg(min(col("img_a")).as("dup_of"))
    gh.select(col("doc_id"), col("gate")).join(dupOf, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("gate") =!= "ok", col("gate"))
          .when(col("dup_of").isNotNull, lit("dup"))
          .otherwise(lit("kept")).as("verdict"),
        when(col("gate") === "ok", col("dup_of")).as("dup_of"))
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
