package graft.analytics

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import graft.SparkSpec

/** The WAV codec is cross-validated against the JDK's independent
  * javax.sound.sampled implementation in both directions, so a
  * symmetric encoder/decoder bug pair cannot cancel out. */
class AudioCodecSpec extends SparkSpec {

  private def law(cls: Long)(i: Int): Int = AudioCodec.classSample(cls, i)

  test("roundtrip: encode then decode reproduces every sample") {
    val s = Array.tabulate(500)(law(9))
    val got = AudioCodec.decodeWav(AudioCodec.encodeWav(s))
    assert(got.toSeq === s.toSeq)
  }

  test("JDK AudioSystem reads our encoder's WAVs sample-exactly") {
    val s = Array.tabulate(333)(law(4)) // odd data length path (666 bytes)
    val ais = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(AudioCodec.encodeWav(s)))
    val f = ais.getFormat
    assert(f.getChannels === 1 && f.getSampleSizeInBits === 16)
    assert(f.getSampleRate === AudioCodec.SampleRate.toFloat)
    val bytes = ais.readAllBytes()
    assert(bytes.length === s.length * 2)
    val got = (0 until s.length).map { i =>
      val v = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
      if (v >= 0x8000) v - 0x10000 else v
    }
    assert(got === s.toSeq)
  }

  test("our decoder reads a WAV with an extra ancillary chunk") {
    // splice a LIST chunk between fmt and data — decoders must walk, not
    // assume fixed offsets
    val s = Array.tabulate(100)(law(2))
    val plain = AudioCodec.encodeWav(s)
    val head = plain.slice(0, 36) // RIFF header + fmt chunk
    val tail = plain.slice(36, plain.length) // data chunk
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = head ++ listChunk ++ tail
    // fix RIFF size field (bytes 4..7, LE)
    val riffLen = spliced.length - 8
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    assert(AudioCodec.decodeWav(spliced).toSeq === s.toSeq)
  }

  test("unsupported layouts fail loudly") {
    intercept[IllegalArgumentException](AudioCodec.decodeWav("RIFFnope".getBytes))
    intercept[IllegalArgumentException](
      AudioCodec.decodeWav(new Array[Byte](10)))
  }

  test("features match the closed-form law") {
    implicit val sp = spark
    import sp.implicits._
    val ids = spark.createDataset(Seq(0L, 65L).map(java.lang.Long.valueOf))
    val got = AudioCodec.features(AudioCodec.synthWavMedia(ids)).collect()
    got.foreach { f =>
      val cls = f.doc_id % 64
      val s = Array.tabulate(AudioCodec.NSamples)(law(cls))
      assert(f.n_samples === s.length)
      assert(f.peak_abs === s.map(math.abs).max)
      assert(f.sum_sq === s.map(v => v.toLong * v).sum)
      assert(f.dc_sum === s.map(_.toLong).sum)
      assert(f.zero_crossings ===
        s.sliding(2).count(p => p(0).toLong * p(1) < 0))
    }
  }

  test("audio funnel gates separate the planted laws by precedence") {
    implicit val sp = spark
    import sp.implicits._
    // 85 silent (%17), 65 clipped (%13), 55 static (%11), 10/74 std
    // (cls 10 both -> exact duplicates); 0 hits %17 AND %13 -> silent wins
    val ids = spark.createDataset(
      Seq(85L, 65L, 55L, 10L, 74L, 0L).map(java.lang.Long.valueOf))
    val v = AudioCodec.audioFunnel(AudioCodec.synthAudioFunnelMedia(ids))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(v(85L)._1 === "silent" && v(65L)._1 === "clipped")
    assert(v(55L)._1 === "static" && v(0L)._1 === "silent")
    assert(v(10L) === ("kept", -1L))
    assert(v(74L) === ("dup", 10L)) // 74 % 64 == 10 % 64 -> same samples
  }
}
