package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video as opaque `binary` with typed
 * metadata, processed in partition-sized batches.
 *
 * The Spark-side plumbing (schema, partitioning, batch shape) is real;
 * the codec itself is STUBBED with a deterministic fake — this container
 * has no image/audio libraries. Swap [[MediaCodec.decodeStub]] for a real
 * decoder (e.g. JNI/ffmpeg or an Arrow-batched Python worker) without
 * touching the dataflow.
 */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])

  /** Typed features extracted per media payload. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  object MediaCodec {
    /**
     * STUB decoder: deterministic pseudo-metadata derived from payload
     * bytes. A real implementation parses the container header. Marked
     * clearly as fake: dims are functions of length/first bytes only.
     */
    def decodeStub(r: MediaRecord): MediaFeatures = {
      val len = r.media.length
      val b0 = if (len > 0) r.media(0) & 0xff else 0
      val b1 = if (len > 1) r.media(1) & 0xff else 0
      var crc = 1469598103934665603L // FNV-1a over payload: cheap + deterministic
      var i = 0
      while (i < len) { crc ^= (r.media(i) & 0xffL); crc *= 1099511628211L; i += 1 }
      MediaFeatures(r.doc_id, r.mime, len,
        width = 16 + (b0 % 64), height = 16 + (b1 % 64),
        n_frames = if (r.mime.startsWith("video")) 1 + len % 30 else 1,
        checksum = crc)
    }
  }

  /**
   * Batch feature extraction: `mapPartitions` so a real codec can
   * amortize per-batch init (model load, ffmpeg context) across the
   * partition — the Scala analogue of an Arrow-batched Python UDF.
   * Narrow (no shuffle); repartition upstream to size decode batches.
   */
  def extractFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(MediaCodec.decodeStub)
    }
  }

  /** One sampled frame: parent doc, frame index, stream timestamp, and
   *  the frame's (stub) content hash. */
  final case class FrameSample(doc_id: Long, frame_idx: Int, ts_ms: Long, frame_hash: Long)

  /**
   * Frame sampling — every k-th frame of each video payload, the 1->N
   * expansion a real extractor performs. The dataflow is the real thing
   * (flatMap inside `mapPartitions`, per-partition codec init point, no
   * shuffle, output cardinality data-dependent); the decode is the same
   * declared stub. Timestamps assume 25 fps (40 ms per frame).
   */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int)(
      implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    require(everyK > 0, "everyK must be positive")
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.flatMap { r =>
        val f = MediaCodec.decodeStub(r)
        (0 until f.n_frames by everyK).iterator.map { i =>
          FrameSample(r.doc_id, i, i * 40L,
            f.checksum ^ (i.toLong * 0x9e3779b97f4a7c15L))
        }
      }
    }
  }

  /** Wrap a text table as fake media rows (payload = utf8 bytes) to
   *  exercise the binary-column pipeline end-to-end. */
  def fakeMediaFromText(df: DataFrame, mime: String = "image/fake")(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col("doc_id"), lit(mime).as("mime"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }
}
