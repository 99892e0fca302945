package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal ingestion plumbing: media as opaque binary payloads, decoded
  * and featurized ON THE EXECUTORS, with only fixed-width features ever
  * crossing a shuffle — the only layout that works when the payload column
  * is 99% of a 100 TB table.
  *
  * Pipeline shape (all REAL and tested):
  *   - typed rows with a `Array[Byte]` payload + mime metadata
  *   - `Dataset.mapPartitions` batches rows through the decoder so per-batch
  *     setup (a real codec context) amortizes — the Scala analog of a
  *     Pandas-UDF `mapInPandas` batch loop
  *   - frame sampling at a fixed byte stride (video keyframe shape)
  *   - nearest-neighbor resize over the decoded plane (real resampling
  *     arithmetic)
  *   - per-media feature vector: fixed 64-dim byte-histogram embedding
  *
  * ===The stub===
  * This container ships no image/audio/video codecs, so [[decodeFrame]] is
  * a DETERMINISTIC FAKE: it "decodes" a payload chunk into an 8×8 grayscale
  * plane by reading raw bytes. Swapping in a real codec changes only that
  * one function — schema, batching, partitioning, and everything downstream
  * is production-shaped.
  */
object MediaPipeline {

  val FrameStride = 256
  val PlaneW = 8
  val PlaneH = 8
  val FeatureDim = 64

  final case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)
  final case class Frame(media_id: Long, frame_idx: Int, width: Int, height: Int,
                         pixels: Array[Byte])
  final case class MediaFeatures(media_id: Long, n_frames: Int,
                                 embedding: Array[Float])

  /** STUB decoder — replace with a real codec binding in production. Reads
    * one FrameStride-byte chunk as an 8×8 grayscale plane (zero-padded).
    */
  def decodeFrame(payload: Array[Byte], frameIdx: Int): Frame = {
    val off = frameIdx * FrameStride
    val pixels = Array.tabulate[Byte](PlaneW * PlaneH) { i =>
      val p = off + i * (FrameStride / (PlaneW * PlaneH))
      if (p < payload.length) payload(p) else 0
    }
    Frame(-1L, frameIdx, PlaneW, PlaneH, pixels)
  }

  def frameCount(payload: Array[Byte]): Int =
    payload.length / FrameStride + 1

  /** Nearest-neighbor resize — real resampling arithmetic over the plane. */
  def resize(f: Frame, w: Int, h: Int): Frame = {
    val out = Array.tabulate[Byte](w * h) { i =>
      val x = (i % w) * f.width / w
      val y = (i / w) * f.height / h
      f.pixels(y * f.width + x)
    }
    f.copy(width = w, height = h, pixels = out)
  }

  /** 64-bin byte histogram over all frame planes, L1-normalized — the
    * fixed-width executor-side feature that is all a downstream ANN/dedup
    * stage ever shuffles.
    */
  def featurize(payload: Array[Byte]): MediaFeatures = {
    val hist = new Array[Float](FeatureDim)
    val n = frameCount(payload)
    var fi = 0
    while (fi < n) {
      val frame = decodeFrame(payload, fi)
      frame.pixels.foreach { b => hist((b & 0xFF) / (256 / FeatureDim)) += 1f }
      fi += 1
    }
    val total = hist.sum
    if (total > 0) { var i = 0; while (i < FeatureDim) { hist(i) /= total; i += 1 } }
    MediaFeatures(-1L, n, hist)
  }

  /** The executor-side batch loop: decode+featurize per partition. Input
    * partitioning is preserved (narrow), payload bytes never leave the
    * executor, and the output is ~260 bytes/row regardless of payload size.
    */
  def featurizeDataset(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens once here (real codecs open a context)
      rows.map { r => featurize(r.payload).copy(media_id = r.media_id) }
    }
  }

  /** Frame explosion as typed rows — one Frame per stride chunk. */
  def explodeFrames(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { r =>
      (0 until frameCount(r.payload)).iterator
        .map(i => decodeFrame(r.payload, i).copy(media_id = r.media_id))
    }
  }
}
