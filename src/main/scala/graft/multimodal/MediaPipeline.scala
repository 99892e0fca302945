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
  * ===Decoders===
  * IMAGE payloads decode for REAL: [[decodeImage]] uses the JDK's built-in
  * `javax.imageio` (PNG/BMP/GIF/JPEG — no external codec dependency) and
  * converts to a BT.601 integer-luma grayscale plane. Audio/video still go
  * through the DETERMINISTIC STUB [[decodeFrame(payload:Array[Byte],frameIdx:Int)*]]
  * (this container ships no av codecs): it "decodes" a payload chunk into
  * an 8×8 plane by reading raw bytes. Swapping in a real av codec changes
  * only that one function — schema, batching, partitioning, and everything
  * downstream is production-shaped for both families.
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

  /** True when the mime family routes to the REAL image decoder. */
  def isImageMime(mime: String): Boolean = mime != null && mime.startsWith("image/")

  /** REAL single-frame image decode via the JDK's `javax.imageio`
    * (PNG/BMP/GIF/JPEG ship with every JRE — zero new dependencies).
    * Grayscale plane = BT.601 integer luma `(299r + 587g + 114b) / 1000`
    * per pixel. None when the bytes are not a decodable image (wrong
    * format, truncated), so callers fall back deterministically.
    */
  def decodeImage(payload: Array[Byte]): Option[Frame] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val pixels = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            pixels(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
            x += 1
          }
          y += 1
        }
        Some(Frame(-1L, 0, w, h, pixels))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Mime-routed decode: an image mime → the real [[decodeImage]] (one frame),
    * anything else (or an undecodable image payload) → the stride stub.
    */
  def decodeFrame(payload: Array[Byte], mime: String, frameIdx: Int): Frame =
    (if (isImageMime(mime) && frameIdx == 0) decodeImage(payload) else None)
      .getOrElse(decodeFrame(payload, frameIdx))

  /** STUB decoder (audio/video only — images decode for real above).
    * Reads one FrameStride-byte chunk as an 8×8 grayscale plane
    * (zero-padded); replace with a codec binding in production.
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

  /** All frames of a payload under its mime routing: a decodable image is
    * exactly one real frame; everything else windows through the stub.
    */
  def frames(payload: Array[Byte], mime: String): Iterator[Frame] =
    (if (isImageMime(mime)) decodeImage(payload) else None) match {
      case Some(f) => Iterator.single(f)
      case None => (0 until frameCount(payload)).iterator.map(decodeFrame(payload, _))
    }

  /** 64-bin byte histogram over all frame planes, L1-normalized — the
    * fixed-width executor-side feature that is all a downstream ANN/dedup
    * stage ever shuffles.
    */
  def featurize(payload: Array[Byte],
                mime: String = "application/octet-stream"): MediaFeatures = {
    val hist = new Array[Float](FeatureDim)
    var n = 0
    frames(payload, mime).foreach { frame =>
      n += 1
      frame.pixels.foreach { b => hist((b & 0xFF) / (256 / FeatureDim)) += 1f }
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
      rows.map { r => featurize(r.payload, r.mime).copy(media_id = r.media_id) }
    }
  }

  /** Frame explosion as typed rows — one real frame per image, one Frame
    * per stride chunk for everything else.
    */
  def explodeFrames(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { r =>
      frames(r.payload, r.mime).zipWithIndex
        .map { case (f, i) => f.copy(media_id = r.media_id, frame_idx = i) }
    }
  }
}
