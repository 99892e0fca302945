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
  * All three media families now decode for REAL with zero external
  * dependencies: [[decodeImage]] via the JDK's `javax.imageio` (PNG/BMP/
  * GIF/JPEG) to a BT.601 integer-luma plane; [[decodeAudio]] via
  * `javax.sound.sampled` (WAV/PCM incl. µ-law/a-law through the JDK codec
  * chain) to a mono 8-bit sample stream windowed by [[audioFrames]]; and
  * [[decodeVideo]] for MJPEG-in-AVI — a hand-walked RIFF container whose
  * `00dc` frame chunks are plain JPEGs, each through the same imageio
  * luma path ([[videoFrames]]). The DETERMINISTIC STUB
  * [[decodeFrame(payload:Array[Byte],frameIdx:Int)*]] remains only as the
  * fallback for non-media payloads and video codecs the JDK genuinely
  * lacks (H.264 etc.): it "decodes" a payload chunk into an 8×8 plane by
  * reading raw bytes. Swapping in a richer codec changes only that one
  * function — schema, batching, partitioning, and everything downstream is
  * production-shaped for all three families.
  */
object MediaPipeline {

  // ImageIO defaults to a DISK-backed stream cache: every decode of an
  // in-memory payload creates (and deletes) a temp FILE. A round-9
  // sf100 probe thread dump showed all 32 executor threads serialized
  // in TempFileHelper.createTempFile under ImageIO.read — file-creation
  // syscalls, not decoding, dominated dedup_image_phash and the MJPEG
  // frame path. Every payload this pipeline decodes is a small
  // in-memory byte array, so the memory cache is strictly better.
  // Object init runs once per executor JVM on first use.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** True when the mime family routes to the REAL audio decoder. */
  def isAudioMime(mime: String): Boolean = mime != null && mime.startsWith("audio/")

  /** Decoded PCM audio: `samples` is the mono 8-bit signed downmix (the
    * plane-precision working form every downstream stage consumes);
    * `channels`/`sampleRate`/`durationMs` describe the SOURCE payload.
    */
  final case class AudioClip(sampleRate: Int, channels: Int, nSamples: Int,
                             durationMs: Long, samples: Array[Byte])

  /** Structural RIFF/WAVE gate before `javax.sound.sampled` sees the bytes
    * (same rationale as [[graft.functions.ImageDims]]'s magic-number gate:
    * the AU reader matches on the 4 ASCII bytes ".snd", which innocent text
    * can start with). The RIFF chunk size must agree with the payload
    * length, so arbitrary column content cannot pass by accident.
    */
  def looksLikeWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' && {
        val declared = (p(4) & 0xffL) | ((p(5) & 0xffL) << 8) |
          ((p(6) & 0xffL) << 16) | ((p(7) & 0xffL) << 24)
        declared == p.length - 8
      } && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/PCM ships
    * with every JRE — zero new dependencies, the same trick as
    * [[decodeImage]]'s imageio). Non-PCM WAV encodings (µ-law, a-law,
    * float) are converted through the JDK's codec chain to 16-bit signed
    * PCM first; channels are averaged to a mono downmix and samples drop
    * to 8-bit signed (the plane precision). None when the bytes are not a
    * decodable WAV, so callers fall back deterministically to the stub.
    */
  def decodeAudio(payload: Array[Byte]): Option[AudioClip] = {
    if (!looksLikeWav(payload)) return None
    // plain little-endian PCM (the overwhelmingly common WAV layout, and
    // the fixture corpus' own) decodes straight off the byte span —
    // AudioSystem pays an SPI provider scan + a stream stack per CALL,
    // which at sf100 made audio decode 20% of the whole bench suite
    // (round-12 performance note). Exotic encodings fall back to the
    // JDK codec chain; both paths share the mix loop, so the downmix is
    // byte-exact identical either way (MultimodalSpec pins it).
    decodeRiffPcm(payload).orElse(decodeAudioJdk(payload))
  }

  /** Direct RIFF/WAVE chunk walk for PCM u8 / s16-LE payloads (any
    * channel count). None for non-PCM format tags, other widths, or a
    * malformed chunk list — the caller then tries the JDK path.
    */
  private[graft] def decodeRiffPcm(p: Array[Byte]): Option[AudioClip] = {
    def u16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int) = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    // pos tracks as Long: a corrupt chunk size near UInt32.Max would
    // overflow an Int advance into a negative index that passes the
    // loop guard and crashes the String ctor (the JDK fallback path
    // catches and returns None — this walk must degrade the same way)
    var pos = 12L
    var fmtTag = -1; var ch = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= p.length && (fmtTag < 0 || dataOff < 0)) {
      val ip = pos.toInt
      val id = new String(p, ip, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(ip + 4) // 0 .. 4 GiB as a Long — never negative
      val body = ip + 8
      id match {
        case "fmt " if size >= 16 && body + 16 <= p.length =>
          fmtTag = u16(body)
          ch = u16(body + 2)
          sampleRate = u32(body + 4).toInt
          bits = u16(body + 14)
        case "data" =>
          dataOff = body
          dataLen = math.min(size, (p.length - body).toLong).toInt
        case _ =>
      }
      pos = body.toLong + size + (size & 1L) // chunks pad to even
    }
    if (fmtTag != 1 || ch < 1 || (bits != 8 && bits != 16) ||
        dataOff < 0 || sampleRate <= 0) return None
    // WAV convention: 8-bit PCM is UNSIGNED, 16-bit is SIGNED LE —
    // exactly what AudioSystem reports for the same payload
    val mono = mixDown(p, dataOff, dataLen, ch, bits / 8,
      unsigned = bits == 8, bigEndian = false)
    val nFrames = mono.length
    Some(AudioClip(sampleRate, ch, nFrames,
      nFrames * 1000L / sampleRate, mono))
  }

  /** The shared channel-averaging 8-bit downmix over a PCM byte span. */
  private def mixDown(bytes: Array[Byte], off: Int, len: Int, ch: Int,
                      bps: Int, unsigned: Boolean,
                      bigEndian: Boolean): Array[Byte] = {
    val frameSize = ch * bps
    val nFrames = len / frameSize
    val mono = new Array[Byte](nFrames)
    var i = 0
    while (i < nFrames) {
      var acc = 0
      var c = 0
      while (c < ch) {
        val o = off + i * frameSize + c * bps
        // every branch widens to a 16-bit signed sample before the mix
        val s16 =
          if (bps == 1) (if (unsigned) (bytes(o) & 0xff) - 128 else bytes(o).toInt) << 8
          else if (bigEndian) (bytes(o) << 8) | (bytes(o + 1) & 0xff)
          else (bytes(o + 1) << 8) | (bytes(o) & 0xff)
        acc += s16
        c += 1
      }
      mono(i) = ((acc / ch) >> 8).toByte
      i += 1
    }
    mono
  }

  /** The JDK codec-chain path (µ-law, a-law, float, big-endian — the
    * layouts [[decodeRiffPcm]] declines): convert to 16-bit signed PCM
    * and share the same mix loop.
    */
  private[graft] def decodeAudioJdk(payload: Array[Byte]): Option[AudioClip] = {
    var in: javax.sound.sampled.AudioInputStream = null
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val srcFmt = raw.getFormat
      // raw path only for layouts the mix loop actually decodes: signed
      // 8/16-bit, or UNSIGNED 8-bit (the only width whose unsigned flag
      // the loop consults). Unsigned 16-bit would fall through the signed
      // branches and decode offset by full scale — convert it instead.
      val rawOk = (srcFmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          (srcFmt.getSampleSizeInBits == 8 || srcFmt.getSampleSizeInBits == 16)) ||
        (srcFmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED &&
          srcFmt.getSampleSizeInBits == 8)
      in =
        if (rawOk) raw
        else AudioSystem.getAudioInputStream(
          new AudioFormat(srcFmt.getSampleRate, 16, srcFmt.getChannels,
            true, false), raw)
      val f = in.getFormat
      val bytes = in.readAllBytes()
      val ch = f.getChannels max 1
      val bps = f.getSampleSizeInBits / 8
      if (ch * bps <= 0) return None
      val mono = mixDown(bytes, 0, bytes.length, ch, bps,
        unsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED,
        bigEndian = f.isBigEndian)
      val nFrames = mono.length
      val sr = math.round(f.getSampleRate)
      Some(AudioClip(sr, srcFmt.getChannels, nFrames,
        if (sr > 0) nFrames * 1000L / sr else 0L, mono))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (in != null) in.close()
  }

  /** Canonical 44-byte RIFF/WAVE writer, mono 8-bit UNSIGNED PCM — the
    * fixture side of the real decode path: synthesized payloads go
    * through the SAME structural gate + javax.sound decode chain as user
    * WAVs (mm_audio_energy's end-to-end proof, MultimodalSpec fixtures).
    */
  def synthWavU8(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate) // byte rate = sr × 1ch × 1B
      .putShort(1).putShort(8) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(samples)
    bb.array()
  }

  /** Decoded audio windowed into PlaneW×PlaneH sample planes — the audio
    * analog of video frame extraction (one 64-sample window per Frame),
    * zero-padded on the tail like the stride stub.
    */
  def audioFrames(clip: AudioClip): Iterator[Frame] = {
    val per = PlaneW * PlaneH
    val n = math.max((clip.nSamples + per - 1) / per, 1)
    (0 until n).iterator.map { idx =>
      val off = idx * per
      val pixels = Array.tabulate[Byte](per) { i =>
        if (off + i < clip.nSamples) clip.samples(off + i) else 0
      }
      Frame(-1L, idx, PlaneW, PlaneH, pixels)
    }
  }

  /** True when the mime family routes to the REAL video decoder. */
  def isVideoMime(mime: String): Boolean = mime != null && mime.startsWith("video/")

  /** Decoded MJPEG video: the container header's timing/geometry plus the
    * (offset, length) span of each frame's JPEG bytes INSIDE the original
    * payload — no second copy of the frame data is ever materialized
    * (a large AVI is ~100% frame chunks; copying them out would double
    * resident memory per video). [[frameBytes]] copies ONE frame
    * transiently at decode time.
    */
  final case class VideoClip(width: Int, height: Int, usPerFrame: Long,
                             nFrames: Int, durationMs: Long,
                             payload: Array[Byte],
                             frameSpans: Vector[(Int, Int, Int)]) {
    /** The i-th DECODABLE frame's JPEG bytes; its container position is
      * `frameSpans(i)._1` (spans carry (containerIdx, off, len) so a
      * span dropped at parse time never relabels the frames after it).
      */
    def frameBytes(i: Int): Array[Byte] = {
      val (_, off, len) = frameSpans(i)
      java.util.Arrays.copyOfRange(payload, off, off + len)
    }
  }

  /** Structural RIFF/AVI gate (same rationale as [[looksLikeWav]]): magic
    * fourccs plus the declared RIFF size agreeing with the payload length,
    * so arbitrary column bytes cannot wander into the container parser.
    */
  def looksLikeAvi(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' && {
        val declared = (p(4) & 0xffL) | ((p(5) & 0xffL) << 8) |
          ((p(6) & 0xffL) << 16) | ((p(7) & 0xffL) << 24)
        declared == p.length - 8
      } && p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  /** REAL video decode for MJPEG-in-AVI — the one video coding the JDK
    * can decode with ZERO new dependencies: AVI is a RIFF container (the
    * same chunk grammar [[looksLikeWav]] already parses for audio) and
    * each `00dc` frame chunk is a plain JPEG, which `javax.imageio`
    * decodes like any image. The walk reads the `avih` header for
    * geometry/timing and collects the `movi` frame chunks; anything
    * non-AVI or structurally broken returns None so callers fall back
    * deterministically to the stub (which remains the route for codecs
    * the JDK genuinely lacks — H.264 etc.).
    */
  def decodeVideo(payload: Array[Byte]): Option[VideoClip] = {
    if (!looksLikeAvi(payload)) return None
    try {
      def u32(off: Int): Long = (payload(off) & 0xffL) |
        ((payload(off + 1) & 0xffL) << 8) | ((payload(off + 2) & 0xffL) << 16) |
        ((payload(off + 3) & 0xffL) << 24)
      def fourcc(off: Int): String =
        new String(payload, off, 4, "US-ASCII")
      var usPerFrame = 0L; var totalFrames = 0; var w = 0; var h = 0
      var frameOrdinal = 0 // CONTAINER position: every 00dc/00db counts
      val spans = Vector.newBuilder[(Int, Int, Int)]
      // walk the chunk grammar ITERATIVELY — an explicit segment stack,
      // not recursion: a crafted AVI can nest LISTs ~payload/12 deep and
      // a recursive walk would StackOverflow (an Error NonFatal does not
      // catch), failing the whole scan task on one hostile payload. Chunk
      // sizes stay Long and are bounds-checked BEFORE use: a size with
      // the top bit set would wrap a 32-bit Int negative and could stall
      // or reverse the offset advance — a crafted payload passing the
      // structural gate must terminate the walk, never hang the task.
      var stack = List((12, payload.length)) // [start, end) segments, DFS order
      while (stack.nonEmpty) {
        var (off, end) = stack.head
        stack = stack.tail
        var walking = true
        while (walking && off + 8 <= end) {
          val id = fourcc(off)
          val size = u32(off + 4)
          val body = off + 8L
          if (size < 0 || body + size > end) walking = false // malformed: stop
          else {
            val bodyI = body.toInt; val sizeI = size.toInt
            val next = bodyI + sizeI + (sizeI & 1) // chunks are word-aligned
            if (id == "LIST" && bodyI + 4 <= end) {
              // descend: continuation after the LIST first, then the list
              // body on top — DFS preserves container frame order
              stack = (bodyI + 4, bodyI + sizeI) :: (next, end) :: stack
              walking = false
            } else {
              if (id == "avih" && sizeI >= 40) {
                usPerFrame = u32(bodyI)
                totalFrames = u32(bodyI + 16).toInt
                w = u32(bodyI + 32).toInt
                h = u32(bodyI + 36).toInt
              } else if (id == "00dc" || id == "00db") {
                // MJPEG frame chunks are plain JPEGs — require the SOI
                // marker, so a structurally-valid AVI carrying a codec
                // the JDK cannot decode (H.264, raw DIB) makes the WHOLE
                // clip undecodable -> every caller falls back to the stub
                // CONSISTENTLY (frames() and the indexed decodeFrame
                // agree). The ordinal advances for EVERY frame chunk:
                // a corrupted-SOI frame is dropped here but never
                // relabels the frames after it.
                if (sizeI > 2 && (payload(bodyI) & 0xff) == 0xff &&
                    (payload(bodyI + 1) & 0xff) == 0xd8)
                  spans += ((frameOrdinal, bodyI, sizeI))
                frameOrdinal += 1
              }
              off = next
            }
          }
        }
      }
      val fs = spans.result()
      // a clip where NO frame chunk carries a JPEG is a foreign codec ->
      // undecodable as a whole; a clip where SOME do is MJPEG with
      // corruption -> decode what survives, container indices intact
      if (fs.isEmpty || w <= 0 || h <= 0) None
      else Some(VideoClip(w, h, usPerFrame, frameOrdinal,
        frameOrdinal * usPerFrame / 1000L, payload, fs))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoded video frames: each JPEG span through the REAL
    * [[decodeImage]] luma path, lazily — one frame's bytes and one
    * decoded plane in memory at a time. A frame whose JPEG body is
    * corrupt is skipped (decoders must not abort a 100 TB scan on one
    * bad frame); `frame_idx` always names the CONTAINER position, so a
    * skip never silently relabels later frames.
    */
  def videoFrames(clip: VideoClip): Iterator[Frame] =
    clip.frameSpans.indices.iterator.flatMap { i =>
      // frame_idx is the span's CONTAINER ordinal (recorded at parse
      // time), not its position among the decodable spans
      decodeImage(clip.frameBytes(i)).map(_.copy(frame_idx = clip.frameSpans(i)._1))
    }

  /** Minimal MJPEG-AVI writer, the fixture side of [[decodeVideo]] (the
    * [[synthWavU8]] pattern): uniform-gray frames JPEG-encoded by the
    * JDK's own writer and wrapped in a canonical RIFF/AVI — synthesized
    * payloads run the SAME structural gate + container walk + imageio
    * decode as user AVIs.
    */
  def synthAviGray(levels: Seq[Int], w: Int, h: Int,
                   fps: Int = 10): Array[Byte] = {
    val jpegs = levels.map { lvl =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(lvl, lvl, lvl)); g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def le32(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    val usPerFrame = 1000000L / fps
    val avih = chunk("avih", le32(usPerFrame, 0, 0, 0, jpegs.length, 0, 1, 0,
      w, h, 0, 0, 0, 0))
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ le32(0, 0, 0, 1, fps, 0, jpegs.length,
        0, 0, 0) ++ le32((h.toLong << 16) | w.toLong))
    val strf = chunk("strf", le32(40, w, h, (24L << 16) | 1L) ++
      "MJPG".getBytes("US-ASCII") ++ le32(w.toLong * h * 3, 0, 0, 0, 0))
    def list(kind: String, bodies: Array[Byte]*): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ bodies.flatten.toArray)
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)): _*)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val bb = java.nio.ByteBuffer.allocate(8 + riffBody.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffBody.length).put(riffBody)
    bb.array()
  }

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

  /** Mime-routed decode: an image mime → the real [[decodeImage]] (one
    * frame), an audio mime → the real [[decodeAudio]] sample window,
    * anything else (or an undecodable payload) → the stride stub.
    */
  def decodeFrame(payload: Array[Byte], mime: String, frameIdx: Int): Frame =
    (if (isImageMime(mime) && frameIdx == 0) decodeImage(payload)
     else if (isAudioMime(mime))
       decodeAudio(payload).flatMap(c => audioFrames(c).drop(frameIdx).nextOption())
     else if (isVideoMime(mime))
       // find BY container index, not drop(n): videoFrames skips corrupt
       // frames, so positional dropping would silently return a LATER
       // frame than the one asked for
       decodeVideo(payload).flatMap(c =>
         videoFrames(c).find(_.frame_idx == frameIdx))
     else None)
      .getOrElse(decodeFrame(payload, frameIdx))

  /** STUB decoder (the residual fallback: non-media payloads, and video
    * codecs the JDK lacks — MJPEG-AVI decodes for REAL above). Reads one
    * FrameStride-byte chunk as an 8×8 grayscale plane (zero-padded);
    * replace with a codec binding in production.
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

  /** Deterministic grayscale PNG writer for spec/gate fixtures: `vals`
    * are row-major 0-255 lumas, stored as r=g=b through TYPE_INT_RGB so
    * the lossless PNG round-trip and the BT.601 luma fold ((299v + 587v
    * + 114v)/1000 = v exactly) return the SAME integers — what lets a
    * SQL oracle replay a REAL encode→decode→hash chain formula-exactly.
    * (TYPE_BYTE_GRAY would gamma-convert through the gray color space
    * and break integer equality.)
    */
  def synthPngGray(vals: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(vals.length == w * h, s"need $w*$h lumas, got ${vals.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < vals.length) {
      val v = vals(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream(256)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit difference hash (dHash — the standard perceptual image hash):
    * nearest-neighbor resize to 9×8 gray, then bit (y,x) = (p[y][x] <
    * p[y][x+1]), packed row-major MSB-first (bit for (y,x) sits at
    * position 63−(y·8+x)). Integer-only end to end, so a synthetic
    * corpus's hashes are replayable from the generator formula by a SQL
    * oracle. Near-duplicate images (crops, re-encodes, small edits)
    * differ in few bits; Hamming distance over the 64 bits is the
    * dedup metric.
    */
  def dHash(f: Frame): Long = {
    val g = if (f.width == 9 && f.height == 8) f else resize(f, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val l = g.pixels(y * 9 + x) & 0xff
        val r = g.pixels(y * 9 + x + 1) & 0xff
        h = (h << 1) | (if (l < r) 1L else 0L)
        x += 1
      }
      y += 1
    }
    h
  }

  /** All frames of a payload under its mime routing: a decodable image is
    * exactly one real frame, a decodable WAV windows its real PCM samples;
    * everything else windows through the stub.
    */
  def frames(payload: Array[Byte], mime: String): Iterator[Frame] =
    (if (isImageMime(mime)) decodeImage(payload).map(Iterator.single(_)) else None)
      .orElse(decodeAudioFrames(payload, mime))
      .orElse(decodeVideoFrames(payload, mime))
      .getOrElse((0 until frameCount(payload)).iterator.map(decodeFrame(payload, _)))

  private def decodeAudioFrames(payload: Array[Byte],
                                mime: String): Option[Iterator[Frame]] =
    if (isAudioMime(mime)) decodeAudio(payload).map(audioFrames) else None

  private def decodeVideoFrames(payload: Array[Byte],
                                mime: String): Option[Iterator[Frame]] =
    if (isVideoMime(mime)) decodeVideo(payload).map(videoFrames) else None

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
