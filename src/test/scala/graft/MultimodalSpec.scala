package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline._

/** The binary-payload media pipeline: schema, batching, and the decode→
  * resize→featurize chain over the stub codec (FIXTURES.md §B documents as
  * payload stand-ins).
  */
class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def mediaDs = {
    val ds = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRow]
    ds
  }

  test("featurizeDataset: one fixed-width feature row per payload, deterministic") {
    val feats = featurizeDataset(spark, mediaDs).collect()
    feats.length shouldBe Tables.documents(spark, sf0001).count()
    all(feats.map(_.embedding.length)) shouldBe FeatureDim
    // L1-normalized histogram
    all(feats.map(_.embedding.sum.toDouble)) shouldBe 1.0 +- 1e-4
    // deterministic: a second run yields identical vectors
    val again = featurizeDataset(spark, mediaDs).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    feats.foreach(f => again(f.media_id) shouldBe f.embedding.toSeq)
  }

  test("featurization is narrow: no shuffle in the plan") {
    val plan = featurizeDataset(spark, mediaDs).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("explodeFrames: frame count matches payload length / stride") {
    val frames = explodeFrames(spark, mediaDs).groupByKey(_.media_id).count().collect().toMap
    val expected = mediaDs.collect()
      .map(r => r.media_id -> (r.payload.length / FrameStride + 1).toLong).toMap
    frames shouldBe expected
  }

  test("resize: nearest-neighbor plane resampling") {
    val f = Frame(1L, 0, 4, 4, Array.tabulate[Byte](16)(_.toByte))
    val up = MediaPipeline.resize(f, 8, 8)
    up.width shouldBe 8
    up.pixels.length shouldBe 64
    up.pixels(0) shouldBe 0.toByte        // (0,0) ← source (0,0)
    up.pixels(8 * 2 + 2) shouldBe 5.toByte // (2,2) ← source (1,1) = 5
    val down = MediaPipeline.resize(up, 4, 4)
    down.pixels shouldBe f.pixels          // up then down restores the plane
  }

  private def pngFixture(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 50) % 256 << 16) | ((y * 80) % 256 << 8) | 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG fixture decodes END TO END: real dimensions, real luma, one frame") {
    val png = pngFixture(5, 3)

    // the real decoder: known dimensions, known BT.601 luma per pixel
    val f = decodeFrame(png, "image/png", 0)
    f.width shouldBe 5
    f.height shouldBe 3
    // pixel (x=2, y=1): r=100, g=80, b=40
    f.pixels(1 * 5 + 2) shouldBe ((100 * 299 + 80 * 587 + 40 * 114) / 1000).toByte
    // pixel (0,0): r=0, g=0, b=40
    f.pixels(0) shouldBe ((40 * 114) / 1000).toByte

    // mime routing: same bytes under a non-image mime take the stub
    decodeFrame(png, "application/octet-stream", 0).width shouldBe PlaneW

    // e2e through the Dataset paths, image and av rows mixed
    val av = Array.tabulate[Byte](600)(i => (i % 251).toByte)
    val ds = Seq(MediaRow(1L, png, "image/png"),
      MediaRow(2L, av, "application/octet-stream")).toDS()
    val feats = featurizeDataset(spark, ds).collect().map(f => f.media_id -> f).toMap
    feats(1L).n_frames shouldBe 1                      // one REAL frame
    feats(2L).n_frames shouldBe (600 / FrameStride + 1) // stub stride count
    feats(1L).embedding.sum.toDouble shouldBe 1.0 +- 1e-4
    val exploded = explodeFrames(spark, ds).collect().map(f => f.media_id -> f).toMap
    exploded(1L).width shouldBe 5
    exploded(1L).height shouldBe 3

    // resize runs real resampling over the real plane
    val up = MediaPipeline.resize(decodeFrame(png, "image/png", 0), 10, 6)
    up.pixels(0) shouldBe f.pixels(0)
  }

  test("ImageDims expression: header-only dims in a query, NULL for non-images") {
    val png = pngFixture(7, 4)
    val rows = Seq((1L, png), (2L, "just text bytes".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), graft.functions.ImageDims(col("payload")).as("dims"))
      .orderBy(col("media_id"))
      .collect()
    rows(0).getStruct(1).getInt(0) shouldBe 7
    rows(0).getStruct(1).getInt(1) shouldBe 4
    rows(1).isNullAt(1) shouldBe true

    // and through mm_meta's coalesce: a real image reports REAL dimensions
    val meta = Seq((1L, png, "x"), (2L, "plain".getBytes("UTF-8"), "y"))
      .toDF("doc_id", "payload", "text")
      .select(col("doc_id"),
        graft.functions.ImageDims(col("payload")).as("dims"),
        octet_length(col("payload")).as("nb"))
      .select(col("doc_id"),
        coalesce(col("dims.width").cast("long"), (col("nb") % 640 + 1).cast("long")).as("width"),
        coalesce(col("dims.height").cast("long"), (col("nb") % 480 + 1).cast("long")).as("height"))
      .orderBy(col("doc_id")).collect()
    (meta(0).getLong(1), meta(0).getLong(2)) shouldBe ((7L, 4L))
    (meta(1).getLong(1), meta(1).getLong(2)) shouldBe ((6L, 6L)) // 5 bytes → fallback
  }

  /** 16-bit signed little-endian PCM WAV with sample i = `gen(i)` per
    * channel (channel 1 gets `gen(i) + delta` so downmix averaging is
    * observable), written through the JDK's own WAV writer.
    */
  private def wavFixture(sampleRate: Int, channels: Int, nSamples: Int,
                         gen: Int => Short, delta: Short = 0): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nSamples * channels * 2)
    for (i <- 0 until nSamples; c <- 0 until channels) {
      val v = (gen(i) + (if (c == 1) delta else 0)).toShort
      val off = (i * channels + c) * 2
      pcm(off) = (v & 0xff).toByte
      pcm(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("RIFF fast path is byte-exact with the JDK codec path (round 13)") {
    import graft.multimodal.MediaPipeline.{decodeRiffPcm, decodeAudioJdk, synthWavU8}
    // s16-LE mono and stereo (the JDK writer's own layout), plus the
    // canonical u8 mono writer: the direct chunk walk and the
    // AudioSystem chain must agree on EVERY field and EVERY sample
    val payloads = Seq(
      wavFixture(8000, 1, 1600, i => (i * 16).toShort),
      wavFixture(16000, 2, 320, _ => 1024.toShort, 512.toShort),
      synthWavU8(Array.tabulate(500)(i => (i % 251).toByte), 11025))
    payloads.foreach { p =>
      val fast = decodeRiffPcm(p).get
      val jdk = decodeAudioJdk(p).get
      fast.sampleRate shouldBe jdk.sampleRate
      fast.channels shouldBe jdk.channels
      fast.nSamples shouldBe jdk.nSamples
      fast.durationMs shouldBe jdk.durationMs
      fast.samples shouldBe jdk.samples
    }
    // a non-PCM format tag declines the fast path (format 3 = IEEE float)
    val f = payloads.head.clone()
    // fmt chunk body starts at 20 in the canonical layout; tag is u16 LE
    f(20) = 3
    decodeRiffPcm(f) shouldBe None
  }

  test("WAV fixture decodes END TO END: real rate, real samples, real downmix") {
    // 8 kHz mono, 1600 samples = 200 ms; sample i = i*16 (so s16 >> 8 = i/16)
    val wav = wavFixture(8000, 1, 1600, i => (i * 16).toShort)
    val clip = decodeAudio(wav).get
    clip.sampleRate shouldBe 8000
    clip.channels shouldBe 1
    clip.nSamples shouldBe 1600
    clip.durationMs shouldBe 200L
    clip.samples(256) shouldBe ((256 * 16) >> 8).toByte

    // stereo downmix: ch0 = 1024, ch1 = 1024 + 512 → mean 1280 → byte 5
    val st = decodeAudio(wavFixture(16000, 2, 320, _ => 1024.toShort, 512.toShort)).get
    st.channels shouldBe 2
    st.nSamples shouldBe 320
    st.durationMs shouldBe 20L
    all(st.samples.toSeq) shouldBe ((1024 + 1536) / 2 >> 8).toByte

    // frames routing: 1600 samples / 64-per-plane = 25 real windows
    val fs = frames(wav, "audio/wav").toSeq
    fs.length shouldBe 1600 / (PlaneW * PlaneH)
    fs.head.pixels(4) shouldBe ((4 * 16) >> 8).toByte
    // same bytes under a non-audio mime take the stride stub instead
    frames(wav, "application/octet-stream").length shouldBe frameCount(wav)
    // mime-routed single-frame decode agrees with the window iterator
    decodeFrame(wav, "audio/wav", 1).pixels shouldBe fs(1).pixels

    // non-WAV bytes under an audio mime fall back deterministically
    decodeAudio("RIFFxxxx not audio".getBytes("UTF-8")) shouldBe None
    frames("plain text".getBytes("UTF-8"), "audio/wav").length shouldBe
      frameCount("plain text".getBytes("UTF-8"))
  }

  test("AudioMeta expression: header-only audio metadata, NULL for non-audio") {
    val wav = wavFixture(22050, 2, 4410, i => (i % 100).toShort) // 200 ms stereo
    val rows = Seq((1L, wav), (2L, "just text bytes".getBytes("UTF-8")))
      .toDF("media_id", "payload")
      .select(col("media_id"), graft.functions.AudioMeta(col("payload")).as("meta"))
      .orderBy(col("media_id"))
      .collect()
    rows(0).getStruct(1).getInt(0) shouldBe 22050
    rows(0).getStruct(1).getInt(1) shouldBe 2
    rows(0).getStruct(1).getLong(2) shouldBe 200L
    rows(1).isNullAt(1) shouldBe true

    // and through mm_meta's coalesce: a real WAV reports REAL rate/duration
    val meta = Seq((1L, wav), (2L, "plain".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        graft.functions.AudioMeta(col("payload")).as("ameta"),
        octet_length(col("payload")).as("nb"))
      .select(col("doc_id"),
        coalesce(col("ameta.sample_rate").cast("long"),
          (col("nb") % 48000 + 8000).cast("long")).as("sample_rate"),
        coalesce(col("ameta.duration_ms"), (col("nb") % 60000).cast("long")).as("duration_ms"))
      .orderBy(col("doc_id")).collect()
    (meta(0).getLong(1), meta(0).getLong(2)) shouldBe ((22050L, 200L))
    (meta(1).getLong(1), meta(1).getLong(2)) shouldBe ((8005L, 5L)) // 5 bytes → fallback
  }

  test("MJPEG-AVI fixture decodes END TO END: container walk, real JPEG " +
       "frames, timing") {
    val levels = Seq(40, 120, 200)
    val avi = synthAviGray(levels, w = 64, h = 48, fps = 10)
    looksLikeAvi(avi) shouldBe true
    val clip = decodeVideo(avi).getOrElse(fail("synthesized AVI must decode"))
    clip.width shouldBe 64
    clip.height shouldBe 48
    clip.nFrames shouldBe 3
    clip.usPerFrame shouldBe 100000L
    clip.durationMs shouldBe 300L
    val fs = videoFrames(clip).toSeq
    fs.map(_.frame_idx) shouldBe Seq(0, 1, 2)
    all(fs.map(f => (f.width, f.height))) shouldBe ((64, 48))
    // uniform-gray frames survive the JPEG round-trip to within DC
    // quantization: mean luma within ±8 of the generator level
    fs.zip(levels).foreach { case (f, lvl) =>
      val mean = f.pixels.map(_ & 0xff).sum.toDouble / f.pixels.length
      math.abs(mean - lvl) should be <= 8.0
    }
    // mime routing reaches the real path; non-AVI bytes fall back
    val routed = frames(avi, "video/x-msvideo").toSeq
    routed.map(_.width) shouldBe Seq(64, 64, 64)
    looksLikeAvi("RIFFxxxxAVI x".getBytes) shouldBe false
    decodeVideo(Array.tabulate[Byte](300)(_.toByte)) shouldBe None
    // a corrupt frame BODY (SOI intact) is skipped, not fatal — and the
    // surviving frames keep their CONTAINER indices; the indexed decode
    // addresses by container position, never positionally over the
    // skipping iterator
    val avi2 = avi.clone()
    val (_, off1, len1) = clip.frameSpans(1)
    java.util.Arrays.fill(avi2, off1 + 2, off1 + len1, 0x00.toByte)
    val broken = decodeVideo(avi2).get
    videoFrames(broken).map(_.frame_idx).toSeq shouldBe Seq(0, 2)
    decodeFrame(avi2, "video/avi", 2).frame_idx shouldBe 2
    // a corrupted SOI drops the frame AT PARSE TIME — later frames must
    // still carry their container ordinals (spans record the ordinal,
    // not their position among the survivors), and nFrames/duration
    // still count the container
    val soiGone = avi.clone()
    soiGone(off1) = 0x00; soiGone(off1 + 1) = 0x00
    val parsed = decodeVideo(soiGone).get
    parsed.nFrames shouldBe 3
    parsed.durationMs shouldBe 300L
    videoFrames(parsed).map(_.frame_idx).toSeq shouldBe Seq(0, 2)
    decodeFrame(soiGone, "video/avi", 2).frame_idx shouldBe 2
    // a structurally-valid AVI carrying a non-JPEG codec (no SOI in its
    // frame chunks) is undecodable as a WHOLE -> stub fallback, the same
    // answer frames() and the indexed decode both give
    val nonMjpeg = avi.clone()
    clip.frameSpans.foreach { case (_, o, _) =>
      nonMjpeg(o) = 0x00; nonMjpeg(o + 1) = 0x00 }
    decodeVideo(nonMjpeg) shouldBe None
    frames(nonMjpeg, "video/avi").size shouldBe frameCount(nonMjpeg)
    // a chunk size with the top bit set (negative as Int) terminates the
    // walk instead of stalling or reversing it
    val hostile = avi.clone()
    val sizeOff = clip.frameSpans(0)._2 - 4 // the first 00dc's size field
    hostile(sizeOff) = 0xf8.toByte; hostile(sizeOff + 1) = 0xff.toByte
    hostile(sizeOff + 2) = 0xff.toByte; hostile(sizeOff + 3) = 0xff.toByte
    decodeVideo(hostile) shouldBe None // walk stopped, no frames found
    // LISTs nested ~payload/12 deep must not blow the stack: the walk is
    // iterative, so the hostile payload just yields None (no frames),
    // never a StackOverflowError that kills the scan task
    val depth = 60000
    val bb = java.nio.ByteBuffer.allocate(12 + depth * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(12 + depth * 12 - 8)
      .put("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      val remaining = (depth - i) * 12 - 8
      bb.put("LIST".getBytes("US-ASCII")).putInt(remaining)
        .put("deep".getBytes("US-ASCII"))
    }
    val nested = bb.array()
    looksLikeAvi(nested) shouldBe true
    decodeVideo(nested) shouldBe None
  }

  test("decode stub: frames window the payload at the declared stride") {
    // period-251 pattern: a 256-byte stride never repeats the same bytes
    val payload = Array.tabulate[Byte](600)(i => (i % 251).toByte)
    val f0 = decodeFrame(payload, 0)
    val f1 = decodeFrame(payload, 1)
    f0.pixels(0) shouldBe payload(0)
    f1.pixels(0) shouldBe payload(FrameStride)
    f0.pixels should not equal f1.pixels
  }

  test("synthPngGray round-trips lumas exactly through the real decode chain") {
    import graft.multimodal.MediaPipeline
    val vals = Array.tabulate(9 * 8)(i => (i * 37 + 11) % 256)
    val f = MediaPipeline.decodeImage(MediaPipeline.synthPngGray(vals, 9, 8)).get
    (f.width, f.height) shouldBe ((9, 8))
    // TYPE_INT_RGB + lossless PNG + r=g=b luma fold: exact integers back
    f.pixels.map(_ & 0xff).toSeq shouldBe vals.toSeq
  }

  test("dHash: invariant to identity, few bits under a small edit, resize path works") {
    import graft.multimodal.MediaPipeline
    def img(vals: Array[Int]) =
      MediaPipeline.decodeImage(MediaPipeline.synthPngGray(vals, 9, 8)).get
    val base = Array.tabulate(9 * 8)(i => (i * i * 7 + 31) % 256)
    val h0 = MediaPipeline.dHash(img(base))
    MediaPipeline.dHash(img(base.clone())) shouldBe h0
    // one corrupted pixel flips at most its two adjacent comparisons
    val edited = base.clone(); edited(2 * 9 + 4) = (base(2 * 9 + 4) + 128) % 256
    java.lang.Long.bitCount(h0 ^ MediaPipeline.dHash(img(edited))) should be <= 2
    // an upscaled copy of the same image hashes THROUGH the resize to the
    // same 9x8 grid: nearest-neighbor at 2x returns the original samples
    val big = Array.tabulate(18 * 16) { i =>
      val x = (i % 18) / 2; val y = (i / 18) / 2; base(y * 9 + x)
    }
    val bigF = MediaPipeline.decodeImage(MediaPipeline.synthPngGray(big, 18, 16)).get
    MediaPipeline.dHash(bigF) shouldBe h0
  }
}
