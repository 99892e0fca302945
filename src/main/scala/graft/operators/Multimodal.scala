package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, the layout a 100 TB image/audio/video pipeline uses (payload
  * bytes in Parquet binary columns, decode on executors, only features
  * shuffled).
  *
  * Image payloads decode for REAL (`javax.imageio`, see
  * [[graft.multimodal.MediaPipeline.decodeImage]] and the header-only
  * [[graft.functions.ImageDims]] expression); audio/video still go through
  * the clearly-marked deterministic stub. What is oracle-verified here is
  * the Spark-side plumbing: binary encode, per-payload metadata extraction
  * (byte length, digest, dimensions), and frame-offset sampling (one
  * output row per fixed-stride chunk of the payload — the shape of video
  * frame extraction).
  */
object Multimodal extends QueryModule {

  private val FrameStride = 256

  override def queries: Map[String, Q] = Map(
    // Payload metadata: every column derived from the binary payload alone.
    // width/height come from the REAL image header decode when the payload
    // is a decodable image, else the deterministic byte-derived fallback —
    // the testdata payloads are text bytes (never decodable), so the DuckDB
    // oracle replays the fallback exactly, while MultimodalSpec pins the
    // real branch with a generated PNG fixture of known dimensions.
    "mm_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text"))
        .select(
          col("doc_id"),
          col("payload"),
          graft.functions.ImageDims(col("payload")).as("dims"),
          graft.functions.AudioMeta(col("payload")).as("ameta"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("text")).as("digest"))
        .select(
          col("doc_id"),
          col("n_bytes"),
          col("digest"),
          coalesce(col("dims.width").cast("long"),
            (octet_length(col("payload")) % 640 + 1).cast("long")).as("width"),
          coalesce(col("dims.height").cast("long"),
            (octet_length(col("payload")) % 480 + 1).cast("long")).as("height"),
          coalesce(col("ameta.sample_rate").cast("long"),
            (octet_length(col("payload")) % 48000 + 8000).cast("long")).as("sample_rate"),
          coalesce(col("ameta.duration_ms"),
            (octet_length(col("payload")) % 60000).cast("long")).as("duration_ms"))
        .orderBy(col("doc_id"))),

    // Frame sampling: one row per FrameStride-byte chunk — posexplode over a
    // sequence, the narrow (shuffle-free) explode pattern used for video
    // frame / audio window extraction.
    "mm_frame_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("nb"))
        .select(col("doc_id"),
          explode(sequence(lit(0), (col("nb") / FrameStride).cast("int"))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          (col("frame_idx") * FrameStride).cast("long").as("byte_offset"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // REAL audio decode, end-to-end, oracled: each doc gets a
    // deterministic PCM-U8 WAV payload (synthesized executor-side),
    // decoded through the SAME javax.sound chain as user audio, windowed
    // into 64-sample frames, and reduced to per-frame energy Σs² — exact
    // integer arithmetic, so the DuckDB oracle recomputes the expected
    // energies from the generator formula WITHOUT any audio stack:
    // equality proves the WAV header write, RIFF gate, decode, unsigned→
    // signed mapping, windowing, and tail zero-padding all at once. The
    // decode runs in mapPartitions on executors; only (doc_id, frame,
    // energy) scalars ever shuffle — the 100 TB media-pipeline shape.
    "mm_audio_energy" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            // 250 + k·64 samples: NOT frame-aligned, so the last window
            // exercises the zero-pad path (pads contribute 0 energy)
            val n = 250 + (id % 4).toInt * 64
            val u = Array.tabulate[Byte](n)(i => ((id * 31 + i * 7) % 256).toByte)
            val clip = graft.multimodal.MediaPipeline
              .decodeAudio(graft.multimodal.MediaPipeline.synthWavU8(u))
              .getOrElse(throw new IllegalStateException(
                s"doc $id: synthesized WAV failed to decode"))
            graft.multimodal.MediaPipeline.audioFrames(clip).map { f =>
              var e = 0L
              f.pixels.foreach(b => e += b.toInt * b.toInt)
              (id, f.frame_idx.toLong, e)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "energy")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // REAL video decode, oracled end to end (the mm_audio_energy pattern
    // for the third media family): deterministic uniform-gray MJPEG-AVIs
    // are synthesized executor-side — the JDK's own JPEG encoder + the
    // canonical RIFF/AVI writer — then run through the ACTUAL decode
    // chain (structural gate → container walk → per-frame imageio JPEG
    // decode → BT.601 luma plane). Geometry, frame count, and timing are
    // EXACT; mean luma carries an in-plan ±8 contract (JPEG DC
    // quantization — the agg_approx pattern), which the oracle restates
    // as TRUE from the generator formula. A 1-in-7 doc sample keeps the
    // encode+decode cost proportional but bounded at bench SFs.
    "mm_video_frames" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(7)) === 0).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            val nF = (1 + id % 3).toInt
            val levels = (0 until nF).map(f => ((id * 37 + f * 11) % 240 + 8).toInt)
            val avi = graft.multimodal.MediaPipeline
              .synthAviGray(levels, w = 32, h = 24, fps = 10)
            val clip = graft.multimodal.MediaPipeline.decodeVideo(avi)
              .getOrElse(throw new IllegalStateException(
                s"doc $id: synthesized AVI failed to decode"))
            graft.multimodal.MediaPipeline.videoFrames(clip).map { fr =>
              val mean = fr.pixels.map(_ & 0xff).sum.toDouble / fr.pixels.length
              (id, fr.frame_idx.toLong, fr.width.toLong, fr.height.toLong,
                math.abs(mean - levels(fr.frame_idx)) <= 8.0,
                clip.nFrames.toLong, clip.durationMs)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "w", "h", "luma_ok", "n_frames",
          "duration_ms")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),
  )

  override def oracleSql: Map[String, String] = Map(
    // width/height/sample_rate/duration_ms: DuckDB cannot decode media, but
    // it doesn't need to — text payloads never decode as images OR WAV, so
    // both engines take the byte-derived fallback branches here; the
    // real-decode branches are spec-pinned instead (MultimodalSpec's PNG
    // and WAV fixtures)
    "mm_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        | CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS height,
        | CAST(octet_length(encode(text)) % 48000 + 8000 AS BIGINT) AS sample_rate,
        | CAST(octet_length(encode(text)) % 60000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id, CAST(u.f AS BIGINT) AS frame_idx,
        | CAST(u.f * 256 AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        | UNNEST(generate_series(0, nb // 256)) AS u(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // the generator formula replayed in SQL: decoded sample =
    // (id·31 + i·7) mod 256 − 128 (PCM-U8 → signed), energy = Σ s² over
    // each 64-sample window, the partial tail summing only real samples
    "mm_audio_energy" ->
      """WITH p AS (SELECT doc_id, 250 + (doc_id % 4) * 64 AS n
        |           FROM documents),
        |f AS (SELECT doc_id, n,
        |        unnest(generate_series(0, (n + 63) // 64 - 1)) AS frame_idx
        |      FROM p),
        |s AS (SELECT doc_id, frame_idx,
        |        unnest(generate_series(frame_idx * 64,
        |          least(frame_idx * 64 + 63, n - 1))) AS i
        |      FROM f)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(sum(((doc_id * 31 + i * 7) % 256 - 128)
        |         * ((doc_id * 31 + i * 7) % 256 - 128)) AS BIGINT) AS energy
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the generator replayed: geometry/count/timing exact, the luma
    // contract a literal TRUE (equality proves the writer, the gate, the
    // container walk, every frame's JPEG decode, and the timing math)
    "mm_video_frames" ->
      """WITH p AS (SELECT doc_id, 1 + (doc_id % 3) AS nf
        |           FROM documents WHERE doc_id % 7 = 0),
        |f AS (SELECT doc_id, nf,
        |        unnest(generate_series(0, nf - 1)) AS frame_idx
        |      FROM p)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(32 AS BIGINT) AS w, CAST(24 AS BIGINT) AS h,
        |  TRUE AS luma_ok, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(nf * 100 AS BIGINT) AS duration_ms
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
