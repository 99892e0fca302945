package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads + typed
  * metadata, the layout a 100 TB image/audio/video pipeline uses (payload
  * bytes in Parquet binary columns, decode on executors, only features
  * shuffled).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub (documented in
  * [[graft.multimodal.MediaPipeline]]); what is REAL and oracle-verified
  * here is the Spark-side plumbing: binary encode, per-payload metadata
  * extraction (byte length, digest, derived dimensions), and frame-offset
  * sampling (one output row per fixed-stride chunk of the payload — the
  * shape of video frame extraction).
  */
object Multimodal extends QueryModule {

  private val FrameStride = 256

  override def queries: Map[String, Q] = Map(
    // Payload metadata: every column derived from the binary payload alone.
    "mm_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("text"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("text")).as("digest"),
          (octet_length(col("payload")) % 640 + 1).cast("long").as("fake_width"),
          (octet_length(col("payload")) % 480 + 1).cast("long").as("fake_height"))
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
  )

  override def oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS fake_width,
        | CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id, CAST(u.f AS BIGINT) AS frame_idx,
        | CAST(u.f * 256 AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        | UNNEST(generate_series(0, nb // 256)) AS u(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
