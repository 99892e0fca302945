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

  test("decode stub: frames window the payload at the declared stride") {
    // period-251 pattern: a 256-byte stride never repeats the same bytes
    val payload = Array.tabulate[Byte](600)(i => (i % 251).toByte)
    val f0 = decodeFrame(payload, 0)
    val f1 = decodeFrame(payload, 1)
    f0.pixels(0) shouldBe payload(0)
    f1.pixels(0) shouldBe payload(FrameStride)
    f0.pixels should not equal f1.pixels
  }
}
