package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.StarsMv

/** The incrementally-maintained MV (SURVEY.md §2.11 T3, D3/D4): a streaming
  * aggregation over an event log converges to its batch backfill, and keeps
  * converging as new blocks arrive — the github_stars_mv contract
  * (/root/reference/README.md:247-266).
  */
class StreamingMvSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, String)]) =
    rows.toDF("user_id", "event_type")

  test("streaming MV over a file source converges to the batch backfill") {
    val srcDir = tmpDir("mv-src")
    val ckpt = tmpDir("mv-ckpt")
    eventsDf(Seq((1L, "click"), (1L, "click"), (2L, "view"), (3L, "click")))
      .write.mode("append").parquet(srcDir)

    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING")
      .parquet(srcDir)
    val q = StarsMv.stream(stream)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("stars_mv")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val mv = spark.table("stars_mv").orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val backfill = StarsMv.backfill(eventsDf(Seq((1L, "click"), (1L, "click"), (2L, "view"), (3L, "click"))))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    mv shouldBe backfill
    mv shouldBe Array((1L, 2L), (3L, 1L))

    // a new block arrives: restart from checkpoint picks up only the delta
    eventsDf(Seq((1L, "click"), (2L, "click"))).write.mode("append").parquet(srcDir)
    val q2 = StarsMv.stream(
        spark.readStream.schema("user_id LONG, event_type STRING").parquet(srcDir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("stars_mv2")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val mv2 = spark.table("stars_mv2").orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    mv2 shouldBe Array((1L, 3L), (2L, 1L), (3L, 1L))
  }

  test("mid-stream crash + checkpoint restart converges exactly to the backfill (T3)") {
    // the exactly-once contract under FAILURE, not just clean runs: the MV
    // sink dies partway through the file source (an injected crash in batch
    // 1 of 4 — the foreachBatch analog of a dying driver), and a restart
    // from the same checkpoint must replay the failed epoch idempotently
    // and land on exactly backfill() over the full source.
    val srcDir = tmpDir("mv-crash-src")
    val ckpt = tmpDir("mv-crash-ckpt")
    val outDir = tmpDir("mv-crash-out")
    val blocks = Seq(
      Seq((1L, "click"), (2L, "view")),
      Seq((1L, "click"), (3L, "click")),
      Seq((2L, "click")),
      Seq((3L, "click"), (1L, "view")))
    blocks.foreach(b => eventsDf(b).coalesce(1).write.mode("append").parquet(srcDir))

    def run(crashAtBatch: Option[Long]) = {
      val stream = spark.readStream
        .schema("user_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1") // one source file per epoch
        .parquet(srcDir)
      StarsMv.stream(stream).writeStream
        .outputMode(OutputMode.Complete())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          if (crashAtBatch.contains(id)) sys.error(s"injected crash at batch $id")
          // Complete-mode overwrite = the MV table commit; idempotent when
          // the restarted query replays the same epoch
          batch.write.mode("overwrite").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    val dying = run(crashAtBatch = Some(1L))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      dying.awaitTermination()
    }
    // the crash was genuinely mid-stream: only batch 0's partial MV landed
    val partial = spark.read.parquet(outDir).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    partial shouldBe Array((1L, 1L)) // block 0 alone: one click by user 1

    val resumed = run(crashAtBatch = None)
    resumed.awaitTermination(120000)
    val got = spark.read.parquet(outDir).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = StarsMv.backfill(eventsDf(blocks.flatten))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe expected
    got shouldBe Array((1L, 2L), (2L, 1L), (3L, 2L))
  }

  test("backfill equals the MV query shape on the real events table (D4)") {
    val ev = Tables.events(spark, sf0001)
    val viaMv = StarsMv.stream(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val viaBackfill = StarsMv.backfill(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    viaMv shouldBe viaBackfill
    viaMv.length should be > 0
  }
}
