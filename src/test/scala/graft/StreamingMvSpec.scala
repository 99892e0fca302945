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
