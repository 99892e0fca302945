package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

/** Event-time streaming: watermarked window aggregation converging to its
  * batch oracle, late-data drop past the watermark, and
  * flatMapGroupsWithState sessionization.
  */
class EventStreamsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked windowed counts over a finished stream equal the batch plan") {
    val srcDir = tmpDir("ws-src")
    val rows = Seq(
      (1L, ts("2024-01-01 10:01:00"), "click", 1.0),
      (2L, ts("2024-01-01 10:04:00"), "click", 2.0),
      (3L, ts("2024-01-01 10:11:00"), "view", 3.0),
      (4L, ts("2024-01-01 10:59:00"), "click", 4.0),
      (5L, ts("2024-01-01 11:30:00"), "view", 5.0)) // advances watermark past all windows
    rows.toDF("user_id", "ts", "event_type", "value")
      .write.mode("append").parquet(srcDir)

    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(srcDir)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_counts")
      .option("checkpointLocation", tmpDir("ws-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("w_start", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    val streamed = canon(spark.table("win_counts"))
    val batch = canon(EventStreams.windowedCountsBatch(
      rows.toDF("user_id", "ts", "event_type", "value")))
    // append mode only emits windows finalized by the watermark — every
    // emitted window must match the batch oracle exactly
    streamed.toSet.subsetOf(batch.toSet) shouldBe true
    streamed.length should be >= 2 // the 10:00 and 10:10 windows closed
  }

  test("late rows beyond the watermark are dropped from closed windows") {
    val srcDir = tmpDir("late-src")
    val ckpt = tmpDir("late-ckpt")
    val outDir = tmpDir("late-out")
    // parquet sink: append-mode + checkpoint resume across restarts (the
    // memory sink refuses checkpoint recovery)
    def run(): Seq[(String, String, Long)] = {
      val q = EventStreams.windowedCounts(
          spark.readStream
            .schema("user_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
            .parquet(srcDir),
          window_ = "10 minutes", watermark = "5 minutes")
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq
    }
    Seq((1L, ts("2024-01-01 10:01:00"), "click", 1.0),
        (2L, ts("2024-01-01 10:30:00"), "click", 1.0)) // watermark → 10:25
      .toDF("user_id", "ts", "event_type", "value").write.mode("append").parquet(srcDir)
    val first = run()
    first.count(_._1 == "2024-01-01 10:00:00.0") shouldBe 1

    // a VERY late row for the already-closed 10:00 window + a future row
    Seq((3L, ts("2024-01-01 10:02:00"), "click", 1.0),
        (4L, ts("2024-01-01 11:00:00"), "click", 1.0))
      .toDF("user_id", "ts", "event_type", "value").write.mode("append").parquet(srcDir)
    val second = run()
    // the late 10:02 row must NOT re-emit or grow the closed 10:00 window
    second.count(_._1 == "2024-01-01 10:00:00.0") shouldBe 1
    second.filter(_._1 == "2024-01-01 10:00:00.0").head._3 shouldBe 1L
  }

  test("streaming dedup: duplicates within the watermark emit once, state is bounded") {
    val srcDir = tmpDir("dd-src")
    val ckpt = tmpDir("dd-ckpt")
    val outDir = tmpDir("dd-out")
    def run(): Map[Long, Long] = {
      val q = EventStreams.dedupStream(
          spark.readStream
            .schema("event_id LONG, ts TIMESTAMP, event_type STRING")
            .parquet(srcDir))
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .groupBy(_.getAs[Long]("event_id")).map { case (k, v) => k -> v.length.toLong }
    }
    // batch 1: id 10 arrives twice (same second), id 11 once
    Seq((10L, ts("2024-01-01 10:00:00"), "click"),
        (10L, ts("2024-01-01 10:00:00"), "click"),
        (11L, ts("2024-01-01 10:01:00"), "view"))
      .toDF("event_id", "ts", "event_type").write.mode("append").parquet(srcDir)
    run() shouldBe Map(10L -> 1L, 11L -> 1L)
    // batch 2: replay of id 10 within the watermark + a fresh id — the
    // replay is dropped by the persisted dedup state across the restart
    Seq((10L, ts("2024-01-01 10:02:00"), "click"),
        (12L, ts("2024-01-01 10:03:00"), "click"))
      .toDF("event_id", "ts", "event_type").write.mode("append").parquet(srcDir)
    run() shouldBe Map(10L -> 1L, 11L -> 1L, 12L -> 1L)
  }

  test("flatMapGroupsWithState sessionization: one summary per user after timeout") {
    val srcDir = tmpDir("sess-src")
    Seq(Ev(1L, ts("2024-01-01 10:00:00"), "click"),
        Ev(1L, ts("2024-01-01 10:03:00"), "view"),
        Ev(2L, ts("2024-01-01 10:05:00"), "click"))
      .toDF().write.mode("append").parquet(srcDir)

    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, event_type STRING")
      .parquet(srcDir).as[Ev]
    // tiny gap so sessions time out between microbatches
    val sessions = EventStreams.sessionize(spark, stream, gapMs = 1)
    val q = sessions.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions")
      .option("checkpointLocation", tmpDir("sess-ckpt"))
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      // wait until both users' sessions closed
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("sessions").count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
    } finally q.stop()

    val out = spark.table("sessions").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("n_events")).toMap
    out shouldBe Map(1L -> 2, 2L -> 1)
    all(spark.table("sessions").collect().map(_.getAs[Boolean]("closed"))) shouldBe true
  }

  test("stream-stream interval join equals its batch oracle on a finished stream") {
    val viewDir = tmpDir("attr-views")
    val clickDir = tmpDir("attr-clicks")
    val views = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100L), // within horizon of clicks 201 and 202
      (10L, ts("2024-01-01 10:20:00"), 101L), // within horizon of click 202 only
      (11L, ts("2024-01-01 09:00:00"), 102L), // 90 min before click 203 — outside horizon
      (12L, ts("2024-01-01 10:05:00"), 103L)) // user never clicks
    val clicks = Seq(
      (10L, ts("2024-01-01 10:10:00"), 201L), // attributes to view 100
      (10L, ts("2024-01-01 10:45:00"), 202L), // attributes to views 100 AND 101
      (11L, ts("2024-01-01 10:30:00"), 203L), // no view in horizon
      (13L, ts("2024-01-01 12:30:00"), 204L)) // advances both watermarks
    views.toDF("user_id", "ts", "event_id").write.mode("append").parquet(viewDir)
    clicks.toDF("user_id", "ts", "event_id").write.mode("append").parquet(clickDir)

    val schema = "user_id LONG, ts TIMESTAMP, event_id LONG"
    val joined = EventStreams.attributionJoin(
      spark.readStream.schema(schema).parquet(viewDir),
      spark.readStream.schema(schema).parquet(clickDir))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr")
      .option("checkpointLocation", tmpDir("attr-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
    val streamed = canon(spark.table("attr"))
    val batch = canon(EventStreams.attributionJoinBatch(
      views.toDF("user_id", "ts", "event_id"),
      clicks.toDF("user_id", "ts", "event_id")))
    batch shouldBe Set((10L, 201L, 100L), (10L, 202L, 100L), (10L, 202L, 101L))
    streamed shouldBe batch
  }
}
