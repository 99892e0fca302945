package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming over the `events` shape (FIXTURES.md §B): the
  * windowed-aggregation and custom-state patterns a production pipeline
  * runs continuously, kept separate from the MV analog in [[StarsMv]].
  *
  * At scale these are the standard shapes: watermark bounds state so the
  * window store cannot grow without limit, and the groupBy(window, key)
  * shuffle is the only data movement — state lives partitioned by key in
  * the checkpoint store.
  */
object EventStreams {

  /** T3-style windowed rollup with a watermark: tumbling event-time window
    * per event_type. Late rows beyond the watermark are dropped —
    * exactly-once counts for on-time data (append mode emits only
    * finalized windows).
    */
  def windowedCounts(events: DataFrame,
                     window_ : String = "10 minutes",
                     watermark: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exactly-once dedup: watermarked `dropDuplicates` on the
    * event key — the streaming counterpart of the ReplacingMergeTree
    * ingest-dedup contract (T2). The watermark bounds the key-state store:
    * a duplicate arriving within the watermark is dropped; state for keys
    * older than the watermark is evicted, so memory is ∝ keys-per-watermark
    * window, never ∝ stream history.
    */
  def dedupStream(events: DataFrame,
                  watermark: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionAgg(user_id: Long, n_events: Int,
                              first_ts: Timestamp, last_ts: Timestamp,
                              closed: Boolean)
  // public: the GroupState encoder's generated code constructs it reflectively
  final case class SessionState(n: Int, first: Long, last: Long)

  /** Custom sessionization with [[GroupState]]: a user's session closes
    * after `gapMs` of processing-time silence, emitting one summary row —
    * the flatMapGroupsWithState shape for state machines that windowed
    * aggregation cannot express (counts + first/last + explicit close).
    */
  def sessionize(spark: SparkSession, events: Dataset[Ev],
                 gapMs: Long = 30 * 60 * 1000): Dataset[SessionAgg] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionAgg(userId, s.n, new Timestamp(s.first), new Timestamp(s.last), closed = true))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0, Long.MaxValue, Long.MinValue))
            val next = SessionState(
              prev.n + batch.size,
              math.min(prev.first, batch.map(_.ts.getTime).min),
              math.max(prev.last, batch.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Iterator.empty
          }
      }
  }

  /** Stream-stream event-time interval join — the attribution shape: each
    * `click` joins the same user's `view`s from the preceding `horizon`.
    *
    * Both inputs carry watermarks and the join condition bounds event time
    * on BOTH ends, which is what lets Spark evict join state: a buffered
    * view row is dropped once the click watermark passes `v_ts + horizon`,
    * so state is ∝ events-per-horizon-window per user, never stream
    * history. Without the interval bound the view buffer would grow
    * forever — the stream-stream analog of the partitionless-window
    * hazard. Inner join: unmatched clicks simply never emit (left-outer
    * would emit nulls only at watermark close).
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      horizon: String = "60 minutes",
                      watermark: String = "30 minutes"): DataFrame =
    attributionShape(views, clicks, horizon, Some(watermark))

  /** Batch oracle for [[attributionJoin]]: the SAME builder with the
    * watermarks skipped — a finished stream must produce exactly this row
    * set, and sharing one shape makes condition/column drift between the
    * stream and its oracle structurally impossible.
    */
  def attributionJoinBatch(views: DataFrame, clicks: DataFrame,
                           horizon: String = "60 minutes"): DataFrame =
    attributionShape(views, clicks, horizon, watermark = None)

  private def attributionShape(views: DataFrame, clicks: DataFrame,
                               horizon: String,
                               watermark: Option[String]): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val v = wm(views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("view_id")), "v_ts")
    val c = wm(clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id")), "c_ts")
    c.join(v, expr(
        s"""c_user = v_user AND
           |v_ts <= c_ts AND v_ts >= c_ts - INTERVAL $horizon""".stripMargin))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Batch oracle for [[windowedCounts]]: same plan without the stream —
    * a finished stream over a static source must equal this.
    */
  def windowedCountsBatch(events: DataFrame, window_ : String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
}
