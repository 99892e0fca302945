package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** The reference's incrementally-maintained materialized view
  * (`github_stars_mv` → SummingMergeTree `github_stars`,
  * /root/reference/README.md:247-266) as Structured Streaming.
  *
  * ClickHouse semantics: each inserted block runs `SELECT repo_name,
  * count() WHERE event_type = 'WatchEvent' GROUP BY repo_name` and appends
  * partial counts; merges re-sum them later. Spark restatement (D3/T3):
  * the *same* partial-agg-then-fold contract is exactly update-mode
  * streaming aggregation — state holds the running sum, each trigger emits
  * updated rows. The filter sits before the shuffle, so only matching rows
  * ever reach aggregation state, and a watermark bounds that state for
  * event-time windows.
  *
  * Over the test star schema, `events` plays `github_events` with
  * `event_type = 'click'` standing in for `'WatchEvent'` and `user_id` for
  * `repo_name` (FIXTURES.md §B).
  */
object StarsMv {

  /** D3: the continuous MV — filter → groupBy → count, update mode. The
    * caller supplies any streaming source (file, rate, memory) with the
    * events schema and a sink via `writerFn`.
    */
  def stream(events: DataFrame,
             eventTypeCol: String = "event_type",
             matchValue: String = "click",
             keyCol: String = "user_id"): DataFrame =
    events
      .filter(col(eventTypeCol) === matchValue)   // P8 pre-agg predicate
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("stars"))             // A5 grouped count

  /** Convenience writer: update-mode with checkpoint — the exactly-once
    * state contract the MV needs (SURVEY.md §7.5.5).
    */
  def writer(mv: DataFrame, checkpointDir: String): DataStreamWriter[Row] =
    mv.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())

  /** D4: the one-shot batch backfill — `INSERT INTO github_stars SELECT
    * repo_name, countIf(event_type = 'WatchEvent') GROUP BY repo_name`
    * (README.md:263-266). Same plan shape as the stream; a streaming restart
    * from empty checkpoint over the full source must converge to this.
    */
  def backfill(events: DataFrame,
               eventTypeCol: String = "event_type",
               matchValue: String = "click",
               keyCol: String = "user_id"): DataFrame =
    events
      .groupBy(col(keyCol))
      .agg(count_if(col(eventTypeCol) === matchValue).as("stars")) // A6 countIf
      .filter(col("stars") > 0)

  /** The literal `github_stars_mv` (README.md:256-262): WatchEvents per
    * repo_name over the real `github_events` schema
    * ([[graft.schema.GhEventsSchema]]) — works over the batch table or a
    * `readStream` of it.
    */
  def githubStars(ghEvents: DataFrame): DataFrame =
    stream(ghEvents, "event_type", "WatchEvent", "repo_name")

  /** The literal backfill INSERT (README.md:263-266). */
  def githubStarsBackfill(ghEvents: DataFrame): DataFrame =
    backfill(ghEvents, "event_type", "WatchEvent", "repo_name")
}
