package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal joins ClickHouse ships natively but Spark's SQL surface lacks —
  * re-expressed as compositions of built-ins (the SURVEY §7.4 preference:
  * compose before customizing), each with an exact DuckDB oracle:
  *
  *   - ASOF join: for each purchase event, the latest click by the same
  *     user at-or-before it. Implemented as the union-and-carry-forward
  *     pattern: tag both streams, sort per key by time, and carry the last
  *     click time forward with `last(_, ignoreNulls)` over an unbounded-
  *     preceding frame. ONE shuffle on the join key — the same movement an
  *     equi-join would make; no per-row probing, no range explosion.
  *   - Range (interval) join: count clicks within 10 minutes after each
  *     purchase. Implemented with time bucketing: both sides get a
  *     10-minute bucket id, the join runs on user + bucket ∈ {b, b+1}
  *     (every ≤10-minute successor lies in the same or next bucket), and
  *     the exact predicate filters inside. Candidate pairs stay ∝ events
  *     per 2-bucket window instead of the full per-user cross product.
  */
object TemporalJoins extends QueryModule {

  private val RangeSec = 600 // 10 minutes

  override def queries: Map[String, Q] = Map(
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("is_click"), lit(null).cast("long").as("event_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("is_click"), col("event_id"))
      // clicks sort before a same-timestamp purchase (is_click desc) so an
      // equal-time click is visible to it — matching ASOF JOIN's `>=`
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("is_click").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(buys)
        .withColumn("last_click_ts",
          last(when(col("is_click") === 1, col("ts")), ignoreNulls = true).over(w))
        .filter(col("is_click") === 0)
        .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
          col("last_click_ts"))
        .orderBy(col("event_id"))
    }),

    "join_range" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("b_ts"),
          (unix_timestamp(col("ts")) / RangeSec).cast("long").as("bk"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          explode(array(
            (unix_timestamp(col("ts")) / RangeSec).cast("long"),
            (unix_timestamp(col("ts")) / RangeSec).cast("long") - 1)).as("bk"))
      buys.join(clicks, Seq("user_id", "bk"), "left_outer")
        // exact predicate on full-precision timestamps (the oracle compares
        // c.ts <= b.ts + INTERVAL; a second-truncated unix_timestamp diff
        // would admit sub-second gaps up to RangeSec+0.99s). The bucket ids
        // above may be second-truncated — floor is monotone, so every true
        // match still lands in bucket bk or bk+1 — but the final filter must
        // not be.
        .withColumn("hit",
          col("c_ts").isNotNull &&
          col("c_ts") > col("b_ts") &&
          col("c_ts") <= col("b_ts") + expr(s"INTERVAL $RangeSec SECONDS"))
        .groupBy(col("event_id"), col("user_id"), col("b_ts"))
        .agg(sum(when(col("hit"), 1).otherwise(0)).as("n_clicks_10m"))
        .select(col("event_id"), col("user_id"), col("n_clicks_10m"))
        .orderBy(col("event_id"))
    }),
  )

  override def oracleSql: Map[String, String] = Map(
    "join_asof" ->
      """SELECT b.event_id AS event_id, b.user_id AS user_id,
        | b.ts AS purchase_ts, c.ts AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') b
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON b.user_id = c.user_id AND b.ts >= c.ts
        |ORDER BY b.event_id""".stripMargin,

    "join_range" ->
      """SELECT b.event_id, b.user_id,
        | count(c.ts) AS n_clicks_10m
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') b
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON b.user_id = c.user_id
        | AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 600 SECONDS
        |GROUP BY b.event_id, b.user_id ORDER BY b.event_id""".stripMargin,
  )
}
