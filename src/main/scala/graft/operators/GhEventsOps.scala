package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.schema.GhEventsSchema
import graft.sources.TsvIngest
import graft.streaming.StarsMv

/** Queries over the full `github_events` schema
  * (/root/reference/create_db.py:67-128), oracle-checked end to end.
  *
  * The driver's DuckDB oracle can only see the testdata Parquet, so these
  * queries materialize github_events as a DETERMINISTIC adapter view over
  * the `events` table: each synthetic event maps to one GH event row with
  * all 54 declared columns populated (mapped where meaningful, typed
  * defaults elsewhere), routed through the same
  * [[graft.sources.TsvIngest.normalizeNamed]] validation the real JSONL
  * ingest uses — so every query here exercises the declared schema's Enum8
  * checks, Array columns, and second-truncated DateTimes, and the oracle
  * mirrors the mapping inline. The fixture-file ingest/MV/compact path for
  * the same schema is covered by GhEventsSpec.
  *
  * Mapping (mirrored verbatim in each oracle):
  *   click→WatchEvent  view→PushEvent  purchase→PullRequestEvent
  *   signup→CreateEvent  error→IssuesEvent
  *   repo_name = 'org'||user_id%10||'/repo'||user_id
  *   labels    = ['l'||event_id%7, 'l'||event_id%3]
  */
object GhEventsOps extends QueryModule {

  /** The adapter view: events → full 54-column github_events. */
  def fromEvents(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val sec = date_trunc("second", col("ts"))
    val mapped: Map[String, Column] = Map(
      "file_time" -> sec,
      "event_type" -> when(col("event_type") === "click", "WatchEvent")
        .when(col("event_type") === "view", "PushEvent")
        .when(col("event_type") === "purchase", "PullRequestEvent")
        .when(col("event_type") === "signup", "CreateEvent")
        .when(col("event_type") === "error", "IssuesEvent")
        .otherwise("Event"),
      "actor_login" -> concat(lit("user"), col("user_id").cast("string")),
      "repo_name" -> concat(lit("org"), (col("user_id") % 10).cast("string"),
        lit("/repo"), col("user_id").cast("string")),
      "created_at" -> sec,
      "updated_at" -> sec,
      "action" -> when(col("event_type") === "click", "started")
        .when(col("event_type") === "purchase", "opened")
        .otherwise("none"),
      "comment_id" -> col("event_id"),
      "number" -> (col("event_id") % 1000),
      "title" -> col("props"),
      "labels" -> array(
        concat(lit("l"), (col("event_id") % 7).cast("string")),
        concat(lit("l"), (col("event_id") % 3).cast("string"))))
    val cols = GhEventsSchema.columns.map(c =>
      TsvIngest.normalizeNamed(mapped.getOrElse(c.name, TsvIngest.chDefault(c)), c))
    ev.select(cols: _*)
  }

  override def queries: Map[String, Q] = Map(
    // The github_stars MV shape (README.md:256-262) over the real schema:
    // WatchEvent pre-filter → groupBy repo_name → count. Same plan whether
    // batch or streaming (StarsMv.githubStars is the shared definition).
    "gh_stars_rollup" -> ((s, d) =>
      StarsMv.githubStars(fromEvents(s, d))
        .orderBy(col("repo_name"))),

    // Array(LowCardinality(String)) column exercised: explode labels,
    // count per label — the first consumer of ChArray end to end.
    "gh_labels_explode" -> ((s, d) =>
      fromEvents(s, d)
        .select(explode(col("labels")).as("label"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"))),

    // Array predicate + sort-key-prefix filter: PRs carrying label 'l1',
    // per repo. event_type is the leading sort key, so at rest this scan
    // prunes row groups the way ClickHouse's primary index would.
    "gh_pr_by_label" -> ((s, d) =>
      fromEvents(s, d)
        .filter(col("event_type") === "PullRequestEvent" &&
          array_contains(col("labels"), "l1"))
        .groupBy(col("repo_name"))
        .agg(count(lit(1)).as("n_prs"))
        .orderBy(col("repo_name"))),

    // The heavy wide-table shape: daily top-5 repos by stars, joined back
    // against the same table's PR stream for label co-occurrence. Two
    // aggregations over the full 54-column view + a per-day window (bounded
    // partitions — never global) + a join whose build side is days×5 rows,
    // so AQE broadcasts it and the big PR side never shuffles for the join.
    "gh_daily_top_labels" -> ((s, d) => {
      val gh = fromEvents(s, d)
      val stars = gh.filter(col("event_type") === "WatchEvent")
        .groupBy(date_format(col("created_at"), "yyyy-MM-dd").as("day"),
          col("repo_name"))
        .agg(count(lit(1)).as("stars"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day")).orderBy(col("stars").desc, col("repo_name"))
      val top = stars.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
      val prs = gh.filter(col("event_type") === "PullRequestEvent")
        .select(date_format(col("created_at"), "yyyy-MM-dd").as("day"),
          col("repo_name"),
          concat(col("labels")(0), lit(":"), col("labels")(1)).as("pair"))
      top.join(prs, Seq("day", "repo_name"), "left")
        .groupBy(col("day"), col("repo_name"), col("stars"), col("rnk"))
        .agg(count(col("pair")).as("n_prs"),
          count_distinct(col("pair")).as("n_label_pairs"))
        .orderBy(col("day"), col("rnk"))
    }),

    // Stars velocity: week-over-week star delta per repo, top movers
    // first — the trending-repos query every GitHub-analytics dashboard
    // runs. Scale shape: the weekly pre-aggregate collapses the event
    // stream before any window (the lag partitions carry one row per
    // repo-week, never raw events), and the ranked output is a top-k
    // (TakeOrderedAndProject), not a global sort.
    "gh_star_velocity" -> ((s, d) => {
      val gh = fromEvents(s, d)
      val weekly = gh.filter(col("event_type") === "WatchEvent")
        .groupBy(
          date_format(date_trunc("week", col("created_at")), "yyyy-MM-dd")
            .as("week"),
          col("repo_name"))
        .agg(count(lit(1)).as("stars"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("repo_name")).orderBy(col("week"))
      weekly
        .withColumn("prev", lag(col("stars"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("week"), col("repo_name"), col("stars"),
          (col("stars") - col("prev")).as("delta"))
        .orderBy(col("delta").desc, col("week"), col("repo_name"))
        .limit(25)
    }),
  )

  private val repoExpr =
    "concat('org', CAST(user_id % 10 AS VARCHAR), '/repo', CAST(user_id AS VARCHAR))"
  private val labelsExpr =
    "['l' || CAST(event_id % 7 AS VARCHAR), 'l' || CAST(event_id % 3 AS VARCHAR)]"

  override def oracleSql: Map[String, String] = Map(
    "gh_stars_rollup" ->
      s"""SELECT $repoExpr AS repo_name, count(*) AS stars
         |FROM events WHERE event_type = 'click'
         |GROUP BY 1 ORDER BY repo_name""".stripMargin,

    "gh_labels_explode" ->
      s"""SELECT label, count(*) AS n FROM (
         |  SELECT unnest($labelsExpr) AS label FROM events)
         |GROUP BY label ORDER BY label""".stripMargin,

    "gh_pr_by_label" ->
      s"""SELECT $repoExpr AS repo_name, count(*) AS n_prs
         |FROM events
         |WHERE event_type = 'purchase' AND list_contains($labelsExpr, 'l1')
         |GROUP BY 1 ORDER BY repo_name""".stripMargin,

    "gh_daily_top_labels" ->
      s"""WITH gh AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         |    $repoExpr AS repo_name,
         |    'l' || CAST(event_id % 7 AS VARCHAR) || ':' ||
         |    'l' || CAST(event_id % 3 AS VARCHAR) AS pair
         |  FROM events),
         |stars AS (
         |  SELECT day, repo_name, count(*) AS stars FROM gh
         |  WHERE event_type = 'click' GROUP BY 1, 2),
         |top AS (
         |  SELECT * FROM (
         |    SELECT day, repo_name, stars, row_number() OVER (
         |      PARTITION BY day ORDER BY stars DESC, repo_name) AS rnk
         |    FROM stars) WHERE rnk <= 5),
         |prs AS (
         |  SELECT day, repo_name, pair FROM gh WHERE event_type = 'purchase')
         |SELECT t.day, t.repo_name, t.stars, t.rnk,
         |  count(p.pair) AS n_prs, count(DISTINCT p.pair) AS n_label_pairs
         |FROM top t LEFT JOIN prs p
         |  ON p.day = t.day AND p.repo_name = t.repo_name
         |GROUP BY t.day, t.repo_name, t.stars, t.rnk
         |ORDER BY t.day, t.rnk""".stripMargin,

    "gh_star_velocity" ->
      s"""WITH weekly AS (
         |  SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
         |    $repoExpr AS repo_name, count(*) AS stars
         |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         |lagged AS (
         |  SELECT week, repo_name, stars,
         |    lag(stars) OVER (PARTITION BY repo_name ORDER BY week) AS prev
         |  FROM weekly)
         |SELECT week, repo_name, stars, stars - prev AS delta
         |FROM lagged WHERE prev IS NOT NULL
         |ORDER BY delta DESC, week, repo_name LIMIT 25""".stripMargin,
  )
}
