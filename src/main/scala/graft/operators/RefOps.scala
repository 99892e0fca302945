package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's own operator inventory (SURVEY.md §2), re-expressed as
  * declarative Spark programs over the shared test star schema.
  *
  * Shapes map 1:1 to reference citations:
  *   - q1_agg       — A4+O2 richest shape (repo/schedule.py:81-83) widened to
  *                    the classic pricing-summary aggregate
  *   - p3/p5/p6/p7/p9 — predicate family (app.py:49, repo/importer.py:95,
  *                    106-108,146-147; repo/schedule.py:86,93-95)
  *   - p8/a6        — countIf (README.md:259-266)
  *   - a1..a4       — scalar/grouped aggregates (repo/schedule.py:30-32,
  *                    app.py:48-50, repo/importer.py:95, repo/schedule.py:80-83)
  *   - a5           — github_stars MV rollup, batch backfill form
  *                    (README.md:247-266)
  *   - a8_dedup_latest — ReplacingMergeTree latest-wins (types.json:7)
  *   - o1/o2        — ORDER BY + LIMIT top-k (repo/importer.py:138-139,
  *                    repo/schedule.py:81-83); Spark plans TakeOrderedAndProject
  *   - j1/j2/j3     — anti/semi/existence joins (repo/schedule.py:93-100,
  *                    app.py:48-52)
  *
  * All predicates/projections sit directly on the Parquet scan so Catalyst
  * pushes them down (PushedFilters) — at 100 TB these queries touch only the
  * row groups and columns they need.
  */
object RefOps extends QueryModule {

  override def queries: Map[String, Q] = Map(
    // ---- flagship: scan → filter → group agg → sort (TPC-H Q1 shape) ----
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-06-30 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // ---- predicates ----
    "p3_filter_eq" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    "p5_watermark" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("2001-06-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "p6_conj_pred" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_discount") > 0.08)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "p7_in_list" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))),

    "p8_count_if" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count_if(col("value") > 50.0).as("n_big"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    "p9_point_lookup" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") === 777L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // ---- aggregates ----
    "a1_count_scalar" -> ((s, d) =>
      Tables.events(s, d).agg(count(lit(1)).as("n"))),

    "a2_count_filtered" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .agg(count(col("o_orderkey")).as("n"))),

    "a3_max_watermark" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "A")
        .agg(max(col("l_shipdate")).as("hwm"))),

    "a4_groupby_min" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("last_updated"))
        .orderBy(col("o_custkey"))),

    "a5_stars_rollup" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("stars"))
        .orderBy(col("user_id"))),

    "a6_countif_backfill" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count_if(col("event_type") === "click").as("stars"))
        .orderBy(col("user_id"))),

    // A7: SummingMergeTree merge-time re-aggregation — partial aggregates
    // computed over disjoint slices of the fact stream re-sum to the total
    // (the summable-partial-state contract, README.md:247-253). The slices
    // stand in for insert blocks; union ∘ re-groupBy is the "merge".
    "a7_summing_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def partial(pred: org.apache.spark.sql.Column) =
        ev.filter(pred).groupBy(col("user_id"))
          .agg(count(lit(1)).as("stars"))
      partial(col("event_id") % 2 === 0)
        .union(partial(col("event_id") % 2 === 1))
        .groupBy(col("user_id"))
        .agg(sum(col("stars")).as("stars"))
        .orderBy(col("user_id"))
    }),

    "a8_dedup_latest" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
          col("o_orderdate").as("latest_orderdate"))
        .orderBy(col("o_custkey"))
    }),

    // ---- sort / top-k ----
    "o1_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    "o2_stalest_first" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("last_updated"))
        .orderBy(col("last_updated").asc, col("o_custkey"))
        .limit(100)),

    // ---- joins from orchestration semantics ----
    "j1_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "j2_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    "j3_existence" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_custkey") === 42L)
        .agg(count(lit(1)).as("n"))),
  )

  override def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "p3_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,

    "p5_watermark" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p6_conj_pred" ->
      """SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
        |WHERE l_returnflag = 'R' AND l_discount > 0.08
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p7_in_list" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "p8_count_if" ->
      """SELECT event_type, count(*) FILTER (WHERE value > 50.0) AS n_big,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "p9_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey = 777 ORDER BY o_orderkey""".stripMargin,

    "a1_count_scalar" -> "SELECT count(*) AS n FROM events",

    "a2_count_filtered" ->
      "SELECT count(o_orderkey) AS n FROM orders WHERE o_orderstatus = 'O'",

    "a3_max_watermark" ->
      "SELECT max(l_shipdate) AS hwm FROM lineitem WHERE l_returnflag = 'A'",

    "a4_groupby_min" ->
      """SELECT o_custkey, min(o_orderdate) AS last_updated FROM orders
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "a5_stars_rollup" ->
      """SELECT user_id, count(*) AS stars FROM events
        |WHERE event_type = 'click' GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a6_countif_backfill" ->
      """SELECT user_id, count(*) FILTER (WHERE event_type = 'click') AS stars
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a7_summing_merge" ->
      """SELECT user_id, count(*) AS stars FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a8_dedup_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        | o_orderdate AS latest_orderdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "o1_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "o2_stalest_first" ->
      """SELECT o_custkey, min(o_orderdate) AS last_updated FROM orders
        |GROUP BY o_custkey ORDER BY last_updated ASC, o_custkey LIMIT 100""".stripMargin,

    "j1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j2_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "j3_existence" ->
      "SELECT count(*) AS n FROM orders WHERE o_custkey = 42",
  )
}
