package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module inventories; each module is a
  * [[graft.operators.QueryModule]] (reference shapes, analytics, extensions).
  */
object SparkEntry {

  // package-visible so QueriesSpec can assert no key collides across
  // modules (flatMap(_.queries).toMap would drop a colliding query SILENTLY)
  private[graft] val modules: Seq[QueryModule] =
    Seq(RefOps, Analytics, ChAggs, TemporalJoins, Dedup, TextAnalysis, Similarity, Multimodal, GhEventsOps, CatalogOps, Dictionaries, FuncDepth)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefOps.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
