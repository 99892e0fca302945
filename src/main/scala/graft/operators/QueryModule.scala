package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of verifiable queries.
  *
  * Each key appears in [[graft.SparkEntry.queries]]; keys present in
  * `oracleSql` are hash-compared against DuckDB on identical Parquet by the
  * driver (see BASELINE.md). Conventions that make the hash-compare stable:
  *
  *   - every output column is explicitly aliased, with the SAME name in the
  *     Spark plan and the oracle SQL (the driver sorts columns by name);
  *   - every query ends in a total-order `ORDER BY` repeated in the oracle,
  *     so row order is deterministic on both sides;
  *   - floating-point aggregates are `round(…, n)`-ed on both sides —
  *     Spark's partial/final aggregation sums doubles in partition order,
  *     DuckDB sums sequentially, so raw sums differ in the last ulp.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}
