package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Table registry — our analog of the reference's DDL catalog
  * (/root/reference/create_db.py:30-128 + /root/reference/types.json).
  *
  * Each table is a Parquet directory plus declared engine semantics. The
  * ClickHouse MergeTree family defers its per-engine behavior to background
  * merges; on immutable Parquet we split that into an eager write path
  * ([[Catalog.append]]) and a read-time view ([[Catalog.read]]) so readers
  * always see fully-merged semantics (SURVEY.md §4 "merge-time dedup"):
  *
  *   - [[Append]]          ≈ MergeTree: plain columnar append.
  *   - [[ReplacingDedup]]  ≈ ReplacingMergeTree(types.json:7): equal-sort-key
  *     rows collapse to the latest `versionCol`. Write path dedups within the
  *     batch; read path window-dedups across batches, so replayed imports are
  *     invisible (the reference's idempotent re-import invariant).
  *   - [[Summing]]         ≈ SummingMergeTree(README.md:251): equal-key rows
  *     re-sum `sumCols`. Partial aggregates are summable, so appends of
  *     per-batch partials + read-time re-sum ≡ a total aggregate —
  *     exactly the MV contract (README.md:247-266).
  *
  * Scale note: the read-time window/agg shuffles only when a batch boundary
  * actually split a key; [[compact]] folds history back to one row per key so
  * steady-state reads stay shuffle-free after AQE sees the tiny post-compact
  * tables.
  */
sealed trait EngineSemantics
case object Append extends EngineSemantics
final case class ReplacingDedup(keys: Seq[String], versionCol: String) extends EngineSemantics
final case class Summing(keys: Seq[String], sumCols: Seq[String]) extends EngineSemantics

final case class TableDef(
    name: String,
    path: String,
    schema: StructType,
    sortKeys: Seq[String],
    semantics: EngineSemantics)

final class Catalog(spark: SparkSession) {

  private val tables = scala.collection.concurrent.TrieMap.empty[String, TableDef]

  /** D1/D2: register ≈ CREATE TABLE (create_db.py:32-33). Idempotent. */
  def createTable(t: TableDef): TableDef = { tables.putIfAbsent(t.name, t); tables(t.name) }

  def get(name: String): TableDef =
    tables.getOrElse(name, throw new NoSuchElementException(s"table $name"))

  def exists(name: String): Boolean =
    tables.contains(name) && new java.io.File(get(name).path).exists()

  /** S4: columnar append, clustered by the declared sort key on the way in
    * (O3) — `repartitionByRange` gives cross-file range layout, then
    * `sortWithinPartitions` gives Parquet row groups whose min/max stats
    * replicate the sparse-primary-index skipping of `ORDER BY` tables
    * (types.json:7). ReplacingDedup batches are pre-collapsed so a single
    * batch can never introduce duplicates on its own.
    */
  def append(name: String, batch: DataFrame): Unit = {
    val t = get(name)
    val deduped = t.semantics match {
      case ReplacingDedup(keys, version) => latestWins(batch, keys, version)
      case _ => batch
    }
    val sorted =
      if (t.sortKeys.nonEmpty)
        deduped
          .repartitionByRange(t.sortKeys.map(col): _*)
          .sortWithinPartitions(t.sortKeys.map(col): _*)
      else deduped
    sorted.write.mode("append").parquet(t.path)
  }

  /** Read with full engine semantics applied (merged view). */
  def read(name: String): DataFrame = {
    val t = get(name)
    val raw = spark.read.schema(t.schema).parquet(t.path)
    t.semantics match {
      case Append => raw
      case ReplacingDedup(keys, version) => latestWins(raw, keys, version)
      case Summing(keys, sumCols) =>
        raw.groupBy(keys.map(col): _*)
          .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
          .toDF(keys ++ sumCols: _*)
    }
  }

  /** Raw storage view — duplicates/partials visible (what a ClickHouse
    * `SELECT … FINAL`-less read over unmerged parts would see).
    */
  def readRaw(name: String): DataFrame = {
    val t = get(name)
    spark.read.schema(t.schema).parquet(t.path)
  }

  /** The deferred "background merge": rewrite storage to its merged form.
    * ClickHouse does this continuously and asynchronously; on Parquet it is
    * an explicit overwrite via a temp path + atomic-ish swap.
    */
  def compact(name: String): Unit = {
    val t = get(name)
    val merged = read(name).cache()
    merged.count() // materialize before the overwrite clobbers the source
    val sorted =
      if (t.sortKeys.nonEmpty)
        merged.repartitionByRange(t.sortKeys.map(col): _*)
          .sortWithinPartitions(t.sortKeys.map(col): _*)
      else merged
    sorted.write.mode("overwrite").parquet(t.path)
    merged.unpersist()
  }

  /** A8/T2: ReplacingMergeTree latest-wins collapse (types.json:7). */
  private def latestWins(df: DataFrame, keys: Seq[String], version: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(version).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
