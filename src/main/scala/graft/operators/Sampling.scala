package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Deterministic key-consistent sampling over ARBITRARY DataFrames — the
  * query-side half of the engine's SAMPLE support (the storage-side half,
  * with the stored bucket column and minmax file pruning, is
  * [[graft.catalog.Catalog.withSampleBy]] / `readSampled`; companion doc
  * there carries the semantics contract).
  *
  * Both halves, the ClickHouse-dialect `SAMPLE k [OFFSET m]` rewrite
  * ([[graft.sql.ChDialect]]), and the DuckDB oracle predicate rendered by
  * [[duckPredicate]] all derive their bucket window from the ONE
  * [[Catalog.sampleWindow]] rounding, so no two surfaces can disagree on
  * which rows a window holds.
  */
object Sampling {

  /** The bucket of a key — identical math to the stored
    * [[Catalog.sampleExprSql]] column, as a Column for frames that carry
    * no stored bucket. Pure codegen'd built-ins (md5/substr/conv): the
    * filter runs scan-side inside whole-stage codegen, nothing shuffles.
    */
  def bucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int")

  /** `SAMPLE frac OFFSET offset` as a predicate on `key`. */
  def sampleFilter(key: Column, frac: Double, offset: Double = 0.0): Column = {
    val (lo, hi) = Catalog.sampleWindow(frac, offset)
    val b = bucket(key)
    b >= lit(lo) && b < lit(hi)
  }

  /** The same window as a DuckDB-runnable predicate over `keySql` — a
    * lexicographic compare on the fixed-width lowercase hex prefix, which
    * orders exactly like the numeric bucket, so the oracle replays the
    * identical row set without needing a hex→int conversion.
    */
  def duckPredicate(keySql: String, frac: Double, offset: Double = 0.0): String = {
    val (lo, hi) = Catalog.sampleWindow(frac, offset)
    val h = s"substr(md5(CAST($keySql AS VARCHAR)), 1, 4)"
    val upper =
      if (hi >= Catalog.SampleBuckets) "" else f" AND $h%s < '$hi%04x'"
    f"$h%s >= '$lo%04x'" + upper
  }
}
