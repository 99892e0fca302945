package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** ClickHouse query-result-cache analog (`use_query_cache = 1`): serve a
  * repeated query's RESULT without recomputing it. Entries are keyed on
  * the whitespace-normalized query text and guarded by
  *
  *   - a TTL (CH `query_cache_ttl` — its ONLY staleness control), and
  *   - a caller-supplied validity token — normally the
  *     [[graft.catalog.Catalog.tableVersion]] digests of every table the
  *     query reads — re-probed on every hit. CH accepts TTL-stale reads
  *     by design; the catalog's version digests cost one directory
  *     listing, so this cache refuses them: an append/compact/delete to
  *     any input table invalidates immediately.
  *
  * Only DRIVER-SIZED results cache: the result is fetched with a limit
  * probe of maxRowsPerEntry + 1, its bytes estimated from the collected
  * rows, and a result over EITHER cap (rows, or the CH
  * `query_cache_max_size_in_bytes` per-entry byte analog) passes through
  * uncached — a result cache stores answers (aggregates, top-ks,
  * dashboards), never table-sized scans. Hits rebuild a DataFrame from
  * the stored local rows — no job, no scan, plan-time only.
  *
  * Capacity is LRU over maxEntries AND a total byte budget — both bound
  * driver heap deterministically. The clock is injectable (the
  * QueryGovernor pattern) so TTL expiry is spec-testable without sleeps.
  * Thread-safe: reads and writes synchronize on the entry map (driver-
  * side metadata-scale work, never contended by executors).
  */
final class QueryCache(
    maxEntries: Int = 128,
    maxRowsPerEntry: Int = 100000,
    ttlMs: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis(),
    // CH `query_cache_max_size_in_bytes` per-entry analog (1 MiB default,
    // the CH default) + a TOTAL budget: rows alone let 128 entries of
    // 100k wide string rows pin multi-GB of driver heap
    maxBytesPerEntry: Long = 1L << 20,
    maxTotalBytes: Long = 128L << 20) {

  require(maxEntries > 0 && maxRowsPerEntry > 0 && ttlMs > 0 &&
      maxBytesPerEntry > 0 && maxTotalBytes >= maxBytesPerEntry,
    s"QueryCache: maxEntries/maxRowsPerEntry/ttlMs/byte budgets must be " +
      "positive (total >= per-entry)")

  private final case class Entry(
      schema: StructType, rows: Array[Row], validity: Seq[String],
      bytes: Long, createdAt: Long, var lastUsed: Long, var hits: Long)

  // LinkedHashMap in ACCESS order = the LRU ordering for free
  private val entries =
    new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)

  private var hitCount = 0L
  private var missCount = 0L
  private var totalBytes = 0L

  /** Driver-heap estimate of one collected value (JVM object overheads
    * approximated; exactness doesn't matter — bounding the heap does).
    */
  private def valueBytes(v: Any): Long = v match {
    case null => 8L
    case s: String => 40L + 2L * s.length
    case b: Array[Byte] => 24L + b.length
    case r: Row => 24L + r.toSeq.map(valueBytes).sum
    case xs: scala.collection.Seq[_] => 24L + xs.map(valueBytes).sum
    case m: scala.collection.Map[_, _] =>
      24L + m.map { case (k, x) => valueBytes(k) + valueBytes(x) }.sum
    case d: java.math.BigDecimal => 40L + d.unscaledValue().bitLength() / 8
    case d: scala.math.BigDecimal => 40L + d.underlying().unscaledValue().bitLength() / 8
    case _ => 16L // boxed primitives, dates, timestamps
  }

  private def rowsBytes(rows: Array[Row]): Long =
    rows.foldLeft(0L)((acc, r) => acc + 24L + r.toSeq.map(valueBytes).sum)

  private def removeEntry(key: String): Unit =
    Option(entries.remove(key)).foreach(e => totalBytes -= e.bytes)

  private def norm(text: String): String =
    text.trim.replaceAll("\\s+", " ")

  /** Run `query` through the cache. `validity` is re-evaluated on every
    * call (by-name): a hit whose stored tokens differ from the current
    * ones is dropped and recomputed — the version-invalidation contract.
    */
  def cached(s: SparkSession, text: String, validity: => Seq[String])
            (run: => DataFrame): DataFrame = {
    val key = norm(text)
    val now = clock()
    val current = validity
    val stored = entries.synchronized {
      Option(entries.get(key)).filter { e =>
        val live = now - e.createdAt <= ttlMs && e.validity == current
        if (!live) removeEntry(key)
        live
      }.map { e =>
        e.lastUsed = now; e.hits += 1; hitCount += 1
        (e.schema, e.rows)
      }
    }
    stored match {
      case Some((schema, rows)) =>
        s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      case None =>
        entries.synchronized { missCount += 1 }
        val df = run
        // limit probe: fetch one row beyond the cap — rows.length >
        // maxRowsPerEntry means "too big, pass through" without ever
        // materializing the full oversized result on the driver
        val probe = df.limit(maxRowsPerEntry + 1).collect()
        lazy val bytes = rowsBytes(probe)
        // an oversized result (rows OR bytes) passes through uncached —
        // a result cache stores answers, never table-sized payloads
        if (probe.length > maxRowsPerEntry || bytes > maxBytesPerEntry) df
        else {
          entries.synchronized {
            removeEntry(key) // replacing: release the old entry's bytes
            entries.put(key,
              Entry(df.schema, probe, current, bytes, now, now, 0L))
            totalBytes += bytes
            val it = entries.entrySet().iterator()
            while ((entries.size() > maxEntries ||
                totalBytes > maxTotalBytes) && it.hasNext) {
              val victim = it.next() // access-order head = least recent
              totalBytes -= victim.getValue.bytes
              it.remove()
            }
          }
          s.createDataFrame(java.util.Arrays.asList(probe: _*), df.schema)
        }
    }
  }

  /** `system.query_cache` analog: (query, rows, hits, age_ms, stale). */
  def listing(s: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import s.implicits._
    val now = clock()
    entries.synchronized {
      entries.entrySet().asScala.toSeq.map { e =>
        (e.getKey, e.getValue.rows.length.toLong, e.getValue.hits,
          now - e.getValue.createdAt,
          now - e.getValue.createdAt > ttlMs)
      }
    }.toDF("query", "rows", "hits", "age_ms", "stale")
      .orderBy($"query")
  }

  def stats: (Long, Long) = entries.synchronized((hitCount, missCount))

  /** Current estimated driver-heap footprint of all stored results. */
  def bytes: Long = entries.synchronized(totalBytes)

  def clear(): Unit = entries.synchronized {
    entries.clear(); totalBytes = 0L
  }
}
