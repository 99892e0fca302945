package graft.catalog

import org.apache.spark.sql.DataFrame

/** ClickHouse Buffer-engine analog: writes accumulate in MEMORY and reach
  * the target table only when a threshold trips; reads serve
  * buffer ∪ target so nothing is ever invisible. The reference engine
  * buffers to absorb high-frequency small inserts that would otherwise
  * litter a MergeTree with tiny parts — the identical failure mode this
  * Catalog has (every [[Catalog.append]] is at least one parquet file, and
  * a 100 TB table fed by row-at-a-time inserts drowns in file-listing
  * overhead long before it drowns in data). Batches are Spark-cached (the
  * RAM residence of the reference engine, with spill-to-disk the
  * reference lacks).
  *
  * Flush policy — deterministic, not background: thresholds are checked
  * at [[insert]] time against the caller-supplied clock (`num_rows` and
  * `time` of the reference's min/max knob pairs; a background flusher
  * would make every test and replay timing-dependent). [[flush]] forces.
  * One append per flush, so the target sees ONE part per flush, not one
  * per insert — and the target's attached materialized views fire at
  * flush time with the coalesced block, exactly like the reference
  * (Buffer tables pass blocks to the target's MVs when they flush, not
  * when they buffer).
  *
  * Same durability contract as the reference engine, stated loudly: a
  * crash loses the unflushed buffer. Reads of an [[Catalog.Aggregating]]
  * or Summing target see the buffer's rows UNMERGED next to the target's
  * merged view (the reference's documented Buffer caveat) — callers that
  * need merged reads flush first.
  */
final class BufferedTable(cat: Catalog, target: String,
                          maxRows: Long, maxAgeMs: Long) {
  require(maxRows > 0 && maxAgeMs > 0,
    s"Buffer($target): thresholds must be positive")

  private var buf: Vector[DataFrame] = Vector.empty
  private var bufRows: Long = 0L
  private var oldestMs: Long = -1L

  /** Rows currently buffered (0 after a flush). */
  def buffered: Long = synchronized(bufRows)

  /** Buffer one batch; flush to the target iff a threshold trips (row
    * count reached, or the OLDEST buffered batch is older than
    * `maxAgeMs`). Returns the rows buffered by this call.
    */
  def insert(batch: DataFrame,
             nowMs: Long = System.currentTimeMillis()): Long = synchronized {
    val t = cat.get(target)
    val aligned = batch.select(
      t.schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    aligned.cache()
    val n = aligned.count()
    buf :+= aligned
    bufRows += n
    if (oldestMs < 0) oldestMs = nowMs
    if (bufRows >= maxRows || nowMs - oldestMs >= maxAgeMs) flush()
    n
  }

  /** Force the buffer into the target as ONE append; returns rows
    * flushed. The append path runs the target's engine semantics and
    * fires its materialized views with the coalesced block.
    */
  def flush(): Long = synchronized {
    if (buf.isEmpty) return 0L
    val n = bufRows
    try cat.append(target, buf.reduce(_.unionByName(_)))
    finally {
      buf.foreach(_.unpersist())
      buf = Vector.empty; bufRows = 0L; oldestMs = -1L
    }
    n
  }

  /** buffer ∪ target — every inserted row is visible whether or not it
    * has flushed (raw buffer rows beside the target's merged view; the
    * reference engine's documented read semantics).
    */
  def read(): DataFrame = synchronized {
    buf.foldLeft(cat.read(target))(_.unionByName(_))
  }
}
