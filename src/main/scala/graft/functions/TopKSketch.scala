package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse's `topK(k)(x)` as a typed [[Aggregator]] over a SpaceSaving
  * sketch — the approximate heavy-hitters aggregate Spark has no built-in
  * for (`approx_count_distinct` covers cardinality, nothing covers top-k).
  *
  * SpaceSaving (Metwally et al., ICDT 2005 — the same algorithm ClickHouse
  * documents for topK): keep at most `capacity` counters; an unseen value
  * evicts the current minimum and inherits its count + 1 (the classic
  * overestimate bound). Guarantees: any value with true frequency
  * > N/capacity is retained, and counts are exact whenever the number of
  * distinct values never exceeds `capacity` — which is how TopKSketchSpec
  * pins it against an exact GROUP BY oracle.
  *
  * Buffers merge associatively (union counters, re-evict to capacity), so
  * the aggregate is partial-aggregation friendly: each partition sketches
  * locally and only `capacity` counters per partition cross the shuffle —
  * the property that makes topK usable over 100 TB where an exact
  * GROUP BY + ORDER BY + LIMIT would shuffle every distinct value.
  */
object TopKSketch {

  final case class Sketch(counters: mutable.Map[String, Long]) {
    def add(v: String, capacity: Int): Sketch = {
      if (counters.contains(v)) counters(v) += 1L
      else if (counters.size < capacity) counters(v) = 1L
      else {
        val (minV, minC) = counters.minBy { case (value, c) => (c, value) }
        counters.remove(minV)
        counters(v) = minC + 1L
      }
      this
    }

    def mergeWith(other: Sketch, capacity: Int): Sketch = {
      other.counters.foreach { case (v, c) =>
        counters(v) = counters.getOrElse(v, 0L) + c
      }
      while (counters.size > capacity) {
        val (minV, _) = counters.minBy { case (value, c) => (c, value) }
        counters.remove(minV)
      }
      this
    }
  }

  private def topKAggregator(k: Int, capacity: Int): Aggregator[String, Sketch, String] =
    new Aggregator[String, Sketch, String] {
      override def zero: Sketch = Sketch(mutable.Map.empty)
      override def reduce(b: Sketch, v: String): Sketch =
        if (v == null) b else b.add(v, capacity)
      override def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b, capacity)
      override def finish(s: Sketch): String =
        s.counters.toSeq
          .sortBy { case (v, c) => (-c, v) } // count desc, value asc tie-break
          .take(k)
          .map { case (v, c) => s"$v:$c" }
          .mkString(",")
      override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Column-API entry: `top_k($"x", k)` → "v1:c1,v2:c2,…" (count desc).
    * `capacity` defaults to 4k — the usual accuracy/space trade.
    */
  def top_k(c: Column, k: Int, capacity: Int = 0): Column = {
    val cap = if (capacity > 0) capacity else math.max(4 * k, 8)
    udaf(topKAggregator(k, cap)).apply(c)
  }

  // ---- -State / -Merge pair (the Aggregating engine's `topk` kind) ----
  //
  // ClickHouse `topKState` / `topKMerge`: the SpaceSaving counter table
  // itself is the stored state — a MAP<STRING, BIGINT> of at most
  // `capacity` counters per key, mergeable by union + re-evict (the same
  // associative merge the in-query aggregate uses). Counts are EXACT
  // while distinct values stay under capacity (the TopKSketchSpec pinning
  // property), which is what lets the maintained-table oracle be exact at
  // gate scale while the sketch stays bounded at 100 TB.

  // typed MAP<STRING, BIGINT> output (the stored state's column type —
  // kryo here would silently store opaque binary instead)
  private val mapEnc: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  private def stateAggregator(capacity: Int): Aggregator[String, Sketch, Map[String, Long]] =
    new Aggregator[String, Sketch, Map[String, Long]] {
      override def zero: Sketch = Sketch(mutable.Map.empty)
      override def reduce(b: Sketch, v: String): Sketch =
        if (v == null) b else b.add(v, capacity)
      override def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b, capacity)
      override def finish(s: Sketch): Map[String, Long] = s.counters.toMap
      override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      override def outputEncoder: Encoder[Map[String, Long]] = mapEnc
    }

  private def mergeStateAggregator(capacity: Int): Aggregator[Map[String, Long], Sketch, Map[String, Long]] =
    new Aggregator[Map[String, Long], Sketch, Map[String, Long]] {
      override def zero: Sketch = Sketch(mutable.Map.empty)
      override def reduce(b: Sketch, m: Map[String, Long]): Sketch =
        if (m == null) b
        else b.mergeWith(Sketch(mutable.Map.from(m)), capacity)
      override def merge(a: Sketch, b: Sketch): Sketch = a.mergeWith(b, capacity)
      override def finish(s: Sketch): Map[String, Long] = s.counters.toMap
      override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      override def outputEncoder: Encoder[Map[String, Long]] = mapEnc
    }

  /** `topKState(capacity)(x)` → counter-map state. */
  def topk_state(c: Column, capacity: Int): Column =
    udaf(stateAggregator(capacity)).apply(c)

  /** `topKMergeState(capacity)(state)` → merged counter-map state. */
  def topk_merge_state(c: Column, capacity: Int): Column =
    udaf(mergeStateAggregator(capacity)).apply(c)

  /** Finish a merged state to the `top_k` output string ("v:c,…", count
    * desc / value asc) — all built-ins over the final small map, no
    * per-row UDF in the read path.
    */
  def topk_finish(state: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val ordered = array_sort(map_entries(state), (l, r) =>
      when(l("value") > r("value"), -1)
        .when(l("value") < r("value"), 1)
        .when(l("key") < r("key"), -1)
        .when(l("key") > r("key"), 1)
        .otherwise(0))
    array_join(transform(slice(ordered, 1, k),
      e => concat(e("key"), lit(":"), e("value").cast("string"))), ",")
  }
}
