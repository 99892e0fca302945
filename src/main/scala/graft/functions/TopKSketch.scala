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
}
