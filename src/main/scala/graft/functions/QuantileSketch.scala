package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ClickHouse's `quantileState` / `quantileMerge` pair as typed
  * [[Aggregator]]s over a Datasketches KLL doubles sketch — the mergeable
  * quantile state the `Aggregating` engine stores per key (reference
  * README.md:247-266 is the Summing degenerate case; this is the general
  * `-State`/`-Merge` pattern for percentiles, the most common production
  * MV after counts).
  *
  * KLL (Karnin–Lang–Liberty, FOCS 2016 — the sketch ClickHouse itself
  * ships as `quantilesKLL` and the Datasketches library Spark already
  * bundles for its HLL functions): a fixed-size (k=200 → ~5 KB) summary
  * whose merge is associative and lossless in guarantee — normalized rank
  * error ≈ 1.65% at k=200 regardless of input size. That is what makes a
  * percentile rollup maintainable at 100 TB: each insert block stores a
  * kilobyte-scale state per key, compact merges states instead of
  * re-scanning raw values, and a reader unions bytes rather than
  * re-aggregating the corpus.
  *
  * Like the HLL path (`agg_hll_merge`), sketch BYTES are
  * engine/run-specific (KLL compaction flips random coins), so queries
  * never emit raw state — they emit an in-plan accuracy contract against
  * the exact percentile and let the oracle restate it as TRUE.
  */
object QuantileSketch {

  /** Serialization shim: KllDoublesSketch is not Serializable, so the
    * aggregation buffer wraps it and ships the COMPACT byte image across
    * shuffle boundaries (kilobytes per group, the entire point of the
    * sketch). The buffer encoder below is an explicit binary codec whose
    * wire format IS the Datasketches compact image — stable across
    * Spark/kryo/JVM upgrades (the javaSerialization hooks remain only
    * for incidental closure capture).
    */
  final class Buf(@transient var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = if (sk == null) Array.emptyByteArray else sk.toByteArray
      out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b)
      sk = if (n == 0) null else KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  private val K = 200 // Datasketches default: ~1.65% normalized rank error

  private def fresh(): KllDoublesSketch = KllDoublesSketch.newHeapInstance(K)

  /** Explicit shuffle wire format for the aggregation buffer: the KLL
    * compact byte image itself (empty array = empty sketch) — no Java
    * serialization header, no kryo class registry, nothing
    * version-coupled beyond Datasketches' own documented layout.
    */
  private val bufEnc: Encoder[Buf] = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoders, Codec, ExpressionEncoder}
    ExpressionEncoder(AgnosticEncoders.TransformingEncoder[Buf, Array[Byte]](
      scala.reflect.classTag[Buf],
      AgnosticEncoders.BinaryEncoder,
      () => new Codec[Buf, Array[Byte]] {
        override def encode(b: Buf): Array[Byte] =
          if (b.sk == null) Array.emptyByteArray else b.sk.toByteArray
        override def decode(bytes: Array[Byte]): Buf =
          new Buf(if (bytes == null || bytes.isEmpty) null
                  else KllDoublesSketch.heapify(Memory.wrap(bytes)))
      }))
  }

  private def mergeInto(a: Buf, b: Buf): Buf = {
    if (b.sk != null) {
      if (a.sk == null) a.sk = fresh()
      a.sk.merge(b.sk)
    }
    a
  }

  /** `quantileState(x)` — aggregate raw doubles into serialized KLL
    * state bytes (the `-State` producer an insert-trigger MV runs).
    */
  private val stateAgg: Aggregator[java.lang.Double, Buf, Array[Byte]] =
    new Aggregator[java.lang.Double, Buf, Array[Byte]] {
      override def zero: Buf = new Buf(null)
      override def reduce(b: Buf, v: java.lang.Double): Buf = {
        if (v != null) {
          if (b.sk == null) b.sk = fresh()
          b.sk.update(v.doubleValue())
        }
        b
      }
      override def merge(a: Buf, b: Buf): Buf = mergeInto(a, b)
      override def finish(b: Buf): Array[Byte] =
        if (b.sk == null) fresh().toByteArray else b.sk.toByteArray
      override def bufferEncoder: Encoder[Buf] = bufEnc
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `quantileMergeState(state)` — union serialized states into ONE
    * serialized state (what [[graft.catalog.Catalog]]'s Aggregating read
    * view and compact run per key).
    */
  private val mergeStateAgg: Aggregator[Array[Byte], Buf, Array[Byte]] =
    new Aggregator[Array[Byte], Buf, Array[Byte]] {
      override def zero: Buf = new Buf(null)
      override def reduce(b: Buf, v: Array[Byte]): Buf = {
        if (v != null && v.nonEmpty) {
          val in = KllDoublesSketch.heapify(Memory.wrap(v))
          if (b.sk == null) b.sk = fresh()
          b.sk.merge(in)
        }
        b
      }
      override def merge(a: Buf, b: Buf): Buf = mergeInto(a, b)
      override def finish(b: Buf): Array[Byte] =
        if (b.sk == null) fresh().toByteArray else b.sk.toByteArray
      override def bufferEncoder: Encoder[Buf] = bufEnc
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }

  /** `quantileMerge(q)(state)` — union serialized states and FINISH to
    * the q-quantile estimate (the reader that wants the number, not the
    * state; finishing inside the aggregate avoids any scalar
    * bytes→double UDF in the read path).
    */
  private def mergeQuantileAgg(q: Double): Aggregator[Array[Byte], Buf, java.lang.Double] =
    new Aggregator[Array[Byte], Buf, java.lang.Double] {
      override def zero: Buf = new Buf(null)
      override def reduce(b: Buf, v: Array[Byte]): Buf =
        mergeStateAgg.reduce(b, v)
      override def merge(a: Buf, b: Buf): Buf = mergeInto(a, b)
      override def finish(b: Buf): java.lang.Double =
        if (b.sk == null || b.sk.isEmpty) null
        else b.sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
      override def bufferEncoder: Encoder[Buf] = bufEnc
      override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Column API: `quantile_state($"x")` → binary KLL state. */
  def quantile_state(c: Column): Column = udaf(stateAgg).apply(c)

  /** Column API: `quantile_merge_state($"state")` → merged binary state. */
  def quantile_merge_state(c: Column): Column = udaf(mergeStateAgg).apply(c)

  /** Column API: `quantile_merge($"state", q)` → q-quantile estimate. */
  def quantile_merge(c: Column, q: Double): Column =
    udaf(mergeQuantileAgg(q)).apply(c)

  /** Driver-side estimate from one serialized state (spec/debug surface,
    * never in a distributed plan).
    */
  def estimate(state: Array[Byte], q: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(state))
      .getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
}
