package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKSketch
import graft.functions.TopKSketch.Sketch

/** The SpaceSaving topK aggregator: exactness under sufficient capacity,
  * the heavy-hitter retention guarantee under eviction, and merge behavior.
  */
class TopKSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact when capacity covers the distinct values, across partitions") {
    val data = (1 to 300).map(i => s"v${i % 5}") // v0..v4, skewed by remainder
    val out = data.toDF("x").repartition(7)
      .agg(TopKSketch.top_k(col("x"), 5).as("top"))
      .head().getString(0)
    val exact = data.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (v, c) => (-c, v) }
      .map { case (v, c) => s"$v:$c" }.mkString(",")
    out shouldBe exact
  }

  test("heavy hitter survives eviction pressure from a long tail") {
    val heavy = Seq.fill(500)("HOT")
    val tail = (1 to 400).map(i => s"t$i") // 400 distinct singletons
    val data = new scala.util.Random(42).shuffle(heavy ++ tail)
    val sk = data.foldLeft(Sketch(scala.collection.mutable.Map.empty))(
      (s, v) => s.add(v, capacity = 16))
    val top = sk.counters.toSeq.maxBy(_._2)
    top._1 shouldBe "HOT"
    top._2 should be >= 500L // SpaceSaving only ever overestimates
  }

  test("approximate regime: every value with frequency > N/capacity survives the full distributed path") {
    // capacity (16) < distinct values (63): eviction is constantly active,
    // partial sketches merge across 13 partitions, and the SpaceSaving
    // guarantee under test is exactly the documented one — any value with
    // true frequency > N/capacity is retained (N = 2700, bound ≈ 169; the
    // heavies are 900/700/500, every tail value is 10).
    val heavies = Seq("h1" -> 900, "h2" -> 700, "h3" -> 500)
    val data = new scala.util.Random(7).shuffle(
      heavies.flatMap { case (v, c) => Seq.fill(c)(v) } ++
        (1 to 60).flatMap(i => Seq.fill(10)(s"t$i")))
    val out = data.toDF("x").repartition(13)
      .agg(TopKSketch.top_k(col("x"), 16, capacity = 16).as("top"))
      .head().getString(0)
    val counts = out.split(",").map { p =>
      val a = p.split(":"); a(0) -> a(1).toLong
    }.toMap
    Set("h1", "h2", "h3").subsetOf(counts.keySet) shouldBe true
    // SpaceSaving counts only ever overestimate
    counts("h1") should be >= 900L
    counts("h2") should be >= 700L
    counts("h3") should be >= 500L
  }

  test("merge unions counters and re-caps to capacity") {
    def sk(pairs: (String, Long)*) =
      Sketch(scala.collection.mutable.Map(pairs: _*))
    val merged = sk("a" -> 10L, "b" -> 2L).mergeWith(sk("a" -> 5L, "c" -> 7L), capacity = 2)
    merged.counters.toSeq.sorted shouldBe Seq("a" -> 15L, "c" -> 7L)
  }

  test("merge adds the missing side's floor (mergeable-SpaceSaving rule)") {
    // round-9 advice: a counter pruned from one side may have carried up
    // to that side's floor there — merging with max-of-floors alone loses
    // it, breaking the counts-only-overestimate guarantee. The rule:
    // one-sided counters gain the OTHER side's floor; merged floor is the
    // sum (a value pruned from both sides could carry floor_a + floor_b).
    def sk(floor: Long, pairs: (String, Long)*) =
      Sketch(scala.collection.mutable.Map(pairs: _*), floor)
    val merged = sk(3L, "a" -> 10L).mergeWith(sk(2L, "b" -> 5L), capacity = 8)
    merged.counters("a") shouldBe 12L // 10 + other.floor(2)
    merged.counters("b") shouldBe 8L  // 5 + this.floor(3)
    merged.floor shouldBe 5L          // 3 + 2
    // shared counters just sum — no floor double-count
    val m2 = sk(3L, "a" -> 10L).mergeWith(sk(2L, "a" -> 5L), capacity = 8)
    m2.counters("a") shouldBe 15L
  }

  test("wire codec round-trips the sketch byte-identically in meaning") {
    def sk(floor: Long, pairs: (String, Long)*) =
      Sketch(scala.collection.mutable.Map(pairs: _*), floor)
    val s = sk(7L, "α" -> 3L, "b" -> 11L, "" + "长字符串" -> 2L)
    val rt = TopKSketch.sketchFromBytes(TopKSketch.sketchToBytes(s))
    rt.counters shouldBe s.counters
    rt.floor shouldBe 7L
    val empty = TopKSketch.sketchFromBytes(
      TopKSketch.sketchToBytes(Sketch(scala.collection.mutable.Map.empty)))
    empty.counters shouldBe empty.counters.empty
    empty.floor shouldBe 0L
  }
}
