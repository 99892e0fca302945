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
}
