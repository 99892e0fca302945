package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.CosineSimilarity

/** The codegen'd cosine kernel vs a plain-Scala reference implementation —
  * property-tested over random float vectors, plus edge shapes.
  */
class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def ref(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    (0 until n).foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; nx += x * x; ny += y * y
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def eval(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("c"))
      .head().getDouble(0)

  test("matches the reference implementation on random vectors") {
    // scalacheck Gen sampled with fixed seeds (the scalatest bridge artifact
    // is not on the offline classpath, so drive Gen directly)
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    (1 to 20).foreach { i =>
      val a = vecGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val b = vecGen.apply(Gen.Parameters.default, Seed(i.toLong + 1000)).get
      eval(a, b) shouldBe ref(a, b) +- 1e-12
    }
  }

  test("identical vectors → 1, orthogonal → 0, opposite → -1") {
    eval(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) shouldBe 1.0 +- 1e-12
    eval(Seq(1f, 0f), Seq(0f, 1f)) shouldBe 0.0 +- 1e-12
    eval(Seq(1f, 2f), Seq(-1f, -2f)) shouldBe -1.0 +- 1e-12
  }

  test("zero vector yields 0, not NaN") {
    eval(Seq(0f, 0f), Seq(1f, 2f)) shouldBe 0.0
  }

  test("null input yields null") {
    val out = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("c"))
      .head()
    out.isNullAt(0) shouldBe true
  }

  test("kernel runs inside WholeStageCodegen (no fallback to interpreted)") {
    // projection over a parquet scan — the codegen-eligible shape the dedup/
    // ANN operators put the kernel in (joins like BNLJ never codegen,
    // regardless of the expression)
    val e = Tables.embeddings(spark, sf0001)
    val proj = e.select(CosineSimilarity(col("embedding"), col("embedding")).as("c"))
    // `*(n)` is the WholeStageCodegen marker in the physical plan string
    proj.queryExecution.executedPlan.toString should include("*(1) Project [cosinesimilarity")
    proj.agg(min(col("c")), max(col("c"))).head().getDouble(0) shouldBe 1.0 +- 1e-12
  }
}
