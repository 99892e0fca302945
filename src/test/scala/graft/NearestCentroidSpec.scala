package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, NearestCentroid}

/** The arg-max cell-assignment kernel: semantics pinned against the
  * relational formulation it replaced (per-cell cosine → round(…, 6) when
  * `rounded` → lexicographic max(struct(score, cell)), i.e. ties to the
  * HIGHER cell id), plus the analysis-time type gate.
  */
class NearestCentroidSpec extends SparkSpecBase {
  import spark.implicits._

  private def assign(vecs: Seq[Seq[Float]], cents: Seq[Array[Double]],
                     rounded: Boolean): Seq[Int] =
    vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        NearestCentroid(col("embedding"), cents, rounded).as("cell"))
      .orderBy(col("vec_id")).collect().map(_.getInt(1)).toSeq

  test("matches the relational max(struct(round(cos), cell)) arg-max") {
    val cents = Seq(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.7, 0.7, 0.0))
    val vecs = Seq(
      Seq(10f, 1f, 0f),   // closest to cell 0
      Seq(0.1f, 5f, 0f),  // closest to cell 1
      Seq(3f, 3f, 0f),    // exactly along cell 2
      Seq(-1f, -1f, 0f))  // all cosines negative; best is the least negative
    val kernel = assign(vecs, cents, rounded = true)
    // relational replay: cross join + groupBy arg-max, the old shape
    val vdf = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("vec_id", "embedding")
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
    val rel = vdf.crossJoin(cdf)
      .groupBy(col("vec_id"))
      .agg(max(struct(round(CosineSimilarity(col("embedding"), col("centroid")), 6).as("sc"),
        col("cell"))).as("best"))
      .orderBy(col("vec_id")).select(col("best.cell"))
      .collect().map(_.getInt(0)).toSeq
    kernel shouldBe rel
  }

  test("equal scores tie to the HIGHER cell id") {
    // duplicate centroid: both cells score identically for every vector
    val cents = Seq(Array(1.0, 0.0), Array(1.0, 0.0))
    assign(Seq(Seq(2f, 0f), Seq(1f, 1f)), cents, rounded = true) shouldBe Seq(1, 1)
  }

  test("rounding decides the winner only at the 6th decimal") {
    // two centroids whose cosines against the probe differ past the 6th
    // decimal: unrounded assignment can tell them apart, rounded cannot —
    // and the rounded tie then goes to the higher cell
    val a = Array(1.0, 1.0e-7, 0.0)
    val b = Array(1.0, 0.0, 0.0)
    val probe = Seq(Seq(1f, 0f, 0f))
    assign(probe, Seq(a, b), rounded = false) shouldBe Seq(1) // b is exact
    assign(probe, Seq(a, b), rounded = true) shouldBe Seq(1)  // tie → higher
    assign(probe, Seq(b, a), rounded = false) shouldBe Seq(0) // b still exact
    assign(probe, Seq(b, a), rounded = true) shouldBe Seq(1)  // tie → higher
  }

  test("NaN scores order above every number, matching struct-max") {
    // a NaN centroid component makes that cell's cosine NaN; Spark's
    // struct-max (the pinned relational semantics) orders NaN above every
    // double, so the NaN cell must win — and with several NaN cells the
    // HIGHEST one (tie rule)
    val nanCent = Seq(Array(1.0, 0.0), Array(Double.NaN, 0.0), Array(0.0, 1.0))
    assign(Seq(Seq(1f, 0f), Seq(0f, 1f)), nanCent, rounded = true) shouldBe Seq(1, 1)
    // NaN input vector: every cell scores NaN → highest cell wins
    assign(Seq(Seq(Float.NaN, 1f)), nanCent, rounded = true) shouldBe Seq(2)
    // and the relational replay agrees
    val vdf = Seq((0, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val cdf = nanCent.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
    val rel = vdf.crossJoin(cdf)
      .groupBy(col("vec_id"))
      .agg(max(struct(round(CosineSimilarity(col("embedding"), col("centroid")), 6).as("sc"),
        col("cell"))).as("best"))
      .select(col("best.cell")).head().getInt(0)
    rel shouldBe 1
  }

  test("zero-norm input scores 0 against every centroid, ties to last cell") {
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 1.0))
    assign(Seq(Seq(0f, 0f)), cents, rounded = true) shouldBe Seq(2)
  }

  test("array<double> input reads through the double accessor") {
    val cents = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Seq((0, Seq(0.1, 5.0))).toDF("vec_id", "embedding")
      .select(NearestCentroid(col("embedding"), cents, rounded = true).as("cell"))
      .head().getInt(0)
    got shouldBe 1
  }

  test("non-array input fails at ANALYSIS time with a typed error") {
    val ex = intercept[Exception] {
      Seq(1).toDF("x")
        .select(NearestCentroid(col("x"), Seq(Array(1.0)), rounded = true))
        .collect()
    }
    ex.getMessage.toLowerCase should include("nearest_centroid")
  }
}
