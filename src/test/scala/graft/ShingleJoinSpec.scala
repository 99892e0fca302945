package graft

import org.apache.spark.sql.functions._
import graft.functions.ShingleJoin

/** The codegen shingle kernel must be byte-identical to the interpreted
  * HOF form it replaced (the dedup family's oracles replicate that form
  * in DuckDB, so any divergence is a correctness break, not a perf bug).
  */
class ShingleJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val hof3 = expr(
    """CASE WHEN size(toks) < 3 THEN array()
      |     ELSE transform(sequence(1, size(toks) - 2),
      |                    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))
      |END""".stripMargin)

  test("equals the HOF transform+concat_ws form on real corpus tokens") {
    val docs = Tables.documents(spark, sf0001)
      .select(split(lower(col("text")), "\\s+").as("toks"))
    val diff = docs.select(hof3.as("a"), ShingleJoin(col("toks"), 3).as("b"))
      .filter(!(col("a") <=> col("b")))
    diff.count() shouldBe 0L
  }

  test("edge cases: short arrays, empty tokens, unicode, null elements") {
    val rows = Seq(
      Seq.empty[String],
      Seq("one"),
      Seq("one", "two"),
      Seq("one", "two", "three"),
      Seq("", "", ""),                       // empty tokens still join
      Seq("a", "", "b", "c"),
      Seq("héllo", "wörld", "日本語", "x"),  // multi-byte UTF-8
      Seq("a", "b", "c", "d", "e", "f"))
      .toDF("toks")
    val diff = rows.select(hof3.as("a"), ShingleJoin(col("toks"), 3).as("b"))
      .filter(!(col("a") <=> col("b")))
    diff.count() shouldBe 0L
    // explicit expectations, not only HOF agreement
    val got = rows.select(ShingleJoin(col("toks"), 3).as("s")).collect()
      .map(_.getSeq[String](0))
    got(0) shouldBe Seq.empty
    got(1) shouldBe Seq.empty
    got(2) shouldBe Seq.empty
    got(3) shouldBe Seq("one two three")
    got(4) shouldBe Seq("  ")                // "" + ' ' + "" + ' ' + ""
    got(5) shouldBe Seq("a  b", " b c")
    got(7) shouldBe Seq("a b c", "b c d", "c d e", "d e f")
  }

  test("null elements are skipped with their separator (the concat_ws contract)") {
    val withNulls = Seq(
      (1, Array[String]("a", null, "c", "d")))
      .toDF("id", "toks")
    val got = withNulls.select(ShingleJoin(col("toks"), 3).as("s"))
      .head().getSeq[String](0)
    got shouldBe Seq("a c", "c d") // null skipped, no double separator
    val hof = withNulls.select(hof3.as("s")).head().getSeq[String](0)
    got shouldBe hof
  }

  test("width 1 and width > n behave; non-string input refused at analysis") {
    val df = Seq(Seq("x", "y")).toDF("toks")
    df.select(ShingleJoin(col("toks"), 1).as("s")).head().getSeq[String](0) shouldBe Seq("x", "y")
    df.select(ShingleJoin(col("toks"), 5).as("s")).head().getSeq[String](0) shouldBe Seq.empty
    an[Exception] should be thrownBy
      Seq((1, 2)).toDF("a", "toks").select(ShingleJoin(col("toks"), 3)).collect()
  }
}
