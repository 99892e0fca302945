package graft

import org.apache.spark.sql.functions._
import graft.functions.GramDigests

/** The positional K-gram digest kernel behind dedup_substring. */
class GramDigestsSpec extends SparkSpecBase {
  import spark.implicits._

  test("digests equal the HOF md5(concat_ws(slice)) formulation exactly") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b c d e f g h",          // exactly k tokens -> one gram
      "short doc",                 // < k -> empty
      "x  doubled   spaces stay empty tokens here ok tail",
      "").toDF("text")
      .select(split(lower(col("text")), "\\s+").as("toks"))
      // + an array with NULL entries: concat_ws skips the null AND its
      // separator, and the kernel must mirror that byte stream
      .union(Seq(1).toDF("i").select(
        expr("array('a', CAST(NULL AS STRING), 'b', 'c', 'd', 'e', 'f', 'g', 'h')")
          .as("toks")))
    val both = docs.select(
      GramDigests(col("toks"), 8).as("kernel"),
      expr("""CASE WHEN size(toks) < 8 THEN array()
             |     ELSE transform(sequence(1, size(toks) - 7),
             |            i -> md5(concat_ws(' ', slice(toks, i, 8))))
             |END""".stripMargin).as("hof"))
      .collect()
    both.foreach { r =>
      r.getSeq[String](0) shouldBe r.getSeq[String](1)
    }
    // the k-token doc really produced one gram (guard isn't over-eager)
    both(1).getSeq[String](0).length shouldBe 1
    both(2).getSeq[String](0) shouldBe empty
  }

  test("kernel runs inside WholeStageCodegen (no fallback to interpreted)") {
    val d = Tables.documents(spark, sf0001)
      .select(split(lower(col("text")), "\\s+").as("toks"))
      .select(GramDigests(col("toks"), 8).as("g"))
    d.queryExecution.executedPlan.toString should include("*(1) Project [gramdigests")
    d.select(explode(col("g")).as("h")).count() should be > 0L
  }

  test("non-array<string> input fails at ANALYSIS time with a typed error") {
    // the kernel reads UTF8String elements off the ArrayData buffer — a
    // wrong-typed child must be a typed analysis error, never a mid-task
    // ClassCastException
    val df = Seq((Seq(1L, 2L, 3L), "plain")).toDF("nums", "s")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      df.select(GramDigests(col("nums"), 2)).collect()
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      df.select(GramDigests(col("s"), 2)).collect()
  }
}
