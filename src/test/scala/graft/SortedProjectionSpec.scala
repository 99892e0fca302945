package graft

import org.apache.spark.sql.functions._
import graft.plans.{SortedProjectionDef, SortedProjectionRewrite}

/** Gates of the alternate-ORDER-BY projection swap beyond the oracled
  * query: the rule must fire ONLY where the sorted copy can actually
  * skip, and degrade to a no-op on schema drift instead of failing the
  * query.
  */
class SortedProjectionSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeBase(dir: String): String = {
    val base = s"$dir/base"
    spark.range(0, 1000)
      .select(col("id").as("a"), (col("id") % 13).as("b"),
        (col("id") * 2).as("c"))
      .write.mode("overwrite").parquet(base)
    base
  }

  private def register(base: String, dir: String,
                       cols: Seq[String] = Seq("a", "b", "c")): String = {
    val proj = s"$dir/proj"
    spark.read.parquet(base).select(cols.map(col): _*)
      .repartitionByRange(4, col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(proj)
    SortedProjectionRewrite.register(spark, SortedProjectionDef(base, proj, "b"))
    proj
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("swaps on a sort-key predicate, result identical, parents intact") {
    val dir = tmpDir("sp")
    val base = writeBase(dir)
    register(base, dir)
    try {
      val q = spark.read.parquet(base).filter(col("b") === 5)
        .select(col("a"), col("c")).orderBy(col("a"))
      planOf(q) should include("proj")
      planOf(q) should not include "base"
      q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
        (0L until 1000L).filter(_ % 13 == 5).map(a => (a, a * 2))
    } finally SortedProjectionRewrite.unregister(base)
  }

  test("a filter on a non-key column leaves the base scan alone") {
    val dir = tmpDir("sp")
    val base = writeBase(dir)
    register(base, dir)
    try {
      val q = spark.read.parquet(base).filter(col("a") === 5)
      planOf(q) should include("base")
      planOf(q) should not include "proj"
    } finally SortedProjectionRewrite.unregister(base)
  }

  test("a projection missing a scanned column degrades to no swap") {
    val dir = tmpDir("sp")
    val base = writeBase(dir)
    register(base, dir, cols = Seq("a", "b")) // no c
    try {
      val q = spark.read.parquet(base).filter(col("b") === 5)
        .select(col("c"))
      planOf(q) should include("base")
      q.count() shouldBe (0L until 1000L).count(_ % 13 == 5)
    } finally SortedProjectionRewrite.unregister(base)
  }

  test("unregistered bases never swap") {
    val dir = tmpDir("sp")
    val base = writeBase(dir)
    val q = spark.read.parquet(base).filter(col("b") === 5)
    planOf(q) should not include "proj"
  }
}
