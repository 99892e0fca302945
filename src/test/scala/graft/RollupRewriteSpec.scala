package graft

import org.apache.spark.sql.functions._
import graft.plans.{ProjectionDef, RollupRewrite}

/** The PROJECTION-analog optimizer rule: eligible count aggregates are
  * silently answered from a registered rollup; anything the rollup cannot
  * answer is left untouched.
  */
class RollupRewriteSpec extends SparkSpecBase {

  private def withProjection[A](body: (String, String) => A): A = {
    val base = tmpDir("proj-base") + "/base.parquet"
    val rollup = tmpDir("proj-roll") + "/rollup.parquet"
    import spark.implicits._
    // base: (k1 dim, k2 non-dim, v); two k1 groups, k2 splits them further
    Seq(("a", "x", 1L), ("a", "x", 2L), ("a", "y", 3L),
        ("b", "x", 4L), ("b", "y", 5L), ("b", "y", 6L))
      .toDF("k1", "k2", "v").write.parquet(base)
    spark.read.parquet(base).groupBy("k1")
      .agg(count(lit(1)).as("cnt")).write.parquet(rollup)
    RollupRewrite.register(spark, ProjectionDef(base, rollup, Seq("k1"), "cnt"))
    try body(base, rollup) finally RollupRewrite.clear()
  }

  test("eligible count aggregate is rewritten to scan the rollup, values intact") {
    withProjection { (base, rollup) =>
      val df = spark.read.parquet(base)
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
        .orderBy(col("k1"))
      val plan = df.queryExecution.executedPlan.toString
      plan should include(rollup)
      plan should not include base
      df.collect().map(r => (r.getString(0), r.getLong(1))) shouldBe
        Array(("a", 3L), ("b", 3L))
    }
  }

  test("grouping-only aggregate (DISTINCT dims) is answered from the rollup") {
    withProjection { (base, rollup) =>
      val df = spark.read.parquet(base).select(col("k1")).distinct()
        .orderBy(col("k1"))
      df.queryExecution.executedPlan.toString should include(rollup)
      df.collect().map(_.getString(0)) shouldBe Array("a", "b")
      // with a dim filter riding along
      val f = spark.read.parquet(base).filter(col("k1") =!= "a")
        .select(col("k1")).distinct()
      f.queryExecution.executedPlan.toString should include(rollup)
      f.collect().map(_.getString(0)) shouldBe Array("b")
    }
  }

  test("dim filter rides the rewrite; count stays correct") {
    withProjection { (base, rollup) =>
      val df = spark.read.parquet(base)
        .filter(col("k1") =!= "a")
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
      df.queryExecution.executedPlan.toString should include(rollup)
      df.collect().map(r => (r.getString(0), r.getLong(1))) shouldBe
        Array(("b", 3L))
    }
  }

  test("non-dim grouping, non-dim filter, and non-count aggregates are NOT rewritten") {
    withProjection { (base, rollup) =>
      val byNonDim = spark.read.parquet(base)
        .groupBy(col("k2")).agg(count(lit(1)).as("n"))
      byNonDim.queryExecution.executedPlan.toString should not include rollup

      val filterNonDim = spark.read.parquet(base)
        .filter(col("k2") === "x")
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
      filterNonDim.queryExecution.executedPlan.toString should not include rollup
      // and it still answers correctly from the base
      filterNonDim.collect().map(r => (r.getString(0), r.getLong(1))).toSet shouldBe
        Set(("a", 2L), ("b", 1L))

      val sumAgg = spark.read.parquet(base)
        .groupBy(col("k1")).agg(sum(col("v")).as("s"))
      sumAgg.queryExecution.executedPlan.toString should not include rollup

      val countCol = spark.read.parquet(base)
        .groupBy(col("k1")).agg(count(col("k2")).as("n"))
      countCol.queryExecution.executedPlan.toString should not include rollup

      val distinctCount = spark.read.parquet(base)
        .groupBy(col("k1")).agg(countDistinct(col("k2")).as("n"))
      distinctCount.queryExecution.executedPlan.toString should not include rollup
    }
  }

  test("ungrouped count over a filtered-out slice yields 0 through the rewrite, not null") {
    withProjection { (base, rollup) =>
      val df = spark.read.parquet(base)
        .filter(col("k1") === "zzz")
        .agg(count(lit(1)).as("n"))
      df.queryExecution.executedPlan.toString should include(rollup)
      val row = df.collect()(0)
      row.isNullAt(0) shouldBe false
      row.getLong(0) shouldBe 0L
    }
  }

  test("nondeterministic filters and multi-path scans are NOT rewritten") {
    withProjection { (base, rollup) =>
      val randFiltered = spark.read.parquet(base)
        .filter(rand(7) < 0.5)
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
      randFiltered.queryExecution.executedPlan.toString should not include rollup

      val extra = tmpDir("proj-extra") + "/extra.parquet"
      import spark.implicits._
      Seq(("a", "x", 9L)).toDF("k1", "k2", "v").write.parquet(extra)
      val multi = spark.read.parquet(base, extra)
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
      multi.queryExecution.executedPlan.toString should not include rollup
      // and the multi-path answer keeps the extra file's rows
      multi.collect().map(r => (r.getString(0), r.getLong(1))).toSet shouldBe
        Set(("a", 4L), ("b", 3L))
    }
  }

  test("a stale rollup missing a dim column degrades to the base scan, not a failure") {
    withProjection { (base, rollup) =>
      import spark.implicits._
      // clobber the rollup with one lacking cnt — the rule must leave the
      // plan alone (and certainly not throw inside the optimizer)
      Seq(("a")).toDF("k1").write.mode("overwrite").parquet(rollup)
      val df = spark.read.parquet(base)
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet shouldBe
        Set(("a", 3L), ("b", 3L))
    }
  }

  test("the registered production query is stable across re-invocations in one session") {
    // clear afterwards: the production registration is process-global and
    // would otherwise leave an active rewrite pointed at a /tmp rollup for
    // every later suite sharing this test JVM
    try {
      val fn = SparkEntry.queries("proj_rollup_count")
      val a = fn(spark, sf0001).collect().toSeq
      fn(spark, sf0001).collect().toSeq shouldBe a
      fn(spark, sf0001).collect().toSeq shouldBe a
    } finally RollupRewrite.clear()
  }

  test("sum measures and expressions over aggregates rewrite onto the rollup") {
    val base = tmpDir("proj-base") + "/base.parquet"
    val rollup = tmpDir("proj-roll") + "/rollup.parquet"
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 20L))
      .toDF("k1", "v").write.parquet(base)
    spark.read.parquet(base).groupBy("k1")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"))
      .write.parquet(rollup)
    RollupRewrite.register(spark, ProjectionDef(base, rollup,
      Seq("k1"), "cnt", sumCols = Map("v" -> "sum_v")))
    try {
      // round(sum), a sum/count ratio, and a bare count — all in one
      // aggregate, all answered from the rollup
      val df = spark.read.parquet(base)
        .groupBy(col("k1"))
        .agg(round(sum(col("v")), 1).as("s"),
          (sum(col("v")) / count(lit(1))).as("avg_v"),
          count(lit(1)).as("n"))
        .orderBy(col("k1"))
      df.queryExecution.executedPlan.toString should include(rollup)
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))) shouldBe
        Array(("a", 6L, 2.0, 3L), ("b", 30L, 15.0, 2L))
      // a sum over a column the rollup does NOT carry is left alone
      val other = spark.read.parquet(base)
        .groupBy(col("k1")).agg(sum(col("v") * 2).as("s2"))
      other.queryExecution.executedPlan.toString should not include rollup
    } finally RollupRewrite.clear()
  }

  test("decimal sum measures keep the ORIGINAL aggregate's type through the rewrite") {
    // sum-of-decimal widens precision per level: base sum(decimal(12,2)) is
    // decimal(22,2), the rollup's sum(sum_v) would be decimal(32,2) — past
    // the precision-18 boundary the UnsafeRow encoding flips long-backed →
    // byte-array, so without the cast-back parents reading the pinned
    // exprId would decode garbage
    val base = tmpDir("proj-base") + "/base.parquet"
    val rollup = tmpDir("proj-roll") + "/rollup.parquet"
    import spark.implicits._
    Seq(("a", "1.25"), ("a", "2.50"), ("b", "10.00"))
      .toDF("k1", "raw")
      .select(col("k1"), col("raw").cast("decimal(12,2)").as("vd"))
      .write.parquet(base)
    spark.read.parquet(base).groupBy("k1")
      .agg(count(lit(1)).as("cnt"), sum(col("vd")).as("sum_vd"))
      .write.parquet(rollup)
    RollupRewrite.register(spark, graft.plans.ProjectionDef(base, rollup,
      Seq("k1"), "cnt", sumCols = Map("vd" -> "sum_vd")))
    try {
      val df = spark.read.parquet(base)
        .groupBy(col("k1")).agg(sum(col("vd")).as("s"))
        .orderBy(col("k1"))
      df.queryExecution.executedPlan.toString should include(rollup)
      df.schema("s").dataType shouldBe
        org.apache.spark.sql.types.DecimalType(22, 2)
      df.collect().map(r => (r.getString(0), r.getDecimal(1).toPlainString)) shouldBe
        Array(("a", "3.75"), ("b", "10.00"))
    } finally RollupRewrite.clear()
  }

  test("a dim INSIDE an output expression binds to the rewritten aggregate's output") {
    // guards the implicit invariant that grouping exprIds survive groupBy:
    // the rebind now prefers the post-groupBy attribute explicitly
    withProjection { (base, rollup) =>
      val df = spark.read.parquet(base)
        .groupBy(col("k1"))
        .agg(concat(col("k1"), lit("!")).as("tag"), count(lit(1)).as("n"))
        .orderBy(col("k1"))
      df.queryExecution.executedPlan.toString should include(rollup)
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))) shouldBe
        Array(("a", "a!", 3L), ("b", "b!", 3L))
    }
  }

  test("parents above the aggregate (sort, projection) survive the id-preserving swap") {
    withProjection { (base, rollup) =>
      val df = spark.read.parquet(base)
        .groupBy(col("k1")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("k1"))
        .select(concat(col("k1"), lit(":"), col("n")).as("tag"))
      df.queryExecution.executedPlan.toString should include(rollup)
      df.collect().map(_.getString(0)) shouldBe Array("a:3", "b:3")
    }
  }
}
