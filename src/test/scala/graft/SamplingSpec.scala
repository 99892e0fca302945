package graft

import org.apache.spark.sql.functions._
import graft.catalog.{Append, Catalog, TableDef}
import graft.operators.{CatalogOps, Sampling}
import graft.sql.ChDialect

/** SAMPLE BY contract: deterministic windows, disjoint-windows-partition,
  * key-consistency across tables, the stored-bucket == query-side-bucket
  * identity, file-level pruning through the minmax sidecars, and the
  * dialect's `SAMPLE k [OFFSET m]` rewrite (including its loud failures).
  */
class SamplingSpec extends SparkSpecBase {

  test("sampleWindow: rounding, bounds, and refusals") {
    Catalog.sampleWindow(0.25) shouldBe (0, 16384)
    Catalog.sampleWindow(0.25, 0.5) shouldBe (32768, 49152)
    Catalog.sampleWindow(1.0) shouldBe (0, 65536)
    Catalog.sampleWindow(0.5, 0.5) shouldBe (32768, 65536)
    an[IllegalArgumentException] should be thrownBy Catalog.sampleWindow(0.0)
    an[IllegalArgumentException] should be thrownBy Catalog.sampleWindow(1.5)
    an[IllegalArgumentException] should be thrownBy Catalog.sampleWindow(0.5, 1.0)
    // a window entirely past the end rounds to zero buckets
    an[IllegalArgumentException] should be thrownBy
      Catalog.sampleWindow(1e-9, 0.9999999)
  }

  test("disjoint windows partition the table; re-reads are deterministic") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val halves = Seq(0.0, 0.5).map(off =>
      docs.filter(Sampling.sampleFilter(col("doc_id"), 0.5, off)))
    halves.map(_.count()).sum shouldBe n
    halves.head.join(halves(1), "doc_id").count() shouldBe 0L
    // deterministic: the same window selects the same ids on a re-read
    val a = halves.head.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = docs.filter(Sampling.sampleFilter(col("doc_id"), 0.5, 0.0))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    a should contain theSameElementsInOrderAs b
  }

  test("key-consistency: sampling both join sides keeps every sampled pair") {
    val cust = Tables.customer(spark, sf0001)
    val ords = Tables.orders(spark, sf0001)
    val joined = ords.join(cust, col("o_custkey") === col("c_custkey"))
    val sampledJoin =
      joined.filter(Sampling.sampleFilter(col("c_custkey"), 0.3)).count()
    val joinOfSamples = ords
      .filter(Sampling.sampleFilter(col("o_custkey"), 0.3))
      .join(cust.filter(Sampling.sampleFilter(col("c_custkey"), 0.3)),
        col("o_custkey") === col("c_custkey")).count()
    joinOfSamples shouldBe sampledJoin
  }

  test("stored bucket equals the query-side bucket; sampled read prunes files") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    val (df, kept, total) =
      try CatalogOps.sampledScanWithStats(spark, sf0001)
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // bucket-led clustering + bucket minmax sidecars: a quarter window
    // must drop files, not only rows
    total should be > 4
    kept should be < total
    kept should be > 0
    // the pruned+filtered read selects exactly the rows the query-side
    // bucket expression selects on the source table — the stored
    // materialized column and Sampling.bucket can never drift apart
    val expected = Tables.orders(spark, sf0001)
      .filter(Sampling.sampleFilter(col("o_custkey"), 0.25)).count()
    df.count() shouldBe expected
  }

  test("quarter windows re-assemble the whole table through the catalog read") {
    val src = Tables.supplier(spark, sf0001)
    val cat = new Catalog(spark)
    val tmp = tmpDir("graft-smp-sup")
    cat.createTable(Catalog.withSampleBy(
      TableDef("sup_smp", s"$tmp/sup_smp", src.schema,
        sortKeys = Seq("s_suppkey"), semantics = Append), "s_suppkey"))
    cat.append("sup_smp", src)
    val counts = (0 until 4).map(i =>
      cat.readSampled("sup_smp", 0.25, i * 0.25).count())
    counts.sum shouldBe src.count()
  }

  test("withSampleBy refusals: missing key, double declaration, partition key") {
    val schema = Tables.supplier(spark, sf0001).schema
    val base = TableDef("x", "/tmp/x", schema,
      sortKeys = Seq("s_suppkey"), semantics = Append)
    an[IllegalArgumentException] should be thrownBy
      Catalog.withSampleBy(base, "no_such_col")
    an[IllegalArgumentException] should be thrownBy
      Catalog.withSampleBy(Catalog.withSampleBy(base, "s_suppkey"), "s_suppkey")
    an[IllegalArgumentException] should be thrownBy
      Catalog.withSampleBy(base.copy(partitionKeys = Seq("s_nationkey")),
        "s_nationkey")
  }

  test("dialect SAMPLE rewrite: window filter, FINAL tolerance, loud failures") {
    val q = ChDialect.rewrite("SELECT count() FROM orders SAMPLE 0.25 OFFSET 0.5")
    q should include("(SELECT * FROM orders WHERE")
    q should include(">= 32768")
    q should include("< 49152")
    q should endWith("orders")
    // FINAL between table and SAMPLE parses (stripped like bare FINAL)
    ChDialect.rewrite("SELECT count(*) FROM orders FINAL SAMPLE 0.5") should
      include(">= 0")
    // the row-count form needs statistics — refused, not approximated
    an[IllegalArgumentException] should be thrownBy
      ChDialect.rewrite("SELECT count(*) FROM orders SAMPLE 1000")
    // a table with no declared sampling key is refused
    an[IllegalArgumentException] should be thrownBy
      ChDialect.rewrite("SELECT count(*) FROM mystery SAMPLE 0.5")
    // SAMPLE inside a string literal is never rewritten
    ChDialect.rewrite("SELECT 'FROM orders SAMPLE 0.5' AS s") shouldBe
      "SELECT 'FROM orders SAMPLE 0.5' AS s"
  }

  test("dialect WITH ROLLUP/CUBE/TOTALS rewrites") {
    ChDialect.rewrite("SELECT a, sum(x) FROM t GROUP BY a WITH ROLLUP") should
      include("GROUP BY ROLLUP(a)")
    ChDialect.rewrite("SELECT a, b, sum(x) FROM t GROUP BY a, b WITH CUBE") should
      include("GROUP BY CUBE(a, b)")
    ChDialect.rewrite("SELECT a, sum(x) FROM t GROUP BY a WITH TOTALS") should
      include("GROUP BY GROUPING SETS ((a), ())")
    // no modifier: untouched
    ChDialect.rewrite("SELECT a FROM t GROUP BY a ORDER BY a") shouldBe
      "SELECT a FROM t GROUP BY a ORDER BY a"
  }
}
