// Scratch: runMain graft.tools.FtProbe [sfDir] — phase attribution for
// cat_fulltext_scan (round-14 optimization measurement; guide §1).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.{Append, Catalog, TableDef}

object FtProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ftprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Tables.orders(spark, d).count() // warm listing
    (1 to 2).foreach { iter =>
      println(s"[ftprobe] === iter $iter ===")
      val src = Tables.orders(spark, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"),
        concat(lit("clerk_"), col("o_custkey") % 1000, lit(" pri_"),
          translate(col("o_orderpriority"), "-", "_")).as("note"))
      // A: write WITHOUT any index (pure clustered append cost)
      time("plain create+append") {
        val cat = new Catalog(spark)
        val tmp = java.nio.file.Files.createTempDirectory("ftprobe-plain")
        cat.createTable(TableDef("oft_plain", tmp.resolve("t").toString,
          src.schema, sortKeys = Seq("o_orderkey"), semantics = Append))
        cat.append("oft_plain", src)
      }
      // B: write WITH the full-text sidecar (the gate's table)
      val catB = new Catalog(spark)
      val tmpB = java.nio.file.Files.createTempDirectory("ftprobe-ft")
      time("ft create+append") {
        catB.createTable(TableDef("oft_ft", tmpB.resolve("t").toString,
          src.schema, sortKeys = Seq("o_orderkey"), semantics = Append,
          fullTextCols = Seq("note" -> 4096)))
        catB.append("oft_ft", src)
      }
      val (clerk, pri) = time("head probe") {
        val h = src.orderBy(col("o_orderkey"))
          .select(col("o_custkey") % 1000, col("o_orderpriority")).head()
        (h.getLong(0), h.getString(1))
      }
      time("readFullTextAnd+agg") {
        val (df, _, _) = catB.readFullTextAnd("oft_ft", "note",
          Seq(s"clerk_$clerk", s"pri_${pri.replace('-', '_')}"))
        df.filter(col("o_custkey") % 1000 === clerk &&
            col("o_orderpriority") === pri)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("o_orderstatus")).count()
      }
    }
    spark.stop()
  }
}
