// Scratch: runMain graft.tools.FtProbe2 — stage attribution INSIDE the
// full-text sidecar build pipeline (round-14 measurement).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables
import graft.catalog.{Append, Catalog, TableDef}

object FtProbe2 {
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
      println(f"[ftprobe2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val src = Tables.orders(spark, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderpriority"),
      concat(lit("clerk_"), col("o_custkey") % 1000, lit(" pri_"),
        translate(col("o_orderpriority"), "-", "_")).as("note"))
    // write the table WITHOUT declaring the index, so we can run the
    // pipeline stages by hand over its files
    val cat = new Catalog(spark)
    val tmp = java.nio.file.Files.createTempDirectory("ftprobe2")
    cat.createTable(TableDef("oft2", tmp.resolve("t").toString, src.schema,
      sortKeys = Seq("o_orderkey"), semantics = Append))
    cat.append("oft2", src)
    val dir = tmp.resolve("t").toString
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    println(s"[ftprobe2] files: ${files.length}")
    (1 to 2).foreach { iter =>
      println(s"[ftprobe2] === iter $iter ===")
      val base = spark.read
        .schema(StructType(Seq(src.schema("note"))))
        .parquet(files.toSeq: _*)
      val quads = base.select(input_file_name().as("__file"),
        lit("note").as("__col"),
        explode(split(coalesce(col("note"), lit("")),
          "[^A-Za-z0-9_]+")).as("__tok"),
        col("_metadata.row_index").as("__row"))
        .filter(col("__tok") =!= "").distinct()
      time("quads distinct count")(quads.count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__file"), col("__col"), col("__tok"))
        .orderBy(col("__row"))
      val perTok = quads
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= lit(4097))
        .groupBy(col("__file"), col("__col"), col("__tok"))
        .agg(count(lit(1)).as("__n"),
          sort_array(collect_list(col("__row"))).as("__rows"))
      time("perTok count")(perTok.count())
      val vocabDf = perTok.groupBy(col("__file"), col("__col"))
        .agg(count(lit(1)).as("__vocab"))
        .withColumn("__overflow", col("__vocab") > lit(4096))
      val admitted = broadcast(vocabDf.filter(!col("__overflow"))
        .select(col("__file"), col("__col")))
      val folded = perTok.join(admitted, Seq("__file", "__col"))
        .groupBy(col("__file"), col("__col"))
        .agg(sort_array(collect_list(when(col("__n") > 4096,
          col("__tok")))).as("dense"),
          map_from_entries(collect_list(when(col("__n") <= 4096,
            struct(col("__tok"), col("__rows"))))).as("toks"))
        .select(col("__file"), col("__col"),
          to_json(struct(lit("postings").as("kind"), col("dense"),
            col("toks"))).as("__json"))
      time("folded JSON count")(folded.count())
      time("folded foreachPartition noopwrite")(
        folded.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
          it.foreach(_ => ())
        })
    }
    spark.stop()
  }
}
