// Scratch: runMain graft.tools.BpeProbe — per-round cost of the BPE
// train loop (collect vs checkpoint), round-14 measurement.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

object BpeProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (base, tb) = t {
      Tables.documents(spark, d)
        .select(explode(TextFns.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .withColumn("s", array_join(split(col("w"), ""), " "))
        .localCheckpoint()
    }
    println(f"[bpeprobe] base build: $tb%.2f s rows=${base.count()} parts=${base.rdd.getNumPartitions}")
    var words = base
    (1 to 24).foreach { k =>
      val (top, tc) = t {
        words.select(col("freq"), split(col("s"), " ").as("l"))
          .filter(size(col("l")) >= 2)
          .select(col("freq"), col("l"),
            explode(sequence(lit(1), size(col("l")) - 1)).as("i"))
          .select(col("freq"),
            element_at(col("l"), col("i")).as("a"),
            element_at(col("l"), col("i") + 1).as("b"))
          .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1).collect()
      }
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      val pat = lit(" " + a + " " + b + " ")
      val rep = lit(" " + a + b + " ")
      val (nw, tk) = t {
        words.withColumn("s",
          trim(replace(replace(
            concat(lit(" "), col("s"), lit(" ")), pat, rep), pat, rep)))
          .localCheckpoint()
      }
      words = nw
      println(f"[bpeprobe] round $k%2d: collect=$tc%.2f ckpt=$tk%.2f")
    }
    spark.stop()
  }
}
