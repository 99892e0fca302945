// Scratch: runMain graft.tools.AnnProbe — phase attribution for
// cat_ann_index (round-14 optimization measurement).
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.{Append, Catalog, TableDef}
import graft.operators.Similarity

object AnnProbe {
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
      println(f"[annprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    Tables.embeddings(spark, d).count()
    (1 to 2).foreach { iter =>
      println(s"[annprobe] === iter $iter ===")
      val src = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      val cat = new Catalog(spark)
      val tmp = java.nio.file.Files.createTempDirectory("annprobe")
      time("create+append (train+encode)") {
        cat.createTable(TableDef("emb_ann_p", tmp.resolve("t").toString,
          src.schema, sortKeys = Seq("vec_id"), semantics = Append,
          annIndex = Some(graft.catalog.AnnIndexDef("embedding"))))
        cat.append("emb_ann_p", src)
      }
      val q = time("query frame read") {
        val qq = cat.read("emb_ann_p").filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        qq.count(); qq
      }
      val ann = time("readAnnTopK") {
        val a = cat.readAnnTopK("emb_ann_p", q, 5)
          .select(col("q_id"), col("n_id"))
        a.count(); a
      }
      val bf = time("brute-force twin") {
        val b = Similarity.queries("ann_cosine_topk")(spark, d)
          .select(col("q_id"), col("n_id"))
        b.count(); b
      }
      time("final joins") {
        val hits = bf.join(ann, Seq("q_id", "n_id"), "left_semi")
          .agg(count(lit(1)).as("nhits"))
        bf.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
          .select(col("n_exact"),
            (col("nhits") >= col("n_exact") * 0.5).as("recall_at5_ok"))
          .count()
      }
    }
    spark.stop()
  }
}
