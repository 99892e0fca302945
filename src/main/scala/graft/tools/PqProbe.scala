package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** IVF-PQ recall probe: measures recall@5 of the ADC-scored search vs the
  * brute-force exact top-5 across nProbe settings — the measurement behind
  * the `ann_ivfpq_topk` contract floor (the same measure-don't-guess
  * discipline as the round-6 ncells sweep).
  *
  * Usage: runMain graft.tools.PqProbe <sfDir> [nProbe,nProbe,...]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(2, 4, 8, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bf = Similarity.queries("ann_cosine_topk")(spark, sfDir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probes.foreach { np =>
      val t0 = System.nanoTime()
      val pq = Similarity.pqTopK(spark, sfDir, nProbe = np)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = bf.intersect(pq).size.toDouble / bf.size
      println(f"nProbe=$np%3d recall@5=$recall%.3f (${bf.intersect(pq).size}/${bf.size}) ${secs}%.2f s")
    }
    spark.stop()
  }
}
