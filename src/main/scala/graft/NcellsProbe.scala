package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Scale probe for the IVF blocking lever (round-5 verdict item 1 "done"
  * criteria): time [[Similarity.embedNearDupPairs]] at increasing
  * `nCells` on one corpus and print a JSON line per setting.
  *
  * Pair-generation cost is Σ|cell|² ≈ n²/nCells, so wall-time should FALL
  * as nCells rises — before the broadcast-centroid fix it mostly rose,
  * because cell assignment embedded all centroids as plan literals and the
  * plan/codegen cost grew O(nCells·dim) per row. Run at sf10:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "runMain graft.NcellsProbe 16 64 256"
  */
object NcellsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cells = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 64, 256)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding"))
    corpus.count() // warm file listing + footers outside the timed region
    cells.foreach { k =>
      val t0 = System.nanoTime()
      // fresh training per setting (version key includes k via memo key),
      // same threshold as the dedup_embed_cosine query
      val n = Similarity.embedNearDupPairs(corpus, nCells = k,
        threshold = 0.4, version = Some(s"$sfDir#k=$k")).count()
      val cold = (System.nanoTime() - t0) / 1e9
      // second pass hits the in-process training memo → isolates the
      // pair-generation phase; cold - warm ≈ Lloyd training cost
      val t1 = System.nanoTime()
      Similarity.embedNearDupPairs(corpus, nCells = k,
        threshold = 0.4, version = Some(s"$sfDir#k=$k")).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(s"""{"probe":"ncells","sf":"$sfDir","ncells":$k,"pairs":$n,"cold_sec":$cold,"pair_sec":$warm,"train_sec":${cold - warm}}""")
    }
    spark.stop()
  }
}
