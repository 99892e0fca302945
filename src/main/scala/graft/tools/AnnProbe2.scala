// Scratch: runMain graft.tools.AnnProbe2 — micro-attribution for the ANN
// maintenance path: CentroidStore saves, tiny catalog appends.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.catalog.{Append, Catalog, CentroidStore, ReplacingDedup, TableDef}

object AnnProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[annprobe2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(10).count() // session warm
    (1 to 2).foreach { iter =>
      println(s"[annprobe2] === iter $iter ===")
      val cat = new Catalog(spark)
      val tmp = java.nio.file.Files.createTempDirectory("annprobe2").toString
      val st = time("store createTable")(new CentroidStore(spark, cat, tmp))
      val cents = Array.tabulate(16)(i => Array.fill(64)(i.toDouble))
      time("getOrTrain ivf (save)")(
        st.getOrTrain("v1", "ivf16")(cents.toSeq))
      val books = Array.tabulate(128)(i => Array.fill(8)(i.toDouble))
      time("getOrTrain pq (save)")(
        st.getOrTrain("v1", "pq8x16")(books.toSeq))
      time("load x2") {
        st.load("v1", "ivf16"); st.load("v1", "pq8x16")
      }
      // a codes-like append: 2000 rows, ReplacingDedup, sort by cell
      val codes = (0L until 2000L)
        .map(i => (i, (i % 16).toInt, Array.fill(8)(i.toByte), 1L))
        .toDF("id", "cell", "code", "encoded_at")
      time("codes createTable+append") {
        cat.createTable(TableDef("codes_p", s"$tmp/codes$iter", codes.schema,
          sortKeys = Seq("cell"),
          semantics = ReplacingDedup(Seq("id"), "encoded_at")))
        cat.append("codes_p", codes)
        cat.dropTable("codes_p")
      }
    }
    spark.stop()
  }
}
