package graft

import org.apache.spark.sql.functions._
import graft.operators.CatalogOps
import scala.jdk.CollectionConverters._

/** Evidence for the O3 clustering claim (Catalog.append's
  * repartitionByRange + sortWithinPartitions ≈ MergeTree ORDER BY): the
  * sort-key predicate must reach the Parquet scan as a pushed filter, and
  * the clustered layout must make most row groups' min/max stats exclude
  * it — measured from the footers themselves, not inferred.
  */
class CatalogOpsSpec extends SparkSpecBase {

  test("clustered copy: sort-key predicate is pushed to the scan") {
    val (df, _) = CatalogOps.clusteredOrdersWithPath(spark, sf0001)
    val plan = df.filter(col("o_orderkey").between(100, 200))
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThanOrEqual(o_orderkey,100)")
    plan should include("LessThanOrEqual(o_orderkey,200)")
  }

  test("clustered copy: range layout leaves most row groups skippable by min/max stats") {
    // repartitionByRange fans out to spark.sql.shuffle.partitions files;
    // raise it locally so the skipping claim has real granularity
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val (_, path) =
      try CatalogOps.clusteredOrdersWithPath(spark, sf0001)
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    val blocks = fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.startsWith("part-"))
      .flatMap { st =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey")
            .getOrElse(fail("o_orderkey column chunk missing"))
          val s = c.getStatistics
          (s.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        } finally r.close()
      }
    // enough granularity that "most are skippable" is a real claim
    blocks.size should be >= 8
    val matching = blocks.count { case (mn, mx) => mx >= 100L && mn <= 200L }
    // range clustering ⇒ the probed key range lives in very few row groups
    matching should be <= math.max(2, blocks.size / 4)
    // and the layout partitions the keyspace: group ranges don't all overlap
    val sorted = blocks.sortBy(_._1)
    sorted.sliding(2).count {
      case Seq((_, aMax), (bMin, _)) => bMin > aMax
      case _ => false
    } should be >= blocks.size / 2
  }
}
