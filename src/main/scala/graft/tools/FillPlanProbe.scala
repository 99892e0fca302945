// Scratch: runMain graft.tools.FillPlanProbe — WITH FILL plan hygiene.
package graft.tools

import org.apache.spark.sql.SparkSession

/** Observes the unbounded `ORDER BY … WITH FILL` plan: the body must bind
  * to ONE CTE definition (join source + min/max bounds as references)
  * instead of three inlined copies — the round-10 "what's wrong" #2 fix.
  */
object FillPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val df = graft.sql.GraftSql.chSql(spark, d,
      "SELECT rk, count() AS n FROM (SELECT n_regionkey * 2 AS rk " +
        "FROM nation) t GROUP BY rk ORDER BY rk WITH FILL")
    val opt = df.queryExecution.optimizedPlan.toString
    val phys = df.queryExecution.executedPlan.toString
    println(s"withCTE=${opt.contains("WithCTE")}")
    println(s"cteRefs=${opt.linesIterator.count(_.contains("CTERelationRef"))}")
    println(s"physScans=${phys.linesIterator.count(_.contains("FileScan"))}" +
      s" reused=${phys.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ReusedSubquery"))}")
    println(s"rows=${df.collect().length}")
    spark.stop()
  }
}
