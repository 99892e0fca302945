package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic probe for the KILL QUERY primitive choice (QueryGovernor):
  * which driver-side cancellation API actually stops an AQE query
  * mid-flight — `cancelJobGroupAndFutureJobs` (mode A) vs session tags +
  * `interruptTag` (mode B). Run: `runMain graft.tools.KillProbe A|B`.
  */
object KillProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val mode = args.headOption.getOrElse("A")
    val t0 = System.currentTimeMillis()
    try {
      if (mode == "A") {
        spark.sparkContext.setJobGroup("g1", "probe", true)
        new Thread(() => {
          Thread.sleep(1500)
          spark.sparkContext.cancelJobGroupAndFutureJobs("g1", "killed")
        }).start()
      } else if (mode == "B") {
        cls.addTag("t1")
        new Thread(() => {
          Thread.sleep(1500)
          println(s"interrupted: ${cls.interruptTag("t1")}")
        }).start()
      } else {
        spark.sparkContext.addJobTag("t2")
        new Thread(() => {
          Thread.sleep(1500)
          while (true) {
            spark.sparkContext.cancelJobsWithTag("t2", "killed by probe")
            println("cancelJobsWithTag issued")
            Thread.sleep(500)
          }
        }).start()
      }
      val r = spark.range(0L, Long.MaxValue / 1000L)
        .selectExpr("sum(id % 7)").collect().toSeq
      println(s"COMPLETED (cancel missed): $r")
    } catch {
      case e: Throwable =>
        println(s"THREW after ${System.currentTimeMillis() - t0} ms: " +
          s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
    }
    spark.stop()
    sys.exit(0)
  }
}
