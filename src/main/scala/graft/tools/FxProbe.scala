// Scratch: runMain graft.tools.FxProbe [sfDir]
// A/B the Fixpoint round's delta shape: `step(f).distinct().except(acc)`
// vs `step(f).except(acc)`. EXCEPT (distinct semantics) is rewritten by
// ReplaceExceptWithAntiJoin to Distinct(LeftAnti(left, right)) — so the
// inner distinct should be a redundant extra aggregate+exchange per
// round. Prints both one-round plans, runs the full cte_recursive loop
// both ways with a job/stage/task listener, and hash-compares results.
package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object FxProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    def settle(): Unit = {
      var last = (-1L, -1L, -1L); var cur = (jobs.get, stages.get, tasks.get)
      while (cur != last) { Thread.sleep(200); last = cur; cur = (jobs.get, stages.get, tasks.get) }
    }

    val cust = graft.Tables.customer(spark, d)
    val edges = cust.filter(col("c_custkey") > 1)
      .select(col("c_custkey").as("node"),
        floor(col("c_custkey") / 2).cast("long").as("parent"))
    def seed = cust.filter(col("c_custkey") <= 64)
      .select(col("c_custkey").as("start"), col("c_custkey").as("cur"))
    def step(f: DataFrame): DataFrame =
      f.join(edges, col("cur") === col("node"))
        .select(col("start"), col("parent").as("cur"))

    // one-round plan shapes
    val acc0 = seed.distinct().localCheckpoint()
    println("=== round-1 delta WITH inner distinct ===")
    step(acc0).distinct().except(acc0).explain("formatted")
    println("=== round-1 delta WITHOUT inner distinct ===")
    step(acc0).except(acc0).explain("formatted")

    def loop(inner: Boolean): DataFrame = {
      var acc = seed.distinct().localCheckpoint()
      var frontier = acc
      var rounds = 0
      while (rounds < 100 && !frontier.isEmpty) {
        val stepped = step(frontier)
        val fresh = (if (inner) stepped.distinct() else stepped)
          .except(acc).localCheckpoint(false)
        acc = acc.unionByName(fresh)
        frontier = fresh
        rounds += 1
      }
      acc.groupBy(col("start"))
        .agg((count(lit(1)) - 1).as("n_ancestors"), min(col("cur")).as("root"))
        .orderBy(col("start"))
    }

    Seq(true, false).foreach { inner =>
      settle()
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val w0 = System.nanoTime()
      val rows = loop(inner).collect()
      val wall = (System.nanoTime() - w0) / 1e9
      settle()
      val hash = rows.map(_.toString).sorted.mkString("|").hashCode
      println(f"[fxprobe] inner=$inner%-5s jobs=${jobs.get - j0}%-4d stages=${stages.get - s0}%-4d tasks=${tasks.get - t0}%-6d wall=$wall%.2f rows=${rows.length} hash=$hash")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
