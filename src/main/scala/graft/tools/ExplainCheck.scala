// Scratch: runMain graft.tools.ExplainCheck — plan hygiene assertions.
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val interesting = Seq("q1_agg", "q3_shipping", "q5_region_revenue",
      "p5_watermark", "join_broadcast", "j2_semi_join", "o1_topk",
      "gh_stars_rollup", "text_bm25", "win_ntile_dense", "dedup_ngram_jaccard",
      // round 3: skew-salted join, funnel join-backs, vocab/bigram top-k,
      // the two accuracy-contract plans
      "join_skew_salted", "agg_funnel", "agg_retention",
      "text_vocab", "text_bigram", "ann_ivf_topk", "dedup_simhash",
      // round 4: clustered-copy scan (PushedFilters on the sort key),
      // cell-blocked embed dedup, mixture sampling, PII scrub
      "cat_clustered_scan", "dedup_embed_cosine", "text_mix", "text_pii_scrub")
    interesting.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).mkString("; ")
      val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val topk = plan.contains("TakeOrderedAndProject")
      val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).size
      println(s"== $name: codegenOps=$codegen bhj=$broadcasts smj=$smj topk=$topk")
      if (pushed.nonEmpty) println(s"   $pushed")
    }
    spark.stop()
  }
}
