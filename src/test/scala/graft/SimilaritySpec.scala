package graft

import graft.operators.Similarity

/** ANN invariants at sf0.001: the IVF-probed path trades recall for touching
  * ~nProbe/cells of the corpus; assert that trade stays favorable.
  */
class SimilaritySpec extends SparkSpecBase {

  private def topk(name: String): Map[Long, Seq[Long]] =
    Similarity.queries(name)(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("n_id")).toSeq)
      .toMap

  test("brute-force top-k: k results per query, self excluded, ranks dense") {
    val rows = Similarity.queries("ann_cosine_topk")(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.size shouldBe 20
    byQ.values.foreach { rs =>
      rs.length shouldBe 5
      rs.map(_.getAs[Long]("rnk")).sorted shouldBe Array(1L, 2L, 3L, 4L, 5L)
    }
    rows.foreach(r => r.getAs[Long]("n_id") should not be r.getAs[Long]("q_id"))
  }

  test("IVF-probed top-k keeps recall@5 ≥ 0.6 vs brute force") {
    val exact = topk("ann_cosine_topk")
    val ivf = topk("ann_ivf_topk")
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      val hits = ivf.getOrElse(q, Seq.empty).toSet.intersect(e).size
      hits.toDouble / e.size
    }
    (recalls.sum / recalls.size) should be >= 0.6
  }
}
