package graft

import graft.operators.Similarity

/** ANN invariants at sf0.001: the IVF-probed path trades recall for touching
  * ~nProbe/cells of the corpus; assert that trade stays favorable.
  */
class SimilaritySpec extends SparkSpecBase {

  private def rowsToTopk(rows: Array[org.apache.spark.sql.Row]): Map[Long, Seq[Long]] =
    rows.groupBy(_.getAs[Long]("q_id"))
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
    // raw-rows floor on the unwrapped operator (the ann_ivf_topk query now
    // returns the in-plan recall contract over these same rows)
    val exact = rowsToTopk(Similarity.queries("ann_cosine_topk")(spark, sf0001).collect())
    val ivf = rowsToTopk(Similarity.ivfTopK(spark, sf0001).collect())
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      val hits = ivf.getOrElse(q, Seq.empty).toSet.intersect(e).size
      hits.toDouble / e.size
    }
    (recalls.sum / recalls.size) should be >= 0.6
  }

  test("nProbe = nCells degenerates IVF to the exact brute-force answer (via config)") {
    // probing every cell means no candidate is pruned — the IVF result must
    // equal brute force bit for bit; going through GraftConfig pins the
    // ivf_nprobe/ivf_ncells plumbing end to end, file → knobs → plan
    val exact = rowsToTopk(Similarity.queries("ann_cosine_topk")(spark, sf0001).collect())
    val cfg = graft.app.GraftConfig.parse("ivf_nprobe: 16\nivf_ncells: 16\n")
    val full = rowsToTopk(Similarity.ivfTopK(spark, sf0001, cfg).collect())
    full shouldBe exact
  }

  test("ann_ivf_topk contract row reports the brute-force universe and a met floor") {
    val row = Similarity.queries("ann_ivf_topk")(spark, sf0001).collect().head
    row.getAs[Long]("n_exact") shouldBe 100L // 20 queries × 5
    row.getAs[Boolean]("recall_at5_ok") shouldBe true
  }
}
