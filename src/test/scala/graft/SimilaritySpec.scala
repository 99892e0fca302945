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

  test("IVF-PQ top-k keeps recall@5 ≥ 0.5 vs brute force; candidates come from codes") {
    // raw-rows floor on the unwrapped operator (the ann_ivfpq_topk query
    // returns the in-plan recall contract over these same rows); measured
    // 0.67 at sf0.01 — the exact-refine stage is what holds this floor
    // (raw ADC ranks measured 0.25: 64-bit codes cannot order last-decimal
    // cosine gaps)
    val exact = rowsToTopk(Similarity.queries("ann_cosine_topk")(spark, sf0001).collect())
    val pq = rowsToTopk(Similarity.pqTopK(spark, sf0001).collect())
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).toSet
      e.intersect(pq.getOrElse(q, Seq.empty).toSet).size.toDouble / e.size
    }
    (recalls.sum / recalls.size) should be >= 0.5

    // the ADC stage hands each query at most PQ_RERANK candidate ids and
    // self is already excluded
    val cands = Similarity.pqCandidates(spark, sf0001).collect()
    cands.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      rs.length should be <= 64
      rs.foreach(r => r.getAs[Long]("n_id") should not be r.getAs[Long]("q_id"))
    }

    // the committed index artifacts: M-byte codes for every corpus vector,
    // M×K codebook rows
    val (cat, books) = Similarity.pqIndex(spark, sf0001)
    books.length shouldBe 8
    all(books.map(_.length).toSeq) shouldBe 16
    val codes = cat.read("pq_codes").collect()
    codes.length shouldBe Tables.embeddings(spark, sf0001).count()
    all(codes.map(_.getAs[Array[Byte]]("code").length).toSeq) shouldBe 8
    cat.read("pq_codebooks").count() shouldBe 8L * 16L
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

  test("centroids persist through the Catalog and reproduce the exact IVF result") {
    // the cross-session amortization contract: train once → commit through
    // CentroidStore → a FRESH store instance (new session analog) reloads
    // the quantizer and the IVF result is bit-identical to the in-process
    // training path, so at 100 TB Lloyd runs once per corpus version
    val wh = tmpDir("centwh")
    val store = new graft.catalog.CentroidStore(spark, wh)
    var trainRuns = 0
    def train(): Seq[Array[Double]] = {
      trainRuns += 1
      Similarity.trainCentroids(spark, sf0001).map(_.map(_.toDouble)).toSeq
    }
    val first = store.getOrTrain(sf0001, "spherical_f32")(train())
    val second = store.getOrTrain(sf0001, "spherical_f32")(train())
    trainRuns shouldBe 1 // second call served from the committed table
    second.map(_.toSeq) shouldBe first.map(_.toSeq)

    val reloaded = new graft.catalog.CentroidStore(spark, wh)
      .load(sf0001, "spherical_f32")
      .getOrElse(fail("fresh store instance found no committed centroids"))
    val fromStore = Similarity
      .ivfTopKWith(spark, sf0001, reloaded.map(_.map(_.toFloat))).collect()
    val direct = Similarity.ivfTopK(spark, sf0001).collect()
    fromStore.map(_.toSeq) shouldBe direct.map(_.toSeq)

    // the scan-backed path: centroids flow parquet scan → BroadcastExchange
    // (never collected, never plan literals) and the result is still
    // bit-identical — this is the 100 TB shape where ncells is large
    val framed = Similarity
      .ivfTopKFrame(spark, sf0001, store.frame(sf0001, "spherical_f32"))
    framed.queryExecution.executedPlan.toString should include("BroadcastExchange")
    framed.collect().map(_.toSeq) shouldBe direct.map(_.toSeq)

    // retrain = append with a newer trained_at; latest wins on load
    val bumped = first.map(_.map(_ + 1.0))
    Thread.sleep(2) // distinct trained_at
    store.save(sf0001, "spherical_f32", bumped)
    store.load(sf0001, "spherical_f32").get.map(_.toSeq) shouldBe bumped.map(_.toSeq)

    // shrink-retrain: fewer cells than the previous training — load must
    // return ONLY the newest training batch, never 8 fresh + stale tail
    // cells from the larger run (per-cell latest-wins can't forget them;
    // the batch-timestamp filter does)
    val half = bumped.take(bumped.size / 2)
    Thread.sleep(2)
    store.save(sf0001, "spherical_f32", half)
    val shrunk = store.load(sf0001, "spherical_f32").get
    shrunk.size shouldBe half.size
    shrunk.map(_.toSeq) shouldBe half.map(_.toSeq)
  }

  test("cell-blocked near-dup bounds blocks under label skew and finds all tight pairs") {
    // A corpus whose STORED label is one giant block (the skew that would
    // degenerate label-blocked pair generation to n²), while the vectors
    // themselves form 4 tight, well-separated clusters. Cell blocking must
    // (a) keep every block far below the corpus size — Σ|cell|² is the pair
    // cost — and (b) still recover every genuinely-near pair, which in a
    // separated corpus all live inside one cell.
    import org.apache.spark.sql.functions._
    import scala.math.{cos => mcos, sin => msin}
    val n = 100
    val dim = 8
    // orthogonal-ish cluster bases; vec i belongs to cluster i % 4 so the
    // first 4 seed vectors cover the 4 clusters exactly once each
    def vec(i: Int): Array[Float] = {
      val c = i % 4
      val base = Array.tabulate(dim)(d => if (d == c * 2) 1.0 else 0.0)
      val jitter = 0.05 * msin(i * 2.399) // deterministic, tiny
      base(c * 2 + 1) = jitter * mcos(i.toDouble)
      base.map(_.toFloat)
    }
    val corpus = spark.createDataFrame(
      (0 until n).map(i => (i.toLong, vec(i), 0))
    ).toDF("vec_id", "embedding", "label")

    val binned = Similarity.binnedCells(corpus, nCells = 4).cache()
    val sizes = binned.groupBy("cell").count().collect().map(_.getLong(1))
    sizes.max.toInt should be < n / 2 // no degenerate block despite label skew

    val got = Similarity.embedNearDupPairs(corpus, nCells = 4, threshold = 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth by brute force (no blocking)
    val truth = (for {
      i <- 0 until n; j <- i + 1 until n
      a = vec(i).map(_.toDouble); b = vec(j).map(_.toDouble)
      dot = a.zip(b).map { case (x, y) => x * y }.sum
      na = math.sqrt(a.map(x => x * x).sum); nb = math.sqrt(b.map(x => x * x).sum)
      if dot / (na * nb) >= 0.9
    } yield (i.toLong, j.toLong)).toSet
    got shouldBe truth
  }
}
