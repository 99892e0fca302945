package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}
import graft.Tables
import graft.functions.{CosineSimilarity, NearestCentroid, PqAdcScore, PqCodeAt, PqEncode}

import scala.jdk.CollectionConverters._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: Array[Float]`, 64-dim).
  *
  * Two paths:
  *   - `ann_cosine_topk`: brute-force baseline. The query set is broadcast
  *     (tiny) against the full corpus — one narrow pass, no shuffle of the
  *     corpus — then per-query top-k. This is the exact answer and the
  *     recall yardstick.
  *   - `ann_ivf_topk`: the scale path — a real IVF. A coarse quantizer is
  *     trained with spherical k-means (seeded from the first NCELLS
  *     vectors, [[LLOYD_ITERS]] Lloyd rounds); each corpus vector is
  *     assigned to its max-cosine cell, and each query probes only its
  *     NPROBE nearest cells. Centroids are a K×dim table of doubles that
  *     arrives at the executors via ONE BroadcastExchange (a LocalRelation
  *     here, a [[graft.catalog.CentroidStore.frame]] parquet scan in a
  *     deployment) — never as expression-tree literals, so plan size and
  *     generated code stay constant as ncells grows and the Σ|cell|² knob
  *     can actually be turned at 100 TB. Scored candidates drop to
  *     ~NPROBE/NCELLS of the corpus (measured recall@5 ≈ 0.8 at ~30%
  *     scanned on the test data; SimilaritySpec holds the floor).
  *
  * Ranking is by `round(cos, 6) DESC, vec_id` on both engines so last-ulp
  * fold-order differences cannot flip a rank.
  */
object Similarity extends QueryModule {

  private val K = 5
  private val NQ = 20
  private val NPROBE = 4
  private val NCELLS = 16
  private val LLOYD_ITERS = 1 // measured: recall@5 identical to 2 rounds on the test corpus
  private val PQ_M = 8      // PQ subspaces (64-dim → 8-dim subvectors)
  private val PQ_K = 16     // sub-centroids per subspace (a code byte holds 256 at scale)
  private val PQ_RERANK = 64 // ADC survivors per query that reach the exact rerank

  /** Process-wide memo of trained quantizers keyed by (corpus version,
    * variant, nCells). Training runs EAGERLY at plan-build time (the Lloyd
    * passes collect centroid means), so without this every construction of
    * an IVF-backed query — bench, verify, each spec iteration — re-scanned
    * the training sample for an identical answer. [[graft.catalog
    * .CentroidStore]] is the cross-session tier of the same amortization;
    * this map is the in-process tier. Safe because a corpus version string
    * identifies an immutable snapshot; getOrElseUpdate may race to train
    * twice, but both runs are deterministic and equal.
    */
  private val trained =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), Seq[Array[Double]]]

  private def queriesSet(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  private def topK(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("n_id"), col("cos"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  override def queries: Map[String, Q] = Map(
    "ann_cosine_topk" -> ((s, d) => {
      val corpus = Tables.embeddings(s, d)
      val scored = corpus.join(broadcast(queriesSet(s, d)), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(CosineSimilarity(col("q_emb"), col("embedding")), 6).as("cos"))
      topK(scored)
    }),

    // IVF top-k wrapped in its accuracy contract (the agg_approx_distinct
    // pattern): the probe-pruned result is approximate by design, so the
    // raw rows have no DuckDB-expressible oracle — but the documented
    // contract "recall@5 ≥ 0.6 vs brute force" (measured ≈ 0.8 at ~30%
    // scanned) is oracle-checkable as a literal. The plan computes IVF and
    // brute-force top-k side by side, overlaps them with one semi-join, and
    // returns (n_exact, recall_ok); the brute-force side is the same
    // broadcast-query/never-shuffle-corpus shape as ann_cosine_topk, so the
    // contract costs one extra corpus scan, not a shuffle. SimilaritySpec
    // still pins the raw-rows recall floor on the unwrapped operator.
    "ann_ivf_topk" -> ((s, d) => {
      val ivf = ivfTopK(s, d).select(col("q_id"), col("n_id"))
      val bf = queries("ann_cosine_topk")(s, d).select(col("q_id"), col("n_id"))
      val hits = bf.join(ivf, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("nhits"))
      bf.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
        .select(col("n_exact"),
          (col("nhits") >= col("n_exact") * 0.6).as("recall_at5_ok"))
    }),

    // IVF-PQ: the next I/O step past ann_ivf_topk — candidate scoring
    // reads the Catalog codes table (M = 8 one-byte codes per vector,
    // clustered on the coarse cell) instead of the float vectors, so the
    // pair stage's scan shrinks 32× (8 B vs 256 B per vector) at 100 TB.
    // Scores are asymmetric-distance (ADC): a per-query M×K dot-product
    // LUT rides on the broadcast probe row and [[graft.functions
    // .PqAdcScore]] folds it against each code. Same accuracy-contract
    // oracle pattern as ann_ivf_topk, with the documented floor
    // recall@5 ≥ 0.5 vs brute force (PQ reconstruction loses more rank
    // fidelity than probe pruning alone; SimilaritySpec pins the floor on
    // the raw rows).
    "ann_ivfpq_topk" -> ((s, d) => {
      val pq = pqTopK(s, d).select(col("q_id"), col("n_id"))
      val bf = queries("ann_cosine_topk")(s, d).select(col("q_id"), col("n_id"))
      val hits = bf.join(pq, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("nhits"))
      bf.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
        .select(col("n_exact"),
          (col("nhits") >= col("n_exact") * 0.5).as("recall_at5_ok"))
    }),

    // Symmetric int8 quantization (max-abs scaling): the standard
    // compression step before an ANN index build at scale — 4× smaller
    // vectors, integer dot products. Pure narrow map (no shuffle); all
    // math in double (float32 values are exact in double; the oracle casts
    // ::DOUBLE[] to match); deterministic floor(x*scale+0.5) half-up on
    // both engines because round()'s midpoint rule differs between them.
    // Lambdas here are cheap scalar ops — the interpreted-HOF penalty only
    // bites on heavy per-element work.
    "embed_quantize" -> ((s, d) => {
      val xd = transform(col("embedding"), x => x.cast("double"))
      val maxabs = array_max(transform(xd, x => abs(x)))
      val scale = when(maxabs === 0, lit(0.0)).otherwise(lit(127.0) / maxabs)
      val q8 = transform(xd, x => floor(x * scale + 0.5).cast("int"))
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          (floor(scale * 1e6 + 0.5) / 1e6).as("scale"),
          // string-joined: array-typed result cells break the driver's
          // pandas hash-compare
          array_join(transform(q8, v => v.cast("string")), ",").as("q8"))
        .orderBy(col("vec_id"))
    }),

    // Cluster-cohesion diagnostic: per-label centroid, then the
    // distribution of member→own-centroid cosines — the embedding-quality
    // report a curation pipeline runs before trusting labels (a low
    // avg_cos or deeply negative min_cos flags a polluted cluster). The
    // centroid pass is partial-aggregable (label, pos, avg): the shuffle
    // carries labels×dims scalar partials regardless of corpus size —
    // whole vectors never ride a shuffle — and the K centroids broadcast
    // back, so the scoring pass is again narrow. Per-row cosines are
    // 6-decimal rounded BEFORE aggregating (the CosineSimilarity kernel
    // contract), aggregates floor-rounded half-up.
    "embed_centroid_dist" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"))
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("label"),
          transform(col("pm"), x => x.getField("m")).as("centroid"))
      e.join(broadcast(cent), Seq("label"))
        .select(col("label"),
          round(CosineSimilarity(col("embedding"), col("centroid")), 6).as("cos"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          (floor(avg(col("cos")) * 1e6 + 0.5) / 1e6).as("avg_cos"),
          (floor(min(col("cos")) * 1e6 + 0.5) / 1e6).as("min_cos"))
        .orderBy(col("label"))
    }),
  )

  /** The raw IVF top-k rows (q_id, n_id, cos, rnk) — the operator itself;
    * the `ann_ivf_topk` query wraps this in its recall contract, and
    * SimilaritySpec exercises it directly. `nProbe`/`nCells` are the
    * recall-vs-scan-fraction knobs a deployment tunes
    * ([[graft.app.GraftConfig.ivfNProbe]] / ivfNCells feed them); the query
    * entry pins the documented defaults so the contract stays deterministic.
    */
  /** Config-driven entry: deployment callers tune the knobs through
    * `ivf_nprobe` / `ivf_ncells` in config.yml ([[graft.app.GraftConfig]]).
    */
  def ivfTopK(s: SparkSession, d: String, cfg: graft.app.GraftConfig): DataFrame =
    ivfTopK(s, d, cfg.ivfNProbe, cfg.ivfNCells)

  def ivfTopK(s: SparkSession, d: String,
              nProbe: Int = NPROBE, nCells: Int = NCELLS): DataFrame =
    ivfTopKWith(s, d, trainCentroids(s, d, nCells), nProbe)

  /** IVF search with an explicitly supplied quantizer — the entry point a
    * [[graft.catalog.CentroidStore]]-cached quantizer feeds (identical
    * centroids give identical results, so training is fully amortizable
    * across queries and sessions; SimilaritySpec pins that equivalence).
    */
  def ivfTopKWith(s: SparkSession, d: String,
                  centroids: Seq[Array[Float]], nProbe: Int = NPROBE): DataFrame =
    ivfTopKCents(s, d, centroids.map(_.map(_.toDouble)), nProbe)

  /** IVF search against a centroid DATAFRAME — the entry point a
    * [[graft.catalog.CentroidStore.frame]] parquet scan feeds. The K×dim
    * doubles are collected to the driver (the documented bounded pattern —
    * a quantizer is K×dim by construction) and handed to the
    * [[graft.functions.NearestCentroid]] kernel, so corpus assignment is a
    * narrow map with constant plan size regardless of ncells.
    */
  def ivfTopKFrame(s: SparkSession, d: String,
                   cdf: DataFrame, nProbe: Int = NPROBE): DataFrame =
    ivfTopKCents(s, d,
      cdf.orderBy(col("cell")).collect()
        .map(_.getSeq[Double](1).toArray).toSeq, nProbe)

  private def ivfTopKCents(s: SparkSession, d: String,
                           cents: Seq[Array[Double]],
                           nProbe: Int = NPROBE): DataFrame = {
    val corpus = Tables.embeddings(s, d)

    val binned = assignCells(corpus.select(col("vec_id"), col("embedding")), cents,
      rounded = false)

    // each query probes its NPROBE max-cosine cells: queries are FEW, so a
    // cross join against the tiny (cell, centroid) relation stays cheap and
    // keeps the per-query cell ranking relational
    val cdf = centroidFrame(s, cents)
    val wq = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cell"))
    val probes = queriesSet(s, d)
      .crossJoin(broadcast(cdf))
      .select(col("q_id"), col("q_emb"), col("cell"),
        CosineSimilarity(col("q_emb"), col("centroid")).as("ccos"))
      .withColumn("cr", row_number().over(wq))
      .filter(col("cr") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cell"))

    // score only vectors in probed cells — corpus side never shuffles
    val scored = binned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(CosineSimilarity(col("q_emb"), col("embedding")), 6).as("cos"))
    topK(scored)
  }

  /** Centroids as a tiny single-partition (cell, centroid) relation — the
    * broadcast side of the per-QUERY probe ranking (queries × centroids is
    * small on the query axis) and the round-trip format of
    * [[graft.catalog.CentroidStore]]. Corpus-side cell assignment does NOT
    * join this relation — it runs through the [[graft.functions.NearestCentroid]]
    * kernel (see [[assignCells]]).
    */
  def centroidFrame(s: SparkSession, cents: Seq[Array[Double]]): DataFrame = {
    val rows: java.util.List[Row] =
      cents.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }.asJava
    s.createDataFrame(rows, StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType, containsNull = false),
        nullable = false))))
  }

  /** (vec_id, embedding, cell): nearest-centroid assignment as ONE narrow
    * map through the [[graft.functions.NearestCentroid]] kernel — no join,
    * no shuffle, plan size O(1) in ncells. The earlier broadcast-join +
    * `max(struct(score, cell, embedding))` arg-max was plan-size-safe but
    * MATERIALIZED n×ncells candidate structs (each dragging the embedding
    * array) through the aggregate: the sf10 probe measured 6.8 s → 39 s
    * when ncells went 64 → 256, i.e. the Σ|cell|² knob turned the wrong
    * way again. The kernel keeps the identical semantics the DuckDB oracle
    * replays relationally (`max(struct_pack(…))` over the cross join):
    * left-to-right double cosine, ties to the HIGHER cell id, and with
    * `rounded` the cosine is 6-decimal HALF_UP-rounded BEFORE the arg-max
    * so assignment is engine-deterministic.
    */
  private def assignCells(vecs: DataFrame, cents: Seq[Array[Double]],
                          rounded: Boolean): DataFrame =
    vecs.select(col("vec_id"), col("embedding"),
      NearestCentroid(col("embedding"), cents, rounded).as("cell"))

  // ---------------------------------------------------------------------
  // IVF-PQ: product-quantized codes in the Catalog, ADC candidate scoring
  // ---------------------------------------------------------------------

  /** Trained PQ codebooks: M subspaces × K sub-centroids × subDim doubles.
    * Seeds = the first K sample vectors' subvectors, then ONE distributed
    * Lloyd round: the sample encodes through the [[graft.functions
    * .PqEncode]] kernel (argmin-L2 per subspace), exploded dimensions
    * group by (subspace, assigned code, dim) and average — only M×K×subDim
    * doubles (8×16×8 = 1 KB here) ever reach the driver, the
    * roundedCentroids discipline. Means are 6-decimal-rounded so fold
    * order cannot wiggle borderline code assignments between runs.
    */
  private val pqBooks = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Array[Array[Array[Double]]]]

  private[graft] def trainPqBooks(s: SparkSession, d: String): Array[Array[Array[Double]]] =
    pqBooks.getOrElseUpdate((s, d), {
      val sample = Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(5)) === 0 || col("vec_id") < PQ_K)
      val seedRows = sample.filter(col("vec_id") < PQ_K).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val subDim = seedRows.head.length / PQ_M
      val seeds: Array[Array[Array[Double]]] = Array.tabulate(PQ_M) { m =>
        Array.tabulate(PQ_K) { j =>
          java.util.Arrays.copyOfRange(seedRows(j), m * subDim, (m + 1) * subDim)
        }
      }
      val enc = sample.select(col("vec_id"),
        PqEncode(col("embedding"), seeds.toSeq).as("code"))
      val mcol = (col("pos") / subDim).cast("int")
      val means = sample
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .join(enc, Seq("vec_id"))
        .select(mcol.as("m"), PqCodeAt(col("code"), mcol).as("j"),
          pmod(col("pos"), lit(subDim)).as("p"), col("v"))
        .groupBy(col("m"), col("j"), col("p"))
        .agg((floor(avg(col("v")) * 1e6 + 0.5) / 1e6).as("mean"))
        .collect()
      val books = seeds.map(_.map(_.clone()))
      means.foreach { r =>
        val (m, j, p) = (r.getInt(0), r.getInt(1), r.getInt(2))
        if (m < PQ_M && j < PQ_K && p < subDim) books(m)(j)(p) = r.getDouble(3)
      }
      books
    })

  /** The committed PQ index: a Catalog warehouse holding `pq_codebooks`
    * (the inspectable M×K quantizer, the CentroidStore discipline) and
    * `pq_codes` — (vec_id, cell, code) with the M-byte code per corpus
    * vector, clustered on the coarse IVF cell so probed reads prune files.
    * Built ONCE per (session, corpus) in one narrow pass over the corpus
    * (coarse assignment through the NearestCentroid kernel + PqEncode —
    * no join, no shuffle on the embedding column); search never reads the
    * float vectors again.
    */
  private val pqIndexes = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (graft.catalog.Catalog, Array[Array[Array[Double]]])]

  private[graft] def pqIndex(s: SparkSession, d: String)
      : (graft.catalog.Catalog, Array[Array[Array[Double]]]) =
    pqIndexes.getOrElseUpdate((s, d), {
      import graft.catalog.{Append, Catalog, TableDef}
      val books = trainPqBooks(s, d)
      val cents = trainCentroids(s, d, NCELLS).map(_.map(_.toDouble)).toSeq
      val cat = new Catalog(s)
      val whPath = graft.operators.CatalogOps.scratchDir("graft-pq-index")
      CatalogOps.registerForCleanup(whPath)
      val wh = whPath.toString
      val bookSchema = StructType(Seq(
        StructField("m", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType, containsNull = false),
          nullable = false)))
      cat.createTable(TableDef("pq_codebooks", s"$wh/pq_codebooks", bookSchema,
        sortKeys = Seq("m", "j"), semantics = Append))
      val bookRows: java.util.List[Row] = books.zipWithIndex.flatMap {
        case (book, m) => book.zipWithIndex.map { case (c, j) => Row(m, j, c.toSeq) }
      }.toSeq.asJava
      cat.append("pq_codebooks", s.createDataFrame(bookRows, bookSchema))
      val codes = Tables.embeddings(s, d).select(col("vec_id"),
        NearestCentroid(col("embedding"), cents, rounded = false).as("cell"),
        PqEncode(col("embedding"), books.toSeq).as("code"))
      cat.createTable(TableDef("pq_codes", s"$wh/pq_codes", codes.schema,
        sortKeys = Seq("cell"), semantics = Append))
      cat.append("pq_codes", codes)
      (cat, books)
    })

  /** The ADC candidate stage: (q_id, n_id) — each query's PQ_RERANK best
    * candidates by asymmetric-distance score, probing the NPROBE
    * max-cosine cells. This stage touches NOTHING but the M-byte codes
    * table (PlanSpec asserts no scan in this plan reads an embedding
    * column): the per-query dot LUT (M·K doubles) and cell ranking are
    * computed driver-side from the NQ collected query vectors (bounded:
    * NQ×dim — queries are few by definition; a batch query service would
    * compute LUTs in a narrow map instead) and ride the broadcast probe
    * rows; the corpus side never shuffles and never re-reads vectors.
    */
  private[graft] def pqCandidates(s: SparkSession, d: String,
                                  nProbe: Int = NPROBE): DataFrame = {
    val (cat, books) = pqIndex(s, d)
    val cents = trainCentroids(s, d, NCELLS).map(_.map(_.toDouble))
    val subDim = books(0)(0).length
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qRows = Tables.embeddings(s, d).filter(col("vec_id") < NQ)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val probeRows: Seq[Row] = qRows.toSeq.flatMap { case (qid, q) =>
      val probed = cents.zipWithIndex
        .map { case (c, i) => (cosine(q, c), i) }
        .sortBy { case (sc, i) => (-sc, i) } // ccos desc, cell asc — wq's rule
        .take(nProbe)
      val dotLut: Seq[Double] = (0 until PQ_M).flatMap { m =>
        (0 until PQ_K).map { j =>
          val c = books(m)(j)
          var dot = 0.0; var i = 0
          while (i < c.length) { dot += q(m * subDim + i) * c(i); i += 1 }
          dot
        }
      }
      probed.map { case (_, cell) => Row(qid, cell, dotLut) }
    }
    val probes = s.createDataFrame(probeRows.asJava, StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("cell", IntegerType, nullable = false),
      StructField("dot_lut", ArrayType(DoubleType, containsNull = false),
        nullable = false))))
    val normLut: Array[Double] = books.flatMap(_.map(_.map(v => v * v).sum))
    val scored = cat.read("pq_codes").join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        PqAdcScore(col("code"), col("dot_lut"), normLut, PQ_K).as("score"))
    val adcW = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    scored.withColumn("arnk", row_number().over(adcW))
      .filter(col("arnk") <= PQ_RERANK)
      .select(col("q_id"), col("n_id"))
  }

  /** The raw IVF-PQ top-k rows (q_id, n_id, cos, rnk): ADC prune → exact
    * refine, the standard IVF-PQ search shape (64 bits cannot preserve
    * last-decimal cosine gaps — no PQ deployment returns raw ADC ranks).
    * [[pqCandidates]] cuts each query to PQ_RERANK ids reading ONLY the
    * codes table; then just those ids point-read their full vectors,
    * row-pruned by a broadcast join of the tiny candidate list — at
    * 100 TB an id-clustered point lookup, never a corpus scan. Measured
    * at sf0.01: recall@5 = 0.67 at nProbe 4 (0.77 at 8) vs 0.25 for raw
    * ADC ranks — the refine stage IS the operator's accuracy.
    */
  def pqTopK(s: SparkSession, d: String, nProbe: Int = NPROBE): DataFrame = {
    val cands = pqCandidates(s, d, nProbe)
    val rer = Tables.embeddings(s, d)
      .select(col("vec_id").as("n_id"), col("embedding"))
      .join(broadcast(cands), Seq("n_id"))
      .join(broadcast(queriesSet(s, d)), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(CosineSimilarity(col("q_emb"), col("embedding")), 6).as("cos"))
    topK(rer)
  }

  // ---------------------------------------------------------------------
  // Cell-blocked embedding near-dup (the IVF front end reused for dedup)
  // ---------------------------------------------------------------------

  /** Near-duplicate pairs over an embedding corpus, blocked by a coarse
    * IVF cell assignment instead of any stored label column: pair
    * generation cost is Σ|cell|², governed by `nCells` — a tuning knob —
    * rather than by data-dependent label skew (one hot label would
    * otherwise degenerate to n²). The spec exercises exactly that skew.
    *
    * Unlike [[ivfTopK]]'s quantizer, every arithmetic step here is
    * DECIMAL-ROUNDED (cosines to 6 places before the arg-max, centroid
    * means to 6 places) so the DuckDB oracle replays the identical k-means
    * relationally (corpus × centroids cross join + max(struct) arg-max)
    * and the cell assignment — not just the pair scores — hash-matches
    * across engines. `corpus` needs (vec_id, embedding) columns.
    */
  def embedNearDupPairs(corpus: DataFrame, nCells: Int, threshold: Double,
                        version: Option[String] = None): DataFrame = {
    val binned = binnedCells(corpus, nCells, version)
    // SHUFFLE_HASH, not sort-merge: the cell key has only nCells distinct
    // values, so sort-merge buffers each |cell|-row group through
    // ExternalAppendOnlyUnsafeRowArray and SPILLS past ~2k rows — the sf10
    // probe measured the same Σ|cell|² candidate stream 7× slower under
    // SMJ (41.8 s vs 5.9 s at ncells=16). A shuffled hash join keeps one
    // partition's cells as an in-memory hash relation — Σ|cell| rows per
    // partition, the working set within-cell pair generation needs anyway —
    // and streams the probe side at full codegen rate.
    binned.as("a").join(binned.as("b").hint("SHUFFLE_HASH"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(CosineSimilarity(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** (vec_id, embedding, cell) — corpus with its rounded-quantizer cell.
    * Pass `version` (a corpus snapshot id) to reuse a memoized quantizer
    * instead of re-training per call.
    */
  def binnedCells(corpus: DataFrame, nCells: Int,
                  version: Option[String] = None): DataFrame = {
    val cents = version match {
      case Some(v) =>
        trained.getOrElseUpdate((v, "rounded", nCells), roundedCentroids(corpus, nCells))
      case None => roundedCentroids(corpus, nCells)
    }
    assignCells(corpus.select(col("vec_id"), col("embedding")),
      cents, rounded = true)
  }

  /** One rounded Lloyd iteration of spherical k-means over the ~20%
    * deterministic sample (same sampling rule as [[trainCentroids]]):
    * seeds = first `nCells` vectors (float32 values — exact in double on
    * both engines), assign by rounded arg-max, then per-cell dimension
    * means rounded to 6 decimals so Spark's partial-sum fold order and
    * DuckDB's sequential avg cannot diverge. Only nCells×dim doubles
    * reach the driver.
    */
  def roundedCentroids(corpus: DataFrame, nCells: Int): Seq[Array[Double]] = {
    val sample = corpus
      .filter(pmod(col("vec_id"), lit(5)) === 0 || col("vec_id") < nCells)
    val seeds: Seq[Array[Double]] = sample
      .filter(col("vec_id") < nCells).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray).toSeq
    val means = assignCells(sample.select(col("vec_id"), col("embedding")),
        seeds, rounded = true)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((floor(avg(col("v")) * 1e6 + 0.5) / 1e6).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
    seeds.indices.map(i => means.getOrElse(i, seeds(i)))
  }

  /** Spherical k-means coarse quantizer: seeds = first NCELLS vectors, then
    * LLOYD_ITERS rounds of (assign to max-cosine centroid → per-cell
    * dimension-wise mean via posexplode scalar shuffle). Only K×dim doubles
    * ever reach the driver. Training runs over a deterministic ~20% sample —
    * centroid quality needs density, not the full corpus; at 100 TB the
    * sample is the only thing the Lloyd passes ever scan, while assignment/
    * probing still covers everything.
    */
  private[graft] def trainCentroids(s: SparkSession, d: String,
                                    nCells: Int = NCELLS): Seq[Array[Float]] =
    trained.getOrElseUpdate((d, "spherical_f32", nCells), {
      val corpus = Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(5)) === 0 || col("vec_id") < nCells)
      var cents: Seq[Array[Float]] = corpus
        .filter(col("vec_id") < nCells).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).toArray).toSeq
      (1 to LLOYD_ITERS).foreach { _ =>
        val means = assignCells(corpus.select(col("vec_id"), col("embedding")),
            cents.map(_.map(_.toDouble)), rounded = false)
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cell, rows) =>
            cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
          }
        cents = cents.indices.map(i => means.get(i).map(_.toArray).getOrElse(cents(i)))
      }
      // memoized as doubles (float32 is exact in double, so the round-trip
      // is lossless) to share one value type with the rounded variant
      cents.map(_.map(_.toDouble))
    }).map(_.map(_.toFloat))

  override def oracleSql: Map[String, String] = Map(
    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    round(list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
        |SELECT q_id, n_id, cos, rnk FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM scored)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // ann_ivf_topk: the raw probe-pruned rows are engine-specific, but the
    // recall contract is not — the oracle recomputes the brute-force top-5
    // count and asserts the documented floor as a literal (the same
    // accuracy-contract pattern as agg_approx_distinct).
    "ann_ivf_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    round(list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
        |bf AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM scored)
        |  WHERE rnk <= 5)
        |SELECT count(*) AS n_exact, TRUE AS recall_at5_ok FROM bf""".stripMargin,

    // ann_ivfpq_topk: same accuracy-contract shape as ann_ivf_topk — the
    // ADC-scored rows are engine-specific, the recall floor is not.
    "ann_ivfpq_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS n_id,
        |    round(list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
        |bf AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM scored)
        |  WHERE rnk <= 5)
        |SELECT count(*) AS n_exact, TRUE AS recall_at5_ok FROM bf""".stripMargin,

    "embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |s AS (SELECT vec_id, x,
        |        list_max(list_transform(x, v -> abs(v))) AS maxabs FROM e),
        |sc AS (SELECT vec_id, x,
        |        CASE WHEN maxabs = 0 THEN 0.0::DOUBLE
        |             ELSE 127.0::DOUBLE / maxabs END AS scale FROM s)
        |SELECT vec_id, floor(scale * 1e6 + 0.5) / 1e6 AS scale,
        |  array_to_string(list_transform(x,
        |    v -> CAST(CAST(floor(v * scale + 0.5) AS INTEGER) AS VARCHAR)), ',') AS q8
        |FROM sc ORDER BY vec_id""".stripMargin,

    "embed_centroid_dist" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |x AS (SELECT label, unnest(v) AS x,
        |             unnest(generate_series(1, len(v))) AS pos FROM e),
        |c AS (SELECT label, pos, avg(x) AS m FROM x GROUP BY 1, 2),
        |cent AS (SELECT label, list(m ORDER BY pos) AS cv FROM c GROUP BY label),
        |sc AS (SELECT e.label,
        |         round(list_cosine_similarity(e.v, cent.cv), 6) AS cos
        |       FROM e JOIN cent USING (label))
        |SELECT label, count(*) AS n,
        |  floor(avg(cos) * 1e6 + 0.5) / 1e6 AS avg_cos,
        |  floor(min(cos) * 1e6 + 0.5) / 1e6 AS min_cos
        |FROM sc GROUP BY label ORDER BY label""".stripMargin,
  )
}
