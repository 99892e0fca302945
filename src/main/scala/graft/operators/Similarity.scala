package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CosineSimilarity

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: Array[Float]`, 64-dim; `label` = a precomputed coarse
  * cluster id, standing in for an IVF cell assignment).
  *
  * Two paths:
  *   - `ann_cosine_topk`: brute-force baseline. The query set is broadcast
  *     (tiny) against the full corpus — one narrow pass, no shuffle of the
  *     corpus — then per-query top-k. This is the exact answer and the
  *     recall yardstick.
  *   - `ann_ivf_topk`: the scale path. Centroids are computed with a
  *     scalar-shuffle (posexplode → groupBy(label, pos) → avg) rather than
  *     collect_list-ing vectors; each query probes only its nProbe nearest
  *     cells, cutting scored candidates by ~cells/nProbe. At 100 TB the
  *     corpus side stays partitioned by cell and only centroids + queries
  *     move.
  *
  * Ranking is by `round(cos, 6) DESC, vec_id` on both engines so last-ulp
  * fold-order differences cannot flip a rank.
  */
object Similarity extends QueryModule {

  private val K = 5
  private val NQ = 20
  private val NPROBE = 3

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

    "ann_ivf_topk" -> ((s, d) => {
      val corpus = Tables.embeddings(s, d)
      // centroid per cell via scalar shuffle — never materializes a cell's
      // vectors on one node
      val centroids = corpus
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label"), expr("transform(pc, x -> cast(x.c as float))").as("centroid"))
      // each query probes its NPROBE nearest cells
      val wq = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("label"))
      val probes = queriesSet(s, d).join(broadcast(centroids))
        .withColumn("ccos", CosineSimilarity(col("q_emb"), col("centroid")))
        .withColumn("cr", row_number().over(wq))
        .filter(col("cr") <= NPROBE)
        .select(col("q_id"), col("q_emb"), col("label"))
      // score only vectors in probed cells
      val scored = corpus.join(broadcast(probes), Seq("label"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(CosineSimilarity(col("q_emb"), col("embedding")), 6).as("cos"))
      topK(scored)
    }),
  )

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

    // ann_ivf_topk: intentionally no oracle — the probe-pruned result is
    // approximate by design; SimilaritySpec asserts recall@5 vs the
    // brute-force baseline instead (driver records rows-only).
  )
}
