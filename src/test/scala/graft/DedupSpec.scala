package graft

import org.apache.spark.sql.Row
import graft.operators.Dedup

/** Dedup family invariants at sf0.001 (SURVEY.md §7.2.7 extensions). */
class DedupSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    Dedup.queries(name)(spark, sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH candidates + exact verify recovers exactly the exact-Jaccard pair set") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    exact should not be empty // the corpus plants near-dups
    lsh shouldBe exact        // 8x4 bands: recall ≈ 0.985 at J ≥ 0.8, ≈ 1 at planted J ≈ 0.99
  }

  test("the incrementally-maintained band index yields the batch pair set") {
    // three MV-triggered loads into the stored index must answer exactly
    // like the one-shot batch LSH build (per-doc signatures need no corpus
    // stats, so maintenance composes) — and both equal the exact oracle
    pairs("dedup_incremental_lsh") shouldBe pairs("dedup_minhash_lsh")
  }

  test("incremental probe caps hot buckets: a boilerplate cluster cannot go quadratic") {
    // 1200 near-identical boilerplate docs (think license files): every
    // doc lands the SAME band hash in all 8 bands, so an uncapped probe
    // would emit 8 × 1200·1199/2 ≈ 5.7M candidate pairs — M²/2 per band,
    // the quadratic melt at web scale. With the bucket cap those mega
    // buckets (size 1200 > 1000) are DROPPED, so the boilerplate cluster
    // contributes zero probe candidates, while distinct small-bucket docs
    // still pair normally. The cluster itself remains catchable by
    // dedup_exact (identical text).
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val boiler = (0L until 1200L)
      .map(i => (i, "permission is hereby granted free of charge to any " +
        "person obtaining a copy of this software and associated files"))
    // two duplicate docs in their own small bucket (identical text ->
    // identical signatures -> all 8 bands collide, deterministically)
    val organic = Seq(
      (5000L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (5001L, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val docs = (boiler ++ organic).toDF("doc_id", "text")
    val cands = Dedup.probeCandidates(Dedup.bandsOf(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bounded: nothing from the 1200-doc mega buckets; the organic pair
    // (and only small-bucket pairs) survive
    assert(cands.size.toLong <=
      8L * Dedup.MaxLshBucketCap * Dedup.MaxLshBucketCap,
      s"candidate count ${cands.size} exceeds the cap² bound")
    cands should contain ((5000L, 5001L))
    cands.count { case (i, j) => i < 1200L && j < 1200L } shouldBe 0
  }

  test("image pHash LSH: a boilerplate image cluster is capped, near-dup pairs survive") {
    // The image twin of the cap test: 1200 copies of ONE image (think a
    // site logo or placeholder thumbnail replicated across a crawl) hash
    // identically, so all 4 Hamming bands form 1200-doc mega buckets —
    // dropped by the shared capped front end, zero probe candidates from
    // the cluster. Three designed near-dup pairs (one corrupted pixel →
    // ≤ 2 bits, confined to one band) keep 3 clean bands each and pair up.
    import graft.multimodal.MediaPipeline
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def hash(vals: Array[Int]): Long = MediaPipeline.dHash(
      MediaPipeline.decodeImage(MediaPipeline.synthPngGray(vals, 9, 8)).get)
    val hB = hash(Array.tabulate(72)(i => (i * 53 + 7) % 256))
    val pairHashes = (0 until 3).map { g =>
      val base = Array.tabulate(72)(i => ((g + 2) * (i * i + 13) + 5) % 256)
      val ed = base.clone(); ed(3 * 9 + 3) = (base(3 * 9 + 3) + 128) % 256
      (hash(base), hash(ed))
    }
    val rows = (0L until 1200L).map(id => (id, hB)) ++
      pairHashes.zipWithIndex.flatMap { case ((h1, h2), g) =>
        Seq((2000L + 2 * g, h1), (2001L + 2 * g, h2)) }
    val bands = rows.toDF("doc_id", "h")
      .select(col("doc_id"), posexplode(array(
        expr("int(shiftrightunsigned(h, 48) & 65535)"),
        expr("int(shiftrightunsigned(h, 32) & 65535)"),
        expr("int(shiftrightunsigned(h, 16) & 65535)"),
        expr("int(h & 65535)"))).as(Seq("band", "bh")))
    val cands = Dedup.probeCandidates(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cands.count { case (i, j) => i < 1200L && j < 1200L } shouldBe 0
    (0 until 3).foreach { g =>
      cands should contain ((2000L + 2 * g, 2001L + 2 * g))
    }
    // and the designed edits really are near-dups under the full hash
    pairHashes.foreach { case (h1, h2) =>
      java.lang.Long.bitCount(h1 ^ h2) should be <= 2
    }
  }

  test("audio fingerprint: decode path equals the formula; pairs are exactly the designed groups") {
    // The decode-is-the-formula identity, directly: the REAL WAV
    // write→RIFF gate→javax.sound decode→window→energy pipeline must
    // produce the same energy-delta fingerprint as computing the
    // generator arithmetic in memory — the identity the DuckDB oracle
    // rests on (it replays the arithmetic side).
    import graft.multimodal.MediaPipeline
    def viaDecode(gid: Long, v: Int): Long = {
      val u = Array.tabulate[Byte](65 * 64) { i =>
        val base = (((gid + 1) * (i + 13L) * (i + 29L)) % 1000003L % 256L).toInt
        (if (v > 0 && i / 64 == v * 17) (base + 100) % 256 else base).toByte
      }
      val clip = MediaPipeline.decodeAudio(MediaPipeline.synthWavU8(u)).get
      val e = MediaPipeline.audioFrames(clip).map { f =>
        var acc = 0L; f.pixels.foreach(b => acc += b.toInt * b.toInt); acc
      }.toArray
      e.length shouldBe 65
      (0 until 64).foldLeft(0L)((h, k) =>
        if (e(k + 1) > e(k)) h | (1L << (63 - k)) else h)
    }
    def viaFormula(gid: Long, v: Int): Long = {
      val e = Array.tabulate(65) { k =>
        (0 until 64).map { i =>
          val idx = k * 64 + i
          val base = (((gid + 1) * (idx + 13L) * (idx + 29L)) % 1000003L % 256L).toInt
          val s = (if (v > 0 && k == v * 17) (base + 100) % 256 else base) - 128
          s.toLong * s
        }.sum
      }
      (0 until 64).foldLeft(0L)((h, k) =>
        if (e(k + 1) > e(k)) h | (1L << (63 - k)) else h)
    }
    for (gid <- Seq(0L, 7L, 123L); v <- 0 to 3)
      viaDecode(gid, v) shouldBe viaFormula(gid, v)

    // the gate query returns exactly the within-group designed pairs
    val pairs = Dedup.queries("dedup_audio_fp")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should not be empty
    pairs.foreach { case (i, j) => i / 4 shouldBe j / 4 } // no false pairs
    // every group with ≥2 sampled (odd) members pairs completely
    val docN = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val byGroup = (0L until docN).filter(_ % 2 == 1).groupBy(_ / 4)
    val expected = byGroup.values.flatMap(ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)).toSet
    pairs.toSet shouldBe expected
  }

  test("video signature: decoded-mean bits equal the level-compare formula; pairs are exactly the designed groups") {
    // The JPEG-lossy decode must still yield EXACTLY the level-compare
    // bits (equal levels → byte-identical frames → strict > false;
    // 90-apart levels → flat-frame decode error ≪ 45) — the identity the
    // DuckDB oracle rests on.
    import graft.multimodal.MediaPipeline
    def sel(gid: Long, v: Int, k: Int): Int = {
      val s = ((((gid * 7919L + 1) % 1000003L) *
        (k + 19L) * (k + 41L)) % 1000003L % 3L).toInt
      if (v > 0 && k == v * 13) (s + 1) % 3 else s
    }
    def viaDecode(gid: Long, v: Int): Long = {
      val levels = Array.tabulate(65)(k => 30 + 90 * sel(gid, v, k))
      val clip = MediaPipeline.decodeVideo(
        MediaPipeline.synthAviGray(levels.toIndexedSeq, 16, 12, 10)).get
      val means = MediaPipeline.videoFrames(clip).toArray.sortBy(_.frame_idx)
        .map(fr => fr.pixels.map(_ & 0xff).sum.toDouble / fr.pixels.length)
      means.length shouldBe 65
      (0 until 64).foldLeft(0L)((h, k) =>
        if (means(k + 1) > means(k)) h | (1L << (63 - k)) else h)
    }
    def viaFormula(gid: Long, v: Int): Long =
      (0 until 64).foldLeft(0L)((h, k) =>
        if (sel(gid, v, k + 1) > sel(gid, v, k)) h | (1L << (63 - k)) else h)
    for (gid <- Seq(0L, 7L, 123L); v <- 0 to 3)
      viaDecode(gid, v) shouldBe viaFormula(gid, v)

    // the gate query returns exactly the within-group designed pairs
    val pairs = Dedup.queries("dedup_video_sig")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should not be empty
    pairs.foreach { case (i, j) => i / 112 shouldBe j / 112 } // no false pairs
    val docN = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val byGroup = (0L until docN).filter(_ % 28 == 3).groupBy(_ / 112)
    val expected = byGroup.values.flatMap(ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)).toSet
    pairs.toSet shouldBe expected
  }

  test("LSH recovers every exact pair at the correctness-gate scale factor, marginal band included") {
    // The exact-Jaccard oracle for dedup_minhash_lsh / dedup_clusters is
    // cell-exact, but 8×4-band LSH recall at J just above 0.8 is only
    // ~98.5% per pair — a true pair in the marginal band J ∈ [0.8, 0.9)
    // could in principle be missed by candidate generation and fail parity.
    // The testdata corpus is NOT perfectly clean: sf0.001 contains one
    // organic marginal-band pair (so "no marginal pairs" is not assertable);
    // what the oracle mapping actually rests on is that banding recovers
    // the ENTIRE exact pair set on the gate dataset — recall is a
    // deterministic function of the fixed corpus, so this spec failing on
    // new testdata is the loud signal to widen the band count, not a flake.
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.01" // the driver's correctness-gate SF
    def pairsAt(name: String): Set[(Long, Long)] =
      Dedup.queries(name)(spark, d)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsAt("dedup_ngram_jaccard")
    exact should not be empty
    pairsAt("dedup_minhash_lsh") shouldBe exact
    // count the marginal band for the record: pairs here are the ones whose
    // recovery depends on banding luck frozen into the fixed corpus
    val marginal = Dedup.queries("dedup_ngram_jaccard")(spark, d)
      .filter(col("jaccard") >= 0.8 && col("jaccard") < 0.9).count()
    info(s"marginal-band (J ∈ [0.8,0.9)) pairs at sf0.01: $marginal")
  }

  test("exact dedup groups agree with distinct text count") {
    val out = Dedup.queries("dedup_exact")(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
    out.map(_.getAs[Long]("n_dups")).sum shouldBe docs.count()
    // keep_id is the min doc_id of its group, so keep_ids are unique
    out.map(_.getAs[Long]("keep_id")).distinct.length shouldBe out.length
  }

  test("simhash near-dup pairs include the high-Jaccard planted pairs") {
    val planted = pairs("dedup_ngram_jaccard")
    val simhash = Dedup.simhashPairs(spark, sf0001)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SimHash at Hamming ≤ 16 is best-effort (8×16-bit chunks guarantee a
    // collision only while ≤ 7 chunks differ); require it to recover a
    // solid majority of true near-dups
    val recalled = planted.intersect(simhash).size.toDouble
    if (planted.nonEmpty) (recalled / planted.size) should be >= 0.8
  }

  test("dedup_simhash contract row reports the true-pair universe and a met floor") {
    val row = Dedup.queries("dedup_simhash")(spark, sf0001).collect().head
    row.getAs[Long]("n_true_pairs") should be > 0L
    row.getAs[Boolean]("recovery_ok") shouldBe true
  }

  test("cluster canonicalization: pair endpoints share a canonical; one keeper per cluster") {
    val pairsSet = pairs("dedup_ngram_jaccard")
    val rows = Dedup.queries("dedup_clusters")(spark, sf0001).collect()
    val canon = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairsSet.foreach { case (i, j) => canon(i) shouldBe canon(j) }
    // the canonical doc maps to itself and is the unique keeper of its cluster
    canon.values.foreach(c => canon(c) shouldBe c)
    rows.filter(_.getBoolean(2)).map(_.getLong(0)).toSet shouldBe canon.values.toSet
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = Dedup.queries("dedup_embed_cosine")(spark, sf0001).collect()
    all(rows.map(_.getAs[Double]("cos"))) should be >= 0.4
    all(rows.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")))
      .map { case (i, j) => j - i }) should be > 0L
  }

  test("star-contraction CC: a 100-node chain converges in O(log n) rounds, labels = min") {
    // the topology min-label propagation handled worst (O(diameter) = 99
    // rounds there); the large-star/small-star alternation must stay
    // logarithmic — generous bound: 2·ceil(log2 n) + 2 = 16
    import spark.implicits._
    val n = 100
    val chain = (0L until n - 1L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.connectedComponents(chain)
    rounds should be <= 16
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    got.keySet shouldBe (0L until n.toLong).toSet
    all(got.values) shouldBe 0L
  }

  test("star-contraction CC matches driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(220)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference labels: plain union-find, canonical = component min
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v.toInt).toLong).toMap
    val (labels, rounds) = Dedup.connectedComponents(edges.toDF("a", "b"))
    rounds should be <= 16
    labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap shouldBe expected
  }

  test("duplicate spans are disjoint interval unions of duplicated 8-gram coverage") {
    val spans = Dedup.queries("dedup_substring")(spark, sf0001).collect()
    spans should not be empty // planted near-dups guarantee shared 8-grams
    spans.foreach { r =>
      val len = r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1
      val n = r.getAs[Long]("n_grams")
      len should be >= 8L                 // at least one full gram
      n should be >= 1L
      len should be <= n * 8              // union of n intervals of length 8
    }
    // interval-union maximality: spans within a doc are disjoint and ordered
    spans.groupBy(_.getAs[Long]("doc_id")).values.foreach { rs =>
      rs.sortBy(_.getAs[Long]("span_start")).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          b.getAs[Long]("span_start") should be > a.getAs[Long]("span_end")
        case _ => ()
      }
    }
    // a planted whole-document near-dup must surface as one long span
    spans.map(r => r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1)
      .max should be >= 20L
  }

  test("bloom-pruned decontamination returns exactly the broadcast-exact answer") {
    // Bloom filters have no false negatives and the exact-verify join
    // removes false positives, so prune->verify must be value-identical to
    // text_decontam — the property that lets the two queries share one
    // oracle.
    def rows(name: String): Seq[(Long, Long)] =
      Dedup.queries(name)(spark, sf0001).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shared"))).toSeq
    val exact = rows("text_decontam")
    exact should not be empty
    rows("text_decontam_bloom") shouldBe exact
  }
}
