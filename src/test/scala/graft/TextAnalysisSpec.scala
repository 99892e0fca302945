package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.TextAnalysis

/** Text-curation operator invariants that the synthetic corpus cannot
  * exercise (it is PII-free by construction) plus mixing determinism.
  */
class TextAnalysisSpec extends SparkSpecBase {

  test("scrubPii redacts planted emails and phones, leaves clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk for details"),
      (2L, "call +1 212 555 0187 or 089-4711-2358 today"),
      (3L, "mixed: bob@corp.io and 01234567890 in one line"),
      (4L, "clean text with no personal data at all"),
      (5L, "digits-only local part: 0123456789@relay.example.com here")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextFns.scrubPii(col("text")).as("clean"),
        TextFns.piiRedactionCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out(1L) shouldBe ("contact me at <EMAIL> for details", 1L)
    out(2L) shouldBe ("call <PHONE> or <PHONE> today", 2L)
    out(3L) shouldBe ("mixed: <EMAIL> and <PHONE> in one line", 2L)
    out(4L) shouldBe ("clean text with no personal data at all", 0L)
    // the digit-run inside the email is ONE redaction, not email + phone:
    // the count mirrors the scrub's sequential application
    out(5L) shouldBe ("digits-only local part: <EMAIL> here", 1L)
  }

  test("text_pii_scrub on the corpus: zero redactions, digests = pass-through md5") {
    val rows = TextAnalysis.queries("text_pii_scrub")(spark, sf0001).collect()
    rows.length.toLong shouldBe Tables.documents(spark, sf0001).count()
    all(rows.map(_.getAs[Long]("n_redact"))) shouldBe 0L
    // pass-through fidelity: scrubbing PII-free text must not alter a byte
    val direct = Tables.documents(spark, sf0001)
      .select(col("doc_id"), md5(col("text")).as("digest"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => r.getAs[String]("digest") shouldBe direct(r.getAs[Long]("doc_id")))
  }

  test("text_mix: kept counts are deterministic, bounded by rate, reproducible") {
    val a = TextAnalysis.queries("text_mix")(spark, sf0001).collect()
    val b = TextAnalysis.queries("text_mix")(spark, sf0001).collect()
    a.map(_.toString) shouldBe b.map(_.toString) // hash gate, not an RNG
    a.foreach { r =>
      val rate = r.getAs[Double]("rate")
      val nDocs = r.getAs[Long]("n_docs")
      val nKept = r.getAs[Long]("n_kept")
      rate should (be >= 0.25 and be <= 1.0)
      nKept should be <= nDocs
      // a 1.0-rate source keeps everything
      if (rate == 1.0) nKept shouldBe nDocs
    }
    // the tiers actually differentiate: not all sources share one rate
    a.map(_.getAs[Double]("rate")).distinct.length should be > 1
  }

  test("BPE training: deterministic merges, valid subwords, pack counts consistent") {
    import org.apache.spark.sql.functions._
    val (merges, words) = TextAnalysis.bpeTrain(spark, sf0001)
    merges.map(_._1) shouldBe (1L to TextAnalysis.BpeMerges.toLong)
    // each merge is a distinct pair with a positive corpus-weighted count
    merges.map(m => (m._2, m._3)).distinct.length shouldBe merges.length
    all(merges.map(_._4)) should be > 0L
    // the merged word table is a faithful segmentation: symbols of each
    // word concatenate back to the word, and piece count only shrinks
    val rows = words.select(col("w"), col("s")).collect()
    rows.foreach { r =>
      val w = r.getString(0); val s = r.getString(1)
      s.split(" ").mkString shouldBe w
      s.split(" ").length should be <= w.length
    }
    // pack-by-BPE: per-doc piece counts are at least the whitespace token
    // count (subwords only split words) and at most the character count
    val pack = TextAnalysis.queries("text_pack_bpe")(spark, sf0001)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ws = TextAnalysis.queries("text_pack")(spark, sf0001)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pack.keySet shouldBe ws.keySet
    pack.foreach { case (id, n) => n should be >= ws(id) }
  }
}
