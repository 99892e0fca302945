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

  test("BPE merges are boundary-guarded: a pair never fuses across a symbol edge") {
    // The round-9 advice corpus: 'al'×5 forces merge 1 = (a,l); 'lb'×3
    // then forces merge 2 = (l,b). Word 'alb' is 'al b' after round 1 —
    // a RAW "l b"→"lb" replace would fuse it to the single symbol 'alb',
    // a merge (al,b) that was never learned. The guard (space sentinels)
    // must leave it as 'al b'. The invariant checked is closure: every
    // symbol in the final word table is a single char or the product of
    // a learned merge applied to already-valid symbols.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("bpeguard")
    (Seq.fill(5)("al") ++ Seq.fill(3)("lb") ++ Seq("alb"))
      .zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(dir + "/documents.parquet")
    val (merges, words) = TextAnalysis.bpeTrain(spark, dir)
    merges.take(2).map(m => (m._2, m._3)) shouldBe Seq(("a", "l"), ("l", "b"))
    val valid = merges.foldLeft(Set.empty[String]) { case (acc, (_, a, b, _)) =>
      val ok = (a.length == 1 || acc(a)) && (b.length == 1 || acc(b))
      if (ok) acc + (a + b) else acc
    }
    val bad = words.select(col("s")).collect().flatMap(_.getString(0).split(" "))
      .filterNot(sym => sym.length == 1 || valid(sym))
    withClue(s"unlearned fused symbols: ${bad.mkString(",")}: ") {
      bad shouldBe empty
    }
    // The discriminating signal: after (a,l) and (l,b), 'alb' must still
    // be 'al b' — so round 3 SEES pair (al,b) and learns it as a third
    // merge. The unguarded replace fused 'al b'→'alb' during round 2,
    // leaving round 3 pairless: only 2 merges learned. (The final fused
    // 'alb' is then lawful — produced by the LEARNED merge 3.)
    merges.length shouldBe 3
    (merges(2)._2, merges(2)._3) shouldBe ("al", "b")
    words.filter(col("w") === "alb").head().getAs[String]("s") shouldBe "alb"
  }

  test("BPE encode: pieces concatenate back to the document's tokens, ids rank the vocab") {
    import org.apache.spark.sql.functions._
    val enc = TextAnalysis.queries("text_encode_bpe")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    enc.length.toLong shouldBe Tables.documents(spark, sf0001)
      .filter(exists(graft.functions.TextFns.tokens(col("text")), _ =!= ""))
      .count()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), concat_ws("", graft.functions.TextFns.tokens(col("text"))).as("flat"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { case (id, pieces, ids, n) =>
      // piece stream reconstructs the exact character stream of the doc
      pieces.split(" ").mkString shouldBe docs(id)
      val idArr = ids.split(",")
      idArr.length.toLong shouldBe n
      pieces.split(" ").length.toLong shouldBe n
      // ids are positive vocab ranks
      all(idArr.map(_.toLong)) should be > 0L
    }
  }
}
