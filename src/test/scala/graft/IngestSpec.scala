package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{GitImporter, TsvIngest}
import graft.schema.GitSchemas

/** The reference ingest contract (SURVEY.md §3.1): typed TSV projection,
  * watermark incremental append, replay idempotence (the ReplacingMergeTree
  * invariant), Enum8 validation.
  */
class IngestSpec extends SparkSpecBase {

  private def commitRow(hash: String, time: String, author: String = "alice"): String =
    (Seq(hash, author, time, s"msg $hash") ++ Seq.fill(9)("1")).mkString("\t")

  private def writeTsv(dir: String, name: String, rows: Seq[String]): String = {
    val p = Paths.get(dir, name)
    Files.writeString(p, rows.mkString("", "\n", "\n"))
    p.toString
  }

  test("typed projection yields declared names and types") {
    val dir = tmpDir("ingest")
    writeTsv(dir, "commits.tsv", Seq(
      commitRow("aaa", "2024-01-01 10:00:00"),
      commitRow("bbb", "1704103200"))) // epoch-seconds form of 2024-01-01 10:00
    val imp = new GitImporter(spark, tmpDir("wh"))
    imp.importRepo("acme/repo", dir)
    val df = imp.catalog.read("commits")
    df.schema.fieldNames.take(4) shouldBe Array("hash", "author", "time", "message")
    df.schema("time").dataType.typeName shouldBe "timestamp"
    df.schema("lines_added").dataType.typeName shouldBe "long"
    val times = df.select("time").collect().map(_.getTimestamp(0).toString).sorted
    times shouldBe Array("2024-01-01 10:00:00.0", "2024-01-01 10:00:00.0")
    df.filter(col("repo_name") === "acme/repo").count() shouldBe 2
  }

  test("replay of the same TSV is a no-op (idempotent re-import, T1/T2)") {
    val dir = tmpDir("ingest")
    writeTsv(dir, "commits.tsv", Seq(
      commitRow("aaa", "2024-01-01 10:00:00"),
      commitRow("bbb", "2024-01-02 10:00:00")))
    val imp = new GitImporter(spark, tmpDir("wh"))
    val first = imp.importRepo("acme/repo", dir)
    first("commits") shouldBe 2
    val second = imp.importRepo("acme/repo", dir) // strict '>' watermark drops all
    second("commits") shouldBe 0
    imp.catalog.read("commits").count() shouldBe 2
  }

  test("incremental import ingests only rows past the high-water mark (T1)") {
    val dir = tmpDir("ingest")
    writeTsv(dir, "commits.tsv", Seq(commitRow("aaa", "2024-01-01 10:00:00")))
    val imp = new GitImporter(spark, tmpDir("wh"))
    imp.importRepo("acme/repo", dir)
    // extended history: old row re-emitted + one new commit
    writeTsv(dir, "commits.tsv", Seq(
      commitRow("aaa", "2024-01-01 10:00:00"),
      commitRow("ccc", "2024-03-01 10:00:00")))
    val n = imp.importRepo("acme/repo", dir)
    n("commits") shouldBe 1
    imp.catalog.read("commits").select("hash").collect().map(_.getString(0)).sorted shouldBe
      Array("aaa", "ccc")
  }

  test("watermarks are per-repo: one repo's history does not gate another's") {
    val dir1 = tmpDir("r1"); val dir2 = tmpDir("r2")
    writeTsv(dir1, "commits.tsv", Seq(commitRow("aaa", "2024-06-01 10:00:00")))
    writeTsv(dir2, "commits.tsv", Seq(commitRow("bbb", "2024-01-01 10:00:00")))
    val imp = new GitImporter(spark, tmpDir("wh"))
    imp.importRepo("acme/one", dir1)
    val n = imp.importRepo("acme/two", dir2) // earlier time, different repo
    n("commits") shouldBe 1
  }

  test("property: incremental re-import of a growing history converges to one-shot import") {
    // the reference's real pattern: git-import re-emits the FULL history
    // TSV on every run; the watermark must make any prefix-then-full replay
    // sequence equivalent to importing the final history once. Random
    // histories via scalacheck Gen, fixed seeds.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val histGen = Gen.listOfN(30, for {
      h <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
      day <- Gen.chooseNum(1, 28)
      hour <- Gen.chooseNum(0, 23)
    } yield commitRow(h, f"2024-03-$day%02d $hour%02d:00:00"))
    (1 to 3).foreach { seed =>
      val rows = histGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get.distinct
      val sortedByTime = rows.sortBy(_.split("\t")(2))
      // cut strictly between timestamps: rows sharing the boundary second
      // would otherwise be dropped by the strict '>' watermark — the same
      // same-second re-read semantics the reference has (importer.py:107)
      val cutoff = sortedByTime(rows.size / 2).split("\t")(2)
      val prefix = sortedByTime.filter(_.split("\t")(2) < cutoff)

      val dirA = tmpDir("prop-a"); val impA = new GitImporter(spark, tmpDir("wh-a"))
      writeTsv(dirA, "commits.tsv", prefix)
      impA.importRepo("p/r", dirA)
      writeTsv(dirA, "commits.tsv", sortedByTime) // full history re-emitted
      impA.importRepo("p/r", dirA)
      impA.importRepo("p/r", dirA)                // pure replay: no-op

      val dirB = tmpDir("prop-b"); val impB = new GitImporter(spark, tmpDir("wh-b"))
      writeTsv(dirB, "commits.tsv", sortedByTime)
      impB.importRepo("p/r", dirB)

      def snap(imp: GitImporter) = imp.catalog.read("commits")
        .select("hash", "time").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString)).toSet
      withClue(s"seed $seed: ") {
        snap(impA) shouldBe snap(impB)
      }
    }
  }

  test("Enum8 validation rejects undeclared values (F1 check constraint)") {
    val dir = tmpDir("ingest")
    val goodTail = (Seq("a.txt", "", "txt") ++ Seq.fill(5)("1") ++
      Seq("hash1", "alice", "2024-01-01 10:00:00", "msg") ++ Seq.fill(9)("2")).mkString("\t")
    writeTsv(dir, "file_changes.tsv", Seq(s"Add\t$goodTail", s"Banana\t$goodTail"))
    val imp = new GitImporter(spark, tmpDir("wh"))
    val e = intercept[Exception] { imp.importRepo("acme/repo", dir) }
    e.getMessage should include("invalid Enum8 value")
  }

  test("file_changes and line_changes ingest through their full-width schemas") {
    val dir = tmpDir("ingest")
    val fc = (Seq("Modify", "src/a.scala", "", "scala") ++ Seq.fill(5)("3") ++
      Seq("h1", "bob", "2024-02-02 02:02:02", "m") ++ Seq.fill(9)("4")).mkString("\t")
    writeTsv(dir, "file_changes.tsv", Seq(fc))
    val lc = (Seq("1", "10", "11", "1", "5", "6", "2", "1", "ctx", "val x = 1", "2", "Code",
      "prevh", "carol", "2024-02-01 01:01:01", "Modify", "src/a.scala", "", "scala") ++
      Seq.fill(5)("7") ++ Seq("h1", "bob", "2024-02-02 02:02:02", "m") ++
      Seq.fill(9)("8")).mkString("\t")
    writeTsv(dir, "line_changes.tsv", Seq(lc))
    val imp = new GitImporter(spark, tmpDir("wh"))
    val n = imp.importRepo("acme/repo", dir)
    n("file_changes") shouldBe 1
    n("line_changes") shouldBe 1
    val row = imp.catalog.read("line_changes").head()
    row.getAs[Byte]("sign") shouldBe 1
    row.getAs[String]("line_type") shouldBe "Code"
    row.getAs[Long]("line_number_new") shouldBe 11L
  }
}
