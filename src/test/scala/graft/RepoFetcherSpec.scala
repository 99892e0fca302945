package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import graft.queue.WorkQueue
import graft.sources.{GitCliFetcher, GitImporter}

/** End-to-end worker path from a bare repo name: clone → git-import analog →
  * TSVs → fact tables (the reference's importer.py:18-90 + §3.2 loop),
  * spec'd against a locally created fixture repository — git clones from
  * plain directories, so no network is involved.
  */
class RepoFetcherSpec extends SparkSpecBase {

  private def sh(cwd: Path, env: Map[String, String], cmd: String*): Unit = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd.toFile)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val p = pb.start()
    val err = new String(p.getErrorStream.readAllBytes(), UTF_8)
    require(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $err")
  }

  // deterministic commits: fixed identity + timestamps (UTC seconds)
  private def gitEnv(epoch: Long) = Map(
    "GIT_AUTHOR_NAME" -> "Fixture Author", "GIT_AUTHOR_EMAIL" -> "fix@example.com",
    "GIT_COMMITTER_NAME" -> "Fixture Author", "GIT_COMMITTER_EMAIL" -> "fix@example.com",
    "GIT_AUTHOR_DATE" -> s"$epoch +0000", "GIT_COMMITTER_DATE" -> s"$epoch +0000")

  private def commit(repo: Path, epoch: Long, msg: String, files: (String, String)*): Unit = {
    files.foreach { case (name, content) =>
      val p = repo.resolve(name)
      Files.createDirectories(p.getParent match { case null => repo; case d => d })
      Files.write(p, content.getBytes(UTF_8))
    }
    sh(repo, gitEnv(epoch), "git", "add", "-A")
    sh(repo, gitEnv(epoch), "git", "commit", "--quiet", "-m", msg)
  }

  private def fixtureRepo(): Path = {
    val repo = Files.createTempDirectory("fixture-repo")
    sh(repo, Map.empty, "git", "init", "--quiet", "-b", "main")
    commit(repo, 1700000000L, "initial",
      "src/Main.scala" -> "object Main {\n  // entry\n  def main(a: Array[String]): Unit = ()\n}\n",
      "README.md" -> "# fixture\n")
    commit(repo, 1700000100L, "add util",
      "src/Util.scala" -> "object Util {\n  val x = 1\n}\n")
    commit(repo, 1700000200L, "tweak main",
      "src/Main.scala" -> "object Main {\n  // entry point\n  def main(a: Array[String]): Unit = println(1)\n}\n")
    repo
  }

  test("worker from bare repo name: clone → TSVs → all three fact tables; pull is incremental") {
    val upstream = fixtureRepo()
    val cache = Files.createTempDirectory("git-cache").toString
    val warehouse = Files.createTempDirectory("wh").toString
    val fetcher = new GitCliFetcher(cache, urlFor = _ => upstream.toString)
    val importer = new GitImporter(spark, warehouse)
    val queue = new WorkQueue(Files.createTempDirectory("q"))

    // §3.2 claim → fetch → import → release, from nothing but the repo name
    queue.schedule("acme/fixture")
    importer.workOnce(queue, "w1", fetcher.fetch) shouldBe Some("acme/fixture")
    queue.length shouldBe 0

    importer.catalog.read("commits").count() shouldBe 3
    val fc = importer.catalog.read("file_changes")
    // commit1: 2 adds, commit2: 1 add, commit3: 1 modify
    fc.count() shouldBe 4
    fc.filter(org.apache.spark.sql.functions.col("change_type") === "Add").count() shouldBe 3
    val lc = importer.catalog.read("line_changes")
    lc.count() should be > 0L
    // the Modify commit rewrote 2 lines with zero-context hunks: both signs present
    lc.filter(org.apache.spark.sql.functions.col("sign") === -1).count() should be > 0L

    // replay: re-fetch (pull, no-op) + re-import is idempotent (watermark + dedup)
    importer.importRepo("acme/fixture", fetcher.fetch("acme/fixture"))
    importer.catalog.read("commits").count() shouldBe 3

    // upstream advances → pull picks it up → only the new commit lands
    commit(upstream, 1700000300L, "fourth", "NOTES.md" -> "notes\n")
    importer.importRepo("acme/fixture", fetcher.fetch("acme/fixture"))
    importer.catalog.read("commits").count() shouldBe 4
    importer.catalog.read("file_changes").count() shouldBe 5
  }

  test("rename tracking and blame provenance (reference types.json:18 prev_* columns)") {
    val upstream = fixtureRepo()
    sh(upstream, gitEnv(1700000300L), "git", "mv", "src/Util.scala", "src/Util2.scala")
    sh(upstream, gitEnv(1700000300L), "git", "commit", "--quiet", "-m", "rename util")
    val cache = Files.createTempDirectory("git-cache3").toString
    val fetcher = new GitCliFetcher(cache, urlFor = _ => upstream.toString)
    val dir = fetcher.fetch("acme/rename")
    def rows(f: String) =
      new String(Files.readAllBytes(java.nio.file.Paths.get(dir, f)), UTF_8)
        .split("\n").filter(_.nonEmpty).map(_.split("\t", -1))

    val commits = rows("commits.tsv")
    commits.length shouldBe 4
    commits(3)(6).toLong shouldBe 1 // files_renamed
    commits(3)(7).toLong shouldBe 0 // not counted as modified

    val ren = rows("file_changes.tsv").filter(_(0) == "Rename")
    ren.length shouldBe 1
    ren(0)(1) shouldBe "src/Util2.scala" // path
    ren(0)(2) shouldBe "src/Util.scala"  // old_path

    // the "tweak main" commit rewrote lines first written by "initial":
    // deleted rows carry that origin commit as prev_* provenance
    val initialHash = commits(0)(0)
    val tweakHash = commits(2)(0)
    val deleted = rows("line_changes.tsv")
      .filter(r => r(0) == "-1" && r(24) == tweakHash)
    deleted.length should be > 0
    all(deleted.map(_(12))) shouldBe initialHash        // prev_commit_hash
    all(deleted.map(_(13))) shouldBe "Fixture Author"   // prev_author
    all(deleted.map(_(14))) shouldBe "2023-11-14 22:13:20" // prev_time
    // added rows have no predecessor
    val added = rows("line_changes.tsv").filter(r => r(0) == "1" && r(24) == tweakHash)
    all(added.map(_(12))) shouldBe ""

    // rename WITH an edit in the same commit (-M partial similarity):
    // change type stays Rename, hunks address the OLD path's line space,
    // and the blame snapshot followed the file across the first rename.
    // Grow the file first — git's similarity detector needs the unchanged
    // majority to dominate (a 1-of-3-line edit falls under the 50% bar)
    val grown = "object Util {\n  val x = 1\n" +
      (0 until 7).map(i => s"  val a$i = $i\n").mkString + "}\n"
    commit(upstream, 1700000400L, "grow util", "src/Util2.scala" -> grown)
    Files.write(upstream.resolve("src/Util2.scala"),
      grown.replace("object Util {", "object Util2 {").getBytes(UTF_8))
    sh(upstream, gitEnv(1700000500L), "git", "mv", "src/Util2.scala", "src/Util3.scala")
    sh(upstream, gitEnv(1700000500L), "git", "add", "-A")
    sh(upstream, gitEnv(1700000500L), "git", "commit", "--quiet", "-m", "rename+edit")
    fetcher.fetch("acme/rename") // pull + re-import
    val commits2 = rows("commits.tsv")
    commits2.length shouldBe 6
    val renEditHash = commits2(5)(0)
    val ren2 = rows("file_changes.tsv")
      .filter(r => r(0) == "Rename" && r(9) == renEditHash)
    ren2.length shouldBe 1
    ren2(0)(1) shouldBe "src/Util3.scala"
    ren2(0)(2) shouldBe "src/Util2.scala"
    ren2(0)(4).toLong should be > 0L // lines_added: the edit rode the rename
    // the edited line ("object Util {") predates the grow commit's
    // insert-only hunk AND both renames — provenance must reach all the
    // way back to the original "add util" commit
    val addUtilHash = commits2(1)(0)
    val renDeleted = rows("line_changes.tsv")
      .filter(r => r(0) == "-1" && r(24) == renEditHash)
    renDeleted.length should be > 0
    all(renDeleted.map(_(12))) shouldBe addUtilHash
  }

  private def shOut(cwd: Path, cmd: String*): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd.toFile)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), UTF_8)
    val err = new String(p.getErrorStream.readAllBytes(), UTF_8)
    require(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $err")
    out
  }

  /** Owner hash of the first line containing `needle`, per git's own
    * first-parent blame at `rev` — the external truth the import's
    * provenance columns are compared against.
    */
  private def blameOwner(repo: Path, rev: String, file: String, needle: String): String =
    shOut(repo, "git", "blame", "--first-parent", "-l", rev, "--", file)
      .split("\n").find(_.contains(needle))
      .map(_.split(" ")(0)).getOrElse(fail(s"no blame line matching '$needle'"))

  test("merge commits emit first-parent diff rows; provenance matches git blame --first-parent") {
    val repo = fixtureRepo() // 3 commits on main; Util.scala has "val x = 1"
    // side branch edits Util; main advances independently; then a no-ff merge
    sh(repo, gitEnv(1700000300L), "git", "checkout", "--quiet", "-b", "feat")
    commit(repo, 1700000300L, "branch edit",
      "src/Util.scala" -> "object Util {\n  val x = 42\n}\n")
    sh(repo, gitEnv(1700000400L), "git", "checkout", "--quiet", "main")
    commit(repo, 1700000400L, "main readme", "README.md" -> "# fixture\nmore\n")
    sh(repo, gitEnv(1700000500L), "git", "merge", "--quiet", "--no-ff", "--no-edit", "feat")
    // post-merge mainline commit rewrites the line the MERGE carried in
    commit(repo, 1700000600L, "post merge edit",
      "src/Util.scala" -> "object Util {\n  val x = 43\n}\n")

    val cache = Files.createTempDirectory("git-cache4").toString
    val fetcher = new GitCliFetcher(cache, urlFor = _ => repo.toString)
    val dir = fetcher.fetch("acme/merged")
    def rows(f: String) =
      new String(Files.readAllBytes(java.nio.file.Paths.get(dir, f)), UTF_8)
        .split("\n").filter(_.nonEmpty).map(_.split("\t", -1))

    val commits = rows("commits.tsv")
    commits.length shouldBe 7 // 3 + branch edit + main readme + merge + post
    val byMsg = commits.map(r => r(3) -> r(0)).toMap
    val addUtilHash = byMsg("add util")
    val branchHash = byMsg("branch edit")
    val mergeHash = commits.map(_(0)).find(h =>
      shOut(repo, "git", "rev-list", "--merges", "-n", "1", h).nonEmpty &&
        shOut(repo, "git", "rev-parse", h).trim == shOut(repo, "git", "rev-list", "--merges", "-n", "1", "main").trim)
      .getOrElse(fail("merge commit not in commits.tsv"))
    val postHash = byMsg("post merge edit")

    // 1. the merge emits file/line rows from its first-parent diff: on the
    //    mainline it replaces "val x = 1" with the branch's "val x = 42"
    val mergeFiles = rows("file_changes.tsv").filter(_(9) == mergeHash)
    mergeFiles.map(_(1)) should contain("src/Util.scala")
    val mergeLines = rows("line_changes.tsv").filter(_(24) == mergeHash)
    mergeLines.filter(_(0) == "1").map(_(9)) should contain("  val x = 42")
    // 2. the line the merge deleted was authored on the mainline by
    //    "add util" — and git blame --first-parent at merge^ agrees
    val mergeDeleted = mergeLines.filter(r => r(0) == "-1" && r(9).contains("val x = 1"))
    mergeDeleted.length shouldBe 1
    mergeDeleted(0)(12) shouldBe addUtilHash
    mergeDeleted(0)(12) shouldBe blameOwner(repo, s"$mergeHash^", "src/Util.scala", "val x = 1")
    // 3. the post-merge edit deletes a line the MERGE carried onto the
    //    mainline: first-parent attribution owns it to the merge commit,
    //    NOT the branch commit — exactly what git blame --first-parent says
    //    (the old linearized replay misattributed this to the branch commit)
    val postDeleted = rows("line_changes.tsv")
      .filter(r => r(24) == postHash && r(0) == "-1" && r(9).contains("val x = 42"))
    postDeleted.length shouldBe 1
    postDeleted(0)(12) shouldBe mergeHash
    postDeleted(0)(12) should not be branchHash
    postDeleted(0)(12) shouldBe blameOwner(repo, s"$postHash^", "src/Util.scala", "val x = 42")
    // 4. the side-branch commit's own rows are exact too: its diff is taken
    //    against ITS parent (the branch point), so the deleted "val x = 1"
    //    line carries mainline provenance
    val branchDeleted = rows("line_changes.tsv")
      .filter(r => r(24) == branchHash && r(0) == "-1" && r(9).contains("val x = 1"))
    branchDeleted.length shouldBe 1
    branchDeleted(0)(12) shouldBe addUtilHash
  }

  test("git-import analog emits faithful commit counters") {
    val upstream = fixtureRepo()
    val cache = Files.createTempDirectory("git-cache2").toString
    val fetcher = new GitCliFetcher(cache, urlFor = _ => upstream.toString)
    val dir = fetcher.fetch("acme/counters")
    val rows = new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "commits.tsv")), UTF_8)
      .split("\n").map(_.split("\t", -1))
    rows.length shouldBe 3
    val initial = rows(0)
    initial(0).length shouldBe 40                  // full hash
    initial(1) shouldBe "Fixture Author"
    initial(2) shouldBe "2023-11-14 22:13:20"      // epoch 1700000000 UTC
    initial(4).toLong shouldBe 2                   // files_added
    initial(8).toLong should be > 0L               // lines_added
    val modify = rows(2)
    modify(7).toLong shouldBe 1                    // files_modified
    modify(9).toLong should be > 0L                // lines_deleted (rewrote lines)
  }
}
