package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.collection.mutable

/** The reference's repo-acquisition step as a pluggable hook
  * (/root/reference/repo/importer.py:18-40 clone/pull;
  * repo/importer.py:86-90 `clickhouse git-import`).
  *
  * `fetch(repoName)` makes the repo's git-import TSVs exist somewhere and
  * returns that directory; everything from the TSVs onward is the engine
  * ([[TsvIngest]]). Two implementations:
  *
  *   - [[RepoFetcher.fromTsvRoot]] — TSVs were produced externally (the
  *     out-of-engine posture the reference also supports via --keep_files);
  *     fetch is a pure path lookup.
  *   - [[GitCliFetcher]] — the real subprocess path: `git clone` / `git
  *     pull` into a data cache (importer.py:18-36), then a git-log-based
  *     history extraction that emits the same three TSVs `clickhouse
  *     git-import` does, so `start_worker` is end-to-end from a bare repo
  *     name to fact tables.
  */
trait RepoFetcher {
  def fetch(repoName: String): String
}

object RepoFetcher {
  /** Consume externally produced TSVs under `root/<repoName>/`. */
  def fromTsvRoot(root: String): RepoFetcher = (repoName: String) => s"$root/$repoName"
}

/** Clone-or-pull + git-import analog over the `git` CLI.
  *
  * `urlFor` maps a repo name to its clone URL — the reference hardcodes
  * `https://github.com/{name}` (repo/importer.py:124-125); tests pass a
  * local fixture path (git clones from plain directories), which is also
  * what keeps this spec-able in a network-less container.
  *
  * History extraction is ONE `git log` pass over the full history with
  * zero-context patches, parsed into the three TSV shapes of
  * FIXTURES.md §A. Documented deltas vs `clickhouse git-import`:
  *   - rename/copy detection is disabled (`--no-renames`): a rename lands
  *     as Delete+Add, `files_renamed` is 0, and `Rename`/`Copy` change
  *     types never occur (counter semantics only; ingest is unaffected);
  *   - line provenance (`prev_commit_hash`/`prev_author`/`prev_time`) needs
  *     a blame pass the analog skips — emitted as ''/epoch 0;
  *   - merge commits contribute a commit row but no file/line rows (git
  *     shows no combined diff by default, matching the ingest watermark's
  *     view of them).
  */
final class GitCliFetcher(
    cacheDir: String,
    urlFor: String => String = r => s"https://github.com/$r") extends RepoFetcher {

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  override def fetch(repoName: String): String = {
    val dir = Paths.get(cacheDir, repoName)
    if (Files.exists(dir.resolve(".git")))
      run(dir, "git", "pull", "--ff-only", "--quiet") // importer.py:33-36
    else {
      Files.createDirectories(dir.getParent)
      run(dir.getParent, "git", "clone", "--quiet", urlFor(repoName), dir.toString)
    }
    gitImport(dir)
    dir.toString
  }

  /** Run a subprocess, streaming stdout lines through `consume` while a
    * background thread drains stderr — reading the two pipes sequentially
    * deadlocks once the child fills the unread one (~64 KB), and buffering
    * `git log -p` over a big history as one String would hit the JVM's 2 GB
    * array cap long before 100 TB-scale repos do.
    */
  private def runStreaming[T](cwd: Path, cmd: String*)(consume: Iterator[String] => T): T = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd.toFile)
    pb.redirectErrorStream(false)
    val p = pb.start()
    val errBuf = new java.io.ByteArrayOutputStream()
    val drainer = new Thread(() => p.getErrorStream.transferTo(errBuf), "stderr-drain")
    drainer.setDaemon(true)
    drainer.start()
    // InputStreamReader REPLACEs malformed bytes (repos carry non-UTF-8
    // file content in patches); a throwing decoder would abort the import
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream, UTF_8))
    val result =
      try consume(Iterator.continually(reader.readLine()).takeWhile(_ != null))
      finally reader.close()
    val code = p.waitFor()
    drainer.join(10000)
    require(code == 0,
      s"${cmd.mkString(" ")} failed ($code): ${errBuf.toString(UTF_8).take(500)}")
    result
  }

  private def run(cwd: Path, cmd: String*): Unit =
    runStreaming(cwd, cmd: _*)(_.foreach(_ => ()))

  private def sanitize(s: String): String = s.replaceAll("[\\t\\n\\r]", " ")

  private def ext(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(dot + 1) else ""
  }

  /** Empty/Comment/Punct/Code per the reference's line_type Enum8
    * (create_db.py via types.json:18) — the standard git-import heuristic:
    * blank → Empty, comment-leader → Comment, no letters/digits → Punct.
    */
  private def lineType(line: String): String = {
    val t = line.trim
    if (t.isEmpty) "Empty"
    else if (t.startsWith("//") || t.startsWith("#") || t.startsWith("/*") ||
             t.startsWith("*") || t.startsWith("--")) "Comment"
    else if (!t.exists(_.isLetterOrDigit)) "Punct"
    else "Code"
  }

  private final case class Hunk(oldStart: Long, newStart: Long,
                                added: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty,
                                deleted: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty)
  private final class FileDiff(var path: String, var changeType: String) {
    val hunks: mutable.ArrayBuffer[Hunk] = mutable.ArrayBuffer.empty
    def linesAdded: Long = hunks.map(_.added.size.toLong).sum
    def linesDeleted: Long = hunks.map(_.deleted.size.toLong).sum
    def hunksAdded: Long = hunks.count(h => h.added.nonEmpty && h.deleted.isEmpty)
    def hunksRemoved: Long = hunks.count(h => h.added.isEmpty && h.deleted.nonEmpty)
    def hunksChanged: Long = hunks.count(h => h.added.nonEmpty && h.deleted.nonEmpty)
  }
  private final case class Commit(hash: String, author: String, epoch: Long, subject: String,
                                  files: mutable.ArrayBuffer[FileDiff] = mutable.ArrayBuffer.empty)

  private val HunkHeader = """@@ -(\d+)(?:,\d+)? \+(\d+)(?:,\d+)? @@.*""".r

  /** Path from a `--- a/x` / `+++ b/x` header line: strips the marker, an
    * optional quoting layer (git quotes non-ASCII paths), and the a/ or b/
    * prefix; `/dev/null` → None. Header lines are the authoritative path
    * source — the `diff --git a/x b/x` line is ambiguous for paths that
    * themselves contain ` b/` or are quoted.
    */
  private def headerPath(l: String, prefix: String): Option[String] = {
    val body = l.drop(4).trim
    if (body == "/dev/null") None
    else {
      val unq =
        if (body.length >= 2 && body.head == '"' && body.last == '"')
          body.substring(1, body.length - 1)
        else body
      Some(if (unq.startsWith(prefix)) unq.drop(prefix.length) else unq)
    }
  }

  /** Parse the streamed `git log --reverse -p --unified=0 --no-renames`
    * output. File headers (`---`/`+++`/mode lines) are only recognized
    * BEFORE a file's first hunk; past it, every `+`/`-` line is content —
    * which is also what makes added lines starting with `++` (rendered
    * `+++…`) count correctly instead of being mistaken for headers.
    */
  private def parseLog(lines: Iterator[String]): Seq[Commit] = {
    val commits = mutable.ArrayBuffer.empty[Commit]
    var file: FileDiff = null
    var hunk: Hunk = null
    lines.foreach {
      case l if l.startsWith("@C\t") =>
        val a = l.split("\t", 5)
        commits += Commit(a(1), a(2), a(3).toLong, if (a.length > 4) a(4) else "")
        file = null; hunk = null
      case l if l.startsWith("diff --git ") =>
        // seed the path from the (ambiguous) diff line — binary files emit
        // no ---/+++ headers; text files overwrite it from the headers
        val seed = l.indexOf(" b/") match {
          case -1 => ""
          case i => l.substring(i + 3)
        }
        file = new FileDiff(seed, "Modify")
        hunk = null
        commits.last.files += file
      case l if file != null && hunk == null && l.startsWith("new file mode") =>
        file.changeType = "Add"
      case l if file != null && hunk == null && l.startsWith("deleted file mode") =>
        file.changeType = "Delete"
      // headers override the seed unconditionally (old == new path without
      // renames; `+++` wins last for Add, `---` supplies Delete's path)
      case l if file != null && hunk == null && l.startsWith("--- ") =>
        headerPath(l, "a/").foreach(p => file.path = p)
      case l if file != null && hunk == null && l.startsWith("+++ ") =>
        headerPath(l, "b/").foreach(p => file.path = p)
      case HunkHeader(o, n) if file != null =>
        hunk = Hunk(o.toLong, n.toLong)
        file.hunks += hunk
      case l if hunk != null && l.startsWith("+") =>
        hunk.added += l.substring(1)
      case l if hunk != null && l.startsWith("-") =>
        hunk.deleted += l.substring(1)
      case _ => ()
    }
    commits.toSeq
  }

  /** Emit commits.tsv / file_changes.tsv / line_changes.tsv (FIXTURES.md §A)
    * from the parsed history — the `clickhouse git-import` output contract
    * (repo/importer.py:86-90), headerless and positional.
    */
  private def gitImport(dir: Path): Unit = {
    val commits = runStreaming(dir, "git", "log", "--reverse", "--no-renames",
      "-p", "--unified=0", "--pretty=format:@C%x09%H%x09%an%x09%at%x09%s")(parseLog)

    val commitRows = commits.map { c =>
      val fa = c.files.count(_.changeType == "Add").toLong
      val fd = c.files.count(_.changeType == "Delete").toLong
      val fm = c.files.count(_.changeType == "Modify").toLong
      Seq(c.hash, sanitize(c.author), tsFmt.format(Instant.ofEpochSecond(c.epoch)),
        sanitize(c.subject), fa, fd, 0L, fm,
        c.files.map(_.linesAdded).sum, c.files.map(_.linesDeleted).sum,
        c.files.map(_.hunksAdded).sum, c.files.map(_.hunksRemoved).sum,
        c.files.map(_.hunksChanged).sum).mkString("\t")
    }

    val fileRows = commits.flatMap { c =>
      val commitTail = Seq(
        c.files.count(_.changeType == "Add").toLong,
        c.files.count(_.changeType == "Delete").toLong, 0L,
        c.files.count(_.changeType == "Modify").toLong,
        c.files.map(_.linesAdded).sum, c.files.map(_.linesDeleted).sum,
        c.files.map(_.hunksAdded).sum, c.files.map(_.hunksRemoved).sum,
        c.files.map(_.hunksChanged).sum)
      c.files.map { f =>
        (Seq(f.changeType, f.path, f.path, ext(f.path),
          f.linesAdded, f.linesDeleted, f.hunksAdded, f.hunksRemoved, f.hunksChanged,
          c.hash, sanitize(c.author), tsFmt.format(Instant.ofEpochSecond(c.epoch)),
          sanitize(c.subject)) ++ commitTail).mkString("\t")
      }
    }

    val lineRows = commits.flatMap { c =>
      val commitTail = Seq(
        c.files.count(_.changeType == "Add").toLong,
        c.files.count(_.changeType == "Delete").toLong, 0L,
        c.files.count(_.changeType == "Modify").toLong,
        c.files.map(_.linesAdded).sum, c.files.map(_.linesDeleted).sum,
        c.files.map(_.hunksAdded).sum, c.files.map(_.hunksRemoved).sum,
        c.files.map(_.hunksChanged).sum)
      c.files.flatMap { f =>
        val fileTail = Seq(f.changeType, f.path, f.path, ext(f.path),
          f.linesAdded, f.linesDeleted, f.hunksAdded, f.hunksRemoved, f.hunksChanged,
          c.hash, sanitize(c.author), tsFmt.format(Instant.ofEpochSecond(c.epoch)),
          sanitize(c.subject)) ++ commitTail
        f.hunks.zipWithIndex.flatMap { case (h, hi) =>
          val del = h.deleted.zipWithIndex.map { case (line, k) =>
            (line, -1L, h.oldStart + k, 0L, hi)
          }
          val add = h.added.zipWithIndex.map { case (line, k) =>
            (line, 1L, 0L, h.newStart + k, hi)
          }
          (del ++ add).map { case (line, sign, oldNo, newNo, hunkNum) =>
            (Seq(sign, oldNo, newNo, hunkNum.toLong + 1L, h.oldStart, h.newStart,
              h.added.size.toLong, h.deleted.size.toLong, "",
              sanitize(line).take(255),
              math.min(line.takeWhile(ch => ch == ' ' || ch == '\t').length, 255).toLong,
              lineType(line),
              // provenance (prev_*) needs a blame pass — documented gap
              "", "", "1970-01-01 00:00:00") ++ fileTail).mkString("\t")
          }
        }
      }
    }

    Files.write(dir.resolve("commits.tsv"), commitRows.mkString("\n").getBytes(UTF_8))
    Files.write(dir.resolve("file_changes.tsv"), fileRows.mkString("\n").getBytes(UTF_8))
    Files.write(dir.resolve("line_changes.tsv"), lineRows.mkString("\n").getBytes(UTF_8))
  }
}
