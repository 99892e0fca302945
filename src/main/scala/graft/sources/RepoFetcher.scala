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

/** Remote-validity probe — the reference shells `git ls-remote` to check a
  * repo exists before enqueueing it (repo/importer.py:77-83, called from
  * app.py:45). Exit code 0 = valid; any failure, IOException, or timeout =
  * invalid. `git ls-remote` accepts plain directory paths as remotes, which
  * keeps the probe spec-able in a network-less container (the same local
  * fixture posture RepoFetcherSpec uses for clone/pull).
  */
object GitRemoteProbe {
  def lsRemote(urlFor: String => String = r => s"https://github.com/$r",
               timeoutMs: Long = 20000): String => Boolean = repo => {
    val pb = new ProcessBuilder("git", "ls-remote", urlFor(repo))
    // never block on a credential prompt for a private/missing repo — the
    // reference's subprocess would hang the Flask handler the same way
    pb.environment().put("GIT_TERMINAL_PROMPT", "0")
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    try {
      val p = pb.start()
      if (!p.waitFor(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        p.destroyForcibly()
        false
      } else p.exitValue() == 0
    } catch { case _: java.io.IOException => false }
  }

  /** The shipped default: probe the reference's hardcoded GitHub remote
    * (importer.py:124-125 `https://github.com/{name}`).
    */
  val default: String => Boolean = lsRemote()
}

/** Clone-or-pull + git-import analog over the `git` CLI.
  *
  * `urlFor` maps a repo name to its clone URL — the reference hardcodes
  * `https://github.com/{name}` (repo/importer.py:124-125); tests pass a
  * local fixture path (git clones from plain directories), which is also
  * what keeps this spec-able in a network-less container.
  *
  * History extraction is ONE `git log --reverse --topo-order -M -C -p
  * --unified=0` pass,
  * parsed commit-by-commit into the three TSV shapes of FIXTURES.md §A.
  * Rows stream to disk as each commit completes — only the current
  * commit's diff plus the line-provenance snapshot (below) are held in
  * memory, so history size is bounded by the output files, not the JVM.
  *
  * Rename tracking and line provenance match `clickhouse git-import`
  * (/root/reference/types.json:18, README.md:170-212):
  *   - `-M` rename detection: a rename emits a `Rename` file_changes row
  *     with (path, old_path) and counts into `files_renamed`; `Copy` and
  *     `Type` (mode-only change) are parsed from the same headers;
  *   - `prev_commit_hash`/`prev_author`/`prev_time` on deleted lines come
  *     from an incrementally maintained blame snapshot (per file, per
  *     line: which commit last wrote it) — the same replay posture
  *     git-import uses, costing O(current checkout) memory rather than a
  *     `git blame` subprocess per file per commit. Added lines carry
  *     empty provenance (they have no predecessor).
  *
  * Branched histories are exact (round 5): every commit's diff is taken
  * against its own FIRST PARENT (`--diff-merges=first-parent` makes merge
  * commits emit that diff too, so merges contribute file/line rows), and
  * the blame replay applies each diff to a per-commit snapshot of that
  * first parent's state — never to a global snapshot of a linearized
  * walk, which misattributed line origins where merged branches edited
  * the same file. The resulting attribution contract is exactly
  * `git blame --first-parent`: a line carried onto the mainline by a
  * merge belongs to the merge commit; a line authored on the lineage
  * belongs to its authoring commit (RepoFetcherSpec pins both against
  * real `git blame --first-parent` output). Snapshots are retained only
  * until the last first-parent child of their commit has been replayed,
  * so live memory is one checkout per concurrently-open branch — the
  * same O(current checkout) bound as before on linear histories.
  */
final class GitCliFetcher(
    cacheDir: String,
    urlFor: String => String = r => s"https://github.com/$r") extends RepoFetcher {

  private val tsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
  private val epoch0 = "1970-01-01 00:00:00"

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
    var oldPath: String = path
    var modeChange: Boolean = false
    val hunks: mutable.ArrayBuffer[Hunk] = mutable.ArrayBuffer.empty
    // a mode-only diff (old mode/new mode, no hunks) is git's T status
    def effectiveType: String =
      if (changeType == "Modify" && modeChange && hunks.isEmpty) "Type" else changeType
    def linesAdded: Long = hunks.map(_.added.size.toLong).sum
    def linesDeleted: Long = hunks.map(_.deleted.size.toLong).sum
    def hunksAdded: Long = hunks.count(h => h.added.nonEmpty && h.deleted.isEmpty)
    def hunksRemoved: Long = hunks.count(h => h.added.isEmpty && h.deleted.nonEmpty)
    def hunksChanged: Long = hunks.count(h => h.added.nonEmpty && h.deleted.nonEmpty)
  }
  private final case class CommitMeta(hash: String, author: String, epoch: Long)
  private final case class Commit(meta: CommitMeta, subject: String, parents: Seq[String],
                                  files: mutable.ArrayBuffer[FileDiff] = mutable.ArrayBuffer.empty)

  /** Per-file line-provenance snapshot of one commit's tree state. The
    * buffers are NEVER mutated after construction (replayHunks always
    * builds a fresh one), so snapshots share them structurally — an
    * immutable Map update costs O(log n), not a tree copy.
    */
  private type BlameState = Map[String, mutable.ArrayBuffer[CommitMeta]]

  private val HunkHeader = """@@ -(\d+)(?:,\d+)? \+(\d+)(?:,\d+)? @@.*""".r

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1) else s

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
      val unq = unquote(body)
      Some(if (unq.startsWith(prefix)) unq.drop(prefix.length) else unq)
    }
  }

  /** Parse the streamed `git log --reverse -M -p --unified=0` output,
    * invoking `onCommit` as each commit's diff completes — so peak memory
    * is one commit, not the history. File headers (`---`/`+++`/mode/
    * rename/copy lines) are only recognized BEFORE a file's first hunk;
    * past it, every `+`/`-` line is content — which is also what makes
    * added lines starting with `++` (rendered `+++…`) count correctly
    * instead of being mistaken for headers.
    *
    * The commit header uses a %x00 delimiter: git forbids NUL inside
    * commit-object headers, so an author name containing tabs (git allows
    * them) cannot shift fields. A malformed header degrades to
    * placeholder fields rather than aborting the whole import.
    */
  private def parseLog(lines: Iterator[String])(onCommit: Commit => Unit): Unit = {
    var commit: Commit = null
    var file: FileDiff = null
    var hunk: Hunk = null
    def flush(): Unit = if (commit != null) { onCommit(commit); commit = null }
    lines.foreach {
      case l if l.startsWith("@C\u0000") =>
        flush()
        val a = l.split("\u0000", 6)
        val hash = if (a.length > 1) a(1) else "(malformed)"
        val author = if (a.length > 2) sanitize(a(2)) else "(unknown)"
        val epoch = if (a.length > 3) a(3).toLongOption.getOrElse(0L) else 0L
        val parents =
          if (a.length > 4) a(4).split(' ').toSeq.filter(_.nonEmpty) else Seq.empty
        commit = Commit(CommitMeta(hash, author, epoch),
          if (a.length > 5) a(5) else "", parents)
        file = null; hunk = null
      case l if commit != null && l.startsWith("diff --git ") =>
        // seed the path from the (ambiguous) diff line — binary files emit
        // no ---/+++ headers; text files overwrite it from the headers
        val seed = l.indexOf(" b/") match {
          case -1 => ""
          case i => l.substring(i + 3)
        }
        file = new FileDiff(seed, "Modify")
        file.oldPath = seed
        hunk = null
        commit.files += file
      case l if file != null && hunk == null && l.startsWith("new file mode") =>
        file.changeType = "Add"
      case l if file != null && hunk == null && l.startsWith("deleted file mode") =>
        file.changeType = "Delete"
      case l if file != null && hunk == null && l.startsWith("old mode ") =>
        file.modeChange = true
      case l if file != null && hunk == null && l.startsWith("rename from ") =>
        file.changeType = "Rename"; file.oldPath = unquote(l.drop("rename from ".length))
      case l if file != null && hunk == null && l.startsWith("rename to ") =>
        file.path = unquote(l.drop("rename to ".length))
      case l if file != null && hunk == null && l.startsWith("copy from ") =>
        file.changeType = "Copy"; file.oldPath = unquote(l.drop("copy from ".length))
      case l if file != null && hunk == null && l.startsWith("copy to ") =>
        file.path = unquote(l.drop("copy to ".length))
      // headers override the seed (`---` supplies the old path — also the
      // only path for Delete; `+++` wins last for Add/Modify/Rename)
      case l if file != null && hunk == null && l.startsWith("--- ") =>
        headerPath(l, "a/").foreach { p =>
          file.oldPath = p
          if (file.changeType != "Rename" && file.changeType != "Copy") file.path = p
        }
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
    flush()
  }

  /** Replay one file's hunks over its per-line provenance snapshot:
    * surviving lines keep their origin commit, added lines are owned by
    * `meta`. With --unified=0, a pure-insert hunk's oldStart is the line
    * the insertion follows (so it is copied first); a delete/change
    * hunk's oldStart is the first line it removes.
    */
  private def replayHunks(old: mutable.ArrayBuffer[CommitMeta], hunks: Seq[Hunk],
                          meta: CommitMeta): mutable.ArrayBuffer[CommitMeta] = {
    val out = new mutable.ArrayBuffer[CommitMeta](old.size)
    var idx = 0
    hunks.foreach { h =>
      val copyUpTo = if (h.deleted.nonEmpty) h.oldStart - 1 else h.oldStart
      while (idx < copyUpTo && idx < old.size) { out += old(idx); idx += 1 }
      idx += h.deleted.size
      var k = 0
      while (k < h.added.size) { out += meta; k += 1 }
    }
    while (idx < old.size) { out += old(idx); idx += 1 }
    out
  }

  /** Emit commits.tsv / file_changes.tsv / line_changes.tsv (FIXTURES.md §A)
    * from the streamed history — the `clickhouse git-import` output contract
    * (repo/importer.py:86-90), headerless and positional. Rows are written
    * as each commit parses.
    *
    * Blame bookkeeping: each commit's diff (always vs its FIRST parent,
    * `--diff-merges=first-parent`) is replayed onto a snapshot of that
    * parent's tree state, so provenance is exact on any DAG shape — the
    * `git blame --first-parent` contract. A cheap metadata-only pre-pass
    * counts how many commits will diff against each snapshot; a snapshot
    * is released the moment its last first-parent child has been replayed,
    * bounding live memory to one checkout per concurrently-open branch.
    */
  private def gitImport(dir: Path): Unit = {
    // pre-pass: #children that have each commit as their FIRST parent
    // (a commit reachable only as a second parent never needs a snapshot)
    val pending = mutable.HashMap.empty[String, Int]
    runStreaming(dir, "git", "log", "--topo-order", "--pretty=format:%H %P") { lines =>
      lines.foreach { l =>
        val sp = l.indexOf(' ')
        if (sp > 0) {
          val sp2 = l.indexOf(' ', sp + 1)
          val firstParent = if (sp2 > 0) l.substring(sp + 1, sp2) else l.substring(sp + 1)
          if (firstParent.nonEmpty)
            pending.updateWith(firstParent)(n => Some(n.getOrElse(0) + 1))
        }
      }
    }
    val states = mutable.HashMap.empty[String, BlameState]
    val wCommits = Files.newBufferedWriter(dir.resolve("commits.tsv"), UTF_8)
    val wFiles = Files.newBufferedWriter(dir.resolve("file_changes.tsv"), UTF_8)
    val wLines = Files.newBufferedWriter(dir.resolve("line_changes.tsv"), UTF_8)
    try {
      // --topo-order: children never precede parents (commit-date skew
      // can otherwise reorder them); -M/-C enable rename + copy detection
      runStreaming(dir, "git", "log", "--reverse", "--topo-order", "-M", "-C",
        "-p", "--unified=0", "--diff-merges=first-parent",
        "--pretty=format:@C%x00%H%x00%an%x00%at%x00%P%x00%s") { lines =>
        parseLog(lines) { c =>
          val firstParent = c.parents.headOption
          val base = firstParent.flatMap(states.get).getOrElse(Map.empty)
          val next = emitCommit(c, base, wCommits, wFiles, wLines)
          firstParent.foreach { p =>
            val left = pending.getOrElse(p, 1) - 1
            if (left <= 0) { states.remove(p); pending.remove(p) }
            else pending(p) = left
          }
          if (pending.getOrElse(c.meta.hash, 0) > 0) states(c.meta.hash) = next
        }
      }
    } finally {
      wCommits.close(); wFiles.close(); wLines.close()
    }
  }

  /** Write one commit's rows, reading provenance from `base` (its first
    * parent's state) and returning the commit's own state. `base` is never
    * mutated — shared buffers stay valid for sibling branches.
    */
  private def emitCommit(c: Commit, base: BlameState,
                         wCommits: java.io.Writer, wFiles: java.io.Writer,
                         wLines: java.io.Writer): BlameState = {
    val ts = tsFmt.format(Instant.ofEpochSecond(c.meta.epoch))
    val types = c.files.map(_.effectiveType)
    val fa = types.count(_ == "Add").toLong
    val fd = types.count(_ == "Delete").toLong
    val fr = types.count(t => t == "Rename" || t == "Copy").toLong
    val fm = types.count(_ == "Modify").toLong
    val commitTail = Seq(fa, fd, fr, fm,
      c.files.map(_.linesAdded).sum, c.files.map(_.linesDeleted).sum,
      c.files.map(_.hunksAdded).sum, c.files.map(_.hunksRemoved).sum,
      c.files.map(_.hunksChanged).sum)

    wCommits.write((Seq(c.meta.hash, c.meta.author, ts, sanitize(c.subject)) ++ commitTail)
      .mkString("", "\t", "\n"))

    c.files.foreach { f =>
      val fileTail = Seq(f.effectiveType, sanitize(f.path), sanitize(f.oldPath), ext(f.path),
        f.linesAdded, f.linesDeleted, f.hunksAdded, f.hunksRemoved, f.hunksChanged,
        c.meta.hash, c.meta.author, ts, sanitize(c.subject)) ++ commitTail
      wFiles.write(fileTail.mkString("", "\t", "\n"))

      // deleted lines are addressed in the OLD path's coordinate space,
      // looked up in the PRE-commit state (base)
      val src = base.getOrElse(f.oldPath, mutable.ArrayBuffer.empty[CommitMeta])
      f.hunks.zipWithIndex.foreach { case (h, hi) =>
        def writeLine(line: String, sign: Long, oldNo: Long, newNo: Long): Unit = {
          val (ph, pa, pt) =
            if (sign < 0 && oldNo >= 1 && oldNo <= src.size) {
              val m = src((oldNo - 1).toInt)
              (m.hash, m.author, tsFmt.format(Instant.ofEpochSecond(m.epoch)))
            } else ("", "", epoch0) // added lines have no predecessor
          wLines.write((Seq(sign, oldNo, newNo, hi.toLong + 1L, h.oldStart, h.newStart,
            h.added.size.toLong, h.deleted.size.toLong, "",
            sanitize(line).take(255),
            math.min(line.takeWhile(ch => ch == ' ' || ch == '\t').length, 255).toLong,
            lineType(line), ph, pa, pt) ++ fileTail).mkString("", "\t", "\n"))
        }
        h.deleted.zipWithIndex.foreach { case (line, k) =>
          writeLine(line, -1L, h.oldStart + k, 0L)
        }
        h.added.zipWithIndex.foreach { case (line, k) =>
          writeLine(line, 1L, 0L, h.newStart + k)
        }
      }
    }

    // derive this commit's state from base (sequential within the commit:
    // a rename A->B plus a fresh add of A in the same diff must chain)
    var next = base
    c.files.foreach { f =>
      f.effectiveType match {
        case "Add" =>
          next = next.updated(f.path, replayHunks(mutable.ArrayBuffer.empty, f.hunks.toSeq, c.meta))
        case "Delete" =>
          next = next - f.oldPath
        case "Rename" =>
          val st = next.getOrElse(f.oldPath, mutable.ArrayBuffer.empty[CommitMeta])
          next = (next - f.oldPath).updated(f.path, replayHunks(st, f.hunks.toSeq, c.meta))
        case "Copy" =>
          // no defensive clone: replayHunks never mutates its input, so the
          // source buffer can be shared under both paths (and across states)
          val st = next.getOrElse(f.oldPath, mutable.ArrayBuffer.empty[CommitMeta])
          next = next.updated(f.path, replayHunks(st, f.hunks.toSeq, c.meta))
        case _ =>
          next = next.updated(f.path, replayHunks(
            next.getOrElse(f.path, mutable.ArrayBuffer.empty[CommitMeta]), f.hunks.toSeq, c.meta))
      }
    }
    next
  }
}
