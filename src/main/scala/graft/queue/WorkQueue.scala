package graft.queue

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** The reference's distributed work queue, kept OUT of the analytics store.
  *
  * In the reference the queue is a `KeeperMap` table — a ZooKeeper-backed KV
  * map where `keeper_map_strict_mode=1` makes the claim UPDATE a true
  * compare-and-set (/root/reference/create_db.py:36-49,
  * /root/reference/clickhouse/__init__.py:33-35). That is coordination
  * state, not analytics (SURVEY.md §7.5.1) — so our analog is filesystem
  * primitives with the same atomicity guarantees, not Parquet mutation:
  *
  *   - enqueue  = exclusive file create (`O_EXCL`) — a second enqueue of the
  *     same repo throws, the "Keeper: Node exists" race
  *     (/root/reference/repo/schedule.py:60-65)
  *   - claim    = atomic rename pending→claimed — exactly one concurrent
  *     claimant can win, the `ALTER TABLE … UPDATE … WHERE worker_id=''`
  *     CAS (/root/reference/repo/importer.py:146-155)
  *   - complete = delete (/root/reference/repo/importer.py:172-177)
  *
  * On a real cluster the queue directory lives on shared storage whose
  * rename is atomic (NFS/POSIX); the protocol itself is the thing the
  * reference encodes, and [[QueueSpec]] asserts its one-winner invariant.
  */
final class WorkQueue(dir: Path, maxQueueLength: Int = 10000) extends JobQueue {

  Files.createDirectories(dir)


  private def keyOf(repoName: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(repoName.getBytes(UTF_8))

  private def pending(repo: String): Path = dir.resolve(s"${keyOf(repo)}.pending")
  // One deterministic claimed name per repo (worker id lives in the row, not
  // the filename): the claim CAS is the SOURCE file vanishing under a losing
  // rename, not destination uniqueness — and a deterministic name is what
  // lets contains() be two stat calls instead of a directory glob.
  private def claimed(repo: String): Path = dir.resolve(s"${keyOf(repo)}.claimed")

  private def encode(j: Job): String =
    Seq(j.repoName, j.scheduled, j.priority, j.workerId, j.startedTime).mkString("\t")
  private def decode(s: String): Job = {
    val a = s.split("\t", -1)
    Job(a(0), a(1).toLong, a(2).toInt, a(3), a(4).toLong)
  }

  /** A1 queue-length guard (schedule.py:30-32) — a name count only, no file
    * contents read: `schedule` runs this per call, and the reference's bulk
    * path (`bulk_schedule` over a 128k-repo seed list, repo/schedule.py:84-95)
    * would otherwise do O(queue) reads per enqueue = O(n·queue) total.
    * Refreshes the in-process cache used by the enqueue guard.
    */
  override def length: Int = {
    val st = Files.list(dir)
    // count only the two state-marker suffixes — foreign files in a shared
    // queue dir (editor backups, other tooling) must not consume capacity,
    // matching the old read-and-decode semantics at name-count cost
    val n = try st.iterator.asScala.count { p =>
      val name = p.getFileName.toString
      name.endsWith(".pending") || name.endsWith(".claimed")
    } finally st.close()
    cachedLen.set(n)
    n
  }

  /** In-process length cache so bulk enqueue is O(1) amortized per call: a
    * full name listing runs only when the cache is cold or claims we are at
    * the cap (then the authoritative recount decides). Enqueues by OTHER
    * processes can make the cache under-count and let a burst overshoot the
    * cap slightly — the same non-transactional count-then-insert race the
    * reference has (repo/schedule.py:30-44 counts in one statement and
    * inserts in another; its own off-by-one is documented in SURVEY.md §0).
    * The cap is a back-pressure valve, not an invariant.
    */
  private val cachedLen = new java.util.concurrent.atomic.AtomicInteger(-1)
  private def atCapacity(): Boolean = {
    val c = cachedLen.get()
    (c < 0 || c >= maxQueueLength) && length >= maxQueueLength
  }

  /** P9 dup point-lookup (schedule.py:21-27) as two O(1) existence probes —
    * the KeeperMap point-get, not a scan; no directory listing, no reads.
    */
  override def contains(repoName: String): Boolean =
    Files.exists(pending(repoName)) || Files.exists(claimed(repoName))

  private def list(): Seq[Job] = {
    val st = Files.list(dir)
    try st.iterator.asScala.toSeq
      .filter(p => !p.getFileName.toString.endsWith(".tmp"))
      .flatMap(p => Try(decode(Files.readString(p))).toOption)
    finally st.close()
  }

  /** Unclaimed jobs only — the claim candidate scan reads pending files and
    * never opens claimed ones (filename suffix is the state marker).
    */
  private def listPending(): Seq[Job] = {
    val st = Files.newDirectoryStream(dir, "*.pending")
    try st.iterator.asScala.toSeq
      .flatMap(p => Try(decode(Files.readString(p))).toOption)
    finally st.close()
  }

  /** Enqueue (schedule.py:37-67): length guard → dup check → exclusive
    * create. Returns Left(reason) on the reference's failure modes.
    */
  override def schedule(repoName: String, priority: Int,
               now: Long): Either[String, Job] = {
    if (atCapacity()) Left("QUEUE IS FULL")
    else if (contains(repoName)) Left("ALREADY_PROCESSING")
    else {
      val job = Job(repoName, now, priority, "", 0L)
      try {
        Files.write(pending(repoName), encode(job).getBytes(UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        cachedLen.incrementAndGet()
        Right(job)
      } catch {
        // the Keeper "Node exists" race surfaced as KEEPER_EXCEPTION
        case _: FileAlreadyExistsException => Left("ALREADY_PROCESSING")
      }
    }
  }

  /** O1 candidate scan + M1 CAS + M2 verify (importer.py:136-158): pick the
    * best `retries` unclaimed jobs (priority DESC, scheduled ASC), attempt an
    * atomic rename on each; first rename that sticks is the claim. Returns
    * the claimed job, its row updated like the reference's UPDATE.
    */
  override def claim(workerId: String, retries: Int,
            now: Long): Option[Job] = {
    val candidates = listPending()
      .filter(_.workerId.isEmpty)                       // P4 worker_id = ''
      .sortBy(j => (-j.priority, j.scheduled))          // O1 top-k
      .take(retries)
    candidates.iterator.flatMap { j =>
      val src = pending(j.repoName)
      val dst = claimed(j.repoName)
      val won = Try {
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      }.isSuccess
      if (won) {
        val updated = j.copy(workerId = workerId, startedTime = now)
        // write-then-atomic-rename: a plain writeString would truncate the
        // claimed file in place, and a concurrent list() reading it mid-write
        // would fail decode and drop the job from view — letting schedule()
        // re-enqueue a repo that is in flight. The .tmp suffix is already
        // filtered by list().
        val tmp = dir.resolve(dst.getFileName.toString + ".tmp")
        Files.writeString(tmp, encode(updated))
        Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        // M2 claim-verify read-back (importer.py:150-155)
        if (decode(Files.readString(dst)).workerId == workerId) Some(updated) else None
      } else None
    }.take(1).toSeq.headOption
  }

  /** M3: job completion / cleanup — DELETE FROM queue (importer.py:172-177).
    * Removes the row whatever state it is in, like the reference's
    * unconditional release.
    */
  override def complete(repoName: String): Unit = {
    val deleted = Seq(pending(repoName), claimed(repoName))
      .count(p => Try(Files.deleteIfExists(p)).getOrElse(false))
    cachedLen.updateAndGet(v => if (v >= deleted) v - deleted else v)
    ()
  }

  override def snapshot(): Seq[Job] = list().sortBy(_.repoName)
}
