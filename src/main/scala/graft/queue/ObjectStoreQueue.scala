package graft.queue

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Storage contract for [[ObjectStoreQueue]]: the four operations an
  * S3-class object store actually offers — conditional PUT
  * (`If-None-Match: *`), GET, DELETE, LIST. No rename, no O_EXCL
  * directory tricks: a cloud deployment implements this trait with its
  * object-store client verbatim.
  */
trait CondPutStore {
  /** Create-if-absent; MUST be atomic (the store's conditional PUT).
    * Returns false when the key already exists.
    */
  def putIfAbsent(key: String, value: String): Boolean
  def get(key: String): Option[String]
  def delete(key: String): Boolean
  def listKeys(): Seq[String]
}

/** Local-directory stand-in that restricts itself to conditional-put
  * semantics only (CREATE_NEW is the If-None-Match analog) — the test
  * substrate proving the protocol needs nothing stronger.
  */
final class LocalCondPutStore(dir: Path) extends CondPutStore {
  Files.createDirectories(dir)
  override def putIfAbsent(key: String, value: String): Boolean =
    try { Files.write(dir.resolve(key), value.getBytes(UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW); true }
    catch { case _: FileAlreadyExistsException => false }
  override def get(key: String): Option[String] =
    Try(Files.readString(dir.resolve(key))).toOption
  override def delete(key: String): Boolean =
    Try(Files.deleteIfExists(dir.resolve(key))).getOrElse(false)
  override def listKeys(): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator.asScala.map(_.getFileName.toString).toSeq finally st.close()
  }
}

/** The KeeperMap queue protocol (/root/reference/create_db.py:36-49,
  * repo/importer.py:136-158) re-expressed over object-store primitives —
  * the substrate [[WorkQueue]]'s POSIX atomic-rename CAS cannot reach
  * (S3-class stores have no rename; deploy/README.md documents the
  * limitation this class closes).
  *
  * State per repo is two keys, `<key>.pending` and `<key>.claimed`:
  *
  *   - enqueue  = conditional PUT of pending (one creator wins — the
  *     "Keeper: Node exists" race, schedule.py:60-65)
  *   - claim    = conditional PUT of claimed carrying the updated row
  *     (worker_id, started_time) — exactly one concurrent claimant's PUT
  *     succeeds, the CAS — then DELETE of pending. A crash between the
  *     two leaves a pending+claimed pair: claim scans treat "claimed
  *     exists" as authoritative, never double-claim, and lazily repair by
  *     deleting the stale pending.
  *   - complete = DELETE of both keys (unconditional release).
  */
final class ObjectStoreQueue(store: CondPutStore, maxQueueLength: Int = 10000) extends JobQueue {


  private def keyOf(repoName: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(repoName.getBytes(UTF_8))
  private def pendingKey(repo: String): String = s"${keyOf(repo)}.pending"
  private def claimedKey(repo: String): String = s"${keyOf(repo)}.claimed"

  private def encode(j: Job): String =
    Seq(j.repoName, j.scheduled, j.priority, j.workerId, j.startedTime).mkString("\t")
  private def decode(s: String): Job = {
    val a = s.split("\t", -1)
    Job(a(0), a(1).toLong, a(2).toInt, a(3), a(4).toLong)
  }

  // a repo counts ONCE even in the transient pending+claimed pair state
  // (mid-claim, or a crashed winner awaiting repair) — the rename CAS
  // substrate never has two markers, and the capacity guard and snapshot
  // must agree with it
  override def length: Int = store.listKeys()
    .filter(k => k.endsWith(".pending") || k.endsWith(".claimed"))
    .map(k => k.stripSuffix(".pending").stripSuffix(".claimed"))
    .distinct.size

  override def contains(repoName: String): Boolean =
    store.get(pendingKey(repoName)).isDefined || store.get(claimedKey(repoName)).isDefined

  override def schedule(repoName: String, priority: Int,
               now: Long): Either[String, Job] = {
    if (length >= maxQueueLength) Left("QUEUE IS FULL")
    else if (contains(repoName)) Left("ALREADY_PROCESSING")
    else {
      val job = Job(repoName, now, priority, "", 0L)
      if (store.putIfAbsent(pendingKey(repoName), encode(job))) Right(job)
      else Left("ALREADY_PROCESSING")
    }
  }

  override def claim(workerId: String, retries: Int,
            now: Long): Option[Job] = {
    val keys = store.listKeys().toSet
    val candidates = keys.toSeq.filter(_.endsWith(".pending"))
      .flatMap { k =>
        val base = k.stripSuffix(".pending")
        if (keys.contains(s"$base.claimed")) {
          // crashed winner's leftover: the claimed object is authoritative,
          // the pending marker is stale — repair, never re-claim. Re-probe
          // the claimed key at delete time: the listing is a snapshot, and
          // a complete()+re-schedule() landing in between must not lose
          // the fresh enqueue. (A store offering etag-conditional DELETE
          // can close the residual probe-to-delete window; the repair is
          // idempotent either way — the next scan retries it.)
          if (store.get(s"$base.claimed").isDefined) store.delete(k)
          None
        } else store.get(k).flatMap(s => Try(decode(s)).toOption)
      }
      .filter(_.workerId.isEmpty)
      .sortBy(j => (-j.priority, j.scheduled))
      .take(retries)
    candidates.iterator.flatMap { j =>
      val updated = j.copy(workerId = workerId, startedTime = now)
      // THE CAS: one conditional PUT of the claimed object, row already
      // updated — single-step, no post-claim rewrite window at all
      if (store.putIfAbsent(claimedKey(j.repoName), encode(updated))) {
        store.delete(pendingKey(j.repoName))
        // M2 claim-verify read-back (importer.py:150-155)
        store.get(claimedKey(j.repoName))
          .flatMap(s => Try(decode(s)).toOption)
          .filter(_.workerId == workerId)
      } else None
    }.take(1).toSeq.headOption
  }

  override def complete(repoName: String): Unit = {
    store.delete(pendingKey(repoName))
    store.delete(claimedKey(repoName))
    ()
  }

  override def snapshot(): Seq[Job] = {
    val keys = store.listKeys().toSet
    keys.toSeq
      .filter(k => k.endsWith(".pending") || k.endsWith(".claimed"))
      // pair state: the claimed row is the authoritative one
      .filterNot(k => k.endsWith(".pending") &&
        keys.contains(k.stripSuffix(".pending") + ".claimed"))
      .flatMap(k => store.get(k).flatMap(s => Try(decode(s)).toOption))
      .sortBy(_.repoName)
  }
}
