package graft.queue

/** Queue row: the 5 columns of git.work_queue
  * (/root/reference/create_db.py:36-49), shared by both substrates.
  */
final case class Job(
    repoName: String,
    scheduled: Long,
    priority: Int,
    workerId: String,
    startedTime: Long)

/** The KeeperMap queue contract (SURVEY.md §3.2-3.3) independent of
  * substrate: [[WorkQueue]] implements it over POSIX atomic rename,
  * [[ObjectStoreQueue]] over conditional PUT. The worker pool
  * ([[graft.sources.GitImporter.workOnce]], ClickhubCli start_workers)
  * programs against this trait, so a deployment picks its substrate in
  * config without touching the import path.
  */
trait JobQueue {
  /** Enqueue: length guard → dup check → one-creator-wins create. */
  def schedule(repoName: String, priority: Int = 0,
               now: Long = System.currentTimeMillis() / 1000): Either[String, Job]

  /** Claim CAS over the best `retries` unclaimed jobs (priority DESC,
    * scheduled ASC); exactly one concurrent claimant wins each job.
    */
  def claim(workerId: String, retries: Int = 2,
            now: Long = System.currentTimeMillis() / 1000): Option[Job]

  /** Unconditional release (importer.py:172-177). */
  def complete(repoName: String): Unit

  def length: Int
  def contains(repoName: String): Boolean
  def snapshot(): Seq[Job]
}
