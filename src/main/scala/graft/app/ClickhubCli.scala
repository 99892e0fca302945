package graft.app

import java.nio.file.Paths
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queue.{JobQueue, WorkQueue}
import graft.sources.GitImporter

/** The reference's CLI surface (/root/reference/clickhub.py:29-49) over our
  * engine: `schedule`, `import`, `start_worker`, `update_all_repos`,
  * `bulk_schedule`. One object so a user of the reference can map each
  * entrypoint 1:1. The git-clone / git-import subprocess steps are a
  * pluggable [[graft.sources.RepoFetcher]]: `--git_fetch true` runs them
  * in-worker like the reference's importer.py:18-90; the default consumes
  * the TSV directory external tooling produced.
  */
object ClickhubCli {

  final case class Env(spark: SparkSession, importer: GitImporter, queue: JobQueue)

  /** Env from a parsed config file (config.yml analog, [[GraftConfig]]).
    * SPARK_MASTER in the environment still overrides the file (test/driver
    * sessions pin their own master).
    */
  def env(cfg: GraftConfig): Env =
    env(cfg.warehouse, s"${cfg.queueDir}/${cfg.taskTable}", cfg.maxQueueLength,
      sys.env.getOrElse("SPARK_MASTER", cfg.sparkMaster))

  def env(warehouse: String, queueDir: String, maxQueueLength: Int = 10000,
          master: String = sys.env.getOrElse("SPARK_MASTER", "local[4]")): Env = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Env(spark, new GitImporter(spark, warehouse), new WorkQueue(Paths.get(queueDir), maxQueueLength))
  }

  /** `clickhub.py schedule` (clickhub.py:80-86; schedule.py:37-67). */
  def schedule(e: Env, repoName: String, priority: Int = 0): Either[String, Unit] =
    e.queue.schedule(repoName, priority).map(_ => ())

  /** `clickhub.py import` (clickhub.py:87-99; §3.1). */
  def importRepo(e: Env, repoName: String, tsvDir: String, keepFiles: Boolean = true): Map[String, Long] =
    e.importer.importRepo(repoName, tsvDir, keepFiles)

  /** `clickhub.py start_worker` (clickhub.py:122-132; importer.py:161-179):
    * poll → claim → import → release. `maxPolls` bounds the loop for tests;
    * pass Int.MaxValue for the production daemon. `sleepMs` mirrors
    * config.yml:17's 10 s poll period.
    */
  def worker(e: Env, workerId: String, tsvDirFor: String => String,
             maxPolls: Int, sleepMs: Long = 10000): Seq[String] = {
    val done = Seq.newBuilder[String]
    var polls = 0
    while (polls < maxPolls) {
      e.importer.workOnce(e.queue, workerId, tsvDirFor) match {
        case Some(repo) => done += repo
        case None => if (polls < maxPolls - 1) Thread.sleep(sleepMs)
      }
      polls += 1
    }
    done.result()
  }

  /** `start_workers.sh` analog (/root/reference/start_workers.sh:4-8): spawn
    * N workers draining ONE shared queue concurrently. The reference forks N
    * OS processes; here each worker is a thread running the same poll loop —
    * the claim CAS ([[graft.queue.WorkQueue.claim]]) is what makes them
    * safe, exactly as Keeper strict mode does for the reference's processes.
    * Returns each worker's processed repos; the one-winner claim invariant
    * guarantees the result sets are disjoint.
    */
  def startWorkers(e: Env, nWorkers: Int, tsvDirFor: String => String,
                   maxPolls: Int, sleepMs: Long = 10000): Map[String, Seq[String]] = {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[(String, Throwable)]
    val threads = (0 until nWorkers).map { i =>
      val id = s"worker-$i"
      val result = new java.util.concurrent.atomic.AtomicReference[Seq[String]](Seq.empty)
      val t = new Thread(() =>
        try result.set(worker(e, id, tsvDirFor, maxPolls, sleepMs))
        catch { case th: Throwable => errors.add(id -> th) }, id)
      (id, t, result)
    }
    threads.foreach(_._2.start())
    threads.foreach(_._2.join())
    // a dead worker must fail the pool loudly — the reference's N processes
    // die visibly; silently returning partial results would report success
    // while jobs were dropped
    if (!errors.isEmpty) {
      val (id, th) = errors.peek()
      throw new RuntimeException(
        s"${errors.size} of $nWorkers workers failed; first failure in $id", th)
    }
    threads.map { case (id, _, r) => id -> r.get() }.toMap
  }

  /** `clickhub.py update_all_repos` (clickhub.py:102-114;
    * schedule.py:71-107): staleness scan (A4+O2 — `min(updated_at)` per
    * repo, stalest first, LIMIT) anti-joined (J1) against the current queue,
    * then per-repo enqueue. The scan is a real Spark query over the commits
    * table; the queue membership probe is a broadcast anti-join against the
    * (tiny) queue snapshot, the degenerate-but-correct version of the
    * reference's 1000-per-IN batching (schedule.py:84-95).
    */
  def updateAllRepos(e: Env, limit: Int = 50000): Seq[String] = {
    import e.spark.implicits._
    if (!e.importer.catalog.exists("commits")) return Seq.empty
    val stalest = e.importer.catalog.readRaw("commits")
      .groupBy(col("repo_name"))
      .agg(min(col("updated_at")).as("last_updated"))
      .orderBy(col("last_updated").asc, col("repo_name"))
      .limit(limit)
      .select(col("repo_name"))
    val queued = e.queue.snapshot().map(_.repoName).toDF("repo_name")
    val toSchedule = stalest
      .join(broadcast(queued), Seq("repo_name"), "left_anti") // J1
      .as[String].collect().toSeq
    toSchedule.filter(r => e.queue.schedule(r).isRight)
  }

  /** `clickhub.py bulk_schedule` over a repos.txt-style list (clickhub.py:33-38). */
  def bulkSchedule(e: Env, repos: Seq[String]): Seq[String] =
    repos.filter(r => e.queue.schedule(r).isRight)

  /** Worker TSV source: `--git_fetch true` makes workers clone/pull + run
    * the git-import analog themselves (the reference's full importer.py
    * path, [[graft.sources.GitCliFetcher]]); default consumes externally
    * produced TSVs under the data cache, as before.
    */
  /** `--flag value` lookup, shared by main() and fetcherFor. */
  private def argOf(args: Array[String], name: String, default: String = null): String =
    args.sliding(2).collectFirst { case Array(`name`, v) => v }
      .getOrElse(Option(default).getOrElse(sys.error(s"missing $name")))

  private def fetcherFor(args: Array[String], cfg: GraftConfig): String => String = {
    val root = argOf(args, "--tsv_root", cfg.dataCache)
    if (argOf(args, "--git_fetch", "false").toBoolean) new graft.sources.GitCliFetcher(root).fetch
    else graft.sources.RepoFetcher.fromTsvRoot(root).fetch
  }

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("")
    def arg(name: String, default: String = null): String = argOf(args, name, default)
    // `-c/--config config.yml` analog (clickhub.py:51); flags override file.
    // `--task_table` selects the queue instance exactly as the reference
    // does (clickhub.py:23-24, default git.work_queue; git.new_queue is the
    // clone queue test.py:35 inserts into) — each maps to its own directory
    // under the queue base dir, so --queue_dir and --task_table compose.
    val cfg = args.sliding(2)
      .collectFirst { case Array("--config" | "-c", p) => GraftConfig.load(p) }
      .getOrElse(GraftConfig())
    val taskTable = arg("--task_table", cfg.taskTable).split('.').last
    val e = env(arg("--warehouse", cfg.warehouse),
      s"${arg("--queue_dir", cfg.queueDir)}/$taskTable", cfg.maxQueueLength,
      sys.env.getOrElse("SPARK_MASTER", cfg.sparkMaster))
    cmd match {
      case "schedule" =>
        println(schedule(e, arg("--repo_name"), arg("--priority", "0").toInt))
      case "import" =>
        println(importRepo(e, arg("--repo_name"), arg("--tsv_dir")))
      case "start_worker" =>
        worker(e, arg("--worker_id", java.util.UUID.randomUUID().toString),
          fetcherFor(args, cfg), Int.MaxValue, cfg.sleepTimeMs)
      case "start_workers" => // start_workers.sh:4-8
        startWorkers(e, arg("--workers", "4").toInt,
          fetcherFor(args, cfg), Int.MaxValue, cfg.sleepTimeMs)
      case "serve" => // app.py analog (Dockerfile runs app.py)
        val app = new HttpApp(e, arg("--port", "8080").toInt,
          lookupTable = cfg.repoLookupTable)
        app.start()
        Thread.currentThread().join() // serve until killed, like flask run
      case "update_all_repos" =>
        println(updateAllRepos(e, arg("--limit", "50000").toInt).mkString("\n"))
      case "bulk_schedule" =>
        val repos = scala.io.Source.fromFile(arg("--file")).getLines().map(_.trim).filter(_.nonEmpty).toSeq
        println(bulkSchedule(e, repos).size + " scheduled")
      case other => sys.error(s"unknown command '$other' (schedule|import|start_worker|start_workers|serve|update_all_repos|bulk_schedule)")
    }
    e.spark.stop()
  }
}
