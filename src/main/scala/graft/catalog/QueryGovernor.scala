package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `KILL QUERY` + `max_execution_time` + `system.processes` analog.
  *
  * In ClickHouse every running query registers in system.processes under
  * its query_id; `KILL QUERY WHERE query_id = …` flips a cancellation
  * flag the workers poll, and `max_execution_time` enforces the same
  * kill from a watchdog (the reference's operational surface — runaway
  * analytics must be killable without restarting the server). A lazy
  * engine has nothing to kill until an action materializes, so the
  * governor wraps the ACTION — the same place [[QueryLog]] measures.
  *
  * The cancellation primitive is JOB TAGS + `cancelJobsWithTag`, chosen
  * by measurement over the two alternatives (tools/KillProbe):
  * job-group cancellation with future-job poisoning deadlocks an AQE
  * query (the stage-event loop waits forever on a job that was refused
  * at submission), and a one-shot cancel of either kind is a silent
  * no-op when it lands while the query is still PLANNING — the "killed"
  * query then runs to completion. So [[kill]] re-issues the cancel on a
  * short period until the query actually exits: every job the action
  * (or AQE's stage-submission threads, which inherit the tag) submits
  * after the kill is swept by the next tick. Tags are unique per RUN,
  * so a reused query_id never inherits a stale cancellation.
  *
  * Scale note: cancellation is a control-plane message per executor,
  * not a data-plane operation — killing a 1000-executor scan costs the
  * same as killing a laptop-local one, and the periodic re-cancel is a
  * driver-local timer tick, not a cluster round-trip.
  */
private[catalog] final case class GovernedQuery(queryId: String, tag: String,
                                                startedMs: Long, maxMs: Long)

final class QueryGovernor(spark: SparkSession) {

  private val running = TrieMap.empty[String, GovernedQuery]
  // daemon timer: an abandoned governor must not pin the JVM
  private val timer = new java.util.Timer("graft-query-governor", true)

  /** Run `action` under `queryId`, visible in [[systemProcesses]] and
    * killable via [[kill]]; `maxExecutionMs > 0` arms the watchdog. A
    * killed action surfaces as the SparkException of the cancelled job
    * (SPARK_JOB_CANCELLED) — the caller sees the same failure a
    * ClickHouse client sees (QUERY_WAS_CANCELLED), never a silent empty
    * result.
    */
  def run[T](queryId: String, maxExecutionMs: Long = 0L)(action: => T): T = {
    // queryId is sanitized out of the tag (Spark refuses commas in job
    // tags; uniqueness comes from the UUID suffix anyway), so no id can
    // make addJobTag throw after the registry slot is taken
    val tag = s"graft-q-${queryId.replaceAll("[,\\s]", "_")}-" +
      java.util.UUID.randomUUID().toString.take(8)
    val entry = GovernedQuery(queryId, tag, System.currentTimeMillis(),
      maxExecutionMs)
    require(running.putIfAbsent(queryId, entry).isEmpty,
      s"query_id $queryId is already running (ids must be unique while live)")
    val sc = spark.sparkContext
    try sc.addJobTag(tag)
    catch { case e: Throwable => running.remove(queryId); throw e }
    val watchdog =
      if (maxExecutionMs <= 0) None
      else {
        val t = new java.util.TimerTask {
          // kill BY TAG, not by id: watchdog.cancel() cannot stop a task
          // already executing on the timer thread, and an id-addressed
          // kill firing after this run's finally could cancel an
          // innocent NEW run that reused the id — the tag pins the kill
          // to exactly the run that armed it
          override def run(): Unit = killTagged(queryId, tag)
        }
        timer.schedule(t, maxExecutionMs)
        Some(t)
      }
    try action
    finally {
      watchdog.foreach(_.cancel())
      running.remove(queryId)
      sc.removeJobTag(tag)
    }
  }

  /** `KILL QUERY WHERE query_id = id` — callable from ANY thread (the
    * point: the killing session is never the stuck one). Returns whether
    * the query was live when the kill was issued. The cancel repeats
    * every 250 ms until the query exits (doc above: a one-shot cancel
    * can land during planning and miss), then the ticker retires itself.
    */
  def kill(queryId: String): Boolean =
    running.get(queryId).exists(r => killTagged(queryId, r.tag))

  /** The kill addressed to ONE specific run (its per-run tag): no-op if
    * that run has already exited, even when a new run reuses the id.
    */
  private def killTagged(queryId: String, tag: String): Boolean =
    running.get(queryId).exists(_.tag == tag) && {
      def fire(): Unit =
        spark.sparkContext.cancelJobsWithTag(tag, s"KILL QUERY $queryId")
      fire()
      val ticker = new java.util.TimerTask {
        override def run(): Unit =
          if (running.get(queryId).exists(_.tag == tag)) fire()
          else cancel()
      }
      timer.schedule(ticker, 250L, 250L)
      true
    }

  /** `system.processes`: the queries live RIGHT NOW, with elapsed wall
    * time and their configured limit (0 = unlimited).
    */
  def systemProcesses(): DataFrame = {
    import spark.implicits._
    val now = System.currentTimeMillis()
    running.values.toSeq.sortBy(_.startedMs)
      .map(r => (r.queryId, r.startedMs, now - r.startedMs, r.maxMs))
      .toDF("query_id", "started_ms", "elapsed_ms", "max_execution_ms")
  }
}
