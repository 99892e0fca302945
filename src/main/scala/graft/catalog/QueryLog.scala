package graft.catalog

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.QueryExecutionListener

/** `system.query_log` analog (ClickHouse logs every query's duration,
  * result size, and outcome into a MergeTree table the ops runbooks
  * query like any other). Spark's native completion hook is the
  * [[QueryExecutionListener]] — it fires AFTER an action finishes, with
  * the real wall time and the executed plan, which is the only honest
  * point to measure a lazy engine (wrapping the DataFrame-building call
  * would time plan CONSTRUCTION, a few microseconds of nothing).
  *
  * Events buffer in memory and land in an ordinary [[Catalog]] Append
  * table on [[flush]] — batched, exactly like ClickHouse's
  * flush_interval_milliseconds cycle, so logging adds zero writes to the
  * hot query path and the log table composes with every other catalog
  * feature (clustering on ts, TTL expiry of old entries, system.parts).
  *
  * Only queries that touch EXTERNAL storage are logged: an event whose
  * logical plan holds no [[LogicalRelation]] is internal driver-local
  * maintenance (including this log's own flush appends, whose batches
  * are in-memory rows — the recursion guard is structural, not a racy
  * flag: the listener bus is asynchronous, so any flag-based exclusion
  * would leak under concurrency).
  */
final class QueryLog(spark: SparkSession, cat: Catalog, path: String,
                     table: String = "query_log") {

  val schema: StructType = StructType(Seq(
    StructField("ts_ms", LongType),
    StructField("query_id", StringType),
    StructField("action", StringType),
    StructField("statement", StringType),
    StructField("duration_ms", LongType),
    StructField("result_rows", LongType),
    StructField("shuffle_read_bytes", LongType),
    StructField("shuffle_write_bytes", LongType),
    StructField("spill_bytes", LongType),
    StructField("status", StringType),
    StructField("error", StringType)))

  cat.createTable(TableDef(table, path, schema,
    sortKeys = Seq("ts_ms"), semantics = Append))

  private val buf = new ConcurrentLinkedQueue[
    (Long, String, String, String, Long, Long, Long, Long, Long, String, String)]

  /** Inspect the ANALYZED plan, not qe.logical: Spark 4's lazy
    * DataFrameReader leaves `UnresolvedDataSource` at the leaf of the
    * raw logical plan, so a direct action on a freshly-read table would
    * look storage-free and silently escape the log. Analysis resolves it
    * to the [[LogicalRelation]] this test keys on. onFailure may carry a
    * plan that cannot analyze — treat that as storage-touching (an
    * analysis error against a table is exactly what an ops log wants).
    */
  private def touchesStorage(qe: QueryExecution): Boolean =
    scala.util.Try(qe.analyzed).toOption
      .forall(_.collectFirst { case _: LogicalRelation => () }.isDefined)

  /** One line of plan text identifies the query shape without dragging a
    * full multi-KB tree into every log row (ClickHouse stores the query
    * text; a DataFrame-first engine's nearest equivalent is the plan).
    */
  private def statementOf(qe: QueryExecution): String = {
    val s = qe.logical.toString.linesIterator.take(3).mkString(" | ")
    if (s.length > 500) s.take(500) else s
  }

  private def resultRows(qe: QueryExecution): Long =
    qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

  /** Every physical node of the FINAL plan, descending through the AQE
    * wrapper (a leaf whose real tree hangs off `executedPlan`), materialized
    * query stages, and subquery plans. [[ReusedExchangeExec]] is kept as a
    * boundary leaf: its metrics alias the original exchange's, so walking
    * through it would double-count the reused shuffle.
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val below = p match {
      case _: ReusedExchangeExec => Nil
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    }
    p +: (below ++ p.subqueries.flatMap(allNodes))
  }

  /** (shuffle read bytes, shuffle write bytes, spill bytes) summed from the
    * executed plan's own SQLMetrics — the numbers the SQL UI shows, read
    * AFTER the action so they are complete, attributed per query with no
    * listener bookkeeping (the `read_bytes`/`written_bytes` columns of
    * ClickHouse's system.query_log). Size metrics initialize to -1
    * ("invalid"), so unset ones clamp to 0 instead of draining the sum.
    */
  private def execMetrics(qe: QueryExecution): (Long, Long, Long) =
    scala.util.Try {
      val nodes = allNodes(qe.executedPlan)
      def sum(keys: String*): Long =
        nodes.map(n => keys.flatMap(n.metrics.get).map(m => math.max(0L, m.value)).sum).sum
      (sum("localBytesRead", "remoteBytesRead"),
        sum("shuffleBytesWritten"),
        sum("spillSize", "diskBytesSpilled"))
    }.getOrElse((0L, 0L, 0L))

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      if (touchesStorage(qe)) {
        val (rd, wr, sp) = execMetrics(qe)
        buf.add((System.currentTimeMillis(),
          java.util.UUID.randomUUID().toString, funcName, statementOf(qe),
          durationNs / 1000000L, resultRows(qe), rd, wr, sp, "QueryFinish", null))
      }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      if (touchesStorage(qe))
        buf.add((System.currentTimeMillis(),
          java.util.UUID.randomUUID().toString, funcName, statementOf(qe),
          -1L, -1L, 0L, 0L, 0L, "ExceptionWhileProcessing",
          String.valueOf(exception.getMessage).take(500)))
  }

  /** Start recording. Idempotent per instance (double-attach would log
    * every query twice — the listener manager does not dedup).
    */
  @volatile private var attached = false
  def attach(): this.type = synchronized {
    if (!attached) { spark.listenerManager.register(listener); attached = true }
    this
  }

  def detach(): Unit = synchronized {
    if (attached) { spark.listenerManager.unregister(listener); attached = false }
  }

  /** Buffered events not yet flushed — the listener bus delivers
    * asynchronously, so callers that need "everything up to now" poll
    * this before [[flush]] (the driver's flush cadence does the same).
    */
  def pending: Int = buf.size

  /** Drain the buffer into the log table; returns rows landed. The drain
    * snapshots first, so events arriving mid-flush are simply kept for
    * the next cycle — never lost, never double-appended.
    */
  def flush(): Long = {
    val rows = Iterator.continually(buf.poll()).takeWhile(_ != null).toSeq
    if (rows.isEmpty) 0L
    else {
      import spark.implicits._
      try cat.append(table,
        rows.toDF("ts_ms", "query_id", "action", "statement",
          "duration_ms", "result_rows", "shuffle_read_bytes",
          "shuffle_write_bytes", "spill_bytes", "status", "error"))
      catch {
        case e: Throwable =>
          // a failed append must not eat the drained events — requeue
          // them for the next cycle (order is immaterial: the log is
          // clustered on ts_ms)
          rows.foreach(buf.add)
          throw e
      }
    }
  }

  /** The log as a DataFrame — queryable like any table, ClickHouse-style:
    * `log().groupBy("status").count()`, slow-query top-k, etc.
    */
  def log(): DataFrame = cat.read(table)
}
