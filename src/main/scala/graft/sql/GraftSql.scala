package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegerLiteral}
import graft.Tables
import graft.functions.{CosineSimilarity, GramDigests, PolyHash}

/** SQL-text entry point: the reference's entire query surface is SQL
  * strings over named tables (create_db.py:67-128, README.md:232-266) —
  * this registers the same tables as temp views so every query the engine
  * answers through the DataFrame API is equally answerable as `SELECT …`
  * text through the session's own parser, optimizer (including the
  * installed [[graft.plans.RollupRewrite]] batch), and executor.
  *
  * Views are metadata only — each still reads through [[graft.Tables]]'s
  * scan options (e.g. the events NANOS handling), so SQL and DataFrame
  * plans bottom out in the identical parquet scans with the identical
  * pushdowns. SqlParitySpec holds the two surfaces equal query by query.
  */
object GraftSql {

  /** Register every testdata table as a temp view named as in TESTDATA.md. */
  def registerViews(s: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(s, sfDir) else Tables(s, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** Expose the engine's codegen'd Catalyst kernels as SQL functions, so
    * the operators built on them (fingerprinting, similarity scoring,
    * substring-span digests) are reachable from SQL text too — the same
    * expression objects the DataFrame surface plans, not UDF wrappers.
    */
  def registerFunctions(s: SparkSession): Unit = {
    def reg(name: String, arity: Int)(b: Seq[Expression] => Expression): Unit =
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        { args =>
          require(args.length == arity, s"$name expects $arity arguments")
          b(args)
        },
        "internal")
    reg("polyhash", 1)(a => PolyHash(a.head))
    reg("cosine_similarity", 2)(a => CosineSimilarity(a(0), a(1)))
    reg("gram_digests", 2) {
      case Seq(toks, IntegerLiteral(k)) => GramDigests(toks, k)
      case _ => throw new IllegalArgumentException(
        "gram_digests(toks, k): k must be an integer literal")
    }
  }

  /** One-call text query: register views + kernels, parse, run. */
  def sql(s: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(s, sfDir)
    registerFunctions(s)
    s.sql(query)
  }

  /** ClickHouse-dialect entry point: the [[ChDialect]] shim rewrites the
    * CH-isms the reference's own SQL surface uses (`count()`, `countIf`,
    * `::UInt32` casts, `FINAL`, `PREWHERE`, `quantile(q)(x)`, …) into
    * Spark SQL, then runs through [[sql]] — so a user can paste the
    * reference's queries as written.
    */
  def chSql(s: SparkSession, sfDir: String, query: String): DataFrame =
    sql(s, sfDir, ChDialect.rewrite(query))

  /** `EXPLAIN [PIPELINE]` analog: the formatted physical plan for a SQL
    * text — the surface an engine user reads to check pushdown
    * (`PushedFilters`), codegen spans (`WholeStageCodegen`), and join
    * strategies, without leaving the SQL entry point.
    */
  def explain(s: SparkSession, sfDir: String, query: String): String =
    sql(s, sfDir, query).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
}
