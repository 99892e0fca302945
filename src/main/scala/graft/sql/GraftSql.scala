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

  // ---- parameterized views --------------------------------------------
  //
  // CH `CREATE VIEW v AS SELECT … WHERE x = {p:Type}` + `SELECT * FROM
  // v(p = val)`: the view text carries typed placeholders; invocation
  // binds values. Substitution is TYPED literal rendering — numbers are
  // validated numeric (an integer placeholder refuses '1; DROP …'),
  // strings are escaped — so a parameter can never smuggle SQL.

  // the type class admits ',' so Decimal(10,2)-shaped placeholders match
  private val paramRe = """\{(\w+)\s*:\s*([A-Za-z0-9(),]+)\}""".r
  private val paramViews =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Register (or replace) a parameterized view. */
  def createParamView(name: String, text: String): Unit = {
    require(paramRe.findFirstIn(text).isDefined,
      s"parameterized view $name declares no {param:Type} placeholders " +
        "(use a plain temp view instead)")
    paramViews.put(name, text)
  }

  /** Invoke a parameterized view with bound values — `SELECT * FROM
    * name(p = v, …)`. Every declared placeholder must be bound and no
    * extras are accepted.
    */
  def paramView(s: SparkSession, sfDir: String, name: String,
                params: Map[String, Any]): DataFrame = {
    val text = paramViews.getOrElse(name,
      throw new NoSuchElementException(s"unknown parameterized view $name"))
    val decls = paramRe.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap
    val missing = decls.keySet.diff(params.keySet)
    require(missing.isEmpty, s"$name: unbound parameters $missing")
    val extra = params.keySet.diff(decls.keySet)
    require(extra.isEmpty, s"$name: unknown parameters $extra")
    val bound = paramRe.replaceAllIn(text, m =>
      java.util.regex.Matcher.quoteReplacement(
        renderLiteral(name, m.group(1), m.group(2), params(m.group(1)))))
    // belt-and-braces: any '{name:' remnant means a placeholder the
    // regex could not parse (malformed type text) — refuse rather than
    // hand Spark a literal brace token
    require(!"""\{\w+\s*:""".r.findFirstIn(bound).isDefined,
      s"$name: unsubstituted placeholder remains in view text")
    sql(s, sfDir, bound)
  }

  /** Render one bound value as a Spark SQL literal of the declared CH
    * placeholder type — validation IS the injection barrier.
    */
  private def renderLiteral(view: String, p: String, chType: String,
                            v: Any): String = {
    val t = chType.toLowerCase
    def num: String = v match {
      case n: java.lang.Number => n.toString
      case other => throw new IllegalArgumentException(
        s"$view: parameter $p declared $chType but bound to " +
          s"non-numeric ${other.getClass.getSimpleName}")
    }
    if (t.startsWith("uint") || t.startsWith("int")) {
      val s = num
      require(!s.contains('.') && !s.toLowerCase.contains("e"),
        s"$view: parameter $p declared $chType but bound to non-integer $s")
      require(!(t.startsWith("uint") && s.startsWith("-")),
        s"$view: parameter $p declared $chType but bound to negative $s")
      s
    } else if (t.startsWith("float") || t.startsWith("decimal")) {
      val s = num
      // NaN/Infinity would render as bare identifiers ('NaN' is a
      // column reference to Spark's parser) — refuse non-finite binds
      v match {
        case d: java.lang.Double if d.isNaN || d.isInfinite =>
          throw new IllegalArgumentException(
            s"$view: parameter $p declared $chType but bound to non-finite $d")
        case f: java.lang.Float if f.isNaN || f.isInfinite =>
          throw new IllegalArgumentException(
            s"$view: parameter $p declared $chType but bound to non-finite $f")
        case _ =>
      }
      s
    }
    else if (t == "string" || t == "date" || t.startsWith("datetime") ||
             t.startsWith("fixedstring"))
      // Spark's default lexer processes backslash escapes in literals
      "'" + v.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
    else throw new IllegalArgumentException(
      s"$view: parameter $p has unsupported placeholder type $chType")
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
