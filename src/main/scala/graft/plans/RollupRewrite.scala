package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.graftshim.ColumnShim

/** A registered rollup: `rollupPath` holds `SELECT dims…, count(*) AS
  * cntCol FROM basePath GROUP BY dims…` — the stars-MV shape (reference
  * README.md:256-266), maintained by the MV/backfill machinery.
  */
final case class ProjectionDef(basePath: String, rollupPath: String,
                               dims: Seq[String], cntCol: String)

/** ClickHouse-PROJECTION analog: automatic rollup selection as a Catalyst
  * optimizer rule (reference engine feature class; clickhub's
  * `github_stars_mv` is the manual version of exactly this rewrite).
  *
  * A count aggregate over a base table whose grouping columns and filter
  * columns are all projection dimensions is answered from the
  * pre-aggregated rollup instead — `count(*)` becomes `sum(cnt)` over a
  * table that is orders of magnitude smaller. At 100 TB this is the
  * difference between scanning the event log and scanning its rollup; the
  * rewrite is what makes stored MVs pay off without queries opting in.
  *
  * Soundness gates (all conservative — any miss leaves the plan alone):
  *   - the scan chain down to the base relation is only column-pruning
  *     `Project`s and `Filter`s;
  *   - every filter references projection dimensions only (a filter on a
  *     non-dim column cannot be evaluated post-aggregation);
  *   - every grouping expression is a bare dimension attribute;
  *   - every aggregate is a non-distinct `count(literal)` (`count(*)` /
  *     `count(1)` — the summable-partial-state case; `count(x)` skips
  *     nulls and is NOT derivable from a count rollup);
  *   - output names and exprIds are preserved via a top-level Project, so
  *     parent operators (sorts, joins) are untouched.
  *
  * Freshness is the caller's contract, as with ClickHouse projections:
  * register a rollup only while it is maintained alongside its base (the
  * Catalog's append path + StarsMv backfill in this repo).
  *
  * Registered through `spark.experimental.extraOptimizations` (the final
  * optimizer batch): [[register]] is idempotent, and the rewritten subtree
  * contains no registered base scan, so re-application is a no-op.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  private val registry = new ConcurrentHashMap[String, ProjectionDef]()

  private def canon(p: String): String = new Path(p).toUri.getPath

  /** Register a projection and install the rule in the session (once). */
  def register(s: SparkSession, p: ProjectionDef): Unit = {
    registry.put(canon(p.basePath), p)
    if (!s.experimental.extraOptimizations.contains(RollupRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RollupRewrite
  }

  /** Test hook: forget every registered projection. */
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Unwrap pruning Projects / Filters down to a parquet scan, collecting
    * filter conditions. Anything else (joins, windows, non-attribute
    * projections) disqualifies the subtree.
    */
  private def unwrap(plan: LogicalPlan,
                     filters: List[Expression]): Option[(List[Expression], LogicalRelation)] =
    plan match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, filters)
      case Filter(cond, child) => unwrap(child, cond :: filters)
      case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation] =>
        Some((filters, r))
      case _ => None
    }

  private def isCountLiteral(e: Expression): Boolean = e match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(children) => children.forall(_.isInstanceOf[Literal])
        case _ => false
      }
    case _ => false
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (filters, rel) <- unwrap(agg.child, Nil)
      fsRel = rel.relation.asInstanceOf[HadoopFsRelation]
      root <- fsRel.location.rootPaths.headOption
      proj <- Option(registry.get(canon(root.toString)))
      dims = proj.dims.toSet
      // every filter and grouping column must be a projection dimension
      if filters.forall(_.references.forall(a => dims(a.name)))
      if agg.groupingExpressions.forall {
        case a: AttributeReference => dims(a.name)
        case _ => false
      }
      // aggregates: bare/aliased grouping attrs, or count(literal)
      if agg.aggregateExpressions.forall {
        case a: AttributeReference => dims(a.name)
        case Alias(a: AttributeReference, _) => dims(a.name)
        case Alias(ae, _) => isCountLiteral(ae)
        case _ => false
      }
    } yield {
      val spark = SparkSession.active
      var df = spark.read.parquet(proj.rollupPath)
      // replay the dim filters against the rollup's attributes (by name)
      val byName = df.queryExecution.analyzed.output.map(a => a.name -> a).toMap
      filters.foreach { c =>
        df = df.filter(ColumnShim.column(c.transform {
          case a: AttributeReference => byName(a.name)
        }))
      }
      val groupCols = agg.groupingExpressions.map {
        case a: AttributeReference => col(a.name)
      }
      // count(*) over the base ≡ sum(cnt) over the rollup (rollup rows
      // partition the base rows); sum of a non-null long is a long
      val rolled = df.groupBy(groupCols: _*)
        .agg(sum(col(proj.cntCol)).cast("long").as("__rollup_cnt"))
      val analyzed = rolled.queryExecution.analyzed
      val outByName = analyzed.output.map(a => a.name -> a).toMap
      // pin the original output names AND exprIds so parents are untouched
      val aligned: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference =>
          Alias(outByName(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(a: AttributeReference, name) =>
          Alias(outByName(a.name), name)(exprId = al.exprId)
        case al: Alias =>
          Alias(outByName("__rollup_cnt"), al.name)(exprId = al.exprId)
      }
      Project(aligned, analyzed)
    }
  }
}
