package graft.plans

import org.apache.spark.sql.DataFrame

/** `WITH RECURSIVE` as a first-class engine operator (the reference's
  * server dialect grew recursive CTEs; Spark 4 can parse them, but a
  * DataFrame-level fixpoint is the API surface programs compose with —
  * arbitrary `step` transforms, not just what fits in one SQL body).
  *
  * Semi-naive evaluation (the Datalog optimization): `step` receives only
  * the PREVIOUS round's new rows (the frontier), never the whole
  * accumulation, so each round's join work is proportional to the delta —
  * on a 100 TB graph the frontier typically shrinks geometrically while a
  * naive re-evaluation would re-join the full closure every round.
  * UNION-distinct semantics: rows already derived are not re-derived
  * (`except` against the accumulation), which is also what guarantees
  * termination on cyclic inputs — a cycle's rows enter the accumulation
  * once and the frontier goes empty.
  *
  * Every round is localCheckpoint-ed (the Dictionaries.hierarchy /
  * connected-components pattern): lineage would otherwise grow by two
  * joins per round and re-run the whole history at each action. Superseded
  * checkpoints are released as soon as their successor is materialized.
  */
object Fixpoint {

  /** Iterate `seed ∪ step(frontier)` to fixpoint, distinct semantics.
    * `step` must return frontier-shaped rows (same schema). Throws if the
    * fixpoint is not reached within `maxIters` rounds (the analog of
    * Spark SQL's cteRecursionLevelLimit / CH's max_recursive_cte_
    * evaluation_depth — unbounded recursion should fail loudly, not spin).
    */
  def recursive(seed: DataFrame, step: DataFrame => DataFrame,
                maxIters: Int = 100): DataFrame = {
    def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }
    var acc = seed.distinct().localCheckpoint()
    var frontier = acc
    var rounds = 0
    while (rounds < maxIters && !frontier.isEmpty) {
      val fresh = step(frontier).distinct().except(acc).localCheckpoint()
      // acc and fresh are each distinct and mutually disjoint (fresh is
      // the except), so the union is already distinct — re-distincting
      // would shuffle the whole accumulation every round
      val nextAcc = acc.unionByName(fresh).localCheckpoint()
      if (frontier ne acc) release(frontier)
      release(acc)
      acc = nextAcc
      frontier = fresh
      rounds += 1
    }
    if (!frontier.isEmpty)
      throw new IllegalStateException(
        s"Fixpoint.recursive: no fixpoint within $maxIters rounds " +
          "(unbounded recursion?)")
    acc
  }
}
