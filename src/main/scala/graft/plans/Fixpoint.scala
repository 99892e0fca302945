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
  * Every round's DELTA is localCheckpoint-ed (the Dictionaries.hierarchy /
  * connected-components pattern): lineage would otherwise grow by two
  * joins per round and re-run the whole history at each action. The
  * accumulation itself is a flat union over those materialized deltas —
  * it is never re-copied (see the in-loop note).
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
    var acc = seed.distinct().localCheckpoint()
    var frontier = acc
    var rounds = 0
    while (rounds < maxIters && !frontier.isEmpty) {
      // lazy checkpoint: the loop-guard isEmpty above is the first action
      // over `fresh` and materializes its blocks (Spark's local-checkpoint
      // completion hook finishes any partitions the guard's scan skipped),
      // so a round costs one driver action, not checkpoint + guard
      val fresh = step(frontier).distinct().except(acc).localCheckpoint(false)
      // acc and fresh are each distinct and mutually disjoint (fresh is
      // the except), so the union is already distinct — re-distincting
      // would shuffle the whole accumulation every round.
      //
      // The accumulation is a PLAN-LEVEL union of the checkpointed
      // deltas (round-14): every leaf is already materialized blocks, so
      // acc needs no checkpoint of its own — the old per-round
      // `acc.union(fresh).localCheckpoint()` recopied the ENTIRE closure
      // every round (O(closure²) block traffic over a deep recursion)
      // and cost one more job per round. Union plans flatten, so k
      // rounds leave a k-leaf union, not a k-deep tree; the deltas stay
      // live exactly as long as the result needs them.
      acc = acc.unionByName(fresh)
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
