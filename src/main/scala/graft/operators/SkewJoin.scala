package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, a plain
  * shuffle join lands that key's entire volume on one reducer. AQE's
  * skew-join split handles sort-merge cases adaptively; explicit salting is
  * the deterministic alternative that also composes with aggregations:
  * the fact side gets a random salt in [0, S), the dimension side is
  * replicated S ways, and the join key becomes (key, salt) — one hot key
  * spreads across S reducers at the cost of an S× blow-up of the (small)
  * dimension side only.
  *
  * Result-identical to the unsalted join; [[graft.SkewJoinSpec]] asserts it.
  */
object SkewJoin {

  /** Join `facts` (large, possibly skewed on `key`) with `dim` (small) on
    * equal `key` columns, salting S ways. Extra join predicates are ANDed.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    // deterministic salt: hash-of-monotonic-id modulo S spreads rows evenly
    // without an RNG (reproducible plans, no seed plumbing)
    val saltedFacts = facts.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFacts.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
