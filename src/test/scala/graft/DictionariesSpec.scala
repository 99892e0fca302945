package graft

import org.apache.spark.sql.functions._
import graft.operators.Dictionaries

/** The dictionary analog beyond what the oracled queries pin: the general
  * parent-pointer hierarchy walker (the `dict_hierarchy` query's data
  * resolves in 2 levels; the walker must handle deeper chains, roots,
  * dangling parents, and the maxDepth bound), and getOrDefault miss
  * semantics.
  */
class DictionariesSpec extends SparkSpecBase {
  import spark.implicits._

  // a 4-level chain (1→2→3→4), a self-root (4), and a dangler (9→99 with
  // 99 absent from the dictionary)
  private lazy val dict = Seq(
    (1L, Some(2L)), (2L, Some(3L)), (3L, Some(4L)), (4L, None),
    (9L, Some(99L))).toDF("node", "parent")
    .select(col("node"), col("parent").cast("long").as("parent"))

  private def paths(maxDepth: Int = 8): Map[Long, Seq[Long]] = {
    val fact = Seq(1L, 3L, 4L, 9L).toDF("k")
    Dictionaries.hierarchy(fact, col("k"), dict, "node", "parent",
        maxDepth = maxDepth)
      .select(col("k"), col("path")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("hierarchy walks chains of any depth to the root") {
    val p = paths()
    p(1L) shouldBe Seq(1L, 2L, 3L, 4L)
    p(3L) shouldBe Seq(3L, 4L)
    p(4L) shouldBe Seq(4L)
  }

  test("a dangling parent ends the chain at the last resolvable node") {
    // 9's parent 99 is not a dictionary key: the chain records 99 (the
    // pointer exists) and stops (nothing to walk through)
    paths()(9L) shouldBe Seq(9L, 99L)
  }

  test("maxDepth bounds the walk") {
    paths(maxDepth = 2)(1L) shouldBe Seq(1L, 2L)
  }

  test("getOrDefault fills misses with the default, hits pass through") {
    val d = Dictionaries.Dict(dict, "node")
    val fact = Seq(1L, 42L).toDF("k")
    val got = d.getOrDefault(fact, col("k"), "parent", lit(-1L), "p")
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe Seq((1L, 2L), (42L, -1L))
  }

  test("dict_get plans its four probes as broadcast joins") {
    val df = Dictionaries.queries("dict_get")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.count(_.contains("BroadcastHashJoin")) shouldBe 4
  }
}
