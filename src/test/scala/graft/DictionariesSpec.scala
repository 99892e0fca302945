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

  test("range_hashed: smallest-lo wins on overlap, bounds inclusive, " +
       "misses default") {
    val dim = Seq((1L, 0.0, 10.0, "a"), (1L, 5.0, 20.0, "b"))
      .toDF("k", "lo", "hi", "v")
    val fact = Seq((10L, 1L, 7.0), (20L, 1L, 15.0), (30L, 1L, 20.0),
      (40L, 1L, 99.0), (50L, 2L, 7.0)).toDF("id", "k", "p")
    val got = Dictionaries.RangeDict(dim, "k", "lo", "hi")
      .getOrDefault(fact, col("k"), col("p"), "v", lit("?"), "t")
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    got shouldBe Map(10L -> "a", // both ranges match; lo=0 beats lo=5
      20L -> "b", 30L -> "b",    // hi is inclusive
      40L -> "?", 50L -> "?")    // point out of range; key absent
  }

  test("ip_trie: longest prefix wins, host bits in the CIDR are masked, " +
       "misses default") {
    def ip(a: Long, b: Long, c: Long, d: Long): Long =
      a * 16777216L + b * 65536L + c * 256L + d
    val dim = Seq(("10.0.0.0/8", "net8"), ("10.3.7.9/16", "net16"),
      ("0.0.0.0/0", "default-route")).toDF("cidr", "label")
    val fact = Seq((1L, ip(10, 3, 200, 1)), (2L, ip(10, 4, 0, 1)),
      (3L, ip(11, 0, 0, 1))).toDF("id", "addr")
    val got = Dictionaries.IpTrieDict(dim, "cidr", "label")
      .getOrDefault(fact, col("addr"), lit("miss"), "label")
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // 10.3.x.x: /16 wins over /8 and /0 (and the /16's host bits 7.9 did
    // not narrow it to an exact-address match); 10.4.x.x: /8; 11.x: /0
    got shouldBe Map(1L -> "net16", 2L -> "net8", 3L -> "default-route")
    // two CIDRs masking to the SAME network collapse to one trie node
    // (min label) — a fact row must never duplicate through the probe
    val dupDim = Seq(("10.0.0.0/8", "b"), ("10.9.9.9/8", "a"))
      .toDF("cidr", "label")
    val dupGot = Dictionaries.IpTrieDict(dupDim, "cidr", "label")
      .getOrDefault(Seq((1L, ip(10, 3, 0, 1))).toDF("id", "addr"),
        col("addr"), lit("miss"), "label")
      .collect()
    dupGot.length shouldBe 1
    dupGot.head.getString(2) shouldBe "a"
  }

  test("range and trie probes plan as broadcast joins, never sort-merge") {
    Seq("dict_range", "dict_ip_trie").foreach { q =>
      val plan = Dictionaries.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      withClue(q) {
        plan should include("BroadcastHashJoin")
        plan should not include "SortMergeJoin"
      }
    }
  }
}
