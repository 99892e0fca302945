package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ClickHouse external-dictionary analog: `dictGet` / `dictGetOrDefault` /
  * `dictGetHierarchy` (the dictionary engine family the reference's server
  * ships alongside MergeTree — create_db.py's DDL surface runs on a server
  * where dictionaries are the standard dim-enrichment path).
  *
  * ClickHouse keeps a dictionary fully RAM-resident on every server and
  * resolves `dictGet(dict, attr, key)` as an O(1) in-memory probe. The
  * Spark-first analog keeps the same memory residency — one copy per
  * executor — but gets it through a BROADCAST hash join, not a plan-embedded
  * literal map:
  *
  *   - `element_at(typedLit(map), key)` would mirror CH's layout most
  *     literally, but the map is baked into the expression tree, so plan
  *     size and codegen grow O(|dict|) — the exact failure mode the IVF
  *     literal-centroid fix removed (Similarity.assignCells). Rejected.
  *   - A broadcast left join costs one BroadcastExchange of the dim rows
  *     (shipped once per executor, like CH's resident dictionary), keeps
  *     the probe a codegen'd hash lookup, keeps plan size constant in
  *     dictionary cardinality, and lets Catalyst prune/push around it.
  *
  * `getOrDefault` is a left join + `coalesce` (CH returns the attribute
  * default on a miss, never null). `hierarchy` walks a parent-pointer
  * dictionary to the root with a driver-side loop of broadcast joins —
  * bounded by `maxDepth` exactly like CH bounds dictGetHierarchy by the
  * dictionary's declared depth; each level is one more broadcast probe, and
  * the loop stops early as soon as a level resolves no parents (checked on
  * the DICT, driver-side, |dict| rows — never by counting the fact table).
  */
object Dictionaries extends QueryModule {

  /** A registered dictionary: small keyed dim relation, resident per
    * executor once joined. `attrs` are the exposed attribute columns.
    */
  final case class Dict(dim: DataFrame, key: String) {

    /** dictGetOrDefault: enrich `fact` with `attr` looked up by `factKey`,
      * misses filled with `default` (dictGet = getOrDefault with a null
      * default). One broadcast probe; output column named `as`.
      */
    def getOrDefault(fact: DataFrame, factKey: Column, attr: String,
                     default: Column, as: String): DataFrame = {
      val lookup = broadcast(dim.select(col(key).as("__dict_key"),
        col(attr).as("__dict_val")))
      fact.join(lookup, factKey === col("__dict_key"), "left_outer")
        .withColumn(as, coalesce(col("__dict_val"), default))
        .drop("__dict_key", "__dict_val")
    }
  }

  /** dictGetHierarchy over a parent-pointer dictionary (`key`, `parent`):
    * for each fact key, the ancestor chain [key, parent(key), …] up to the
    * root (parent null) or `maxDepth`. Each level adds ONE broadcast probe
    * of the dict against itself-resolved chain heads; fact rows are touched
    * once at the end. The loop's stop check runs on the resolved DICT
    * (tiny, driver-side) so fact-table size never gates iteration count.
    */
  def hierarchy(fact: DataFrame, factKey: Column, dict: DataFrame,
                key: String, parent: String, maxDepth: Int = 8,
                as: String = "path"): DataFrame = {
    // eager localCheckpoint per level (the connectedComponents pattern,
    // Dedup.scala): without it, each level's stop-check action recomputes
    // the whole uncached join chain from scratch — O(depth²) join work —
    // and the invariant step projection would re-broadcast per level.
    // Blocks of the superseded level are released as soon as the next is
    // materialized; the final level's checkpoint stays live for the fact
    // join to read.
    def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
    val step = broadcast(dict.select(col(key).as("__sk"), col(parent).as("__sp")))
    // resolve key -> full ancestor path on the dict itself (|dict| rows)
    var chain = dict.select(col(key).as("__k"), array(col(key)).as("__path"),
      col(parent).as("__next")).localCheckpoint()
    var depth = 1
    var open = !chain.filter(col("__next").isNotNull).isEmpty
    while (open && depth < maxDepth) {
      val next = chain.join(step, col("__next") === col("__sk"), "left_outer")
        .select(col("__k"),
          when(col("__next").isNotNull,
            concat(col("__path"), array(col("__next"))))
            .otherwise(col("__path")).as("__path"),
          col("__sp").as("__next"))
        .localCheckpoint() // eager: one job per level, lineage truncated
      release(chain)
      chain = next
      depth += 1
      open = !chain.filter(col("__next").isNotNull).isEmpty
    }
    fact.join(broadcast(chain.select(col("__k"), col("__path"))),
        factKey === col("__k"), "left_outer")
      .withColumn(as, col("__path"))
      .drop("__k", "__path", "__next")
  }

  override def queries: Map[String, Q] = Map(
    // Chained dictGet + a getOrDefault miss: supplier -> nation name via
    // the nation dict, nation -> region name via the region dict, plus a
    // deliberately-missing probe (s_suppkey % 40 overruns the 25 nation
    // keys) resolved to CH's attribute default instead of null. Three
    // broadcast probes, zero shuffles of the fact side.
    "dict_get" -> ((s, d) => {
      val nationDict = Dict(Tables.nation(s, d), "n_nationkey")
      val regionDict = Dict(Tables.region(s, d), "r_regionkey")
      val base = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val withNation = nationDict.getOrDefault(base, col("s_nationkey"),
        "n_name", lit("??"), "nation_name")
      val withRegion = regionDict.getOrDefault(
        nationDict.getOrDefault(withNation, col("s_nationkey"),
          "n_regionkey", lit(-1L), "rk"),
        col("rk"), "r_name", lit("??"), "region_name")
      val missProbe = nationDict.getOrDefault(withRegion,
        pmod(col("s_suppkey"), lit(40)), "n_name", lit("n/a"), "maybe_name")
      missProbe.select(col("s_suppkey"), col("nation_name"),
          col("region_name"), col("maybe_name"))
        .orderBy(col("s_suppkey"))
    }),

    // dictGetHierarchy: nodes = nations (parent: 100+regionkey) ∪ regions
    // (id 100+key, parent null); per supplier the ancestor id chain
    // [nation, region-node]. The implementation walks parent pointers
    // GENERALLY (loop-until-roots, maxDepth-bounded); this dictionary
    // happens to resolve in 2 levels, which the oracle hardcodes.
    "dict_hierarchy" -> ((s, d) => {
      val nations = Tables.nation(s, d).select(
        col("n_nationkey").as("node"),
        (col("n_regionkey") + lit(100L)).as("parent"))
      val regions = Tables.region(s, d).select(
        (col("r_regionkey") + lit(100L)).as("node"),
        lit(null).cast("long").as("parent"))
      val dict = nations.unionByName(regions)
      hierarchy(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("s_nationkey"), dict, "node", "parent")
        // rendered as a joined string: array-typed result cells are not
        // portably hashable through the pandas-based oracle compare
        .select(col("s_suppkey"), array_join(col("path"), ",").as("path"))
        .orderBy(col("s_suppkey"))
    }),
  )

  override def oracleSql: Map[String, String] = Map(
    "dict_get" ->
      """SELECT s_suppkey,
        |  coalesce(n1.n_name, '??')  AS nation_name,
        |  coalesce(r.r_name,  '??')  AS region_name,
        |  coalesce(n2.n_name, 'n/a') AS maybe_name
        |FROM supplier s
        |LEFT JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |LEFT JOIN region r  ON n1.n_regionkey = r.r_regionkey
        |LEFT JOIN nation n2 ON (s.s_suppkey % 40) = n2.n_nationkey
        |ORDER BY s_suppkey""".stripMargin,

    "dict_hierarchy" ->
      """SELECT s_suppkey, s_nationkey || ',' || (n_regionkey + 100) AS path
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
  )
}
