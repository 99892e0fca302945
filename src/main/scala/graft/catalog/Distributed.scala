package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.PolyHash

/** A registered Distributed facade: `members` are ordinary [[Catalog]]
  * tables (one per shard, index = shard id) and `shardKey` is the column
  * whose hash routes each row. `cluster`/`db`/`memberBase` carry the
  * DDL-text spelling (`ENGINE = Distributed(cluster, db, t, key)`) so
  * SHOW CREATE renders the declaration back verbatim; API-created
  * facades keep the defaults.
  */
final case class DistributedDef(name: String, path: String,
                                shardKey: String, members: Seq[String],
                                cluster: String = "default",
                                db: String = "default",
                                memberBase: String = "",
                                declared: Boolean = false)

/** ≈ the ClickHouse `Distributed` engine: a facade over N per-shard member
  * tables. INSERTs split the batch by `hash(shardKey) % N` and land each
  * slice in its member; SELECTs union all members; a point probe on the
  * sharding key reads exactly one member — the `optimize_skip_unused_shards`
  * prune, which here means N−1 shards' files never even enter the plan.
  *
  * Spark-first shape: members are plain [[Catalog]] tables (any engine
  * semantics, any layout — a Collapsing member collapses per shard, which
  * is sound because equal sort keys hash to the same shard). The facade
  * keeps NO data of its own, only a `_DIST` sidecar naming the members, so
  * [[attachDistributed]] can rebuild the whole topology from storage alone
  * — the restart story matches [[Catalog.attach]].
  *
  * The routing hash is the cross-engine [[PolyHash]] fold of the key cast
  * to string: the same loop runs as a codegen'd Catalyst expression on the
  * insert path and as plain Scala on the driver for [[shardOf]], so a
  * probe's shard is computable WITHOUT a Spark job and provably agrees
  * with where appends put the row.
  *
  * Scale note: `append` materializes the routed batch once (cached) and
  * slices it N ways — N short cached filters, not N source scans; on a
  * real fleet each slice write is the member's own clustered append, so
  * the facade adds no extra shuffle. Reads are a union of independent
  * per-member scans: Catalyst pushes predicates and pruning into every
  * branch separately, and a shard-pinned probe skips the union entirely.
  */
final class DistributedCatalog(spark: SparkSession, cat: Catalog) {

  private val dists =
    scala.collection.concurrent.TrieMap.empty[String, DistributedDef]

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def sidecar(path: String) =
    new org.apache.hadoop.fs.Path(path, "_DIST")

  def get(name: String): DistributedDef =
    dists.getOrElse(name,
      throw new NoSuchElementException(s"unknown distributed table $name"))

  /** CREATE TABLE … ENGINE = Distributed: declares N member tables
    * (`<name>_shard0…N-1`, each at `<path>/shard<i>`) with the given
    * per-member schema/keys/semantics, and persists the topology sidecar.
    */
  def create(name: String, path: String, schema: StructType,
             sortKeys: Seq[String], semantics: EngineSemantics,
             shardKey: String, nShards: Int,
             layout: TableLayout = FlatDir): DistributedDef = {
    require(nShards >= 1, s"$name: need at least one shard (got $nShards)")
    require(schema.fieldNames.contains(shardKey),
      s"$name: sharding key $shardKey is not in the schema")
    val members = (0 until nShards).map(i => s"${name}_shard$i")
    members.zipWithIndex.foreach { case (m, i) =>
      cat.createTable(TableDef(m, s"$path/shard$i", schema, sortKeys,
        semantics, layout))
    }
    val d = DistributedDef(name, path, shardKey, members,
      memberBase = name)
    persist(d)
    dists.putIfAbsent(name, d)
    dists(name)
  }

  /** `CREATE TABLE … ENGINE = Distributed(cluster, db, t, key)` as DDL
    * text, over ALREADY-REGISTERED member tables — ClickHouse's own
    * model: the local tables exist on the nodes before the facade is
    * declared. Members resolve as the consecutively-numbered
    * `<t>_shard<i>` registrations (the [[create]] naming convention); a
    * single registered `<t>` is a 1-shard cluster. The declared column
    * list validates against the member schema; the facade itself stores
    * only the `_DIST` sidecar (when `path` is non-empty), so
    * [[attachDistributed]] rebuilds it from storage alone.
    */
  def declare(name: String, path: String, cluster: String, db: String,
              memberBase: String, shardKey: String,
              declared: StructType): DistributedDef = {
    val shardNames = Iterator.from(0).map(i => s"${memberBase}_shard$i")
      .takeWhile(n => scala.util.Try(cat.get(n)).isSuccess).toList
    val members =
      if (shardNames.nonEmpty) shardNames
      else if (scala.util.Try(cat.get(memberBase)).isSuccess)
        List(memberBase)
      else throw new IllegalArgumentException(
        s"$name: ENGINE = Distributed($cluster, $db, $memberBase, " +
          s"$shardKey) — no registered member tables named " +
          s"${memberBase}_shard0… or $memberBase; create the members " +
          "first (the ClickHouse model: local tables exist before the " +
          "Distributed facade is declared)")
    val memberSchema = cat.get(members.head).schema
    members.foreach { mn =>
      require(cat.get(mn).schema.fieldNames.sameElements(
          memberSchema.fieldNames),
        s"$name: member $mn's schema differs from ${members.head}'s — " +
          "all shards of one Distributed table share a schema")
    }
    declared.fieldNames.foreach(c =>
      require(memberSchema.fieldNames.contains(c),
        s"$name: declared column $c is not in member $memberBase's schema"))
    require(memberSchema.fieldNames.contains(shardKey),
      s"$name: sharding key $shardKey is not a member column")
    val d = DistributedDef(name, path, shardKey, members, cluster, db,
      memberBase, declared = true)
    if (path.nonEmpty) persist(d)
    dists.put(name, d)
    d
  }

  private def persist(d: DistributedDef): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.compact(JsonMethods.render(
      ("name" -> d.name) ~ ("shard_key" -> d.shardKey) ~
        ("members" -> d.members) ~ ("cluster" -> d.cluster) ~
        ("db" -> d.db) ~ ("member_base" -> d.memberBase) ~
        ("declared" -> d.declared)))
    val f = fs(d.path)
    val out = f.create(sidecar(d.path), true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Rebuild the facade (and attach every member) from storage alone. */
  def attachDistributed(path: String): DistributedDef = {
    import org.json4s.jackson.JsonMethods
    val f = fs(path)
    val in = f.open(sidecar(path))
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val j = JsonMethods.parse(json)
    def str(k: String) =
      (j \ k).asInstanceOf[org.json4s.JString].s
    val members = (j \ "members").asInstanceOf[org.json4s.JArray]
      .arr.map(_.asInstanceOf[org.json4s.JString].s)
    def opt(k: String, dflt: String) = (j \ k) match {
      case org.json4s.JString(v) => v
      case _ => dflt
    }
    val isDeclared = (j \ "declared") match {
      case org.json4s.JBool(b) => b
      case _ => false
    }
    // a create()d facade owns `<path>/shard<i>` member storage — attach
    // each; a DDL-declared facade's members are registered tables of
    // their own (attach them by their own paths first)
    if (isDeclared)
      members.foreach(mn => require(
        scala.util.Try(cat.get(mn)).isSuccess,
        s"${str("name")}: declared-facade member $mn is not registered — " +
          "attach the member tables before the Distributed sidecar"))
    else
      members.zipWithIndex.foreach { case (_, i) =>
        cat.attach(s"$path/shard$i") }
    val d = DistributedDef(str("name"), path, str("shard_key"), members,
      opt("cluster", "default"), opt("db", "default"),
      opt("member_base", ""), isDeclared)
    dists.putIfAbsent(d.name, d)
    dists(d.name)
  }

  /** DROP TABLE on the facade: the declaration (and its sidecar) goes;
    * the member tables keep their data — CH's own Distributed semantics.
    */
  def drop(name: String): Unit = {
    val d = get(name)
    if (d.path.nonEmpty) {
      val f = fs(d.path)
      val sc = sidecar(d.path)
      if (f.exists(sc)) f.delete(sc, false)
    }
    dists.remove(name)
  }

  /** The shard a key value routes to — driver-side, no Spark job; the
    * value is rendered the way `cast(col AS STRING)` renders it, so only
    * pass values of the key column's declared type.
    */
  def shardOf(name: String, keyValue: Any): Int = {
    val d = get(name)
    (PolyHash.fold(String.valueOf(keyValue)) % d.members.size).toInt
  }

  /** INSERT through the facade: one routed materialization, N slice
    * appends (each slice goes through its member's full append path —
    * engine pre-fold, clustering sort, skip-index build).
    *
    * The N member appends are INDEPENDENT jobs on disjoint tables, so they
    * are submitted CONCURRENTLY (guide §2.6 — overlap independent jobs):
    * serialized, each append's fixed per-exchange/driver-action overhead
    * added up N-fold and dominated shard-sized blocks (round-14 scaling
    * probe: cat_ddl_distributed ran FASTER on 8 cores than 32 — pure
    * orchestration cost); concurrent, one append's scheduling tail
    * back-fills with the next one's tasks. Each member takes its own
    * write lock; no two slices touch the same table, and on a real fleet
    * the slices land on different shards' storage anyway.
    */
  def append(name: String, batch: DataFrame): Long = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val d = get(name)
    val n = d.members.size
    val routed = batch.withColumn("__shard",
      pmod(PolyHash(col(d.shardKey).cast("string")), lit(n.toLong)).cast("int"))
      .cache()
    try {
      routed.count() // materialize once; the N filters below hit the cache
      // The materialized cache knows the batch's TRUE byte footprint —
      // read it AFTER the count so the InMemoryRelation's stats come from
      // the materialized buffers, and size each member append's clustering
      // exchange to its ~1/N slice (guide §2.2): a shard-sized slice of a
      // small insert appends exchange-free, a 100 TB batch keeps the same
      // partBytes-bounded fan-out as an unmeasured append. Hash routing is
      // balanced in expectation; skew only shifts the part count by its
      // own factor (layout stays partBytes-bounded, never a constant).
      val batchBytes = {
        val s = routed.queryExecution.optimizedPlan.stats.sizeInBytes
        if (s.isValidLong) s.toLong else -1L
      }
      val sliceBytes = if (batchBytes < 0) -1L else batchBytes / n + 1
      val slices = d.members.zipWithIndex.map { case (m, i) =>
        Future {
          cat.append(m, routed.filter(col("__shard") === i).drop("__shard"),
            blockBytes = sliceBytes)
        }
      }
      slices.map(Await.result(_, Duration.Inf)).sum
    } finally routed.unpersist()
  }

  /** SELECT through the facade: the union of every member's (engine-
    * merged) read view. Catalyst pushes filters/pruning into each branch.
    */
  def read(name: String): DataFrame =
    get(name).members.map(cat.read).reduce(_.unionByName(_))

  /** Shard-pruned point read (`optimize_skip_unused_shards`): the N−1
    * other members never enter the plan.
    */
  def readShardOf(name: String, keyValue: Any): DataFrame =
    cat.read(get(name).members(shardOf(name, keyValue)))
}
