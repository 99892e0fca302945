package graft

/** Contract smoke for the driver surface: every registered query runs at
  * sf0.001, the flagship returns rows, and oracle keys reference real
  * queries (SURVEY.md §7.1).
  */
class QueriesSpec extends SparkSpecBase {

  test("entry() returns rows (driver smoke contract)") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracleSql key has a matching queries key") {
    val unknown = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    unknown shouldBe empty
  }

  test("no query or oracle key collides across modules") {
    // SparkEntry merges module maps with toMap — a duplicated key would
    // silently drop one module's query from the driver's correctness gate
    val qKeys = SparkEntry.modules.flatMap(_.queries.keys)
    qKeys.diff(qKeys.distinct) shouldBe empty
    val oKeys = SparkEntry.modules.flatMap(_.oracleSql.keys)
    oKeys.diff(oKeys.distinct) shouldBe empty
  }

  test("every query executes at sf0.001 and most return rows") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf0001).count()
    }
    // point-lookups and high-threshold dedups may legitimately be empty at
    // this tiny scale; everything else must produce rows
    val allowedEmpty = Set("p9_point_lookup", "j3_existence")
    val empty = counts.collect { case (n, 0L) if !allowedEmpty(n) => n }
    empty shouldBe empty
  }

  test("query result schemas have no duplicate or unaliased columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val fields = fn(spark, sf0001).schema.fieldNames
      withClue(s"$name: ") {
        fields.distinct.length shouldBe fields.length
        fields.foreach(f => f should not include "(")
      }
    }
  }

  test("merged HLL shard sketches estimate within the 5% contract") {
    // merge-then-estimate must agree with the exact distinct count per
    // group — the invariant that makes stored uniqState shards (the
    // AggregatingMergeTree pattern) safe to union at read time
    val rows = SparkEntry.queries("agg_hll_merge")(spark, sf0001).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"event_type=${r.getAs[String]("event_type")}: ") {
        r.getAs[Boolean]("hll_ok") shouldBe true
      }
    }
  }

  // plan-shape guards (incl. the partitionless-window check) live in PlanSpec
}
