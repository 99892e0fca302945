package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted-join equivalence: result-identical to the plain join on skewed
  * data, with the hot key spread across salt partitions.
  */
class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join ≡ plain join on a 90%-hot-key distribution") {
    // 9000 rows on one hot key + 1000 spread over 100 keys
    val facts = ((1 to 9000).map(i => (42L, i.toDouble)) ++
      (1 to 1000).map(i => ((i % 100).toLong, i.toDouble)))
      .toDF("k", "v")
    val dim = (0L to 100L).map(k => (k, s"name_$k")).toDF("k", "name")

    val plain = facts.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))
    val salted = SkewJoin.saltedJoin(facts, dim, "k", salts = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), round(sum("v"), 2).as("s"))

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    canon(salted) shouldBe canon(plain)
  }

  test("hot key actually spreads across salts before the join") {
    val facts = (1 to 4000).map(i => (42L, i)).toDF("k", "v")
    val spread = facts.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    spread.length shouldBe 8
    // roughly uniform: no salt partition holds more than half the hot key
    all(spread) should be < 2000L
  }
}
