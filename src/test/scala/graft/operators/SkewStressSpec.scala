package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial skew stressors at sf0.1 scale — the 100 TB failure
  * modes SCALE.md argues, exercised on data built to trigger them:
  * a boilerplate-heavy corpus collapsing 30% of documents into one
  * LSH bucket per band (≫ any cap), and a join where one hot key owns
  * 30% of the big side. Pins that the guardrails actually bound the
  * work: candidate counts stay index-sized, the hot-bucket removal is
  * a broadcast anti-join (no shuffle added), and salting demonstrably
  * spreads the hot key across tasks. */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.1") + "/documents.parquet")
    .select($"doc_id", $"text")
  // one third of the corpus becomes IDENTICAL boilerplate — every band
  // bucket of these docs is the same, so each holds ~1666 members:
  // uncapped, that alone would emit ~1.4M candidate pairs
  private lazy val boiler = docs.withColumn("text",
    when(pmod(hash($"doc_id"), lit(3)) === 0,
      lit("standard disclaimer boilerplate text repeated verbatim across the whole corpus " * 3))
      .otherwise($"text"))

  test("hot LSH bucket >> cap: capped candidates equal the clean subset's; bounded, never |bucket|^2") {
    val cap = 50
    val capped = Dedup.lshCandidatePairs(boiler, "doc_id", "text", maxBucketSize = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate members appear in NO pair (their buckets are all hot),
    // so the capped result must be exactly the clean docs' pairs
    val clean = docs.filter(pmod(hash($"doc_id"), lit(3)) =!= 0)
    val cleanPairs = Dedup.lshCandidatePairs(clean, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == cleanPairs)
    // bounded: nowhere near the ~1.4M pairs the hot bucket would emit
    assert(capped.size < 100000, s"candidate count ${capped.size} not bounded")
  }

  test("hot-bucket removal plans as a broadcast anti-join (no extra shuffle for the guard)") {
    val plan = Dedup.lshCandidatePairs(boiler, "doc_id", "text", maxBucketSize = Some(50))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("Broadcast"), plan)
  }

  test("hot join key: saltedJoin equals the plain join and spreads the key over salt sub-groups") {
    val salts = 16
    // 30% of 600k lineitem rows remapped onto ONE supplier key
    val big = spark.read.parquet(sf("sf0.1") + "/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
      .withColumn("l_suppkey",
        when(pmod(hash($"l_orderkey", $"l_suppkey"), lit(10)) < 3, lit(7L)).otherwise($"l_suppkey"))
    val small = spark.read.parquet(sf("sf0.1") + "/supplier.parquet")
      .select($"s_suppkey".as("l_suppkey"), $"s_name")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"l_suppkey", $"s_name")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(18,2)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    val plain = agg(big.join(small, "l_suppkey"))
    val salted = Skew.saltedJoin(big, small, Seq("l_suppkey"), $"l_orderkey", salts)
    assert(agg(salted) == plain)
    // the spread: no (key, salt) sub-group holds more than ~hot/salts
    // rows (x2 slack for hash unevenness) — the straggler bound itself
    val hotN = big.filter($"l_suppkey" === 7L).count()
    val maxGroup = big
      .withColumn("__salt", pmod(hash($"l_orderkey"), lit(salts)))
      .groupBy($"l_suppkey", $"__salt").count()
      .agg(max($"count")).head.getLong(0)
    assert(hotN > 150000, s"fixture not skewed enough: hot=$hotN")
    assert(maxGroup <= hotN / salts * 2, s"max sub-group $maxGroup vs hot key $hotN / $salts salts")
    // and the salt genuinely reaches the join's shuffle keys
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }
}
