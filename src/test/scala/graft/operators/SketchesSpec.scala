package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("daily sketches roll up to the same distinct estimate as a direct sketch, near exact") {
    val ev = graft.queries.Corpus.fixture(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", to_date(col("ts")))
    // fine grain: per (event_type, day); rollup: per event_type
    val fine = Sketches.hllSketches(ev, Seq("event_type", "day"), "user_id")
    val rolled = Sketches.hllRollup(fine, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy($"event_type").agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val est = rolled(k)
      assert(math.abs(est - e).toDouble / e < 0.05, s"$k: est=$est exact=$e")
    }
    // merging all sketches equals sketching everything at once (HLL merge law)
    val allAtOnce = Sketches.hllSketches(ev, Seq("event_type"), "user_id")
      .select($"event_type", hll_sketch_estimate($"distinct_sketch").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled == allAtOnce)
  }

  test("approxTopK is exact below sketch capacity and ranks by (count desc, item)") {
    val docs = graft.queries.Corpus.fixture(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val got = Sketches.approxTopK(docs, "token", k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val exact = docs.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.map(t => (t._2, t._3)) == exact)
    assert(got.map(_._1) == (1 to 5))
  }

  test("top-k sketch merge law: rollup of per-day sketches equals the all-at-once top-k") {
    val ev = graft.queries.Corpus.fixture(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", to_date(col("ts")))
    // fine grain per (event_type, day), rolled up per event_type —
    // estimate(combine(accumulate_parts)) must equal the direct build
    // when capacity is never exceeded (the 100 TB per-source pattern)
    val fine = Sketches.topKSketches(ev, Seq("event_type", "day"), "user_id", maxItemsTracked = 8192)
    val rolled = Sketches.topKRollup(fine, Seq("event_type"), k = 5, maxItemsTracked = 8192)
      .select($"event_type", $"rk", $"item", $"cnt")
      .collect().map(r => (r.getString(0), r.getInt(1), r.get(2).toString, r.getLong(3))).toSet
    val direct = {
      // item keeps user_id's NATIVE type: the rollup's (cnt desc, item)
      // tiebreak is typed, and a string cast would flip tie order
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"cnt".desc, $"item")
      ev.groupBy($"event_type", $"user_id".as("item"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
        .select($"event_type", $"rk", $"item", $"cnt")
        .collect().map(r => (r.getString(0), r.getInt(1), r.get(2).toString, r.getLong(3))).toSet
    }
    assert(rolled == direct)
    // row counts ride the sketch rows
    val n = Sketches.topKRollup(fine, Seq("event_type"), k = 1)
      .agg(sum($"n_rows")).head.getLong(0)
    assert(n == ev.count() * 1) // k=1 -> one row per group, n_rows repeated per row
  }

  test("quantile sketch is exact below capacity and obeys the merge law") {
    val ev = graft.queries.Corpus.fixture(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", to_date(col("ts")))
    val fine = Sketches.quantileSketches(ev, Seq("event_type", "day"), "value", capacity = 32768)
    val rolled = Sketches.quantileRollup(fine, Seq("event_type"),
      Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)), capacity = 32768)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // exact disc quantile: 1-indexed rank ceil(p*n) of the sorted values
    val exact = ev.filter($"value".isNotNull)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (et, rows) =>
        val sorted = rows.map(_._2).sorted
        def disc(p: Double) = sorted(math.max(1, math.ceil(p * sorted.length).toInt) - 1)
        et -> ((sorted.length.toLong, disc(0.25), disc(0.5), disc(0.75)))
      }
    assert(rolled == exact)
    // merge law below capacity: per-day build + combine == direct build
    val direct = Sketches.quantileRollup(
      Sketches.quantileSketches(ev, Seq("event_type"), "value", capacity = 32768),
      Seq("event_type"), Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)), capacity = 32768)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rolled == direct)
  }

  test("quantile sketch above capacity: weight conserved, rank error inside the KLL bound") {
    // 20k deterministic, hash-permuted values through a small sketch
    val n = 20000
    val cap = 256
    val df = spark.range(n).select(
      lit("g").as("g"),
      // arrival order decorrelated from value order (xxhash of the id)
      (abs(xxhash64(col("id"))) % n).cast("double").as("v"))
    val fine = Sketches.quantileSketches(df, Seq("g"), "v", capacity = cap)
    // total weight conservation: sum over levels of |values|*2^level == n
    val w = fine.select(explode(col("quant_sketch")).as("lv"))
      .select((size(col("lv.values")) * expr("shiftleft(CAST(1 AS BIGINT), lv.level)")).as("w"))
      .agg(sum(col("w"))).head.getLong(0)
    assert(w == n)
    val est = Sketches.quantileRollup(fine, Seq("g"), Seq(("p50", 0.5)), capacity = cap)
      .head.getDouble(2)
    // deterministic-KLL worst case: each level-i compaction displaces
    // ranks by <= 2^i and level i compacts <= W/(cap*2^i) times, so
    // total rank error <= levels * W / cap (~550 here); assert 2x slack
    val values = df.select(col("v")).as[Double].collect().sorted
    val trueRank = values.count(_ <= est) // est is an element of the data
    val target = math.ceil(0.5 * n)
    val bound = 2.0 * n / cap * (math.log(n.toDouble / cap) / math.log(2.0) + 1)
    assert(math.abs(trueRank - target) <= bound,
      s"rank ${trueRank} vs target $target exceeds bound $bound")
  }

  test("hllOverlap estimates distinct intersection within error") {
    // A = 0..999, B = 500..1499 -> |A∩B| = 500
    val a = spark.range(0, 1000).toDF("v")
    val b = spark.range(500, 1500).toDF("v")
    val r = Sketches.hllOverlap(a, b, "v").head
    val (ea, eb, eu, eo) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(math.abs(ea - 1000) < 50 && math.abs(eb - 1000) < 50)
    assert(math.abs(eu - 1500) < 75)
    assert(math.abs(eo - 500) < 150) // error compounds from three estimates
    // disjoint corpora estimate near zero
    val disjoint = Sketches.hllOverlap(spark.range(0, 500).toDF("v"),
      spark.range(10000, 10500).toDF("v"), "v").head.getLong(3)
    assert(disjoint < 60)
  }
}
