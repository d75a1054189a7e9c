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
