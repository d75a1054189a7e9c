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
}
