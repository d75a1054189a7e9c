package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("top-k aggregator matches the window row_number form exactly") {
    val df = (1 to 500).map(i => ((i % 13).toLong, (i * 37 % 200).toDouble, i.toLong))
      .toDF("key", "ord", "id")
    val topn = udaf(new TopKAggregator(4))
    val got = df.groupBy($"key").agg(topn($"ord", $"id").as("top"))
      .select($"key", posexplode($"top").as(Seq("pos", "t")))
      .select($"key", ($"pos" + 1).cast("long").as("rn"), $"t.ord", $"t.id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"key").orderBy($"ord".desc, $"id")
    val want = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      .select($"key", $"rn".cast("long"), $"ord", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("partial aggregation: plan contains ObjectHashAggregate, no Window") {
    val topn = udaf(new TopKAggregator(2))
    val df = Seq((1L, 5.0, 1L), (1L, 7.0, 2L)).toDF("key", "ord", "id")
      .groupBy($"key").agg(topn($"ord", $"id").as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Aggregate"))
    assert(!plan.contains("Window"))
  }
}
