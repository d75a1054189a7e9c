package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with zero shuffle exchanges") {
    val facts = (0 until 2000).map(i => (i.toLong % 100, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0 until 100).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    Sinks.bucketedTable(facts, "bkt_facts", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    Sinks.bucketedTable(dims, "bkt_dims", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      assert(j.count() == 2000)
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("sortedParquet writes files with disjoint sort-key ranges (min/max skippable)") {
    val out = java.nio.file.Files.createTempDirectory("sorted-pq").toString + "/t"
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", $"id" * 2)
      .orderBy(org.apache.spark.sql.functions.rand(7)) // scrambled input
    Sinks.sortedParquet(df, out, Seq("id"), numFiles = 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 4)
    // per-file (min, max) of the sort key must not overlap across files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min($"id"), org.apache.spark.sql.functions.max($"id")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"file ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
    // total rows preserved
    assert(spark.read.parquet(out).count() == 10000)
  }
}
