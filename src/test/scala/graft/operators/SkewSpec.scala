package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation is value-identical to the plain GROUP BY") {
    // heavily skewed: one key owns 90% of rows
    val df = (1 to 2000).map { i =>
      (if (i <= 1800) "hot" else s"k${i % 7}", i.toLong, (i % 100) / 4.0)
    }.toDF("key", "id", "v")
    val plain = df.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"v".cast("decimal(18,2)")).cast("decimal(18,2)").as("sum_val"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    for (buckets <- Seq(1, 4, 32)) {
      val salted = Skew.saltedCountSum(df, Seq("key"), "v", $"id", buckets)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(salted == plain, s"buckets=$buckets")
    }
  }

  test("saltedJoin output equals the plain join for any salt count") {
    val big = (0 until 1000).map(i => (i.toLong, s"k${i % 3}", i * 0.5)).toDF("id", "key", "v")
    val small = Seq(("k0", 10.0), ("k1", 20.0), ("k2", 30.0), ("k9", 99.0)).toDF("key", "w")
    val plain = big.join(small, "key").select("id", "w").as[(Long, Double)].collect().toSet
    for (salts <- Seq(1, 4, 16)) {
      val salted = Skew.saltedJoin(big, small, Seq("key"), $"id", salts)
        .select("id", "w").as[(Long, Double)].collect().toSet
      assert(salted == plain, s"salts=$salts")
    }
  }
}
