package graft.pipeline

import graft.SparkSpec

class PipelineConfSpec extends SparkSpec {

  test("fromSparkConf mirrors the reference conf keys and defaults") {
    spark.conf.set("spark.job_silver_app.datetime_ref", "2024-03-05_02:10:00")
    spark.conf.set("spark.job_silver_app.bucket_name", "lake")
    spark.conf.set("spark.job_silver_app.dataset_name", "breweries")
    spark.conf.set("spark.job_silver_app.silver_table_name", "silver_dw.t")
    spark.conf.set("spark.job_gold_app.golden_table_name", "gold_dw.t")
    try {
      val (conf, dt) = PipelineConf.fromSparkConf(spark, pathRoot = "/tmp/root")
      assert(conf.bronzeRoot == "/tmp/root/lake/breweries")
      assert(conf.silverTable == "silver_dw.t" && conf.goldTable == "gold_dw.t")
      assert(dt == java.time.LocalDateTime.of(2024, 3, 5, 2, 10, 0))
      // −3h shift applies to the parsed instant (reference quirk)
      assert(BreweryPipeline.saoPauloDate(dt.toInstant(java.time.ZoneOffset.UTC)).toString == "2024-03-04")
    } finally Seq(
      "spark.job_silver_app.datetime_ref", "spark.job_silver_app.bucket_name",
      "spark.job_silver_app.dataset_name", "spark.job_silver_app.silver_table_name",
      "spark.job_gold_app.golden_table_name"
    ).foreach(spark.conf.unset)
  }

  test("datetime_ref accepts both the reference format and its own broken default") {
    // the reference's default '1900-01-01 00:00:00' cannot be parsed by its
    // own underscore format (job_silver.py:112) — we accept both separators
    assert(PipelineConf.parseDatetimeRef("1900-01-01 00:00:00").getYear == 1900)
    assert(PipelineConf.parseDatetimeRef("2024-01-02_03:04:05").getHour == 3)
    val (conf, dt) = PipelineConf.fromSparkConf(spark)
    assert(conf.bronzeRoot == "undefined/breweries" || conf.bronzeRoot.contains("undefined"))
    assert(dt.getYear == 1900)
  }
}
