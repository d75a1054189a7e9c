package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for
    // session bring-up.
    spark.range(1000000).selectExpr("sum(id)").collect()
    val results = graft.queries.Corpus.all.map { q =>
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // second pass over the headline queries: cold numbers above include
    // per-plan codegen+JIT (~0.5-1 s each at sf0.1); warm numbers show
    // steady-state engine throughput.
    val warm = graft.queries.Corpus.headlines.map { q =>
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch { case _: Throwable => -1L }
      s"\"${q.name}\":" + (System.nanoTime() - t0) / 1e9
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warm_headline":$warm,"sf":"$sfDir"}""")
    spark.stop()
  }
}
