package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: time named corpus queries in isolation.
  *
  * {{{ sbt "runMain graft.RunOne /root/testdata/sf0.1 q30_dedup_exact q31_minhash_signatures" }}}
  *
  * Each query runs twice (cold = plan+codegen+JIT, warm = steady state)
  * and optionally prints the formatted physical plan with -explain.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.drop(1).filterNot(_ == "-explain")
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", Runtime.getRuntime.availableProcessors)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val byName = graft.queries.Corpus.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query $n; known: ${byName.keys.toSeq.sorted.mkString(",")}"))
      if (explain) q.run(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = q.run(spark, sfDir).count()
        println(f"RUNONE $n pass$i rows=$c%d sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
