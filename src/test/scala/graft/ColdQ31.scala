package graft

/** Scratch: phase breakdown of q31's cold execution (round-14 ask #7). */
object ColdQ31 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("cold-q31", Runtime.getRuntime.availableProcessors)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm, like RunOne
    val q = graft.queries.Corpus.all.find(_.name == "q31_minhash_signatures").get
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"COLDQ31 $label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val df = t("build")(q.run(spark, sfDir))
    t("analyze")(df.queryExecution.analyzed)
    t("optimize")(df.queryExecution.optimizedPlan)
    t("physical")(df.queryExecution.executedPlan)
    t("execute1")(df.count())
    t("execute2")(q.run(spark, sfDir).count())
    t("execute3")(q.run(spark, sfDir).count())
    spark.stop()
  }
}
