package graft

/** Scratch: adjudicate q74_decontamination's r16 warm drift
  * (0.480 -> 0.921 s at load 1.81) with the repo's interleaved
  * one-JVM protocol: alternate q74 with its q89 bloom twin (control)
  * rep by rep, 6 reps each at the bench SF, per-rep load stamps.
  * Also prints which join side the broadcast gate planned. */
object DriveQ74AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.core.GraftSession.defaultCores
    val spark = graft.core.GraftSession.builder("q74-ab", cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def load(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val q74 = graft.queries.Corpus.all.find(_.name == "q74_decontamination").get
    val q89 = graft.queries.Corpus.all.find(_.name == "q89_decontamination_bloom").get
    def time(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime(); q.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
    }
    // plan check: which side did the gate pick?
    val plan = q74.run(spark, sfDir).queryExecution.executedPlan.toString
    println("PLAN broadcast=" + plan.contains("BroadcastHashJoin") +
      " shuffle=" + plan.contains("SortMergeJoin"))
    val a = scala.collection.mutable.ArrayBuffer[Double]()
    val b = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 6).foreach { i =>
      val la0 = load(); val ta = time(q74); val lb0 = load(); val tb = time(q89)
      a += ta; b += tb
      println(f"REP$i q74=$ta%.3f (load $la0%.2f)  q89=$tb%.3f (load $lb0%.2f)")
    }
    println(f"MIN q74=${a.min}%.3f q89=${b.min}%.3f  load_end=${load()}%.2f")
    spark.stop()
  }
}
