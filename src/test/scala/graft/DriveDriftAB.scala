package graft

/** Scratch: adjudicate the r18 q113/q142 warm drift (warm 4.90/4.27 at
  * loadavg 6.4/4.8 vs committed priors 2.39/2.06) with the repo's
  * interleaved one-JVM protocol: alternate q113, q142 and the q74
  * control rep by rep, 6 reps each at the bench SF, per-rep load
  * stamps, compare MINS against the prior band. The code paths of both
  * queries are untouched since r17 — if the quiet mins land back in
  * the prior band, the drift was ambient (the same verdict as q74/q10
  * in r15/r17/r18); if they hold at ~2x under quiet load, a code cause
  * exists and needs a bisect. */
object DriveDriftAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.core.GraftSession.defaultCores
    val spark = graft.core.GraftSession.builder("drift-ab", cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def load(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def q(n: String) = graft.queries.Corpus.all.find(_.name == n).get
    val subjects = Seq(q("q113_bloom_pruned_read"), q("q142_leakage_safe_split"),
      q("q74_decontamination"))
    def time(x: graft.queries.Q): Double = {
      val t0 = System.nanoTime(); x.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
    }
    subjects.foreach(time) // one warmup pass each (plan compile / JIT)
    val mins = scala.collection.mutable.Map.empty[String, Double]
    (1 to 6).foreach { i =>
      val line = subjects.map { x =>
        val la = load(); val t = time(x)
        mins(x.name) = math.min(mins.getOrElse(x.name, Double.MaxValue), t)
        f"${x.name.take(4)}=$t%.3f@$la%.1f"
      }.mkString("  ")
      println(s"REP$i $line")
    }
    println(mins.toSeq.sortBy(_._1).map { case (n, v) => f"MIN $n=$v%.3f" }.mkString("  "))
    println(f"LOAD_END=${load()}%.2f")
    spark.stop()
  }
}
