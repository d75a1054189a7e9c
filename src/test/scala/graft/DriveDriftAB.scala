package graft

/** Scratch: the standing interleaved one-JVM drift-adjudication
  * protocol (settled q74/q10 in r15/r17/r18 and q113/q142 in r19).
  * r20 subjects: q133_mor_dml_chain_sql (official warm 9.73 s vs r18
  * committed prior 4.49) and q132_manifest_relation_sql (4.07 vs
  * 1.94) — the only >2x multi-second drifts on the r19 board — with
  * q74_decontamination as the untouched CONTROL: uniform inflation
  * across subjects AND control = ambient; subject-only inflation
  * under quiet load = a code cause needing a bisect. Alternate rep by
  * rep (never back-to-back blocks — invisible neighbors poison
  * isolated runs at random), 6 reps, per-rep load stamps, compare
  * MINS against the prior band. Subjects override via args. */
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
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q133_mor_dml_chain_sql", "q132_manifest_relation_sql", "q74_decontamination")
    val subjects = names.map(q)
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
