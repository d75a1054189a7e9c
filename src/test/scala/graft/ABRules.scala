package graft

/** Scratch A/B driver (round 14, VERDICT ask #2): do the round-13
  * planner rules (ScanPruneRule / MetadataAggRule — they run on every
  * optimize pass) cost measurable time on NON-snapshot queries, or was
  * the +19 % warm drift ambient load? Interleaved in ONE JVM per the
  * bench-ambient-load protocol: both sides warmed, then rules-on /
  * rules-off alternating per rep (order flipped each rep), min-of-3.
  */
object ABRules {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("ab-rules", Runtime.getRuntime.availableProcessors)
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q01_pricing_summary", "q31_minhash_signatures",
      "q32_lsh_candidate_pairs", "q71_neardup_clusters", "q81_curate_recipe")
    val byName = graft.queries.Corpus.all.map(q => q.name -> q).toMap
    def setRules(on: Boolean): Unit = {
      spark.conf.set("graft.scan.manifestPruning", on.toString)
      spark.conf.set("graft.scan.metadataAggregates", on.toString)
    }
    // warm both sides (plan compile + JIT) before any timing
    names.foreach { n =>
      setRules(true); byName(n).run(spark, sfDir).count()
      setRules(false); byName(n).run(spark, sfDir).count()
    }
    val res = scala.collection.mutable.Map.empty[(String, Boolean), List[Double]]
    for (rep <- 1 to 3; n <- names; side <- if (rep % 2 == 0) Seq(true, false) else Seq(false, true)) {
      setRules(side)
      val t0 = System.nanoTime()
      byName(n).run(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      res((n, side)) = s :: res.getOrElse((n, side), Nil)
    }
    names.foreach { n =>
      val on = res((n, true)).min
      val off = res((n, false)).min
      println(f"ABRULES $n on=$on%.3f off=$off%.3f delta=${(on - off) / off * 100}%+.1f%%")
    }
    spark.stop()
  }
}
