package graft

/** Interleaved one-JVM A/B of the rename vs direct commit layouts on
  * the fold/materialize spans — the adjudication protocol BASELINE.md
  * prescribes for BENCH_r14's pair break (minor_fold_direct 3.8x /
  * materialize_direct 3.2x vs r13 while the rename twins stayed flat).
  * Alternates layouts rep-by-rep so ambient load cannot land on one
  * side; compares minimums. */
object DriveFoldAB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("foldab", 16)
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val croot = java.nio.file.Files.createTempDirectory("foldab").toString
    val st = new graft.io.SnapshotTables(spark, croot)
    val slice = li.limit((li.count() / 100).toInt).localCheckpoint(true)
    val keys = li.select("l_orderkey").distinct().limit(100).localCheckpoint(true)
    def span(f: => Unit): Double = { val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
    def load(): Double = {
      val s = scala.io.Source.fromFile("/proc/loadavg"); try s.getLines().next().split(" ")(0).toDouble finally s.close()
    }
    val reps = 4
    val res = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to reps; layout <- Seq("rename", "direct")) {
      val tab = s"t_${layout}_$r"
      st.setCommitLayout(tab, Some(layout))
      st.overwriteTable(li, tab)
      st.append(slice, tab); st.deleteKeysMor(tab, keys)
      val f = span { st.compactDeltas(tab) }
      st.append(slice, tab); st.deleteKeysMor(tab, keys)
      val m = span { st.materialize(tab) }
      println(f"REP $r $layout%-6s fold=$f%.3f mat=$m%.3f load=${load()}%.2f")
      res(s"fold_$layout") ::= f; res(s"mat_$layout") ::= m
    }
    def mn(k: String) = res(k).min
    println(f"MIN fold rename=${mn("fold_rename")}%.3f direct=${mn("fold_direct")}%.3f ratio=${mn("fold_direct")/mn("fold_rename")}%.2f")
    println(f"MIN mat  rename=${mn("mat_rename")}%.3f direct=${mn("mat_direct")}%.3f ratio=${mn("mat_direct")/mn("mat_rename")}%.2f")
    spark.stop()
  }
}
