package graft

/** Multi-JVM smoke (SCALE_r15): every number on record before r15 came
  * from one JVM (`local[32]`), which structurally cannot catch
  * closure-serialization or driver-state assumptions (executor-side
  * `@transient lazy val` singletons, non-serializable captures).
  * `local-cluster[2,8,4096]` launches two REAL executor JVMs over the
  * standalone scheduler; the full oracle corpus runs against it and
  * every query must produce rows without serialization failures.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.DriveLocalCluster"
  */
object DriveLocalCluster {
  def main(args: Array[String]): Unit = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = graft.core.GraftSession.builder("graft-local-cluster", 16)
      .master("local-cluster[2,8,4096]")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = SparkEntry.queries.keys.toSeq.sorted
    var ok, failed = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    names.foreach { n =>
      val t0 = System.nanoTime
      try {
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        ok += 1
        println(f"OK   $n rows=$rows t=${(System.nanoTime - t0) / 1e9}%.2f")
      } catch {
        case e: Throwable =>
          failed += 1
          val root = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          failures += (n -> s"${root.getClass.getSimpleName}: ${String.valueOf(root.getMessage).take(160)}")
          println(s"FAIL $n ${failures.last._2}")
      }
    }
    println(s"SUMMARY ok=$ok failed=$failed executors=real-multi-jvm sf=$sfDir")
    failures.foreach { case (n, m) => println(s"FAILED $n :: $m") }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
