package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Prints ONE compact JSON line (the driver
  * machine-parses it from the tail of the build log, so the line must
  * stay well under ~1.8 KB — round-1's full-precision line was longer
  * than the captured tail and failed to parse) and writes the
  * full-precision per-query detail to BENCH_DETAIL.json.
  *
  * A query that throws is recorded as -1 so a broken query can never
  * masquerade as a fast one.
  */
object Bench {
  private def r3(v: Double): Double = math.rint(v * 1000) / 1000
  private def jmap(kvs: Seq[(String, Double)]): String =
    kvs.map { case (k, v) => s""""$k":${r3(v)}""" }.mkString("{", ",", "}")

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

    def time(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }

    val results = graft.queries.Corpus.all.map(q => q.name -> time(q))
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.filter(_._2 < 0).map(_._1)
    // Second pass over the headline queries: cold numbers above include
    // per-plan codegen+JIT (~0.5-1 s each at sf0.1); warm numbers show
    // steady-state engine throughput.
    val warm = graft.queries.Corpus.headlines.map(q => q.name -> time(q))

    val detail =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(results)},""" +
        s""""warm_headline":${jmap(warm)},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"sf":"$sfDir"}"""
    try Files.write(Paths.get("BENCH_DETAIL.json"), detail.getBytes(StandardCharsets.UTF_8))
    catch { case _: Throwable => () }

    // Official line, printed LAST: the driver captures only the final
    // ~2000 chars of output, so if the all-queries map would risk
    // truncation, fall back to the headline subset (full detail is in
    // BENCH_DETAIL.json either way).
    def official(qs: Seq[(String, Double)]): String =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(qs)},""" +
        s""""warm_headline":${jmap(warm)},"failed":${failed.length},"sf":"$sfDir"}"""
    // budget: 2000-char tail minus ~75 for sbt's trailing [success] line
    val full = official(results)
    println(if (full.length <= 1850) full else official(warm.map { case (k, _) => k -> results.toMap.apply(k) }))
    spark.stop()
  }
}
