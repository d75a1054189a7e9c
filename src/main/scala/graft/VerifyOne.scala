package graft

import java.nio.file.{Files, Paths}

/** Dev sibling of [[Verify]]: dump only the NAMED corpus queries (plus
  * the matching oracle_sql.json subset) so a single new query can be
  * oracle-checked in seconds with tools/check_oracle.py instead of
  * re-running the whole corpus.
  *
  * {{{ sbt "runMain graft.VerifyOne /root/testdata/sf0.01 /tmp/v1 q112_semantic_dedup" }}}
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = graft.core.GraftSession.local("graft-verify-one")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
