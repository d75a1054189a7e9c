package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM, forked by sbt). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.local("graft-test", cores = 4)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
