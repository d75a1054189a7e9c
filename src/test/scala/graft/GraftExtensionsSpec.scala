package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is callable from SQL text via session extensions") {
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vt")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM vt").head.getDouble(0)
    assert(r == 11.0)
  }
}
