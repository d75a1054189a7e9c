package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot is callable from SQL text via session extensions") {
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vt")
    val r = spark.sql("SELECT vec_dot(a, b) AS d FROM vt").head.getDouble(0)
    assert(r == 11.0)
  }

  test("vec_norm and vec_cosine compose codegen'd expressions in SQL") {
    Seq((Array(3.0f, 4.0f), Array(3.0f, 4.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vt2")
    val rows = spark.sql("SELECT vec_norm(a) AS n, vec_cosine(a, b) AS c FROM vt2")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows(0) == ((5.0, 1.0))) // |(3,4)| = 5, cos(v,v) = 1
    assert(rows(1) == ((1.0, 0.0))) // orthogonal
  }
}
