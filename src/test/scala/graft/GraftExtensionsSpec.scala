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

  test("graft_* text functions are callable from SQL and match the Column API") {
    import graft.functions.TextFunctions
    Seq(
      (1L, "the cat is on the mat and it is a very nice mat indeed today"),
      (2L, "der hund ist im haus und die katze ist auch da mit der maus")
    ).toDF("id", "text").createOrReplaceTempView("tt")
    val viaSql = spark.sql(
      """SELECT id, graft_lang_id(text) AS lang, graft_token_count(text) AS n,
         graft_normalize_text(text) AS norm, graft_quality_score(text) AS q,
         graft_stopword_ratio(text) AS sr FROM tt ORDER BY id""").collect()
    val viaApi = spark.table("tt").select($"id", TextFunctions.langId($"text"),
      TextFunctions.tokenCount($"text"), TextFunctions.normalizeText($"text"),
      TextFunctions.qualityScore($"text"), TextFunctions.stopwordRatio($"text"))
      .orderBy($"id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
    assert(viaSql(0).getString(1) == "en")
    assert(viaSql(1).getString(1) == "de")
  }
}
