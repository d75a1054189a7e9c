package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hash32 matches md5-prefix reference value") {
    // md5('hello') = 5d41402a... ⇒ 0x5d41402a = 1564557354
    val v = Seq("hello").toDF("s").select(hash32($"s")).head.getLong(0)
    assert(v == 1564557354L)
  }

  test("wordShingles builds overlapping 3-grams, empty below width") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(wordShingles(tokens($"t")).as("sh")).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("occurrences counts non-overlapping hits") {
    val n = Seq("the cat and the dog and the bird").toDF("t")
      .select(occurrences(concat(lit(" "), $"t", lit(" ")), " the ").as("n"))
      .head.getInt(0)
    assert(n == 3)
  }

  test("langId picks dominant marker language, und when none fire") {
    val rows = Seq(
      "the cat and the dog went to the park of wonders",
      "el gato y la casa que los perros",
      "xyzzy plugh qwerty"
    ).toDF("t").select(langId($"t")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("en", "es", "und"))
  }

  test("token counts and quality score are sane") {
    val r = Seq("the quick brown fox jumps over the lazy dog and runs to the hills far away " * 3)
      .toDF("t")
      .select(
        tokenCount($"t").as("n"),
        size(tokensRegex($"t")).as("nr"),
        qualityScore($"t").as("q")
      ).head
    assert(r.getInt(0) > 40)
    assert(r.getInt(1) > 40)
    assert(r.getDouble(2) == 1.0) // good length, stopwords present, sane word length
  }
}
