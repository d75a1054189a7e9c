package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** Property tests (SURVEY §5.4): conformance output schema equals the
  * spec for ARBITRARY input schemas, and conformance is idempotent.
  * Schema assertions only need Catalyst analysis — no jobs run — so
  * hundreds of cases stay cheap. */
class ConformPropertySpec extends SparkSpec {

  private def sample[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  private val typeStrings =
    Seq("int", "integer", "long", "bigint", "bool", "boolean", "double", "float",
      "decimal", "real", "money", "currency", "datetime", "timestamp", "date",
      "string", "mystery_type")

  private val inputTypes: Seq[DataType] =
    Seq(StringType, IntegerType, LongType, DoubleType, BooleanType, DateType, TimestampType)

  private val namePool = ('a' to 'l').map(c => s"c_$c")

  private val genSpec: Gen[Seq[ColumnSpec]] = for {
    n <- Gen.choose(1, 8)
    names <- Gen.pick(n, namePool)
    types <- Gen.listOfN(n, Gen.oneOf(typeStrings))
    orders <- Gen.pick(n, 0 until 50)
    hash <- Gen.oneOf(true, false) // sprinkle a '#'-prefixed describe row
  } yield {
    val cols = names.toSeq.zip(types).zip(orders.toSeq).map { case ((nm, t), o) => ColumnSpec(nm, t, o) }
    if (hash) cols :+ ColumnSpec("# Partition Information", "string", 99) else cols
  }

  private val genInputSchema: Gen[StructType] = for {
    n <- Gen.choose(0, 10)
    names <- Gen.pick(n, namePool ++ Seq("extra_1", "extra_2", "extra_3"))
    types <- Gen.listOfN(n, Gen.oneOf(inputTypes))
  } yield StructType(names.toSeq.zip(types).map { case (nm, t) => StructField(nm, t) })

  private def emptyDf(schema: StructType) =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  test("conformed schema == cleaned spec schema, for arbitrary input schemas") {
    for (_ <- 1 to 200) {
      val spec = sample(genSpec)
      val in = emptyDf(sample(genInputSchema))
      val out = Conform(in, spec)
      val expected = Schema.clean(spec).sortBy(_.order).map(c => (c.name, c.sparkType))
      assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq == expected)
      assert(!out.columns.exists(_.startsWith("#")))
    }
  }

  test("conformance is idempotent on schema for arbitrary inputs") {
    for (_ <- 1 to 100) {
      val spec = sample(genSpec)
      val once = Conform(emptyDf(sample(genInputSchema)), spec)
      val twice = Conform(once, spec)
      assert(twice.schema == once.schema)
    }
  }

  test("conformance never reads columns outside the spec (pruned scan)") {
    // analyzed plan of conform-over-parquet must not reference extras
    val dir = java.nio.file.Files.createTempDirectory("conform-prune").toString
    import spark.implicits._
    Seq((1L, "x", 2.5, "drop_me")).toDF("c_a", "c_b", "c_c", "c_zz").write.mode("overwrite").parquet(dir)
    val spec = Seq(ColumnSpec("c_a", "long", 0), ColumnSpec("c_b", "string", 1))
    val out = Conform(spark.read.parquet(dir), spec)
    val scanned = out.queryExecution.executedPlan.collectLeaves().mkString
    assert(scanned.contains("c_a") && scanned.contains("c_b"))
    assert(!scanned.contains("c_zz"))
  }
}
