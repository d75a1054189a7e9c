package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._
class ConformSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val spec = Seq(
    ColumnSpec("a", "string", 1),
    ColumnSpec("b", "bigint", 2),
    ColumnSpec("c", "float", 3), // widens to double per reference quirk
    ColumnSpec("# partition info", "string", 99)
  )

  test("drops extra, adds missing as null, casts, reorders") {
    val df = spark.createDataFrame(
      List(org.apache.spark.sql.Row("x", "42", "not-a-number", "dropme")).asJava,
      StructType(Seq(
        StructField("c", StringType),
        StructField("extra", StringType),
        StructField("b", StringType),
        StructField("a", StringType)
      ))
    )
    // createDataFrame(rows) matches by position: c="x", extra="42", b="not-a-number", a="dropme"
    val out = Conform(df, spec)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.schema.fields.map(_.dataType).toSeq == Seq(StringType, LongType, DoubleType))
    val r = out.collect().head
    assert(r.getString(0) == "dropme")
    assert(r.isNullAt(1)) // "not-a-number" cast to bigint -> null
    assert(r.isNullAt(2)) // "x" cast to double -> null
  }

  test("driftReport classifies every conformance outcome without a scan") {
    val df = spark.createDataFrame(
      List.empty[org.apache.spark.sql.Row].asJava,
      StructType(Seq(
        StructField("a", StringType),            // exact
        StructField("b", StringType),            // cast -> bigint
        StructField("extra", StringType),        // dropped
        StructField("c", ArrayType(StringType))  // no ANSI cast to double -> nulled
      ))
    )
    val report = Conform.driftReport(df, spec).map(d => d.col_name -> d.status).toMap
    assert(report("a") == "exact")
    assert(report("b") == "cast")
    assert(report("c") == "incompatible_nulled")
    assert(report("extra") == "extra_dropped")
    assert(!report.contains("# partition info")) // describe hygiene applies
    val missing = Conform.driftReport(df.drop("b"), spec).find(_.col_name == "b").get
    assert(missing.status == "missing_in_input" && missing.spec_type == "BIGINT")
  }

  test("missing spec column appears as typed null") {
    val df = spark.createDataFrame(
      List(org.apache.spark.sql.Row("only-a")).asJava,
      StructType(Seq(StructField("a", StringType)))
    )
    val out = Conform(df, spec)
    assert(out.schema("b").dataType == LongType)
    assert(out.collect().head.isNullAt(1))
  }

  test("conformance is idempotent and output schema equals spec schema") {
    val universe = List("a", "b", "c", "z1", "z2")
    // exhaustive over all non-empty input-column subsets (31 cases)
    for (mask <- 1 until (1 << universe.length)) {
      val cols = universe.zipWithIndex.collect { case (n, i) if (mask & (1 << i)) != 0 => n }
      val df = spark.createDataFrame(
        List(org.apache.spark.sql.Row(cols.map(_ => "1"): _*)).asJava,
        StructType(cols.map(n => StructField(n, StringType)))
      )
      val once = Conform(df, spec)
      val twice = Conform(once, spec)
      assert(once.schema == Schema.toStructType(spec))
      assert(twice.schema == once.schema)
      assert(once.collect().toSeq == twice.collect().toSeq)
    }
  }

  test("partition stamp is a DATE column") {
    val df = spark.range(1).selectExpr("cast(id as string) as a")
    val out = Conform.withPartitionStamp(df, spec, "sys_file_date", java.time.LocalDate.parse("2024-05-01"))
    assert(out.schema("sys_file_date").dataType == DateType)
    assert(out.select("sys_file_date").collect().head.getDate(0).toString == "2024-05-01")
  }

  test("brewery spec: phone->bigint, longitude->double per reference") {
    val st = Schema.toStructType(Schema.brewerySpec)
    assert(st("phone").dataType == LongType)
    assert(st("longitude").dataType == DoubleType)
    assert(st.fields.length == 16)
  }
}
