package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  test("codegen VecDot is bit-identical to the HOF left-fold form") {
    val df = Seq.tabulate(50)(i => (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 100 / 97.0f) - 0.5f)))
      .toDF("id", "v")
    val pairs = df.select($"id".as("a"), $"v".as("va"))
      .crossJoin(df.select($"id".as("b"), $"v".as("vb"))).filter($"a" < $"b").limit(500)
    val diff = pairs
      .select((VecDot($"va", $"vb") - hofDot($"va", $"vb")).as("d"))
      .agg(max(abs($"d"))).head.getDouble(0)
    assert(diff == 0.0) // bit-identical, not approximately equal
  }

  test("VecDot handles nulls and double arrays") {
    val r = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(VecDot($"a", $"b")).head.getDouble(0)
    assert(r == 11.0)
    val n = Seq((Option.empty[Array[Double]], Some(Array(1.0))))
      .toDF("a", "b").select(VecDot($"a", $"b")).head
    assert(n.isNullAt(0))
  }
}
