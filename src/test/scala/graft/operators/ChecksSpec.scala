package graft.operators

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def child = Seq(
    (Some(1), "a", 10),
    (Some(1), "b", 10), // duplicate id 1 (both rows count)
    (Some(2), "c", 99), // 99 not an accepted value; parent 99 missing
    (None, "d", 10)     // null id
  ).toDF("id", "v", "ref")

  private def parent = Seq(10, 11, 12).toDF("p")

  test("audit counts violations per rule; zero and non-zero outcomes coexist") {
    val out = Checks.audit(child, Seq(
      Checks.NotNull("id"),
      Checks.Unique(Seq("id")),
      Checks.AcceptedValues("ref", Seq(10, 11, 12)),
      Checks.ReferencedIn("ref", parent, "p")
    )).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null(id)") == 1L)
    assert(out("unique(id)") == 2L) // every row of the duplicated key
    assert(out("accepted_values(ref)") == 1L)
    assert(out("referenced_in(ref)") == 1L)
  }

  test("nulls never count against accepted_values or referential integrity") {
    val df = Seq((Some(10)), (None)).toDF("ref")
    val out = Checks.audit(df, Seq(
      Checks.AcceptedValues("ref", Seq(10)),
      Checks.ReferencedIn("ref", parent, "p")
    )).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ == 0L))
  }

  test("passes gates on the conjunction — the WAP audit step") {
    assert(!Checks.passes(child, Seq(Checks.NotNull("id"))))
    assert(Checks.passes(child.filter($"id".isNotNull), Seq(Checks.NotNull("id"))))
  }
}
