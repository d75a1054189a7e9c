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

  test("auditAndPublish: failing audit blocks publish and keeps the branch; passing audit lands") {
    val root = java.nio.file.Files.createTempDirectory("graft-wapaudit").toString
    val t = new graft.io.SnapshotTables(spark, root)
    t.overwriteTable(Seq((1, "a")).toDF("id", "v"), "tab")
    t.createBranch("tab", "load")
    t.commitToBranch("tab", "load", Seq((2, "b"), (2, "b2")).toDF("id", "v")) // duplicate key
    val rules = Seq(Checks.Unique(Seq("id")), Checks.NotNull("id"))
    val blocked = Checks.auditAndPublish(t, "tab", "load", rules)
    assert(blocked.isLeft)
    val byRule = blocked.left.toOption.get.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byRule("unique(id)") == 2L)
    // nothing published, branch intact for fixing
    assert(t.currentVersion("tab") == 1)
    assert(t.branches("tab") == Seq("load"))
    // fix the batch on the branch, audit again: publishes
    t.commitToBranch("tab", "load", Seq((2, "b")).toDF("id", "v"))
    val landed = Checks.auditAndPublish(t, "tab", "load", rules)
    assert(landed == Right(2))
    assert(t.read("tab").as[(Int, String)].collect().toSet == Set((2, "b")))
    assert(t.branches("tab").isEmpty)
  }
}
