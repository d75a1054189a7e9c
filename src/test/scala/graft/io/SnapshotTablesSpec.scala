package graft.io

import graft.SparkSpec

class SnapshotTablesSpec extends SparkSpec {
  import spark.implicits._

  private def newTables(retention: Int = 10) = {
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    new SnapshotTables(spark, root, previousVersionsMax = retention)
  }

  test("overwrite commits versions; read resolves the current pointer") {
    val t = newTables()
    t.overwriteTable(Seq((1, "a")).toDF("id", "v"), "tab")
    t.overwriteTable(Seq((2, "b"), (3, "c")).toDF("id", "v"), "tab")
    assert(t.currentVersion("tab") == 2)
    assert(t.read("tab").count() == 2)
    assert(t.read("tab").as[(Int, String)].collect().toSet == Set((2, "b"), (3, "c")))
  }

  test("time travel reads retained predecessors") {
    val t = newTables()
    t.overwriteTable(Seq((1, "a")).toDF("id", "v"), "tab")
    t.overwriteTable(Seq((2, "b")).toDF("id", "v"), "tab")
    assert(t.readVersion("tab", 1).as[(Int, String)].head() == ((1, "a")))
    assert(t.history("tab") == Seq(1, 2))
  }

  test("merge upserts by key as a new version; prior version still time-travels") {
    val t = newTables()
    t.overwriteTable(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), "tab")
    t.merge("tab", Seq((2, "B2"), (4, "d")).toDF("id", "v"), keyCols = Seq("id"))
    assert(t.currentVersion("tab") == 2)
    assert(t.read("tab").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B2"), (3, "c"), (4, "d"))) // 2 updated, 4 inserted, 1/3 untouched
    assert(t.readVersion("tab", 1).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "c")))
    // merge into an empty table = insert all
    t.merge("tab2", Seq((9, "z")).toDF("id", "v"), keyCols = Seq("id"))
    assert(t.read("tab2").as[(Int, String)].head() == ((9, "z")))
  }

  test("delete drops matching rows as a new version") {
    val t = newTables()
    t.overwriteTable(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), "tab")
    t.delete("tab", $"id" === 2)
    assert(t.currentVersion("tab") == 2)
    assert(t.read("tab").as[(Int, String)].collect().toSet == Set((1, "a"), (3, "c")))
    assert(t.readVersion("tab", 1).count() == 3) // purge is an auditable commit
  }

  test("retention expires snapshots beyond previousVersionsMax") {
    val t = newTables(retention = 2)
    (1 to 5).foreach(i => t.overwriteTable(Seq((i, s"v$i")).toDF("id", "v"), "tab"))
    // keep current (5) + 2 predecessors: 3, 4
    assert(t.history("tab") == Seq(3, 4, 5))
    assert(t.readVersion("tab", 3).count() == 1)
  }

  test("overwritePartitions replaces only incoming partitions, as a new full version") {
    val t = newTables()
    val day1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("d", "n")
    t.overwriteTable(day1, "tab", Seq("d"))
    val day2fix = Seq(("2024-01-02", 20L)).toDF("d", "n")
    t.overwritePartitions(day2fix, "tab", Seq("d"))
    assert(t.read("tab").select("d", "n").as[(String, Long)].collect().toSet ==
      Set(("2024-01-01", 1L), ("2024-01-02", 20L)))
    assert(t.currentVersion("tab") == 2) // full new version committed
  }

  test("compact rewrites the current snapshot into fewer files as a new version") {
    val t = newTables()
    // 32 shuffle partitions -> many small files in v1
    t.overwriteTable(spark.range(0, 10000).toDF("id").repartition(16), "tab")
    val before = t.read("tab").inputFiles.length
    t.compact("tab")
    assert(t.currentVersion("tab") == 2)
    assert(t.read("tab").inputFiles.length < before)
    assert(t.read("tab").count() == 10000)
    // prior version untouched
    assert(t.readVersion("tab", 1).count() == 10000)
  }

  test("partitioned snapshots prune on the partition column") {
    val t = newTables()
    t.overwriteTable(
      Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("d", "n"), "tab", Seq("d"))
    val plan = t.read("tab").filter($"d" === "2024-01-02")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-02"))
  }
}
