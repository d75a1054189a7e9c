package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta-maintained aggregate ≡ from-scratch GROUP BY, across inserts,
  * updates (including rows that MOVE groups), deletes (including a
  * group dying entirely), and idempotent re-refresh. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def newTables() =
    new SnapshotTables(spark, java.nio.file.Files.createTempDirectory("graft-incagg").toString)

  private def recompute(t: SnapshotTables): Set[(String, Long, BigDecimal)] =
    t.read("src").groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"m".cast("decimal(28,10)")).as("sum_m"))
      .as[(String, Long, BigDecimal)].collect().toSet

  private def view(t: SnapshotTables): Set[(String, Long, BigDecimal)] =
    t.read("agg").select($"g", $"n", $"sum_m")
      .as[(String, Long, BigDecimal)].collect().toSet

  test("refresh bootstraps, then applies only deltas; always equals a recompute") {
    val t = newTables()
    // v1
    t.overwriteTable(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0)).toDF("id", "g", "m"), "src")
    assert(IncrementalAgg.refresh(t, "src", Seq("id"), "agg", Seq("g"), Seq("m")) == 1)
    assert(view(t) == recompute(t))
    // v2: insert (4), update in place (2: 20->25), group migration
    // (3: b->c), delete-by-absence (1), group b dies entirely
    t.overwriteTable(Seq((2L, "a", 25.0), (3L, "c", 5.0), (4L, "c", 7.0)).toDF("id", "g", "m"), "src")
    assert(IncrementalAgg.refresh(t, "src", Seq("id"), "agg", Seq("g"), Seq("m")) == 2)
    assert(view(t) == recompute(t))
    assert(!view(t).exists(_._1 == "b")) // dead group dropped, not zero-row
    // idempotent: same source version -> no new aggregate version
    val v = t.currentVersion("agg")
    assert(IncrementalAgg.refresh(t, "src", Seq("id"), "agg", Seq("g"), Seq("m")) == 2)
    assert(t.currentVersion("agg") == v)
    // v3: everything replaced at once — delta path still exact
    t.overwriteTable(Seq((5L, "z", 1.5), (6L, "z", 2.5), (7L, "a", 9.0)).toDF("id", "g", "m"), "src")
    IncrementalAgg.refresh(t, "src", Seq("id"), "agg", Seq("g"), Seq("m"))
    assert(view(t) == recompute(t))
  }

  test("a group column that is also a diff key maintains correctly") {
    val t = newTables()
    t.overwriteTable(Seq(("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 3L, 4.0)).toDF("g", "id", "m"), "src")
    IncrementalAgg.refresh(t, "src", Seq("g", "id"), "agg", Seq("g"), Seq("m"))
    t.overwriteTable(Seq(("a", 1L, 2.5), ("b", 3L, 4.0), ("c", 9L, 1.0)).toDF("g", "id", "m"), "src")
    IncrementalAgg.refresh(t, "src", Seq("g", "id"), "agg", Seq("g"), Seq("m"))
    assert(view(t) == recompute(t))
  }
}
