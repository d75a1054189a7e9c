package graft.io

import graft.SparkSpec
import graft.core.MapSafeSetOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Regression suite for the r14 map-typed MOR hole: `deleteWhereMor` /
  * `updateMor` used to COMMIT a `mor_patch` the chain resolver's
  * `exceptAll` could never analyze ("Cannot have map type columns in
  * DataFrame which calls set operations"), bricking the table head.
  * The fix canonicalizes maps to key-sorted entries arrays inside the
  * patch algebra ([[graft.core.MapSafeSetOps]]) — a commit must never
  * create a version the resolver cannot read back. Keyed MOR over a
  * map-typed KEY column stays a loud commit-time refusal (maps are not
  * comparable in joins). Mirrors Iceberg v2's own invariant that every
  * committed snapshot is readable
  * (/root/reference/spark/jobs/job_silver.py:174-178 relies on it).
  */
class MapTypedMorSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): (SnapshotTables, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-mor-map").toString
    (new SnapshotTables(spark, root), root)
  }

  private def seed(t: SnapshotTables): Unit =
    t.overwriteTable((1 to 10).map(i => (i.toLong, Map("k" -> s"v$i", "n" -> i.toString)))
      .toDF("id", "m"), "tab")

  test("deleteWhereMor over a map-typed column commits AND the head stays readable") {
    val (t, _) = fresh(); seed(t)
    t.deleteWhereMor("tab", col("id") === 3L)
    val rows = t.read("tab").as[(Long, Map[String, String])].collect().toMap
    assert(rows.keySet == (1 to 10).map(_.toLong).toSet - 3L)
    assert(rows(5L) == Map("k" -> "v5", "n" -> "5"))
    // materialize (fold) replays the same patch algebra
    t.materialize("tab")
    assert(t.read("tab").count() == 9)
  }

  test("updateMor over a map-typed column: old image out, new image in") {
    val (t, _) = fresh(); seed(t)
    t.updateMor("tab", Seq("m" -> map(lit("k"), lit("patched"))), col("id") === 7L)
    val rows = t.read("tab").as[(Long, Map[String, String])].collect().toMap
    assert(rows(7L) == Map("k" -> "patched"))
    assert(rows(6L) == Map("k" -> "v6", "n" -> "6"))
    assert(t.read("tab").count() == 10)
  }

  test("CDC diff across a map-typed patch version works (generic exceptAll path)") {
    val (t, _) = fresh(); seed(t)
    t.deleteWhereMor("tab", col("id") === 2L)
    val d = t.diff("tab", 1, 2).select("id", "__change").as[(Long, String)].collect().toSet
    assert(d == Set((2L, "delete")))
  }

  test("successive map-typed patches fold and resolve (delete then update)") {
    val (t, _) = fresh(); seed(t)
    t.deleteWhereMor("tab", col("id") <= 2L)
    t.updateMor("tab", Seq("m" -> map(lit("k"), lit("u"))), col("id") === 9L)
    val rows = t.read("tab").as[(Long, Map[String, String])].collect().toMap
    assert(rows.keySet == (3 to 10).map(_.toLong).toSet)
    assert(rows(9L) == Map("k" -> "u"))
  }

  test("keyed MOR on a map-typed KEY column refuses at commit time, table stays readable") {
    val (t, _) = fresh(); seed(t)
    val e1 = intercept[IllegalArgumentException](
      t.deleteKeysMor("tab", Seq(Map("k" -> "v3")).toDF("m")))
    assert(e1.getMessage.contains("map-typed"))
    val e2 = intercept[IllegalArgumentException](
      t.upsertMor("tab", Seq((99L, Map("k" -> "x"))).toDF("id", "m"), Seq("m")))
    assert(e2.getMessage.contains("map-typed"))
    assert(t.read("tab").count() == 10)
    assert(t.currentVersion("tab") == 1, "refusal must not commit a version")
  }

  test("MapSafeSetOps: order-insensitive map equality, multiplicity, nulls, nesting") {
    // entry order must not matter
    val a = Seq((1, Map("a" -> 1, "b" -> 2)), (1, Map("a" -> 1, "b" -> 2)), (2, Map("c" -> 3)))
      .toDF("id", "m")
    val b = Seq((1, Map("b" -> 2, "a" -> 1))).toDF("id", "m")
    val out = MapSafeSetOps.exceptAll(a, b).as[(Int, Map[String, Int])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, Map("a" -> 1, "b" -> 2)), (2, Map("c" -> 3))),
      "multiset: one of the two duplicate rows survives")
    // null maps and struct-nested maps
    val sa = Seq(
      (1, Option.empty[Map[String, Int]], Some((Map("x" -> 1), "s"))),
      (2, Some(Map("k" -> 9)), None))
      .toDF("id", "m", "st")
    val sb = Seq((2, Some(Map("k" -> 9)), Option.empty[(Map[String, Int], String)]))
      .toDF("id", "m", "st")
    val res = MapSafeSetOps.exceptAll(sa, sb).select("id").as[Int].collect().toSeq
    assert(res == Seq(1))
    // schema preserved exactly
    assert(MapSafeSetOps.exceptAll(sa, sb).schema == sa.schema)
  }

  test("Iceberg export of a map-typed patched table refuses with the typed message") {
    val (t, _) = fresh(); seed(t)
    t.deleteWhereMor("tab", col("id") === 3L)
    val e = intercept[IllegalArgumentException](IcebergExport.export(t, "tab",
      java.nio.file.Files.createTempDirectory("graft-mor-map-out").toString))
    assert(e.getMessage.contains("map-typed"))
  }
}
