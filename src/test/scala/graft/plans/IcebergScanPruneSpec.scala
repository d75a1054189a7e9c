package graft.plans

import graft.SparkSpec
import graft.io.{IcebergExport, IcebergImport, SnapshotTables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Manifest file skipping on the IMPORT path ([[IcebergScanPruneRule]]):
  * a selective predicate over `graft_iceberg_scan` must open only the
  * files whose manifest bounds allow a match — planning-time skipping,
  * not footer-time. */
class IcebergScanPruneSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.length
        case _ => 0
      }
    }.sum

  /** Export ids 1..4000 as 4 range-disjoint files (+ a second segment
    * of 4 more); returns the export dir. */
  private def exported(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-iprune").toString
    val t = new SnapshotTables(spark, root)
    val df = (1 to 4000).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "m")
    t.overwriteTable(df.repartitionByRange(4, col("id")), "tab")
    t.append((4001 to 8000).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "m")
      .repartitionByRange(4, col("id")), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-iprune-out").toString
    IcebergExport.export(t, "tab", dest)
    dest
  }

  test("range predicate prunes files at planning time; rows stay exact") {
    val dest = exported()
    val all = spark.sql(s"SELECT * FROM graft_iceberg_scan('$dest')")
    val total = IcebergImport.dataFiles(spark, dest).length
    assert(total == 8, s"fixture should export 8 data files, got $total")

    val q = spark.sql(s"SELECT id, v FROM graft_iceberg_scan('$dest') WHERE id <= 900")
    assert(scannedFiles(q) < total, s"expected pruning below $total files")
    assert(scannedFiles(q) <= 2, s"id<=900 lives in the first range file per segment")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (1L to 900L))

    // equality probe prunes to one file per segment
    val eq = spark.sql(s"SELECT v FROM graft_iceberg_scan('$dest') WHERE id = 4500")
    assert(scannedFiles(eq) <= 1)
    assert(eq.collect().map(_.getString(0)).toSeq == Seq("v4500"))

    // an impossible predicate prunes EVERYTHING (empty LocalRelation)
    val none = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest') WHERE id > 1000000")
    assert(scannedFiles(none) == 0)
    assert(none.count() == 0)
  }

  test("kill switch restores the full scan; untracked shapes untouched") {
    val dest = exported()
    spark.conf.set("graft.iceberg.manifestPruning", "false")
    try {
      val q = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest') WHERE id <= 900")
      assert(scannedFiles(q) == 8)
      assert(q.count() == 900)
    } finally spark.conf.unset("graft.iceberg.manifestPruning")
    // a non-prunable predicate shape (expression over the column)
    val expr = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest') WHERE id % 1000 = 1")
    assert(scannedFiles(expr) == 8, "no provable skip -> untouched plan")
    assert(expr.count() == 8)
  }

  test("string bounds prune; results exact under a mixed conjunction") {
    val root = java.nio.file.Files.createTempDirectory("graft-iprune-s").toString
    val t = new SnapshotTables(spark, root)
    // two files with disjoint name prefixes
    val a = (1 to 500).map(i => (i.toLong, f"aaa$i%04d")).toDF("id", "name").coalesce(1)
    val b = (501 to 1000).map(i => (i.toLong, f"zzz$i%04d")).toDF("id", "name").coalesce(1)
    t.overwriteTable(a, "tab"); t.append(b, "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-iprune-s-out").toString
    IcebergExport.export(t, "tab", dest)
    val q = spark.sql(
      s"SELECT id FROM graft_iceberg_scan('$dest') WHERE name >= 'zzz' AND id >= 990")
    assert(scannedFiles(q) == 1, "the aaa-file must be skipped on string bounds")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (990L to 1000L))
  }

  test("snapshot-pinned scans prune against their own snapshot") {
    val dest = exported()
    val q = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest', 1) WHERE id <= 900")
    assert(scannedFiles(q) <= 1, "snapshot 1 has 4 files; only its first range survives")
    assert(q.count() == 900)
    // snapshot 1 predates ids > 4000 entirely
    val gone = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest', 1) WHERE id > 4000")
    assert(gone.count() == 0)
  }
}
