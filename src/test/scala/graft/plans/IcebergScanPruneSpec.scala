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

  test("bucket-partitioned layouts prune point lookups by the murmur3 partition value") {
    val root = java.nio.file.Files.createTempDirectory("graft-iprune-b").toString
    val t = new SnapshotTables(spark, root)
    // bucket-scatter: every file's id RANGE is wide (bounds can't
    // prune a point lookup), only the bucket value can
    t.overwriteTableTransformed(
      (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1), "tab",
      Seq(SnapshotTables.PartitionTransform.bucketMurmur3(8, "id")))
    val dest = java.nio.file.Files.createTempDirectory("graft-iprune-b-out").toString
    IcebergExport.export(t, "tab", dest)
    val total = IcebergImport.dataFiles(spark, dest).length
    assert(total == 8, s"expected 8 bucket files, got $total")
    val q = spark.sql(s"SELECT v FROM graft_iceberg_scan('$dest') WHERE id = 777")
    assert(scannedFiles(q) == 1, "only bucket(777)'s file may be planned")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("v777"))
    // an IN list across several buckets keeps exactly those buckets
    val in = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest') WHERE id IN (10, 20, 30)")
    val expectBuckets = Seq(10L, 20L, 30L)
      .map(v => graft.functions.IcebergMurmur3.bucket(
        graft.functions.IcebergMurmur3.hashLong(v), 8)).distinct.size
    assert(scannedFiles(in) == expectBuckets)
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 20L, 30L))
  }

  test("identity-partitioned (Hive-discovery) layouts prune by partition value") {
    val root = java.nio.file.Files.createTempDirectory("graft-iprune-id").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 300).map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "v", "b"),
      "tab", partitionCols = Seq("b"))
    val dest = java.nio.file.Files.createTempDirectory("graft-iprune-id-out").toString
    IcebergExport.export(t, "tab", dest)
    val total = IcebergImport.dataFiles(spark, dest).length
    assert(total >= 3)
    val q = spark.sql(s"SELECT id FROM graft_iceberg_scan('$dest') WHERE b = 1 AND id <= 50")
    assert(scannedFiles(q) < total, "partition-value probe must prune the other partitions")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (1 to 50).filter(_ % 3 == 1).map(_.toLong))
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
