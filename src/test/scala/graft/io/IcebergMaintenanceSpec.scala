package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IcebergMaintenance]] — compaction (REPLACE snapshot folding in
  * row-level deletes) and snapshot expiry with orphan inventory, on
  * foreign Iceberg v2 layouts. */
class IcebergMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  /** An exported table with MOR deletes + a foreign append — the
    * debt-carrying shape maintenance exists for. */
  private def debtTable(): (String, Set[(Long, Double)]) = {
    val root = java.nio.file.Files.createTempDirectory("graft-maint-snap").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1L to 8L).map(i => (i, i * 10.0)).toDF("k", "x"), "tab")
    t.deleteKeysMor("tab", Seq(2L, 4L).toDF("k"))
    val dest = java.nio.file.Files.createTempDirectory("graft-maint-ice").toString
    IcebergExport.export(t, "tab", dest)
    IcebergAppend.append(spark, dest, Seq((9L, 90.0), (10L, 100.0)).toDF("k", "x"))
    val expect = ((1L to 8L).filterNot(Set(2L, 4L)).map(i => (i, i * 10.0)) ++
      Seq((9L, 90.0), (10L, 100.0))).toSet
    (dest, expect)
  }

  test("compact folds deletes into a REPLACE snapshot; history stays time-travelable") {
    val (dest, expect) = debtTable()
    val before = IcebergImport.snapshots(spark, dest)
    val filesBefore = IcebergImport.dataFiles(spark, dest).size
    assert(IcebergImport.deleteFiles(spark, dest).nonEmpty)

    val snap = IcebergMaintenance.compact(spark, dest, targetFiles = 1)
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet == expect)
    // one data file, zero delete files planned from the new snapshot on
    assert(IcebergImport.dataFiles(spark, dest).size == 1)
    assert(IcebergImport.dataFiles(spark, dest).size < filesBefore)
    assert(IcebergImport.deleteFiles(spark, dest).isEmpty)
    // the pre-compaction head still reads exactly (deletes re-applied)
    assert(IcebergImport.read(spark, dest, Some(before.max))
      .as[(Long, Double)].collect().toSet == expect)
    // the commit is a spec "replace" snapshot
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val md = om.readTree(java.nio.file.Files.readString(IcebergTestSplice.mdFile(metaDir, hint)))
    val sn = (0 until md.get("snapshots").size).map(md.get("snapshots").get)
      .find(_.get("snapshot-id").asLong == snap).get
    assert(sn.get("summary").get("operation").asText == "replace")
  }

  test("expireSnapshots: retained head intact, orphans inventoried then removed") {
    val (dest, expect) = debtTable()
    val preSnaps = IcebergImport.snapshots(spark, dest)
    IcebergMaintenance.compact(spark, dest, targetFiles = 1)

    // inventory only: nothing deleted yet, orphans include the old
    // data files, the MOR delete file, and superseded manifests
    val inventory = IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1)
    assert(inventory.nonEmpty)
    inventory.foreach(p => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(p.stripPrefix("file:"))), p))
    assert(inventory.exists(_.contains("/data/")), "old data files must be orphans")

    // expired snapshots are gone from the surface
    assert(IcebergImport.snapshots(spark, dest).size == 1)
    val e = intercept[IllegalArgumentException](
      IcebergImport.read(spark, dest, Some(preSnaps.max)).collect())
    assert(e.getMessage.contains("not found"))

    // destructive pass: orphans removed, the head still reads exactly
    val removed = IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1,
      removeOrphans = true)
    removed.foreach(p => assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(p.stripPrefix("file:"))), p))
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet == expect)
    // and the files surface agrees: one data file, nothing else
    assert(IcebergImport.dataFiles(spark, dest).size == 1)
    assert(IcebergImport.deleteFiles(spark, dest).isEmpty)
  }

  test("SQL CALL faces: evolution + maintenance on a foreign dir through the catalog mount") {
    spark.conf.set("spark.sql.catalog.icemaint",
      classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.icemaint.root",
      java.nio.file.Files.createTempDirectory("graft-maint-cat").toString)
    val (dest, expect) = debtTable()
    val v1 = spark.sql(s"CALL icemaint.system.iceberg_rename_column('$dest', 'x', 'price')")
      .collect().head.getInt(0)
    val v2 = spark.sql(s"CALL icemaint.system.iceberg_add_column('$dest', 'note', 'string')")
      .collect().head.getInt(0)
    assert(v2 == v1 + 1)
    // append new rows from a SQL QUERY through the CALL face
    val appSnap = spark.sql(s"""CALL icemaint.system.iceberg_append('$dest',
      'SELECT CAST(100 AS BIGINT) AS k, CAST(0.25 AS DOUBLE) AS price,
        CAST(NULL AS STRING) AS note')""").collect().head.getLong(0)
    assert(appSnap > 0)
    val snap = spark.sql(s"CALL icemaint.system.iceberg_compact('$dest', 1)")
      .collect().head.getLong(0)
    assert(snap > appSnap)
    val exp = spark.sql(
      s"CALL icemaint.system.iceberg_expire_snapshots('$dest', 1, true)").collect().head
    assert(exp.getInt(0) > 0 && exp.getInt(1) == exp.getInt(0))
    val out = IcebergImport.read(spark, dest)
    assert(out.columns.toSeq == Seq("k", "price", "note"))
    assert(out.select("k", "price").as[(Long, Double)].collect().toSet ==
      expect + ((100L, 0.25)))
    assert(IcebergImport.dataFiles(spark, dest).size == 1)
  }

  test("maintenance interplay: compact after evolution keeps the evolved names") {
    val root = java.nio.file.Files.createTempDirectory("graft-maint-evo").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-maint-evo-ice").toString
    IcebergExport.export(t, "tab", dest)
    IcebergEvolve.renameColumn(spark, dest, "v", "label")
    IcebergMaintenance.compact(spark, dest, targetFiles = 1)
    // compacted files are written under the CURRENT name with field
    // ids — the name-mapping is no longer needed for the head
    val out = IcebergImport.read(spark, dest)
    assert(out.columns.toSeq == Seq("k", "label"))
    assert(out.as[(Long, String)].collect().toSet == (1L to 4L).map(i => (i, s"v$i")).toSet)
    IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1, removeOrphans = true)
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      (1L to 4L).map(i => (i, s"v$i")).toSet)
  }
}
