package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC data files in foreign Iceberg tables ([[IcebergOrcData]] +
  * format dispatch): the last spec-legal data format the bridge
  * refused. Pins:
  *
  *  - mixed parquet+ORC table reads as one union, columnar ORC path
  *  - BY-ID resolution: an ORC file's `iceberg.id` attributes survive
  *    a post-landing rename (ids, not names)
  *  - ID-LESS ORC files (Spark's own writer) resolve by name with
  *    null-fill for columns the file predates
  *  - equality deletes apply to ORC rows (file-sequence gating works
  *    through `_metadata.file_path`)
  *  - POSITION addressing of ORC rows refuses loudly: position-delete
  *    DML against a table with ORC files, and reads of snapshots
  *    combining position deletes with ORC data
  *  - the incremental append scan ranges over an ORC-added snapshot */
class IcebergOrcDataSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-iceorc-$tag").toString

  private def exported(tag: String): String = {
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable(Seq((2L, "b", 2.5), (4L, "d", 4.5)).toDF("id", "v", "price"), "t")
    val dest = tmp(s"$tag-ice")
    IcebergExport.export(st, "t", dest)
    dest
  }

  test("spec-legal promotions read; an incompatible physical type refuses, never NULLs") {
    // int where the table wants long: the spec's int→long promotion
    val ok = exported("promo-ok")
    val okPath = tmp("promo-data") + "/ok.orc"
    IcebergOrcData.writeDataFile(spark,
      Seq((1, "a", 1.5)).toDF("id", "v", "price"), okPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, ok, Seq(okPath), format = "ORC")
    assert(IcebergImport.read(spark, ok).filter(col("id") === 1L).count() == 1)
    // string where the table wants double: NOT a promotion — the read
    // refuses loudly instead of silently nulling every value
    val bad = exported("promo-bad")
    val badPath = tmp("promo-data2") + "/bad.orc"
    IcebergOrcData.writeDataFile(spark,
      Seq((5L, "e", "oops")).toDF("id", "v", "price"), badPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, bad, Seq(badPath), format = "ORC")
    val e = intercept[Exception] { IcebergImport.read(spark, bad).collect() }
    assert(e.getMessage.contains("not a spec-legal promotion"))
  }

  test("mixed parquet+ORC table: one unioned read, by-id resolution across a rename") {
    val dest = exported("mix")
    val orcPath = tmp("mix-data") + "/add-1.orc"
    val n = IcebergOrcData.writeDataFile(spark,
      Seq((1L, "a", 1.5), (3L, "c", 3.5)).toDF("id", "v", "price"), orcPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    assert(n == 2)
    IcebergAppend.addFiles(spark, dest, Seq(orcPath), format = "ORC")
    val got = IcebergImport.read(spark, dest)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted
    assert(got == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5), (4L, "d", 4.5)))
    // rename AFTER the ORC file landed: iceberg.id attributes resolve it
    IcebergEvolve.renameColumn(spark, dest, "price", "unit_price")
    val renamed = IcebergImport.read(spark, dest).select("id", "unit_price")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(renamed == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5), (4L, 4.5)))
    // files metadata table reports the adopted ORC file's rows
    val files = IcebergImport.filesRelation(spark, dest)
      .filter(col("file_path").endsWith(".orc")).collect()
    assert(files.length == 1 && files.head.getAs[Long]("record_count") == 2L)
  }

  test("id-less ORC files (Spark's writer) resolve by name; missing columns null-fill") {
    val dest = exported("plain")
    val orcDir = tmp("plain-data")
    // Spark's ORC writer: no iceberg.id attributes, and only 2 of the
    // 3 table columns (price predates this file)
    Seq((1L, "a")).toDF("id", "v").coalesce(1).write.mode("overwrite").orc(orcDir)
    val f = new java.io.File(orcDir).listFiles().find(_.getName.endsWith(".orc")).get
    IcebergAppend.addFiles(spark, dest, Seq(f.getAbsolutePath), format = "ORC")
    val got = IcebergImport.read(spark, dest)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1L, 2L, 4L))
    assert(got.head._3.isNaN) // the adopted file predates 'price'
  }

  test("equality deletes apply to ORC rows; position addressing refuses") {
    val dest = exported("del")
    val orcPath = tmp("del-data") + "/add-1.orc"
    IcebergOrcData.writeDataFile(spark,
      Seq((1L, "a", 1.5), (3L, "c", 3.5), (7L, "g", 7.5)).toDF("id", "v", "price"), orcPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, dest, Seq(orcPath), format = "ORC")
    IcebergDml.deleteWhere(spark, dest, "id = 3") // equality: hits the ORC row
    assert(IcebergImport.read(spark, dest).collect().map(_.getLong(0)).toSeq.sorted ==
      Seq(1L, 2L, 4L, 7L))
    // position-delete DML must refuse (it needs real row positions)
    val e = intercept[Exception] {
      IcebergDml.deleteWhere(spark, dest, "price > 7.0", strategy = "position")
    }
    assert(e.getMessage.contains("POSITION") || e.getMessage.contains("position"))
  }

  test("incremental append scan ranges over an ORC-added snapshot") {
    val dest = exported("inc") // snap 1
    val orcPath = tmp("inc-data") + "/add-1.orc"
    IcebergOrcData.writeDataFile(spark,
      Seq((9L, "z", 9.5)).toDF("id", "v", "price"), orcPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, dest, Seq(orcPath), format = "ORC") // snap 2
    val got = IcebergImport.appendsBetween(spark, dest, Some(1L))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L))
  }
}
