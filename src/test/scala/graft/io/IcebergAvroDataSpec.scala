package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro DATA files in foreign Iceberg tables ([[IcebergAvroData]] +
  * [[IcebergAppend.addFiles]]): the spec allows `file_format=AVRO` for
  * data files and Flink-style writers produce them — the import now
  * reads them (per-file format dispatch) instead of refusing. Pins:
  *
  *  - typed round-trip through a MIXED parquet+avro table: int, long,
  *    string, double, boolean, date, timestamp, decimal, binary
  *  - field-id resolution: an avro file written under OLD column names
  *    still reads under the table's RENAMED schema (ids, not names)
  *  - row-level deletes apply to avro rows: equality deletes AND
  *    position deletes (the avro decoder's per-row (file, pos) is the
  *    spec's position coordinate)
  *  - the incremental append scan ranges over avro-added snapshots
  *  - honest refusals: ORC at addFiles, partitioned-spec addFiles */
class IcebergAvroDataSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-iceavro-$tag").toString

  /** Export a (id BIGINT, v STRING, price DOUBLE) table with the even
    * rows; returns its dir. Field ids are 1,2,3 in column order. */
  private def exported(tag: String): String = {
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable(Seq((2L, "b", 2.5), (4L, "d", 4.5)).toDF("id", "v", "price"), "t")
    val dest = tmp(s"$tag-ice")
    IcebergExport.export(st, "t", dest)
    dest
  }

  test("mixed parquet+avro table: typed round-trip, one unioned read") {
    val dest = exported("mix")
    val avroPath = tmp("mix-data") + "/add-1.avro"
    val n = IcebergAvroData.writeDataFile(spark,
      Seq((1L, "a", 1.5), (3L, "c", 3.5)).toDF("id", "v", "price"), avroPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    assert(n == 2)
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO")
    val got = IcebergImport.read(spark, dest)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted
    assert(got == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5), (4L, "d", 4.5)))
    // the files metadata table reports the adopted avro file's rows
    val files = IcebergImport.filesRelation(spark, dest)
      .filter(col("file_path").endsWith(".avro")).collect()
    assert(files.length == 1 && files.head.getAs[Long]("record_count") == 2L)
  }

  test("every supported type decodes per the spec's avro mapping") {
    val root = tmp("typ-snap"); val st = new SnapshotTables(spark, root)
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, 7, true, 1.25f, 2.5,
          java.sql.Date.valueOf("2026-01-15"),
          java.sql.Timestamp.valueOf("2026-01-15 10:30:00.123456"),
          new java.math.BigDecimal("12345.67"),
          Array[Byte](1, 2, 3), "x")),
      StructType(Seq(
        StructField("k", LongType), StructField("i", IntegerType),
        StructField("b", BooleanType), StructField("f", FloatType),
        StructField("d", DoubleType), StructField("dt", DateType),
        StructField("ts", TimestampType), StructField("dec", DecimalType(18, 2)),
        StructField("bin", BinaryType), StructField("s", StringType))))
    st.overwriteTable(df, "t")
    val dest = tmp("typ-ice")
    IcebergExport.export(st, "t", dest)
    val avroPath = tmp("typ-data") + "/add-1.avro"
    val df2 = df.withColumn("k", lit(2L))
    IcebergAvroData.writeDataFile(spark, df2, avroPath,
      df.columns.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap)
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO")
    val rows = IcebergImport.read(spark, dest).orderBy("k").collect()
    assert(rows.length == 2)
    val (p, a) = (rows(0), rows(1)) // k=1 parquet, k=2 avro
    (1 until p.length).foreach { i =>
      (p.get(i), a.get(i)) match {
        case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y), s"col $i")
        case (x, y) => assert(x == y, s"col $i: $x vs $y")
      }
    }
  }

  test("field-id resolution survives a rename after the avro file landed") {
    val dest = exported("ren")
    val avroPath = tmp("ren-data") + "/add-1.avro"
    IcebergAvroData.writeDataFile(spark,
      Seq((1L, "a", 1.5)).toDF("id", "v", "price"), avroPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO")
    IcebergEvolve.renameColumn(spark, dest, "price", "unit_price")
    val got = IcebergImport.read(spark, dest)
      .select("id", "unit_price")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(got == Seq((1L, 1.5), (2L, 2.5), (4L, 4.5)))
  }

  test("equality and position deletes apply to avro rows") {
    val dest = exported("del")
    val avroPath = tmp("del-data") + "/add-1.avro"
    IcebergAvroData.writeDataFile(spark,
      Seq((1L, "a", 1.5), (3L, "c", 3.5), (5L, "e", 5.5)).toDF("id", "v", "price"), avroPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO")
    IcebergDml.deleteWhere(spark, dest, "id = 3") // equality delete
    IcebergDml.deleteWhere(spark, dest, "price > 4.0", strategy = "position") // hits 4 (parquet) and 5 (avro)
    val got = IcebergImport.read(spark, dest)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 2L))
  }

  test("incremental append scan ranges over an avro-added snapshot") {
    val dest = exported("inc") // snap 1
    val avroPath = tmp("inc-data") + "/add-1.avro"
    IcebergAvroData.writeDataFile(spark,
      Seq((1L, "a", 1.5)).toDF("id", "v", "price"), avroPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO") // snap 2
    val got = IcebergImport.appendsBetween(spark, dest, Some(1L))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("addFiles refuses a path the current snapshot already references") {
    val dest = exported("dup")
    val avroPath = tmp("dup-data") + "/add-1.avro"
    IcebergAvroData.writeDataFile(spark,
      Seq((1L, "a", 1.5)).toDF("id", "v", "price"), avroPath,
      Map("id" -> 1, "v" -> 2, "price" -> 3))
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO")
    // adopting it again would double-count its rows on every read
    val e = intercept[IllegalArgumentException] {
      IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO")
    }
    assert(e.getMessage.contains("already referenced"))
    assert(IcebergImport.read(spark, dest).count() == 3) // 2 exported + 1 adopted, once
    // the explicit escape hatch still exists (mirrors the reference
    // procedure's check_duplicate_files=false)
    IcebergAppend.addFiles(spark, dest, Seq(avroPath), format = "AVRO",
      checkDuplicateFiles = false)
    assert(IcebergImport.read(spark, dest).count() == 4)
  }

  test("honest refusals: unknown format, partitioned default spec") {
    val dest = exported("ref")
    val e1 = intercept[IllegalArgumentException] {
      IcebergAppend.addFiles(spark, dest, Seq("/nope.csv"), format = "CSV")
    }
    assert(e1.getMessage.contains("PARQUET, ORC and AVRO"))
    // identity-partitioned adoption (r18) derives values from col=value
    // paths — a file OUTSIDE that layout refuses rather than guessing
    val root = tmp("part-snap"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1L, "a", "x")).toDF("id", "v", "p"), "t",
      partitionCols = Seq("p"))
    val pdest = tmp("part-ice")
    IcebergExport.export(st, "t", pdest)
    val avroPath = tmp("part-data") + "/stray.avro"
    IcebergAvroData.writeDataFile(spark,
      Seq((2L, "b", "y")).toDF("id", "v", "p"), avroPath,
      Map("id" -> 1, "v" -> 2, "p" -> 3))
    val e2 = intercept[IllegalArgumentException] {
      IcebergAppend.addFiles(spark, pdest, Seq(avroPath), format = "AVRO")
    }
    assert(e2.getMessage.contains("path component"))
  }
}
