package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** v1-format and layout-edge compatibility of the jar-free Iceberg
  * bridge — the advisor-flagged interop holes:
  *  - export must write UNPADDED v<N>.metadata.json (HadoopTableOperations
  *    resolves version-hint.text to exactly that spelling);
  *  - v1 manifests carry NO sequence_number field, and the v1 spec
  *    assigns sequence 0 to every entry — EXISTING (status=0) entries
  *    included (routine after v1 manifest rewrites);
  *  - a snapshot with zero data files still reads as the TABLE's shape
  *    (metadata-schema-typed empty frame), so column references
  *    analyze;
  *  - an '=' in an ANCESTOR directory of the table root must not be
  *    mistaken for a Hive partition component.
  */
class IcebergV1CompatSpec extends SparkSpec {
  import spark.implicits._

  /** Real-v1-shaped manifest entry: no sequence_number, no content. */
  private val V1EntryAvro =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}
      |]}}
      |]}""".stripMargin

  private def writeV1Table(statuses: Seq[Int], withData: Boolean): String = {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = java.nio.file.Files.createTempDirectory("graft-ice-v1c").toString
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    java.nio.file.Files.createDirectories(metaDir)
    val dataFiles: Seq[String] =
      if (!withData) Nil
      else {
        val dd = s"$dir/data"
        Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
          .write.mode("overwrite").parquet(dd)
        new java.io.File(dd).listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      }
    val manifests: Seq[String] =
      if (dataFiles.isEmpty) Nil
      else {
        val schema = new org.apache.avro.Schema.Parser().parse(V1EntryAvro)
        val dfSchema = schema.getField("data_file").schema()
        val mPath = metaDir.resolve("m0.avro")
        val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setMeta("format-version", "1")
        w.create(schema, mPath.toFile)
        dataFiles.zip(statuses).foreach { case (f, st) =>
          val dfr = new GenericData.Record(dfSchema)
          dfr.put("file_path", f)
          dfr.put("file_format", "PARQUET")
          dfr.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
          dfr.put("record_count", 2L)
          dfr.put("file_size_in_bytes", java.nio.file.Files.size(java.nio.file.Paths.get(f)))
          val e = new GenericData.Record(schema)
          e.put("status", st)
          e.put("data_file", dfr)
          w.append(e)
        }
        w.close()
        Seq(mPath.toString)
      }
    val md =
      s"""{"format-version":1,"table-uuid":"00000000-0000-0000-0000-000000000001",
         |"location":"$dir","last-updated-ms":1,"last-column-id":2,
         |"schema":{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"id","required":false,"type":"long"},
         |{"id":2,"name":"v","required":false,"type":"string"}]},
         |"partition-spec":[],
         |"current-snapshot-id":1,
         |"snapshots":[{"snapshot-id":1,"timestamp-ms":1,
         |"manifests":[${manifests.map("\"" + _ + "\"").mkString(",")}]}]}""".stripMargin
    java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"), md)
    java.nio.file.Files.writeString(metaDir.resolve("version-hint.text"), "1")
    dir
  }

  test("export writes unpadded v<N>.metadata.json (HadoopTableOperations hint resolution)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ice-pad").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "tab")
    t.append(Seq((6L, "v6")).toDF("id", "v"), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-ice-pad-out").toString
    IcebergExport.export(t, "tab", dest)
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim
    assert(java.nio.file.Files.exists(metaDir.resolve(s"v$hint.metadata.json")),
      s"expected UNPADDED v$hint.metadata.json — what HadoopTableOperations resolves the hint to")
    assert(IcebergImport.read(spark, dest).count() == 6)
  }

  test("v1 EXISTING (status=0) entries with no sequence_number read at sequence 0") {
    val dir = writeV1Table(statuses = Seq(0), withData = true)
    val out = IcebergImport.read(spark, dir)
    assert(out.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("empty v1 snapshot reads as a schema-typed empty frame") {
    val dir = writeV1Table(statuses = Nil, withData = false)
    val out = IcebergImport.read(spark, dir)
    assert(out.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ==
      Seq(("id", LongType, true), ("v", StringType, true)))
    // the fields carry their Iceberg ids as parquet.field.id metadata
    // (what by-id projection over id-carrying data files consults)
    assert(out.schema.fields.map(_.metadata.getLong("parquet.field.id")).toSeq == Seq(1L, 2L))
    // column references analyze and yield zero rows, not an error
    assert(out.filter(col("id") > 0L).count() == 0)
    assert(out.select(col("v")).count() == 0)
  }

  test("a table rooted under an '='-carrying ancestor directory reads correctly") {
    val base = java.nio.file.Files.createTempDirectory("graft-ice-eq").toString
    val root = s"$base/run=5/tables"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val t = new SnapshotTables(spark, root)
    val df = (1 to 30).map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "v", "b")
    t.overwriteTable(df, "tab", partitionCols = Seq("b"))
    val dest0 = s"$base/run=5/exports"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dest0))
    val dest = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(dest0), "out").toString
    IcebergExport.export(t, "tab", dest)
    val out = IcebergImport.read(spark, dest)
    assert(out.columns.toSet == Set("id", "v", "b"), s"got ${out.columns.mkString(",")}")
    assert(out.count() == 30)
    assert(out.filter(col("b") === 1).count() === 10)
  }
}
