package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IcebergExport]] against the public Iceberg v2 table spec: the
  * metadata JSON shape is validated field-by-field (Jackson — already
  * on Spark's classpath), the Avro manifest list and manifests are
  * read back with plain Avro and checked for the spec's field-ids and
  * values, and the exported file inventory round-trips: reading every
  * `file_path` of the current snapshot's manifests reproduces the
  * table exactly. Refusal paths (MOR-pending, partitioned layouts) are
  * pinned so the export can never be silently wrong. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def readAvro(path: String): (Seq[Map[String, Any]], Map[String, String]) = {
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val p = new org.apache.hadoop.fs.Path(path)
    val in = new org.apache.avro.file.DataFileStream[GenericRecord](
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p),
      new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      val metaKeys = in.getMetaKeys.asScala.toSeq
      val meta = metaKeys.filterNot(_.startsWith("avro."))
        .map(k => k -> in.getMetaString(k)).toMap
      val rows = scala.collection.mutable.ArrayBuffer.empty[Map[String, Any]]
      while (in.hasNext) {
        val r = in.next()
        rows += r.getSchema.getFields.asScala.map(f => f.name() -> r.get(f.name())).toMap
      }
      (rows.toSeq, meta)
    } finally in.close()
  }

  test("metadata JSON matches the Iceberg v2 spec shape; snapshots cover every retained version") {
    val root = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "tab")
    t.append((101 to 150).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-iceberg-out").toString
    val mdPath = IcebergExport.export(t, "tab", dest)

    val md = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(new java.net.URI(mdPath).getPath)))
    assert(md.get("format-version").asInt == 2)
    assert(md.get("table-uuid").asText.matches("[0-9a-f-]{36}"))
    assert(md.get("current-schema-id").asInt == 0)
    val schema = md.get("schemas").get(0)
    assert(schema.get("type").asText == "struct" && schema.get("schema-id").asInt == 0)
    val fields = schema.get("fields")
    assert(fields.size == 2)
    assert(fields.get(0).get("name").asText == "id" && fields.get(0).get("type").asText == "long")
    assert(fields.get(1).get("name").asText == "v" && fields.get(1).get("type").asText == "string")
    assert(fields.get(0).get("id").asInt == 1 && fields.get(1).get("id").asInt == 2)
    assert(md.get("last-column-id").asInt == 2)
    assert(md.get("partition-specs").get(0).get("spec-id").asInt == 0)
    assert(md.get("partition-specs").get(0).get("fields").size == 0)
    assert(md.get("sort-orders").get(0).get("order-id").asInt == 0)
    assert(md.get("current-snapshot-id").asLong == t.currentVersion("tab"))
    assert(md.get("refs").get("main").get("snapshot-id").asLong == t.currentVersion("tab"))
    assert(md.get("refs").get("main").get("type").asText == "branch")
    val snaps = md.get("snapshots")
    assert(snaps.size == t.history("tab").size)
    (0 until snaps.size).foreach { i =>
      val s = snaps.get(i)
      assert(s.has("snapshot-id") && s.has("sequence-number") && s.has("timestamp-ms") &&
        s.has("summary") && s.has("manifest-list") && s.has("schema-id"))
      assert(Set("append", "overwrite")(s.get("summary").get("operation").asText))
    }
    // version-hint points at the current metadata version
    val hint = java.nio.file.Files.readString(java.nio.file.Paths.get(dest, "metadata", "version-hint.text"))
    assert(hint == t.currentVersion("tab").toString)
  }

  test("manifest list + manifests carry the spec fields and round-trip the table's files") {
    val root = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "tab")
    t.append((101 to 150).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-iceberg-out").toString
    val mdPath = IcebergExport.export(t, "tab", dest)
    val md = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(new java.net.URI(mdPath).getPath)))

    val cur = t.currentVersion("tab")
    val curSnap = (0 until md.get("snapshots").size).map(md.get("snapshots").get)
      .find(_.get("snapshot-id").asLong == cur).get
    val (listRows, listMeta) = readAvro(curSnap.get("manifest-list").asText)
    assert(listMeta.get("format-version").contains("2"))
    assert(listRows.size == 2, s"head chain has 2 segments, list has ${listRows.size}")
    listRows.foreach { r =>
      assert(r("content") == 0 && r("partition_spec_id") == 0)
      assert(r("manifest_length").asInstanceOf[Long] > 0)
      assert(r("added_files_count").asInstanceOf[Int] > 0)
    }
    assert(listRows.map(_("sequence_number").asInstanceOf[Long]).sorted == Seq(1L, 2L))

    // every manifest: field-ids via values; paths exist; counts true
    val filePaths = listRows.flatMap { r =>
      val (entries, mMeta) = readAvro(r("manifest_path").toString)
      assert(mMeta.get("format-version").contains("2") && mMeta.get("content").contains("data"))
      assert(mMeta.get("partition-spec").contains("[]"))
      assert(om.readTree(mMeta("schema")).get("type").asText == "struct")
      entries.map { e =>
        assert(e("status") == 1)
        val df = e("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        assert(df.get("content") == 0 && df.get("file_format").toString == "PARQUET")
        assert(df.get("record_count").asInstanceOf[Long] > 0)
        assert(df.get("file_size_in_bytes").asInstanceOf[Long] > 0)
        df.get("file_path").toString
      }
    }
    // the listed record counts sum to the table count
    val totalRows = listRows.map(_("added_rows_count").asInstanceOf[Long]).sum
    assert(totalRows == 150)
    // round-trip: reading exactly the listed files reproduces the table
    val back = spark.read.parquet(filePaths: _*)
    assert(back.count() == 150)
    assert(back.as[(Long, String)].collect().toSet ==
      t.read("tab").as[(Long, String)].collect().toSet)
  }

  test("manifest column stats: value/null counts and LE-serialized bounds decode to truth") {
    val root = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    val t = new SnapshotTables(spark, root)
    // one known file: ids 5..104, strings, and a column with nulls
    val df = (5 to 104).map(i =>
      (i.toLong, f"s$i%03d", if (i % 10 == 0) null else s"x$i")).toDF("id", "s", "maybe")
    t.overwriteTable(df.coalesce(1), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-iceberg-out").toString
    val mdPath = IcebergExport.export(t, "tab", dest)
    val md = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(new java.net.URI(mdPath).getPath)))
    val snap = md.get("snapshots").get(0)
    val (listRows, _) = readAvro(snap.get("manifest-list").asText)
    val (entries, _) = readAvro(listRows.head("manifest_path").toString)
    val dfRec = entries.head("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]

    def kvMap(field: String): Map[Int, AnyRef] = {
      import scala.jdk.CollectionConverters._
      dfRec.get(field).asInstanceOf[java.util.Collection[org.apache.avro.generic.GenericRecord]]
        .asScala.map(r => r.get("key").asInstanceOf[Int] -> r.get("value")).toMap
    }
    // schema assigns id=1 to `id`, 2 to `s`, 3 to `maybe`
    val vc = kvMap("value_counts")
    assert(vc(1) == 100L && vc(2) == 100L && vc(3) == 100L)
    val nc = kvMap("null_value_counts")
    assert(nc(1) == 0L && nc(2) == 0L && nc(3) == 10L)
    def le64(b: AnyRef): Long = {
      val bb = b.asInstanceOf[java.nio.ByteBuffer].duplicate()
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    def utf8(b: AnyRef): String = {
      val bb = b.asInstanceOf[java.nio.ByteBuffer].duplicate()
      val arr = new Array[Byte](bb.remaining()); bb.get(arr); new String(arr, "UTF-8")
    }
    val lo = kvMap("lower_bounds"); val hi = kvMap("upper_bounds")
    assert(le64(lo(1)) == 5L && le64(hi(1)) == 104L)
    assert(utf8(lo(2)) == "s005" && utf8(hi(2)) == "s104")
    assert(utf8(lo(3)) == "x101") // min NON-NULL string in byte order ("x100" is null)
  }

  test("time travel: every retained version's manifest list reproduces that version") {
    val root = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), "tab")
    t.append((11 to 30).map(i => (i.toLong, "b")).toDF("id", "v"), "tab")
    t.append((31 to 60).map(i => (i.toLong, "c")).toDF("id", "v"), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-iceberg-out").toString
    val md = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(new java.net.URI(IcebergExport.export(t, "tab", dest)).getPath)))
    val snaps = (0 until md.get("snapshots").size).map(md.get("snapshots").get)
    t.history("tab").foreach { v =>
      val s = snaps.find(_.get("snapshot-id").asLong == v).get
      val (listRows, _) = readAvro(s.get("manifest-list").asText)
      val files = listRows.flatMap { r =>
        readAvro(r("manifest_path").toString)._1
          .map(_("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            .get("file_path").toString)
      }
      assert(spark.read.parquet(files: _*).count() == t.readVersion("tab", v).count(),
        s"version $v diverged through the export")
    }
  }

  test("CALL system.export_iceberg_metadata exports through the SQL catalog") {
    val root = java.nio.file.Files.createTempDirectory("graft-iceberg-cat").toString
    spark.conf.set("spark.sql.catalog.icespec", classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.icespec.root", root)
    spark.sql("CREATE NAMESPACE icespec.dw")
    spark.sql("CREATE TABLE icespec.dw.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO icespec.dw.t SELECT id, CAST(id AS STRING) FROM range(0, 40)")
    val dest = java.nio.file.Files.createTempDirectory("graft-iceberg-out").toString
    val path = spark.sql(
      s"CALL icespec.system.export_iceberg_metadata('dw.t', '$dest')")
      .collect().head.getString(0)
    val md = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(new java.net.URI(path).getPath)))
    assert(md.get("format-version").asInt == 2)
    assert(md.get("snapshots").size >= 1)
  }

  test("refusals: content-addressed patches and partitioned layouts are never exported wrong") {
    val root = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), "mor")
    // content-addressed patches now export as POSITION deletes
    // (IcebergDeletesSpec round-trips them); what refuses is a patch
    // over a Hive-partitioned layout — the data files lack the
    // partition column, so full row images cannot be replayed
    t.deleteWhereMor("mor", org.apache.spark.sql.functions.col("id") === 1L)
    val dest = java.nio.file.Files.createTempDirectory("graft-iceberg-out").toString
    IcebergExport.export(t, "mor", dest)
    assert(IcebergImport.read(spark, dest).count() == 9)

    t.overwriteTable((1 to 10).map(i => (i.toLong, "a", i % 2)).toDF("id", "v", "b"),
      "morp", partitionCols = Seq("b"))
    t.deleteWhereMor("morp", org.apache.spark.sql.functions.col("id") === 1L)
    val e1 = intercept[IllegalArgumentException](IcebergExport.export(t, "morp",
      java.nio.file.Files.createTempDirectory("graft-iceberg-out-p").toString))
    assert(e1.getMessage.contains("Hive-partitioned"))

    // a bucket-only hidden layout EXPORTS with the bucket field
    // honestly OMITTED from the spec (graft buckets with xxhash64,
    // Iceberg pins murmur3 — declaring bucket[N] would corrupt
    // external pruning); content still round-trips exactly
    t.overwriteTableTransformed(
      (1 to 10).map(i => (i.toLong, s"x$i")).toDF("id", "v"),
      "hid", Seq(SnapshotTables.PartitionTransform.bucket(4, "id")))
    val hidDest = java.nio.file.Files.createTempDirectory("graft-iceberg-hid").toString
    val mdPath = IcebergExport.export(t, "hid", hidDest)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(new java.net.URI(mdPath).getPath)))
    assert(md.get("partition-specs").size == 1)
    assert(md.get("partition-specs").get(0).get("fields").size == 0,
      "xxhash bucket fields must be omitted, never declared as Iceberg bucket[N]")
    assert(IcebergImport.read(spark, hidDest).as[(Long, String)].collect().toSet ==
      t.read("hid").as[(Long, String)].collect().toSet)
  }
}
