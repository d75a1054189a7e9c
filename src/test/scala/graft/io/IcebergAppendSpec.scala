package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[IcebergAppend]] — jar-free append commits to a foreign Iceberg v2
  * table: spec-shaped snapshot/manifest/sequence wiring, footer field
  * ids on the written files, stats for file skipping, delete-gating
  * interplay, evolution interplay (mixed vintages), and the refusal +
  * optimistic-concurrency matrix. */
class IcebergAppendSpec extends SparkSpec {
  import spark.implicits._

  private def exported(df: org.apache.spark.sql.DataFrame,
      partitionCols: Seq[String] = Nil): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-app-snap").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable(df, "tab", partitionCols = partitionCols)
    val dest = java.nio.file.Files.createTempDirectory("graft-app-ice").toString
    IcebergExport.export(t, "tab", dest)
    dest
  }

  test("partitioned addFiles: Hive-layout adoption, derived identity values, pruning") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation => h.location.inputFiles.length
          case _ => 0
        }
      }.sum
    // the landing: a date-partitioned parquet tree OUTSIDE the table —
    // exactly the reference's bronze layout (sys_file_date=... dirs)
    val landing =
      java.nio.file.Files.createTempDirectory("graft-adopt-landing").toString + "/bronze"
    Seq((1L, "a", "2026-01-01"), (2L, "b", "2026-01-01"),
        (3L, "c", "2026-01-02"), (4L, "d", "2026-01-03"))
      .toDF("id", "v", "d").withColumn("d", col("d").cast("date"))
      .repartition(col("d"))
      .write.partitionBy("d").parquet(landing)
    // the governed table: identity-partitioned by the same date column
    val dest = exported(
      Seq((10L, "z", java.sql.Date.valueOf("2026-01-04"))).toDF("id", "v", "d"),
      partitionCols = Seq("d"))
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(landing), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) b += st.getPath.toString
      }
      b.result().sorted
    }
    assert(files.size >= 3) // one file per date directory at least
    IcebergAppend.addFiles(spark, dest, files)
    // adopted rows come back, the partition column typed from the
    // path (the files themselves don't carry 'd')
    val got = IcebergImport.read(spark, dest)
      .select("id", "d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSeq.sorted
    assert(got == Seq((1L, "2026-01-01"), (2L, "2026-01-01"), (3L, "2026-01-02"),
      (4L, "2026-01-03"), (10L, "2026-01-04")))
    // partition pruning on the adopted files: a d=literal filter plans
    // fewer files than the table holds (the manifests' partition
    // structs carry the derived identity values)
    val total = IcebergImport.dataFiles(spark, dest).length
    val q = spark.sql(
      s"SELECT id FROM graft_iceberg_scan('$dest') WHERE d = DATE'2026-01-01'")
    assert(scannedFiles(q) < total,
      s"expected partition pruning below $total files, scanned ${scannedFiles(q)}")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // the .partitions face aggregates per derived partition value
    val parts = IcebergImport.partitionsRelation(spark, dest)
      .selectExpr("partition", "record_count").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(parts.values.sum == 5L && parts.size == 4)
  }

  test("append commits a new snapshot: content, time travel, sequence inheritance, stats") {
    val dest = exported((1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"))
    val before = IcebergImport.snapshots(spark, dest)
    val snap = IcebergAppend.append(spark, dest, Seq((5L, "v5"), (6L, "v6")).toDF("k", "v"))
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      (1L to 6L).map(i => (i, s"v$i")).toSet)
    // time travel: the PRE-append snapshot still reads the old content
    assert(IcebergImport.read(spark, dest, Some(before.max))
      .as[(Long, String)].collect().toSet == (1L to 4L).map(i => (i, s"v$i")).toSet)
    assert(IcebergImport.snapshots(spark, dest).toSet == before.toSet + snap)

    // manifest-list shape: previous manifests + ONE append manifest at
    // the next sequence; its entries inherit (null sequence_number)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val md = om.readTree(java.nio.file.Files.readString(IcebergTestSplice.mdFile(metaDir, hint)))
    assert(md.get("current-snapshot-id").asLong == snap)
    val snapNode = (0 until md.get("snapshots").size).map(md.get("snapshots").get)
      .find(_.get("snapshot-id").asLong == snap).get
    val list = IcebergTestSplice.readAvroRecords(snapNode.get("manifest-list").asText)
    val appendEntries = list.filter(_.get("added_snapshot_id").asInstanceOf[Long] == snap)
    assert(appendEntries.size == 1 && list.size > 1)
    val newSeq = appendEntries.head.get("sequence_number").asInstanceOf[Long]
    assert(newSeq == md.get("last-sequence-number").asLong)
    val manifest = IcebergTestSplice.readAvroRecords(
      appendEntries.head.get("manifest_path").toString)
    assert(manifest.nonEmpty)
    manifest.foreach { e =>
      assert(e.get("status").asInstanceOf[Int] == 1)
      assert(e.get("sequence_number") == null) // inherited per the v2 rule
      val dfr = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      assert(dfr.get("record_count").asInstanceOf[Long] > 0)
      assert(dfr.get("lower_bounds") != null && dfr.get("value_counts") != null)
    }
  }

  test("appended rows take a later sequence: existing equality deletes never touch them") {
    val root = java.nio.file.Files.createTempDirectory("graft-app-mor").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1L to 6L).map(i => (i, i * 10.0)).toDF("k", "x"), "tab")
    t.deleteKeysMor("tab", Seq(2L, 4L).toDF("k"))
    val dest = java.nio.file.Files.createTempDirectory("graft-app-mor-ice").toString
    IcebergExport.export(t, "tab", dest)
    // re-add the deleted keys AFTER the delete — they must survive
    IcebergAppend.append(spark, dest, Seq((2L, 99.0), (4L, 98.0)).toDF("k", "x"))
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (3L, 30.0), (5L, 50.0), (6L, 60.0), (2L, 99.0), (4L, 98.0)))
  }

  test("append after a rename: new files carry field ids, vintages mix through the evolved schema") {
    val dest = exported((1L to 3L).map(i => (i, s"v$i")).toDF("k", "v"))
    IcebergEvolve.renameColumn(spark, dest, "v", "label")
    IcebergAppend.append(spark, dest, Seq((4L, "v4")).toDF("k", "label"))
    val out = IcebergImport.read(spark, dest)
    assert(out.columns.toSeq == Seq("k", "label"))
    assert(out.as[(Long, String)].collect().toSet ==
      (1L to 4L).map(i => (i, s"v$i")).toSet)
    // the appended parquet footers carry the Iceberg field ids
    val appended = IcebergImport.dataFiles(spark, dest)
      .filter(_.contains("/data/append-"))
    assert(appended.nonEmpty)
    appended.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val ids = r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .map(fd => fd.getName -> fd.getId.intValue).toMap
        assert(ids == Map("k" -> 1, "label" -> 2))
      } finally r.close()
    }
    // and a SECOND rename after the append still reads both vintages
    IcebergEvolve.renameColumn(spark, dest, "label", "title")
    assert(IcebergImport.read(spark, dest).columns.toSeq == Seq("k", "title"))
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      (1L to 4L).map(i => (i, s"v$i")).toSet)
  }

  test("partitioned append: rows land IN their partitions (identity spec)") {
    val part = exported((1L to 9L).map(i => (i, s"v$i", (i % 3).toInt)).toDF("k", "v", "b"),
      partitionCols = Seq("b"))
    IcebergAppend.append(spark, part,
      Seq((10L, "x", 1), (11L, "y", 2), (12L, "z", 1)).toDF("k", "v", "b"))
    val out = IcebergImport.read(spark, part)
    assert(out.count() == 12)
    assert(out.filter(col("b") === 1).count() ==
      (1L to 9L).count(_ % 3 == 1) + 2)
    // appended files live under identity b=... dirs, the column only
    // in partition metadata (the spec's identity projection shape)
    val appended = IcebergImport.dataFiles(spark, part).filter(_.contains("/data/append-"))
    assert(appended.nonEmpty && appended.forall(_.contains("b=")))
    // and the manifest partition struct scopes them: a probe on b
    // must be able to skip appended files of OTHER buckets (pruned
    // read stays exact)
    assert(out.filter(col("b") === 2).as[(Long, String, Int)].collect().map(_._1).toSet ==
      ((1L to 9L).filter(_ % 3 == 2) :+ 11L).toSet)
  }

  test("partitioned append: murmur3 bucket transform computed for the derived dirs") {
    val root = java.nio.file.Files.createTempDirectory("graft-app-bkt").toString
    val t = new SnapshotTables(spark, root)
    val base = (1L to 40L).map(i => (i, i * 1.5)).toDF("k", "x")
    t.overwriteTableTransformed(base, "tab",
      Seq(SnapshotTables.PartitionTransform.bucketMurmur3(8, "k")))
    val dest = java.nio.file.Files.createTempDirectory("graft-app-bkt-ice").toString
    IcebergExport.export(t, "tab", dest)
    IcebergAppend.append(spark, dest, Seq((41L, 61.5), (42L, 63.0)).toDF("k", "x"))
    val out = IcebergImport.read(spark, dest)
    assert(out.as[(Long, Double)].collect().toSet ==
      ((1L to 40L).map(i => (i, i * 1.5)) ++ Seq((41L, 61.5), (42L, 63.0))).toSet)
    // the derived dir value IS Iceberg's murmur3 bucket of the key
    val appended = IcebergImport.dataFiles(spark, dest).filter(_.contains("/data/append-"))
    assert(appended.nonEmpty)
    appended.foreach { f =>
      val m = "k_bucket=(\\d+)".r.findFirstMatchIn(f)
      assert(m.nonEmpty, f)
    }
  }

  test("partitioned append: day transform derives the spec's date image") {
    val root = java.nio.file.Files.createTempDirectory("graft-app-day").toString
    val t = new SnapshotTables(spark, root)
    val base = (1 to 20).map(i =>
      (i.toLong, java.sql.Date.valueOf(s"2024-01-${(i % 5) + 1}"), i * 2.0))
      .toDF("k", "d", "x")
    t.overwriteTableTransformed(base, "tab",
      Seq(SnapshotTables.PartitionTransform.days("d")))
    val dest = java.nio.file.Files.createTempDirectory("graft-app-day-ice").toString
    IcebergExport.export(t, "tab", dest)
    IcebergAppend.append(spark, dest,
      Seq((21L, java.sql.Date.valueOf("2024-01-03"), 42.0)).toDF("k", "d", "x"))
    val out = IcebergImport.read(spark, dest)
    assert(out.count() == 21)
    assert(out.filter(col("d") === java.sql.Date.valueOf("2024-01-03"))
      .as[(Long, java.sql.Date, Double)].collect().map(_._1).toSet ==
      ((1 to 20).filter(i => (i % 5) + 1 == 3).map(_.toLong) :+ 21L).toSet)
    // the derived dir carries the transform's integer date image
    val appended = IcebergImport.dataFiles(spark, dest).filter(_.contains("/data/append-"))
    assert(appended.nonEmpty)
    val days = java.time.LocalDate.parse("2024-01-03").toEpochDay
    appended.foreach(f => assert(f.contains(s"d_day=$days"), f))
  }

  test("identity partitions over unsupported source types refuse loudly, never a MatchError") {
    // graft's own export already refuses double identity partitions
    // (pinned below), but a FOREIGN writer's table can still carry one:
    // splice such a default spec into exported metadata and pin that
    // the write side refuses with a NAMED type — the r18 ADVICE
    // MatchError hole (load's kind vocabulary + the match default case)
    val eExp = intercept[IllegalArgumentException] {
      exported(Seq((1L, 1.5)).toDF("id", "price"), partitionCols = Seq("price"))
    }
    assert(eExp.getMessage.contains("identity export supports int/long/string/date"))
    val dest = exported(Seq((1L, 1.5), (2L, 2.5)).toDF("id", "price"))
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val mdPath = IcebergTestSplice.mdFile(metaDir, hint)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = om.readTree(java.nio.file.Files.readAllBytes(mdPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val fields = md.get("schemas").get(0).get("fields")
    val priceId = (0 until fields.size).map(fields.get)
      .find(_.get("name").asText == "price").get.get("id").asInt
    val specs = md.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("partition-specs")
    val spec = specs.addObject()
    spec.put("spec-id", 7)
    val sf = spec.putArray("fields").addObject()
    sf.put("name", "price"); sf.put("transform", "identity")
    sf.put("source-id", priceId); sf.put("field-id", 1000)
    md.put("default-spec-id", 7)
    java.nio.file.Files.write(mdPath, om.writeValueAsString(md).getBytes("UTF-8"))
    // the direct edit stales Hadoop LocalFileSystem's checksum sibling
    java.nio.file.Files.deleteIfExists(
      mdPath.getParent.resolve("." + mdPath.getFileName.toString + ".crc"))
    val e = intercept[IllegalArgumentException] {
      IcebergAppend.append(spark, dest, Seq((3L, 3.5)).toDF("id", "price"))
    }
    assert(e.getMessage.contains("identity partition values of type") &&
      e.getMessage.contains("int/long/string/date"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergAppend.addFiles(spark, dest, Seq(s"$dest/data/price=1.5/x.parquet"))
    }
    assert(e2.getMessage.contains("identity partition values of type"))
  }

  test("refusals: schema mismatch, v1 table, racing version file") {
    val dest = exported(Seq((1L, "a")).toDF("k", "v"))
    val e2 = intercept[IllegalArgumentException](
      IcebergAppend.append(spark, dest, Seq((2L, "b", 1)).toDF("k", "v", "extra")))
    assert(e2.getMessage.contains("schema mismatch"))
    val e3 = intercept[IllegalArgumentException](
      IcebergAppend.append(spark, dest, Seq(Tuple1(2L)).toDF("k")))
    assert(e3.getMessage.contains("schema mismatch"))

    // v1 layout refuses (no sequence semantics to inherit)
    val v1dir = java.nio.file.Files.createTempDirectory("graft-app-v1").toString
    val v1meta = java.nio.file.Paths.get(v1dir, "metadata")
    java.nio.file.Files.createDirectories(v1meta)
    java.nio.file.Files.writeString(v1meta.resolve("v1.metadata.json"),
      s"""{"format-version":1,"location":"$v1dir","last-column-id":1,
         |"schema":{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"k","required":false,"type":"long"}]},
         |"partition-spec":[],"current-snapshot-id":-1,"snapshots":[]}""".stripMargin)
    java.nio.file.Files.writeString(v1meta.resolve("version-hint.text"), "1")
    val e4 = intercept[IllegalArgumentException](
      IcebergAppend.append(spark, v1dir, Seq(Tuple1(1L)).toDF("k")))
    assert(e4.getMessage.contains("format-version 1"))

    // a racing writer already claimed v<hint+1> → loud conflict, the
    // table stays at its old head
    val before = IcebergImport.read(spark, dest).count()
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    java.nio.file.Files.writeString(metaDir.resolve(s"v${hint + 1}.metadata.json"), "{}")
    intercept[Exception](IcebergAppend.append(spark, dest, Seq((9L, "z")).toDF("k", "v")))
    java.nio.file.Files.delete(metaDir.resolve(s"v${hint + 1}.metadata.json"))
    assert(IcebergImport.read(spark, dest).count() == before)
  }

  test("streaming append sink: exactly-once across CHECKPOINT LOSS via summary txn markers") {
    val dest = exported(Seq((0L, "seed")).toDF("k", "v"))
    val src = java.nio.file.Files.createTempDirectory("graft-app-stream").toString
    (1L to 4L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(ck: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      graft.streaming.Streams.icebergAppendSink(stream, dest, ck, availableNow = true)
        .awaitTermination()
    }
    val ck = java.nio.file.Files.createTempDirectory("graft-app-ck").toString + "/ck"
    run(ck)
    val once = IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet
    assert(once == (0L to 4L).map(i => (i, if (i == 0) "seed" else s"v$i")).toSet)
    // checkpoint LOSS: the engine replays every batch under the same
    // ids — the summary markers on the snapshot chain skip them all
    val fs = new org.apache.hadoop.fs.Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ck), true)
    run(ck)
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet == once)
    // the markers are on the chain, one per non-empty batch
    assert(IcebergAppend.committedTxnIds(spark, dest).size == 2)
  }

  test("streaming merge sink: keyed upsert per batch, exactly-once across checkpoint loss") {
    val dest = exported(Seq((1L, 0.0), (2L, 0.0)).toDF("k", "x"))
    val src = java.nio.file.Files.createTempDirectory("graft-mrg-stream").toString
    // key-partitioned files: each key's rows land in one micro-batch
    Seq((1L, 10.0), (1L, 11.0), (3L, 30.0)).toDF("k", "x")
      .repartition(2, col("k")).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    def run(ck: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      graft.streaming.Streams.icebergMergeSink(stream, dest, Seq("k"), ck,
        orderCol = Some("x"), availableNow = true).awaitTermination()
    }
    val ck = java.nio.file.Files.createTempDirectory("graft-mrg-ck").toString + "/ck"
    run(ck)
    val once = IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet
    // k=1 replaced by its in-batch max (11.0), k=2 untouched, k=3 inserted
    assert(once == Set((1L, 11.0), (2L, 0.0), (3L, 30.0)))
    val fs = new org.apache.hadoop.fs.Path(ck).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ck), true)
    run(ck)
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet == once,
      "a replayed batch must be skipped by its txn marker, not re-upserted")
  }

  test("merge sink and upsert handle column names containing dots (exact-name resolution)") {
    // "score.v2" must resolve as ONE column everywhere — struct-pack,
    // struct-unpack (getField, never a parsed "__one.score.v2" path),
    // key selection, and the conforming data-manifest write
    val dest = exported(Seq((1L, 0.0, "seed")).toDF("k", "score.v2", "note"))
    val src = java.nio.file.Files.createTempDirectory("graft-dot-stream").toString
    Seq((1L, 10.0, "n1a"), (1L, 11.0, "n1b"), (2L, 20.0, "n2")).toDF("k", "score.v2", "note")
      .repartition(1).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema
    val ck = java.nio.file.Files.createTempDirectory("graft-dot-ck").toString + "/ck"
    val stream = spark.readStream.schema(schema).parquet(src)
    graft.streaming.Streams.icebergMergeSink(stream, dest, Seq("k"), ck,
      orderCol = Some("score.v2"), availableNow = true).awaitTermination()
    assert(IcebergImport.read(spark, dest).as[(Long, Double, String)].collect().toSet ==
      Set((1L, 11.0, "n1b"), (2L, 20.0, "n2")))
    // the batch upsert face too (delete-key select + equality manifest)
    IcebergDml.upsert(spark, dest, Seq((2L, 25.0, "n2b")).toDF("k", "score.v2", "note"),
      keys = Seq("k"))
    assert(IcebergImport.read(spark, dest).as[(Long, Double, String)].collect().toSet ==
      Set((1L, 11.0, "n1b"), (2L, 25.0, "n2b")))
  }

  test("foreign raw-metadata evolution (rename + name REUSED after drop): append lands by id, dropped data never leaks") {
    // the evolution is spliced RAW (not through IcebergEvolve) — the
    // shape a FOREIGN engine leaves behind: `v` (id 2, string) renamed
    // to `w` with a name-mapping entry, and a NEW column `v` (id 3,
    // long) reusing the dropped spelling. graft's append must land
    // values under the CURRENT ids, and the read side must never
    // resolve the old id-less files' physical `v` column to field 3
    // (that would resurrect renamed data under the reused name).
    val dest = exported(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mdFile = IcebergTestSplice.mdFile(metaDir, hint)
    val md = om.readTree(java.nio.file.Files.readString(mdFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val newSchema = om.readTree(
      """{"type":"struct","schema-id":7,"fields":[
        |{"id":1,"name":"k","required":false,"type":"long"},
        |{"id":2,"name":"w","required":false,"type":"string"},
        |{"id":3,"name":"v","required":false,"type":"long"}]}""".stripMargin)
    md.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("schemas").add(newSchema)
    md.put("current-schema-id", 7)
    md.put("last-column-id", 3)
    val props =
      if (md.hasNonNull("properties")) md.get("properties").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else md.putObject("properties")
    props.put("schema.name-mapping.default", """[{"field-id":2,"names":["v","w"]}]""")
    java.nio.file.Files.writeString(metaDir.resolve(s"v${hint + 1}.metadata.json"),
      om.writeValueAsString(md))
    java.nio.file.Files.writeString(metaDir.resolve("version-hint.text"), s"${hint + 1}")
    java.nio.file.Files.deleteIfExists(metaDir.resolve(".version-hint.text.crc"))

    val snap = IcebergAppend.append(spark, dest,
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("k", "w", "v"))
    assert(snap > 0)
    val out = IcebergImport.read(spark, dest)
      .select("k", "w", "v").as[(Long, String, Option[Long])].collect().toSet
    assert(out == Set(
      // old id-less vintage: `w` resolves through the mapping to the
      // old physical `v`; field 3 (`v`) reads NULL — never the old strings
      (1L, "a", None), (2L, "b", None),
      // appended vintage: id-carrying footers, all three fields live
      (3L, "c", Some(30L)), (4L, "d", Some(40L))))
    // the appended footers really carry the CURRENT ids (1, 2, 3)
    val newFiles = IcebergImport.dataFiles(spark, dest)
      .filter(_.contains("/data/append-"))
    assert(newFiles.nonEmpty)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(newFiles.head), spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val ids = r.getFooter.getFileMetaData.getSchema.getFields.asScala
        .map(f => f.getName -> f.getId.intValue()).toMap
      assert(ids == Map("k" -> 1, "w" -> 2, "v" -> 3))
    } finally r.close()
  }

  test("append to an empty-snapshot table bootstraps the chain") {
    // an exported table whose current snapshot has zero data files
    val root = java.nio.file.Files.createTempDirectory("graft-app-empty").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable(Seq((1L, "a")).toDF("k", "v").limit(0), "tab")
    val dest = java.nio.file.Files.createTempDirectory("graft-app-empty-ice").toString
    IcebergExport.export(t, "tab", dest)
    IcebergAppend.append(spark, dest, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }
}
