package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** ICEBERG FORMAT-VERSION 3 with DELETION VECTORS
  * ([[PuffinDeletionVectors]] + the v3 branches in the import) — the
  * r17 verdict's "next hard wall". Pins:
  *
  *  - the roaring64 portable codec round-trips array (≤4096),
  *    bitmap (>4096) and multi-high-key shapes; the decoder also reads
  *    RUN containers (cookie 12347 — foreign writers emit them)
  *  - the `deletion-vector-v1` blob frames with length/magic/CRC and
  *    refuses corruption loudly
  *  - END TO END: a v2 table upgraded to v3, rows deleted by DV —
  *    the read applies the vector; a later append's rows are untouched
  *    (sequence gating); the `.files` face lists the Puffin entry
  *  - the changelog read emits the DV-deleted row images, pruned to
  *    the referenced file
  *  - v3 feature triage: a column carrying a non-null initial-default
  *    refuses loudly (no read semantics here); format-version 4
  *    refuses */
class IcebergV3DvSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-icev3-$tag").toString

  private def exported(tag: String, rows: Seq[(Long, String)]): String = {
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable(rows.toDF("id", "v"), "t")
    val dest = tmp(s"$tag-ice")
    IcebergExport.export(st, "t", dest)
    dest
  }

  test("roaring64 portable codec round-trips array, bitmap and multi-key shapes") {
    val shapes: Seq[Seq[Long]] = Seq(
      Seq(0L, 1L, 5L, 65535L),                       // one array container
      (0L until 5000L).map(_ * 2),                   // bitmap container (cardinality > 4096)
      Seq(1L, 70000L, (1L << 33) + 7, (1L << 33) + 9), // several containers + high keys
      Seq(123456789L)
    )
    shapes.foreach { ps =>
      val enc = PuffinDeletionVectors.encodeRoaring64(ps)
      assert(PuffinDeletionVectors.decodeRoaring64(enc) == ps.distinct.sorted)
    }
  }

  test("run containers decode (cookie 12347 — the shape foreign writers emit)") {
    // hand-build: one map (high key 0), one RUN container holding
    // [10, 13] ∪ [100, 100] — cookie 12347, container count in the
    // high half, run bitset, no offsets (n < 4)
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(1L)            // map count
    bb.putInt(0)              // high key
    bb.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, containerCount-1 = 0
    bb.put(1.toByte)          // run flag bitset: container 0 is a run
    bb.putShort(0)            // key
    bb.putShort(4)            // cardinality-1 (5 values)
    bb.putShort(2)            // number of runs
    bb.putShort(10); bb.putShort(3)   // run [10, 10+3]
    bb.putShort(100); bb.putShort(0)  // run [100, 100]
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(PuffinDeletionVectors.decodeRoaring64(bytes) == Seq(10L, 11L, 12L, 13L, 100L))
  }

  test("deletion-vector blob: framed round-trip; corruption refuses loudly") {
    val blob = PuffinDeletionVectors.encodeDvBlob(Seq(3L, 7L, 11L))
    assert(PuffinDeletionVectors.decodeDvBlob(blob) == Seq(3L, 7L, 11L))
    val corrupted = blob.clone(); corrupted(10) = (corrupted(10) ^ 0x5A).toByte
    val e = intercept[IllegalArgumentException] {
      PuffinDeletionVectors.decodeDvBlob(corrupted)
    }
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("magic"))
  }

  test("end to end: v3 upgrade, DV delete applies, later appends untouched, .files lists Puffin") {
    val dir = exported("e2e", (1L to 10L).map(i => (i, s"v$i")))       // snap 1 (v2)
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    val snap = PuffinDeletionVectors.writeDVDelete(spark, dir, "id % 3 = 0") // snap 2 (DV)
    assert(snap.isDefined)
    assert(IcebergImport.read(spark, dir).select("id").collect().map(_.getLong(0)).toSeq.sorted
      == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L))
    // a LATER append's rows must not be touched by the older DV even
    // where positions overlap (sequence gating)
    IcebergAppend.append(spark, dir, Seq((3L, "back")).toDF("id", "v")) // snap 3
    assert(IcebergImport.read(spark, dir).filter(col("id") === 3L).count() == 1)
    // the metadata face shows the Puffin delete entries (one DV per
    // touched data file, per the v3 one-DV-per-file rule) summing to
    // the 3 deleted rows
    val files = IcebergImport.filesRelation(spark, dir)
      .filter(col("content") === 1).select("file_path", "record_count").collect()
    assert(files.nonEmpty && files.forall(_.getString(0).endsWith(".puffin"))
      && files.map(_.getLong(1)).sum == 3L)
    // nothing-matched returns None, no empty snapshot
    assert(PuffinDeletionVectors.writeDVDelete(spark, dir, "id = 999").isEmpty)
  }

  test("v3 DML writes DVs from executor tasks; overlapping deletes leave ONE DV per file (supersede+union)") {
    // multiple data files (two vintages), so the shuffle-by-file path
    // and the per-task Puffin writes genuinely fan out
    val dir = exported("dml", (1L to 40L).filter(_ % 2 == 0).map(i => (i, s"v$i"))) // snap 1
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergAppend.append(spark, dir, (1L to 40L).filter(_ % 2 == 1).map(i => (i, s"v$i")).toDF("id", "v")) // snap 2
    // the DML face: position strategy on a v3 table must emit DVs
    val s1 = IcebergDml.deleteWhere(spark, dir, "id % 3 = 0", strategy = "position")
    assert(s1.isDefined)
    // second DV delete OVERLAPPING the first's files: the v3 invariant
    // is at most one DV per data file, the new DV carrying ALL
    // previously deleted positions (the r18 ADVICE medium finding —
    // two live DVs per file make the table unreadable upstream)
    val s2 = IcebergDml.deleteWhere(spark, dir, "id % 5 = 0", strategy = "position")
    assert(s2.isDefined)
    assert(IcebergImport.read(spark, dir).select("id").collect().map(_.getLong(0)).toSeq.sorted
      == (1L to 40L).filterNot(i => i % 3 == 0 || i % 5 == 0))
    // ONE live DV entry per referenced data file, across the whole head
    val dvs = IcebergImport.deleteFileInfo(spark, dir).collect {
      case (1, puffin, Some((ref, off, size))) => (ref, puffin, off, size)
    }
    val perFile = dvs.groupBy(_._1)
    assert(perFile.nonEmpty && perFile.forall(_._2.size == 1),
      s"expected one DV per data file, got ${perFile.view.mapValues(_.size).toMap}")
    // the surviving DVs were written by TASKS (partition-id-stamped
    // paths) and their cardinalities sum to every deleted position —
    // the union carried the first delete's positions into the new blobs
    assert(dvs.forall(_._2.matches(".*dv-\\d+-p\\d+-[0-9a-f]+\\.puffin")))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalDeleted = dvs.map { case (_, puffin, off, size) =>
      PuffinDeletionVectors.readPositions(fs, new org.apache.hadoop.fs.Path(puffin), off, size).size
    }.sum
    assert(totalDeleted == (1L to 40L).count(i => i % 3 == 0 || i % 5 == 0))
    // UPDATE on v3 rides the same DV machinery in one overwrite snapshot
    val s3 = IcebergDml.update(spark, dir, "id = 2", Map("v" -> "'two'"))
    assert(s3.isDefined)
    val head = IcebergImport.read(spark, dir)
    assert(head.filter(col("id") === 2L).select("v").head().getString(0) == "two")
    assert(head.count() == (1L to 40L).count(i => i % 3 != 0 && i % 5 != 0))
  }

  test("supersede-rewritten manifests carry EXPLICIT sequence AND file-sequence numbers") {
    // the spec scopes sequence-number inheritance to ADDED entries: a
    // carried EXISTING/DELETED row in a rewritten manifest with a null
    // file_sequence_number reads as UNDEFINED metadata to strict
    // readers and the metadata tables (delete application would still
    // work off the explicit data sequence — the gap is observability)
    val dir = exported("fseq", (1L to 20L).map(i => (i, s"v$i")))
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    PuffinDeletionVectors.writeDVDelete(spark, dir, "id % 3 = 0")
    PuffinDeletionVectors.writeDVDelete(spark, dir, "id % 5 = 0") // supersedes
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new org.apache.hadoop.fs.Path(dir, "metadata")
    val rewritten = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.startsWith("m-dvsupersede-"))
    assert(rewritten.nonEmpty, "expected a supersede-rewritten delete manifest")
    rewritten.foreach { m =>
      val (entries, _) = IcebergImport.readAvro(_ => fs, m)
      assert(entries.nonEmpty)
      entries.foreach { e =>
        assert(e.get("sequence_number") != null,
          s"${m.getName}: carried entry with null sequence_number")
        assert(e.get("file_sequence_number") != null,
          s"${m.getName}: carried entry with null file_sequence_number")
      }
    }
    // and the read is unchanged — both DVs' positions still apply
    assert(IcebergImport.read(spark, dir).select("id").collect().map(_.getLong(0)).toSeq.sorted
      == (1L to 20L).filterNot(i => i % 3 == 0 || i % 5 == 0))
  }

  test("the changelog emits DV-deleted row images") {
    val dir = exported("cdc", (1L to 6L).map(i => (i, s"v$i")))        // snap 1
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    PuffinDeletionVectors.writeDVDelete(spark, dir, "id >= 5")          // snap 2
    val got = IcebergChanges.changesBetween(spark, dir, Some(1L))
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq(("delete", 5L), ("delete", 6L)))
  }

  test("a DV folds v2-vintage position-delete parquet positions for its file (spec completeness)") {
    // upstream v3 readers IGNORE position-delete files for data files
    // that have a DV — a DV missing the pre-upgrade parquet positions
    // would resurrect those rows there, even though graft's own
    // union-based reader hides the hole. The write must fold them in.
    // ONE data file, so every prior position belongs to the touched
    // file (positions in untouched files correctly stay with their
    // parquet delete — only DV'd files must fold)
    val st = new SnapshotTables(spark, tmp("fold-snap"))
    st.overwriteTable((1L to 12L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), "t")
    val dir = tmp("fold-ice")
    IcebergExport.export(st, "t", dir)                                 // snap 1 (v2)
    IcebergDml.deleteWhere(spark, dir, "id % 6 = 0", strategy = "position") // snap 2 (v2 pos-delete PARQUET)
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergDml.deleteWhere(spark, dir, "id % 4 = 0", strategy = "position") // snap 3 (DV, same file)
    // graft's read is exact either way
    assert(IcebergImport.read(spark, dir).select("id").collect().map(_.getLong(0)).toSeq.sorted
      == (1L to 12L).filterNot(i => i % 6 == 0 || i % 4 == 0))
    // the DV itself must carry the union — decode every live DV blob
    // and check the v2-vintage positions are IN it (what an upstream
    // reader that ignores the parquet pos-deletes would apply)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvPositions = IcebergImport.deleteFileInfo(spark, dir).collect {
      case (1, puffin, Some((_, off, size))) =>
        PuffinDeletionVectors.readPositions(fs, new org.apache.hadoop.fs.Path(puffin), off, size).size
    }.sum
    // one data file holds ids 1..12 in order: %6 kills 2 rows, %4
    // kills 3, overlap at 12 → the complete DV carries 4 positions
    assert(dvPositions == (1L to 12L).count(i => i % 6 == 0 || i % 4 == 0),
      s"DV carries $dvPositions positions — the v2 parquet positions did not fold in")
  }

  test("maintenance over DVs: compact folds them away; expiry orphans unreferenced Puffins; reads stay exact") {
    val dir = exported("mnt", (1L to 20L).map(i => (i, s"v$i")))       // snap 1 (v2)
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergDml.deleteWhere(spark, dir, "id % 4 = 0", strategy = "position") // snap 2 (DV)
    val expect = (1L to 20L).filterNot(_ % 4 == 0)
    // compact rewrites the CURRENT content (DV applied) as a REPLACE
    // snapshot: from here on no reader touches the Puffin
    IcebergMaintenance.compact(spark, dir)                             // snap 3
    def ids() = IcebergImport.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids() == expect)
    assert(IcebergImport.filesRelation(spark, dir)
      .filter(col("content") === 1).count() == 0, "compaction left delete entries at head")
    // expiry to the compacted head: the Puffin is referenced by NO
    // retained snapshot — it must surface in the orphan inventory
    val orphans = IcebergMaintenance.expireSnapshots(spark, dir, keepLast = 1)
    assert(orphans.exists(_.endsWith(".puffin")), s"expected an orphaned Puffin in $orphans")
    // and physically removing the orphans changes nothing a reader sees
    IcebergMaintenance.expireSnapshots(spark, dir, keepLast = 1, removeOrphans = true)
    assert(ids() == expect)
  }

  test("changelog across a DV supersede emits exactly the newly-dead rows") {
    val dir = exported("sup", (1L to 12L).map(i => (i, s"v$i")))       // snap 1 (v2)
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergDml.deleteWhere(spark, dir, "id % 3 = 0", strategy = "position") // snap 2 (DV)
    // snap 3 OVERLAPS snap 2's files: its DVs carry the union and the
    // prior entries supersede — the changelog diff must still emit
    // ONLY the rows this snapshot newly killed (12 was already dead)
    IcebergDml.deleteWhere(spark, dir, "id % 4 = 0", strategy = "position") // snap 3 (supersede)
    val got = IcebergChanges.changesBetween(spark, dir, Some(2L), Some(3L))
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq(("delete", 4L), ("delete", 8L)))
  }

  test("v3 feature triage: initial-default refuses loudly; format-version 4 refuses") {
    val dir = exported("tri", Seq((1L, "a")))
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    // inject a defaulted column into the current schema JSON
    val metaDir = new org.apache.hadoop.fs.Path(dir, "metadata")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdPath = IcebergImport.latestMetadata(fs, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = {
      val in = fs.open(mdPath)
      try om.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
    }
    val schemas = md.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("schemas")
    val fields = schemas.get(0).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .withArray[com.fasterxml.jackson.databind.node.ArrayNode]("fields")
    val f = fields.addObject()
    f.put("id", 99); f.put("name", "flagged"); f.put("required", false)
    f.put("type", "int"); f.put("initial-default", 42)
    def rewrite(): Unit = {
      val os = fs.create(mdPath, true)
      try os.write(om.writeValueAsString(md).getBytes("UTF-8")) finally os.close()
    }
    rewrite()
    val e = intercept[IllegalArgumentException] { IcebergImport.read(spark, dir) }
    assert(e.getMessage.contains("initial-default"))
    // and an unknown future format version refuses up front
    fields.remove(fields.size - 1)
    md.put("format-version", 4)
    rewrite()
    val e2 = intercept[IllegalArgumentException] { IcebergImport.read(spark, dir) }
    assert(e2.getMessage.contains("format-version 4"))
  }
}
