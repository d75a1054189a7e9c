package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** CHANGELOG (CDC) READ of foreign Iceberg tables
  * ([[IcebergChanges]], SQL face `graft_iceberg_changes`, streaming
  * face `format("graft-iceberg-changes")`) — the range shapes the
  * appends face refuses, as per-snapshot `_change_type` rows. Pins:
  *
  *  - append-only ranges: inserts identical to the appends face
  *  - MOR position-delete snapshots emit EXACTLY the removed row
  *    images — rows already dead before the snapshot do not re-die
  *  - equality-delete snapshots diff correctly (the widened slice)
  *  - `overwrite` emits survivors-at-parent as deletes + the new
  *    content as inserts (COW pairs, Iceberg's own changelog shape)
  *  - `replace` (compaction) emits NOTHING
  *  - stamps: `_change_ordinal` per range position,
  *    `_commit_snapshot_id` per snapshot
  *  - streaming: a DML snapshot streams as rows instead of failing;
  *    exactly-once across stop / DML+append / restart-from-checkpoint */
class IcebergChangesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-icechg-$tag").toString

  /** Export `rows` as an Iceberg table (snapshot 1) and return its dir. */
  private def exported(tag: String, rows: Seq[(Long, String)]): String = {
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable(rows.toDF("id", "v"), "t")
    val dest = tmp(s"$tag-ice")
    IcebergExport.export(st, "t", dest)
    dest
  }

  private def changes(df: DataFrame): Seq[(String, Long, Long)] =
    df.select("_change_type", "id", "_commit_snapshot_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  test("append-only ranges emit inserts exactly like the appends face") {
    val dir = exported("app", Seq((1L, "a")))                          // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 3
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(1L))) ==
      Seq(("insert", 2L, 2L), ("insert", 3L, 3L)))
    // whole lineage: the root export counts as the initial insert
    assert(changes(IcebergChanges.changesBetween(spark, dir, None)) ==
      Seq(("insert", 1L, 1L), ("insert", 2L, 2L), ("insert", 3L, 3L)))
    // range ordinals are 0-based positions in the REQUESTED range
    val ords = IcebergChanges.changesBetween(spark, dir, Some(1L))
      .select("_change_ordinal", "_commit_snapshot_id").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    assert(ords == Seq((0, 2L), (1, 3L)))
  }

  test("MOR position deletes emit exactly the removed row images; prior deads stay dead") {
    val dir = exported("pos", Seq((1L, "a"), (2L, "b"), (3L, "c")))    // snap 1
    IcebergDml.deleteWhere(spark, dir, "id = 1", strategy = "position") // snap 2
    IcebergDml.deleteWhere(spark, dir, "id <= 2", strategy = "position") // snap 3: only id=2 dies
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(1L), Some(2L))) ==
      Seq(("delete", 1L, 2L)))
    // id=1 was already dead before snap 3 — it must NOT re-die
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(2L), Some(3L))) ==
      Seq(("delete", 2L, 3L)))
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(1L))) ==
      Seq(("delete", 1L, 2L), ("delete", 2L, 3L)))
    // the appends face still refuses this range (its contract is
    // unchanged); the changelog is the DML-capable twin
    val e = intercept[IllegalArgumentException] {
      IcebergImport.appendsBetween(spark, dir, Some(1L))
    }
    assert(e.getMessage.contains("cannot represent snapshot"))
  }

  test("equality deletes diff correctly over the surviving files") {
    val dir = exported("eq", Seq((1L, "a"), (2L, "b"), (3L, "c")))     // snap 1
    IcebergAppend.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))   // snap 2
    IcebergDml.deleteWhere(spark, dir, "id % 2 = 0", strategy = "equality") // snap 3
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(2L))) ==
      Seq(("delete", 2L, 3L), ("delete", 4L, 3L)))
    // the surviving table agrees with replaying the changelog
    assert(IcebergImport.read(spark, dir).select("id").collect().map(_.getLong(0)).toSeq.sorted
      == Seq(1L, 3L))
  }

  test("overwrite emits survivors-at-parent as deletes plus the new content as inserts") {
    val dir = exported("ow", Seq((1L, "a"), (7L, "g")))                // snap 1
    IcebergDml.deleteWhere(spark, dir, "id = 7", strategy = "position") // snap 2
    IcebergAppend.overwrite(spark, dir, Seq((8L, "h"), (9L, "i")).toDF("id", "v")) // snap 3
    // id=7 was dead at the parent — only the SURVIVOR (id=1) dies in
    // the overwrite; the new content arrives as inserts
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(2L), Some(3L))) ==
      Seq(("delete", 1L, 3L), ("insert", 8L, 3L), ("insert", 9L, 3L)))
  }

  test("replace (compaction) emits nothing") {
    val dir = exported("cmp", Seq((1L, "a")))                          // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergMaintenance.compact(spark, dir)                             // snap 3 (replace)
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 4
    assert(changes(IcebergChanges.changesBetween(spark, dir, Some(2L))) ==
      Seq(("insert", 3L, 4L)))
  }

  test("SQL face: graft_iceberg_changes over an append+DML+append range") {
    val dir = exported("sql", Seq((2L, "b"), (4L, "d"), (6L, "f")))    // snap 1
    IcebergAppend.append(spark, dir, Seq((1L, "a"), (3L, "c")).toDF("id", "v")) // snap 2
    IcebergDml.deleteWhere(spark, dir, "id % 3 = 0")                   // snap 3
    IcebergAppend.append(spark, dir, Seq((5L, "e")).toDF("id", "v"))   // snap 4
    val got = spark.sql(s"SELECT _change_type, id FROM graft_iceberg_changes('$dir', 1) " +
        "ORDER BY _change_type, id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("delete", 3L), ("delete", 6L),
      ("insert", 1L), ("insert", 3L), ("insert", 5L)))
  }

  /** Drain one AvailableNow pass of the CHANGES source into `got`. */
  private def drainChanges(dir: String, start: Option[String], checkpoint: String,
      got: scala.collection.mutable.ArrayBuffer[(String, Long, Long)]): Unit = {
    var r = spark.readStream.format("graft-iceberg-changes").option("dir", dir)
    start.foreach(s => r = r.option("startingSnapshot", s))
    val q = r.load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("_change_type", "id", "_commit_snapshot_id").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        got.synchronized { got ++= rows }; ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("a snapshot with NO sequence-number fails the STREAM loudly (v1 history); the batch face still reads") {
    // v1 tables — and the pre-upgrade history of v1→v2 tables — carry
    // no sequence numbers. Defaulting the ordinal to 0 would collapse
    // every such commit to one dedup key, so the streaming changelog
    // must refuse and point at the batch face (whose ordinals are
    // range positions and need no sequence numbers).
    val dir = exported("noseq", Seq((1L, "a")))                        // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    // strip sequence-number from the snapshots — the v1-vintage shape
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, mdPath, _) = IcebergImport.readMeta(spark, dir)
    val raw = new String(
      { val in = fs.open(mdPath); try in.readAllBytes() finally in.close() }, "UTF-8")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = om.readTree(raw).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    doc.get("snapshots").elements().forEachRemaining {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o.remove("sequence-number"); ()
      case _ => ()
    }
    fs.delete(new org.apache.hadoop.fs.Path(mdPath.getParent, "." + mdPath.getName + ".crc"), false)
    val os = fs.create(mdPath, true)
    try os.write(om.writeValueAsString(doc).getBytes("UTF-8")) finally os.close()
    // batch face: ordinals are range positions — still reads fine
    assert(IcebergChanges.changesBetween(spark, dir, None).count() == 2)
    // streaming face: refuses loudly, never a collapsed-ordinal feed
    val q = spark.readStream.format("graft-iceberg-changes").option("dir", dir)
      .option("startingSnapshot", "earliest").load()
      .writeStream.format("memory").queryName("icechg_noseq")
      .option("checkpointLocation", tmp("noseq-ck"))
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no sequence-number")), msgs(e).mkString(" | "))
  }

  test("streaming _change_ordinal is retention-stable: sequence numbers, not lineage ordinals") {
    val dir = exported("ord", Seq((1L, "a")))                          // snap 1, seq 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2, seq 2
    IcebergDml.deleteWhere(spark, dir, "id = 1", strategy = "position") // snap 3, seq 3
    def ordinals(tag: String): Map[Long, Int] = {
      val got = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
      val q = spark.readStream.format("graft-iceberg-changes").option("dir", dir)
        .option("startingSnapshot", "earliest").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("_commit_snapshot_id", "_change_ordinal").distinct().collect()
            .map(r => (r.getLong(0), r.getInt(1)))
          got.synchronized { got ++= rows }; ()
        }
        .option("checkpointLocation", tmp(s"ord-ck-$tag")) // FRESH checkpoint each pass
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toMap
    }
    val before = ordinals("before")
    assert(before == Map(1L -> 1, 2L -> 2, 3L -> 3)) // = the sequence numbers
    // retention trims the chain's front: a LINEAGE ordinal would
    // renumber snap2 -> 0 and snap3 -> 1 on the next (fresh) stream;
    // the sequence-number stamp survives expiry unchanged, so a
    // consumer folding by ordinal keys the same commits the same way
    IcebergMaintenance.expireSnapshots(spark, dir, keepLast = 2)
    val after = ordinals("after")
    assert(after == Map(2L -> 2, 3L -> 3))
  }

  test("streaming: DML snapshots stream as rows; exactly-once across restart") {
    val dir = exported("st", Seq((1L, "a"), (2L, "b"), (3L, "c")))     // snap 1
    val ck = tmp("st-ck")
    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    drainChanges(dir, Some("earliest"), ck, got)
    assert(got.toSeq.sorted ==
      Seq(("insert", 1L, 1L), ("insert", 2L, 1L), ("insert", 3L, 1L)))
    // the stream is DOWN while a DML + an append land — the appends
    // source would fail on the delete snapshot; this one emits it
    IcebergDml.deleteWhere(spark, dir, "id = 2", strategy = "position") // snap 2
    IcebergAppend.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))   // snap 3
    drainChanges(dir, Some("earliest"), ck, got)
    assert(got.toSeq.sorted == Seq(
      ("delete", 2L, 2L),
      ("insert", 1L, 1L), ("insert", 2L, 1L), ("insert", 3L, 1L), ("insert", 4L, 3L)))
    // idempotent restart: nothing new, nothing replayed
    drainChanges(dir, Some("earliest"), ck, got)
    assert(got.size == 5)
  }
}
