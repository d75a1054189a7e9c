package graft.streaming

import graft.SparkSpec
import graft.io.{IcebergAppend, IcebergDml, IcebergExport, IcebergImport, IcebergMaintenance, SnapshotTables}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** Incremental READ of foreign Iceberg tables — batch
  * ([[IcebergImport.appendsBetween]], SQL face
  * `graft_iceberg_appends`) and streaming
  * (`format("graft-iceberg-appends")`). What this suite pins:
  *
  *  - the batch range semantics: exclusive `from`, inclusive `to`,
  *    `from=None` = whole lineage, empty range reads as the table's
  *    schema with zero rows
  *  - `replace` (compaction) snapshots are SKIPPED — the incremental
  *    view reads the ORIGINAL appended files, never the rewritten
  *    copies (no duplicates, no misses)
  *  - `overwrite`/`delete` snapshots in the range REFUSE loudly — an
  *    append-only view cannot represent removed rows
  *  - a `from` that is not an ancestor of `to` refuses (branch bounds)
  *  - the streaming source: `startingSnapshot=earliest` replays the
  *    lineage with per-snapshot `_snapshot_id` stamps; the default
  *    start emits only NEW commits; exactly-once across a stop /
  *    append-more / restart-from-checkpoint cycle
  *    (Trigger.AvailableNow both legs)
  *  - the stream FAILS (not silently skips) when the lineage grows a
  *    delete snapshot */
class IcebergAppendsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-iceapp-$tag").toString

  /** Export `rows` as an Iceberg table (snapshot 1) and return its dir. */
  private def exported(tag: String, rows: Seq[(Long, String)]): String = {
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable(rows.toDF("id", "v"), "t")
    val dest = tmp(s"$tag-ice")
    IcebergExport.export(st, "t", dest)
    dest
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("appendsBetween: exclusive from, inclusive to, whole-lineage and empty ranges") {
    val dir = exported("rng", Seq((1L, "a"), (2L, "b")))              // snap 1
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))  // snap 2
    IcebergAppend.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))  // snap 3
    assert(ids(IcebergImport.appendsBetween(spark, dir, Some(1L))) == Seq(3L, 4L))
    assert(ids(IcebergImport.appendsBetween(spark, dir, Some(1L), Some(2L))) == Seq(3L))
    assert(ids(IcebergImport.appendsBetween(spark, dir, Some(2L), Some(3L))) == Seq(4L))
    assert(ids(IcebergImport.appendsBetween(spark, dir, None)) == Seq(1L, 2L, 3L, 4L))
    val empty = IcebergImport.appendsBetween(spark, dir, Some(3L))
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "v"))
    // SQL face: from=0 is the whole lineage
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_iceberg_appends('$dir', 0)")
      .head().getLong(0) == 4L)
    assert(spark.sql(s"SELECT id FROM graft_iceberg_appends('$dir', 1, 2)")
      .head().getLong(0) == 3L)
  }

  test("appendsSince: the wall-clock face starts after the newest snapshot at-or-before ts") {
    val dir = exported("ts", Seq((1L, "a")))                           // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    // commit times of snaps 1..2 (the TIMESTAMP AS OF clock)
    val times = IcebergImport.snapshotsRelation(spark, dir)
      .orderBy("snapshot_id").collect().map(_.getAs[Long]("timestamp_ms"))
    // at snap 1's commit time: snap 1 is "already consumed" → only snap 2
    assert(ids(IcebergImport.appendsSince(spark, dir, times(0))) == Seq(2L))
    // after snap 2: nothing new
    assert(IcebergImport.appendsSince(spark, dir, times(1)).count() == 0)
    // before the whole lineage: everything
    assert(ids(IcebergImport.appendsSince(spark, dir, times(0) - 1000)) == Seq(1L, 2L))
    // the SQL face takes the same timestamp as a string literal
    val tsLit = new java.sql.Timestamp(times(0)).toString
    assert(spark.sql(s"SELECT id FROM graft_iceberg_appends('$dir', '$tsLit')")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_iceberg_appends('$dir', 'not a time')").collect()
    }
    assert(e.getMessage.contains("neither a snapshot id nor a"))
  }

  test("replace snapshots are skipped: compaction neither duplicates nor loses appends") {
    val dir = exported("cmp", Seq((1L, "a")))                          // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergMaintenance.compact(spark, dir)                             // snap 3 (replace)
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 4
    assert(ids(IcebergImport.appendsBetween(spark, dir, Some(1L))) == Seq(2L, 3L))
    // the full read at head agrees (compaction changed layout, not rows)
    assert(ids(IcebergImport.read(spark, dir)) == Seq(1L, 2L, 3L))
  }

  test("overwrite/delete snapshots in the range refuse loudly; a later from skips them") {
    val dir = exported("del", Seq((1L, "a"), (7L, "g")))               // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergDml.deleteWhere(spark, dir, "id = 7")                       // snap 3 (delete)
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 4
    val e = intercept[IllegalArgumentException] {
      IcebergImport.appendsBetween(spark, dir, Some(1L)).collect()
    }
    assert(e.getMessage.contains("cannot represent snapshot") &&
      e.getMessage.contains("operation=delete"))
    // starting AFTER the delete snapshot reads the later append cleanly
    assert(ids(IcebergImport.appendsBetween(spark, dir, Some(3L))) == Seq(3L))
  }

  test("a from-snapshot off the lineage refuses (branch bounds)") {
    val dir = exported("br", Seq((1L, "a")))                           // snap 1
    graft.io.IcebergEvolve.createBranch(spark, dir, "side")
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"), branch = "side") // snap 2
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 3 (main)
    val e = intercept[IllegalArgumentException] {
      IcebergImport.appendsBetween(spark, dir, Some(2L), Some(3L))
    }
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("streaming from earliest: per-snapshot batches with _snapshot_id stamps") {
    val dir = exported("st", Seq((1L, "a")))                           // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    val q = spark.readStream.format("graft-iceberg-appends")
      .option("dir", dir).option("startingSnapshot", "earliest")
      .option("maxSnapshotsPerBatch", "1")
      .load()
      .writeStream.format("memory").queryName("iceapp_earliest")
      .option("checkpointLocation", tmp("st-ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("iceapp_earliest")
      .select("id", "_snapshot_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 2L)))
  }

  test("exactly-once across restart from checkpoint; default start emits only new commits") {
    val dir = exported("eo", Seq((1L, "a")))                           // snap 1
    val ck = tmp("eo-ck")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def runOnce(start: Option[String], checkpoint: String): Unit = {
      var r = spark.readStream.format("graft-iceberg-appends").option("dir", dir)
      start.foreach(s => r = r.option("startingSnapshot", s))
      val q = r.load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("id", "_snapshot_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          got.synchronized { got ++= rows }; ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce(None, tmp("eo-ck-default")) // default start = head: nothing to emit
    assert(got.isEmpty)
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 3
    runOnce(Some("1"), ck) // catch up from after snap 1, exactly once
    assert(got.toSeq.sorted == Seq((2L, 2L), (3L, 3L)))
    // restart on the same checkpoint: the CHECKPOINTED offset is the
    // floor (startingSnapshot=1 must NOT replay snaps 2-3)
    runOnce(Some("1"), ck)
    assert(got.toSeq.sorted == Seq((2L, 2L), (3L, 3L)))
    IcebergAppend.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))   // snap 4
    runOnce(Some("1"), ck) // only the new commit arrives
    assert(got.toSeq.sorted == Seq((2L, 2L), (3L, 3L), (4L, 4L)))
  }

  /** Drain one AvailableNow pass into `got`, reusing `checkpoint`. */
  private def drainOnce(dir: String, start: Option[String], checkpoint: String,
      got: scala.collection.mutable.ArrayBuffer[(Long, Long)]): Unit = {
    var r = spark.readStream.format("graft-iceberg-appends").option("dir", dir)
    start.foreach(s => r = r.option("startingSnapshot", s))
    val q = r.load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("id", "_snapshot_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        got.synchronized { got ++= rows }; ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("default start survives restart: downtime appends are emitted, not skipped") {
    val dir = exported("dres", Seq((1L, "a")))                         // snap 1
    val ck = tmp("dres-ck")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    drainOnce(dir, None, ck, got) // default start = head at FIRST start: nothing yet
    assert(got.isEmpty)
    // the stream is DOWN while two snapshots land — the failure mode
    // was re-pinning "head" at restart and skipping both silently
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 3
    drainOnce(dir, None, ck, got)
    assert(got.toSeq.sorted == Seq((2L, 2L), (3L, 3L)))
    // and once a batch HAS committed, the checkpoint is the floor
    IcebergAppend.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))   // snap 4
    drainOnce(dir, None, ck, got)
    assert(got.toSeq.sorted == Seq((2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("offsets re-anchor across expireSnapshots: routine expiry neither skips nor re-reads") {
    val dir = exported("exp", Seq((1L, "a")))                          // snap 1
    val ck = tmp("exp-ck")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    drainOnce(dir, Some("earliest"), ck, got)
    assert(got.toSeq.sorted == Seq((1L, 1L), (2L, 2L)))
    // retention trims the chain's FRONT: snap 1 expires, every
    // retained ordinal shifts down by one
    IcebergMaintenance.expireSnapshots(spark, dir, keepLast = 1)
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 3
    drainOnce(dir, Some("earliest"), ck, got)
    // snap 3 arrives exactly once; snap 2 is NOT re-read despite its
    // ordinal having changed (the offset's snapshot-id anchor re-resolves)
    assert(got.toSeq.sorted == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("expiry of the stream's floor snapshot fails loudly, never a silent remap") {
    val dir = exported("expf", Seq((1L, "a")))                         // snap 1
    val ck = tmp("expf-ck")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    drainOnce(dir, Some("earliest"), ck, got)                          // floor anchor = snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergMaintenance.expireSnapshots(spark, dir, keepLast = 1)       // snap 1 (the anchor) expires
    val e = intercept[StreamingQueryException] { drainOnce(dir, None, ck, got) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no longer on the main lineage")))
  }

  test("intra-run floor re-anchors across MID-RUN expiry: no silent stall") {
    // the r18 ADVICE stall: lastEnd held a RAW ordinal stamped against
    // the pre-expiry chain; after expireSnapshots trimmed the front,
    // every retained ordinal shifted down but the floor stayed high, so
    // the source emitted nothing until the chain regrew past the stale
    // value. Exercised on ONE long-lived source object (AvailableNow
    // drains build a fresh source per run and never hit it).
    val dir = exported("stall", Seq((1L, "a")))                        // snap 1
    IcebergAppend.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))   // snap 2
    IcebergAppend.append(spark, dir, Seq((3L, "c")).toDF("id", "v"))   // snap 3
    val src = new IcebergAppendsSource(spark, dir,
      Map("dir" -> dir, "startingSnapshot" -> "earliest"), tmp("stall-md"))
    val o1 = src.getOffset.get
    src.getBatch(None, o1) // consume to head: the intra-run floor stamps here
    assert(src.getOffset.isEmpty) // drained
    // retention trims the chain's FRONT mid-run: [1,2,3] -> [3]
    IcebergMaintenance.expireSnapshots(spark, dir, keepLast = 1)
    IcebergAppend.append(spark, dir, Seq((4L, "d")).toDF("id", "v"))   // snap 4: chain [3,4]
    // pre-fix: floor 3 (raw) >= chain length 2 -> None forever (stall)
    val o2 = src.getOffset
    assert(o2.isDefined, "source stalled after mid-run expiry shifted ordinals")
    // and the offset names exactly the new snapshot, once
    src.getBatch(Some(o1), o2.get)
    val decoded = AppendsOffset.decode(o2.get)
    assert(decoded.ordinal == 2 && decoded.snapshotId == 4L)
    assert(src.getOffset.isEmpty) // floor advanced: drained again, no re-emit
  }

  test("a delete snapshot fails the stream loudly, never a silent skip") {
    val dir = exported("fail", Seq((1L, "a"), (7L, "g")))              // snap 1
    val ck = tmp("fail-ck")
    IcebergDml.deleteWhere(spark, dir, "id = 7")                       // snap 2 (delete)
    val q = spark.readStream.format("graft-iceberg-appends")
      .option("dir", dir).option("startingSnapshot", "earliest")
      .load()
      .writeStream.format("memory").queryName("iceapp_fail")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[StreamingQueryException] { q.awaitTermination() }
    assert(e.getMessage.contains("cannot represent snapshot") ||
      Option(e.getCause).exists(_.getMessage.contains("cannot represent snapshot")))
  }
}
