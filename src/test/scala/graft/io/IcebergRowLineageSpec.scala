package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** V3 ROW LINEAGE on the read side ([[IcebergImport.readWithRowLineage]],
  * r20 — the r19 verdict's #4): `_row_id` / `_last_updated_sequence_number`
  * materialized per the spec's inheritance rules — manifest-list
  * `first_row_id` (id 520, stamped by v3 commits) + per-entry running
  * record counts + row position. Pins:
  *
  *  - appends AFTER upgrade carry dense ids from the table's
  *    next-row-id; PRE-upgrade history reads null lineage (the spec's
  *    upgraded-table posture)
  *  - multi-file appends: the running-sum assignment covers each row
  *    exactly once (ids are a permutation of the range)
  *  - DV deletes keep survivor ids — positions are original ordinals
  *  - refusals: non-v3 tables; data files that MATERIALIZE _row_id
  *    (inheritance would contradict preserved ids) */
class IcebergRowLineageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rowlin-$tag").toString

  private def exported(tag: String, rows: Seq[(Long, String)]): String = {
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable(rows.toDF("id", "v"), "t")
    val dest = tmp(s"$tag-ice")
    IcebergExport.export(st, "t", dest)
    dest
  }

  private def sortedBatch(ids: Seq[Long]) =
    ids.map(i => (i, s"b$i")).toDF("id", "v").repartition(1).sortWithinPartitions("id")

  test("appends after upgrade inherit dense row ids; pre-upgrade history reads null lineage") {
    val dir = exported("inherit", (1L to 4L).map(i => (i, s"v$i")))    // pre-upgrade, seq 1
    PuffinDeletionVectors.upgradeToV3(spark, dir)                      // next-row-id = 0
    IcebergAppend.append(spark, dir, sortedBatch(101L to 105L))        // ids 0..4
    IcebergAppend.append(spark, dir, sortedBatch(201L to 203L))        // ids 5..7
    val got = IcebergImport.readWithRowLineage(spark, dir)
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sortBy(_._1)
    // pre-upgrade rows: no lineage (their manifest list carries no 520)
    assert(got.filter(_._1 <= 4L).forall(t => t._2.isEmpty && t._3.isEmpty))
    // first append: ids 0..4 in sorted file order
    assert(got.filter(t => t._1 >= 101L && t._1 <= 105L).map(_._2.get) == (0L to 4L))
    // second append continues at next-row-id
    assert(got.filter(_._1 >= 201L).map(_._2.get) == (5L to 7L))
    // each batch carries ONE data sequence number, strictly increasing
    val seqs = got.collect { case (id, _, Some(s)) if id >= 101L => (id >= 201L, s) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(seqs(false).size == 1 && seqs(true).size == 1 && seqs(false).head < seqs(true).head)
    // the metadata's next-row-id advanced to the total appended rows
    val (_, _, md) = IcebergImport.readMeta(spark, dir)
    assert(md.get("next-row-id").asLong == 8L)
  }

  test("multi-file append: running-sum assignment is a permutation of the id range") {
    val dir = exported("multifile", Seq((1L, "pre")))
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergAppend.append(spark, dir,
      (1L to 90L).map(i => (1000L + i, s"m$i")).toDF("id", "v").repartition(3))
    val ids = IcebergImport.readWithRowLineage(spark, dir)
      .filter(col("id") >= 1000L).select("_row_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == (0L until 90L), "ids must cover the range exactly once")
  }

  test("DV deletes keep survivor ids — positions are original file ordinals") {
    val dir = exported("dv", Seq((1L, "pre")))
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergAppend.append(spark, dir, sortedBatch(1L to 20L map (1000L + _)))
    val before = IcebergImport.readWithRowLineage(spark, dir)
      .filter(col("id") >= 1000L).select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    PuffinDeletionVectors.writeDVDelete(spark, dir, "id % 3 = 0")
    val after = IcebergImport.readWithRowLineage(spark, dir)
      .filter(col("id") >= 1000L).select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.keySet == before.keySet.filter(_ % 3 != 0))
    assert(after.forall { case (k, rid) => before(k) == rid },
      "survivors must keep their pre-delete row ids")
  }

  test("the SQL face: graft_iceberg_lineage_scan serves the same rows, snapshot pin included") {
    val dir = exported("sqlface", Seq((1L, "pre")))
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergAppend.append(spark, dir, sortedBatch(10L to 14L))
    val viaSql = spark.sql(s"SELECT id, _row_id, _last_updated_sequence_number " +
        s"FROM graft_iceberg_lineage_scan('$dir') ORDER BY id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val viaApi = IcebergImport.readWithRowLineage(spark, dir)
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sortBy(_._1)
    assert(viaSql == viaApi)
    assert(viaSql.filter(_._1 >= 10L).flatMap(_._2) == (0L to 4L))
    // the snapshot-pinned form resolves the pre-append state
    val snaps = IcebergImport.snapshots(spark, dir).sorted
    assert(spark.sql(s"SELECT COUNT(*) FROM graft_iceberg_lineage_scan('$dir', ${snaps.head})")
      .head().getLong(0) == 1L)
    // non-v3 refusal surfaces through SQL too
    val v2 = exported("sqlface-v2", Seq((1L, "a")))
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_iceberg_lineage_scan('$v2')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("format-version")))
  }

  test("refusals: non-v3 tables; a data file that materializes _row_id") {
    val v2 = exported("refuse-v2", Seq((1L, "a")))
    val e1 = intercept[IllegalArgumentException] {
      IcebergImport.readWithRowLineage(spark, v2)
    }
    assert(e1.getMessage.contains("format-version"))
    // materialized lineage: replace the one data file with a parquet
    // carrying a _row_id column (footer-level — the guard must fire
    // before any values are read or trusted)
    val dir = exported("refuse-mat", Seq((1L, "pre")))
    PuffinDeletionVectors.upgradeToV3(spark, dir)
    IcebergAppend.append(spark, dir, sortedBatch(Seq(100L, 101L)))
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(
      IcebergImport.dataFiles(spark, dir).find(_.contains("data")).getOrElse(
        IcebergImport.dataFiles(spark, dir).last))
    val scratch = tmp("refuse-mat-scratch")
    Seq((100L, "x", 0L), (101L, "y", 1L)).toDF("id", "v", "_row_id")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles().filter(_.getName.endsWith(".parquet")).head
    fs.delete(new org.apache.hadoop.fs.Path(target.getParent,
      "." + target.getName + ".crc"), false)
    fs.delete(target, false)
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(part.toString), target)
    val e2 = intercept[IllegalArgumentException] {
      IcebergImport.readWithRowLineage(spark, dir).collect()
    }
    assert(e2.getMessage.contains("materializes a _row_id"))
  }
}
