package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned-snapshot tables on plain parquet — the Iceberg write
  * semantics the reference relies on (overwrite commits a new table
  * version; old metadata versions are retained up to a cap:
  * `write.metadata.delete-after-commit.enabled` +
  * `write.metadata.previous-versions-max=10`,
  * spark/jobs/job_silver.py:174-178), reproduced with nothing but the
  * Hadoop FileSystem API so it runs on local FS or S3A alike.
  *
  * Layout per table:
  * {{{
  *   <root>/<table>/snapshots/v<NNNNN>/   parquet data (partitioned dirs)
  *   <root>/<table>/metadata/v<NNNNN>.json  schema + partition spec
  *   <root>/<table>/metadata/current        pointer file (version number)
  * }}}
  *
  * Commits are write-new-snapshot-then-flip-pointer: readers resolving
  * the pointer before the flip keep reading the old snapshot (snapshot
  * isolation); the flip is a single small-file overwrite. Retention
  * deletes snapshots older than `previousVersionsMax` behind the
  * current one AFTER the flip, so no reader holding the old pointer
  * within the retention window ever loses its files — the same
  * contract Iceberg's metadata retention gives the reference.
  *
  * Concurrency: last-writer-wins on the pointer (adequate for the
  * reference's single daily writer; a real multi-writer deployment
  * swaps this trait implementation for Iceberg/Delta, SURVEY §7).
  */
final class SnapshotTables(spark: SparkSession, root: String, previousVersionsMax: Int = 10)
    extends TableFormat {

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String) = new Path(root, table)
  private def metaDir(table: String) = new Path(tableDir(table), "metadata")
  private def snapDir(table: String, v: Int) =
    new Path(tableDir(table), f"snapshots/v$v%05d")
  private def pointer(table: String) = new Path(metaDir(table), "current")

  private def writeSmallFile(p: Path, content: String): Unit = {
    val f = fs(p)
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  private def readSmallFile(p: Path): String = {
    val in = fs(p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Current committed version, 0 when the table does not exist yet. */
  def currentVersion(table: String): Int = {
    val p = pointer(table)
    if (fs(p).exists(p)) readSmallFile(p).toInt else 0
  }

  /** All retained versions, ascending. */
  def history(table: String): Seq[Int] = {
    val d = new Path(tableDir(table), "snapshots")
    val f = fs(d)
    if (!f.exists(d)) Nil
    else
      f.listStatus(d).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") => n.drop(1).toInt }
        .sorted
  }

  /** Commit `df` as the next version of `table`. */
  override def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit = {
    val next = currentVersion(table) + 1
    val dest = snapDir(table, next)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dest.toString)
    writeSmallFile(
      new Path(metaDir(table), f"v$next%05d.json"),
      s"""{"version":$next,"partition_cols":${partitionCols.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""schema":${df.schema.json}}"""
    )
    writeSmallFile(pointer(table), next.toString) // the commit point
    expire(table, next)
  }

  /** Snapshot model has no partial commit: partition-level overwrite
    * still commits a full new version built from current ∖ incoming
    * partitions ∪ incoming (the copy-on-write Iceberg strategy). */
  override def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "overwritePartitions needs partition columns")
    val cur = currentVersion(table)
    val merged =
      if (cur == 0) df
      else {
        val existing = read(table)
        val incoming = df.select(partitionCols.map(org.apache.spark.sql.functions.col): _*).distinct()
        existing.join(incoming, partitionCols, "left_anti").unionByName(df)
      }
    overwriteTable(merged, table, partitionCols)
  }

  /** Copy-on-write MERGE (upsert): rows of `updates` replace current
    * rows with the same `keyCols` value; unmatched update rows are
    * inserted — `MERGE INTO t USING u ON keys WHEN MATCHED THEN UPDATE
    * WHEN NOT MATCHED THEN INSERT`, committed as a new snapshot version
    * (prior versions remain time-travelable). The merge itself is one
    * anti-join (current rows whose key is NOT updated) + union — the
    * copy-on-write strategy; at scale the anti-join shuffles on the key
    * like any MERGE, and a mostly-unchanged table pays the rewrite,
    * which is exactly Iceberg COW's trade (merge-on-read is the other
    * half, out of scope for a parquet-directory snapshot model).
    * On an empty table, MERGE degenerates to insert-all. */
  def merge(table: String, updates: DataFrame, keyCols: Seq[String], partitionCols: Seq[String] = Nil): Unit = {
    require(keyCols.nonEmpty, "merge needs key columns")
    val cur = currentVersion(table)
    val merged =
      if (cur == 0) updates
      else {
        val keys = updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
        read(table).join(keys, keyCols, "left_anti").unionByName(updates)
      }
    overwriteTable(merged, table, partitionCols)
  }

  /** Copy-on-write DELETE: current rows matching `predicate` are
    * dropped, the remainder committed as a new version — completing the
    * DML triad (overwrite / merge / delete) on the snapshot model. The
    * rewrite cost is COW's trade, but deletion by time-travelable
    * version is also what makes a GDPR-style purge auditable: the purge
    * is a commit, and `expire` eventually removes the data physically. */
  def delete(table: String, predicate: org.apache.spark.sql.Column, partitionCols: Seq[String] = Nil): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    overwriteTable(read(table).filter(!predicate), table, partitionCols)
  }

  /** Read the current snapshot (partition discovery + pruning work as
    * on any partitioned parquet directory). */
  def read(table: String): DataFrame = readVersion(table, currentVersion(table))

  /** TableFormat read side — pipeline SQL resolves against the current
    * snapshot instead of a catalog entry. */
  override def read(spark: SparkSession, table: String): DataFrame = read(table)

  /** Time travel to any retained version. */
  def readVersion(table: String, version: Int): DataFrame = {
    require(version > 0, s"table $table has no committed version")
    spark.read.parquet(snapDir(table, version).toString)
  }

  /** Compact the current snapshot into ~`targetFileBytes` files and
    * commit the result as a new version — the maintenance op an
    * incremental/streaming writer needs (many small commits → many
    * small parquet files → scan-split and open-cost overhead at scale).
    * Data is unchanged; readers of prior versions are unaffected.
    *
    * File count = ceil(bytes / target) via `repartition` (partitioned
    * tables repartition on the partition columns, so each Hive
    * partition directory compacts independently). */
  def compact(table: String, partitionCols: Seq[String] = Nil, targetFileBytes: Long = 128L << 20): Unit = {
    val cur = currentVersion(table)
    require(cur > 0, s"table $table has no committed version")
    val d = snapDir(table, cur)
    val bytes = fs(d).getContentSummary(d).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = readVersion(table, cur)
    val compacted =
      if (partitionCols.nonEmpty)
        df.repartition(nFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    overwriteTable(compacted, table, partitionCols)
  }

  /** Drop snapshots older than the retention window (keep the current
    * one plus `previousVersionsMax` predecessors). */
  private def expire(table: String, current: Int): Unit =
    history(table).filter(_ < current - previousVersionsMax).foreach { v =>
      val d = snapDir(table, v)
      fs(d).delete(d, true)
      val m = new Path(metaDir(table), f"v$v%05d.json")
      fs(m).delete(m, false)
    }
}
