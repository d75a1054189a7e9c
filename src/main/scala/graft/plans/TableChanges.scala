package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** `graft_table_changes` — the SQL face of the snapshot layer's CDC
  * readers ([[graft.io.SnapshotTables.diff]]/`diffKeyed`), shaped
  * after the `table_changes(...)` table-valued function Delta ships
  * and the changelog reads Iceberg exposes (both public knowledge;
  * the reference positions its tables as Iceberg-backed,
  * readme.md:93-114):
  *
  *   SELECT * FROM graft_table_changes('cat.ns.t', 1, 3)
  *   SELECT * FROM graft_table_changes('cat.ns.t', 1, 3, 'k1,k2')
  *
  * 3-arg form — the MULTISET diff: data columns + `_change_type`
  * ('insert' rows exist only in `toVersion`, 'delete' only in
  * `fromVersion`; an update surfaces as delete+insert). 4-arg form —
  * the KEY-CLASSIFIED diff: key columns + `_change_type`
  * (insert/update/delete) + `__old`/`__new` row-image structs, exactly
  * [[graft.io.SnapshotTables.diffKeyed]].
  *
  * All arguments must be literals (the table function is resolved at
  * analysis time): a 3-level catalog-qualified table name, two
  * version bounds, and optionally a comma-separated key-column list.
  * A version bound is an INT version number or a STRING timestamp
  * literal (`'2026-08-14 10:00:00'`), resolved on the `TIMESTAMP AS
  * OF` clock to the latest version committed at or before it — the
  * timestamp form Delta's `table_changes` takes. The plan is the
  * diff's own distributed plan — two version-pinned parquet scans
  * joined/anti-joined, no driver materialization. */
object TableChanges {

  private def strLit(e: Expression, what: String): String = e match {
    case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
    case _ => throw new IllegalArgumentException(
      s"graft_table_changes: $what must be a string literal, got $e")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case l: Literal if l.dataType == IntegerType && l.value != null =>
      l.value.asInstanceOf[Int]
    case l: Literal if l.dataType == LongType && l.value != null =>
      l.value.asInstanceOf[Long].toInt
    case _ => throw new IllegalArgumentException(
      s"graft_table_changes: $what must be an integer literal, got $e")
  }

  /** The analysis-time builder registered by [[graft.GraftExtensions]]. */
  def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 4,
      "graft_table_changes(table, fromVersion, toVersion[, keyCols]) takes 3 or 4 arguments, " +
        s"got ${args.length}")
    val qualified = strLit(args.head, "table")
    val spark = SparkSession.active
    val (st, table) = graft.catalog.CatalogTables.resolveSnapshot(spark, qualified)
    def versionArg(e: Expression, what: String): Int = e match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        val millis =
          try java.sql.Timestamp.valueOf(l.value.toString).getTime
          catch {
            case _: IllegalArgumentException => throw new IllegalArgumentException(
              s"graft_table_changes: $what '$l' is neither a version int nor a " +
                "'yyyy-MM-dd HH:mm:ss[.f]' timestamp literal")
          }
        st.versionAtTimestamp(table, millis).getOrElse(throw new IllegalArgumentException(
          s"graft_table_changes: no version of '$qualified' committed at or before $l"))
      case other => intLit(other, what)
    }
    val fromV = versionArg(args(1), "fromVersion")
    val toV = versionArg(args(2), "toVersion")
    val hist = st.history(table)
    require(hist.contains(fromV) && hist.contains(toV),
      s"graft_table_changes: versions $fromV..$toV of '$qualified' must both be retained " +
        s"(retained: ${hist.mkString(", ")})")
    val df = args.lift(3) match {
      case Some(k) =>
        val keys = strLit(k, "keyCols").split(',').map(_.trim).filter(_.nonEmpty).toSeq
        require(keys.nonEmpty, "graft_table_changes: keyCols must name at least one column")
        st.diffKeyed(table, fromV, toV, keys)
      case None => st.diff(table, fromV, toV)
    }
    df.withColumnRenamed("__change", "_change_type").queryExecution.analyzed
  }
}

/** `graft_table_manifest('cat.ns.t')` — the current version's per-file
  * stats manifest as a SQL relation (Iceberg's `files` metadata table):
  * one row per (file, stats column) with row counts, min/max bounds and
  * null counts, plus membership-sketch columns when committed with
  * `sketchCols`. The plan is a plain distributed scan of the
  * manifest parquet ([[graft.io.SnapshotTables.manifest]]) —
  * manifest-sized metadata, never data. Registered by
  * [[graft.GraftExtensions]]. */
object TableManifest {

  def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1,
      s"graft_table_manifest(table) takes exactly 1 argument, got ${args.length}")
    val qualified = args.head match {
      case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"graft_table_manifest: table must be a string literal, got $other")
    }
    val spark = SparkSession.active
    val (st, table) = graft.catalog.CatalogTables.resolveSnapshot(spark, qualified)
    st.manifest(table).queryExecution.analyzed
  }
}

/** `graft_iceberg_scan` — the SQL face of [[graft.io.IcebergImport]]
  * (jar-free read of an external Iceberg v1/v2 table layout):
  *
  *   SELECT * FROM graft_iceberg_scan('/path/to/iceberg/table')
  *   SELECT * FROM graft_iceberg_scan('/path', 3)      -- snapshot id
  *   SELECT * FROM graft_iceberg_scan('/path', 'tag')  -- named ref
  *
  * Planning resolves the snapshot's data-file set from the metadata
  * JSON + Avro manifests (O(metadata)); the scan itself is a stock
  * distributed parquet read, so pushdown/pruning/codegen are intact. */
object IcebergScan {

  def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 || args.length == 2,
      s"graft_iceberg_scan(table_dir[, snapshot_id | ref]) takes 1-2 arguments, got ${args.length}")
    val dir = args.head match {
      case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"graft_iceberg_scan: table_dir must be a string literal, got $other")
    }
    val spark = SparkSession.active
    args.lift(1) match {
      case None =>
        graft.io.IcebergImport.read(spark, dir).queryExecution.analyzed
      case Some(l: Literal) if (l.dataType == LongType || l.dataType == IntegerType) &&
          l.value != null =>
        val snap = l.value match { case i: Int => i.toLong; case v: Long => v }
        graft.io.IcebergImport.read(spark, dir, Some(snap)).queryExecution.analyzed
      case Some(l: Literal) if l.dataType == StringType && l.value != null =>
        // a NAMED REF (tag or branch) — the VERSION AS OF 'name' face
        graft.io.IcebergImport.readRef(spark, dir, l.value.toString).queryExecution.analyzed
      case Some(other) => throw new IllegalArgumentException(
        s"graft_iceberg_scan: second argument must be an integer snapshot id or a string ref, got $other")
    }
  }

  private def dirAndSnap(name: String, args: Seq[Expression]): (String, Option[Long]) = {
    require(args.length == 1 || args.length == 2,
      s"$name(table_dir[, snapshot_id]) takes 1-2 arguments, got ${args.length}")
    val dir = args.head match {
      case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"$name: table_dir must be a string literal, got $other")
    }
    val snap = args.lift(1).map {
      case l: Literal if (l.dataType == LongType || l.dataType == IntegerType) && l.value != null =>
        l.value match { case i: Int => i.toLong; case v: Long => v }
      case other => throw new IllegalArgumentException(
        s"$name: snapshot_id must be an integer literal, got $other")
    }
    (dir, snap)
  }

  /** `.files` metadata twin: graft_iceberg_files('/dir'[, snap]). */
  def filesPlan(args: Seq[Expression]): LogicalPlan = {
    val (dir, snap) = dirAndSnap("graft_iceberg_files", args)
    graft.io.IcebergImport.filesRelation(SparkSession.active, dir, snap)
      .queryExecution.analyzed
  }

  /** ROW-LINEAGE scan (X146): graft_iceberg_lineage_scan('/dir'[,
    * snap]) — the table's rows plus the v3 spec's `_row_id` /
    * `_last_updated_sequence_number`, inherited per manifest-list
    * first_row_id + row position. Pre-upgrade history reads null
    * lineage; non-v3 tables refuse (see
    * [[graft.io.IcebergImport.readWithRowLineage]]). */
  def lineagePlan(args: Seq[Expression]): LogicalPlan = {
    val (dir, snap) = dirAndSnap("graft_iceberg_lineage_scan", args)
    graft.io.IcebergImport.readWithRowLineage(SparkSession.active, dir, snap)
      .queryExecution.analyzed
  }

  /** `.snapshots` metadata twin: graft_iceberg_snapshots('/dir'). */
  def snapshotsPlan(args: Seq[Expression]): LogicalPlan = {
    val (dir, _) = dirAndSnap("graft_iceberg_snapshots", args)
    graft.io.IcebergImport.snapshotsRelation(SparkSession.active, dir)
      .queryExecution.analyzed
  }

  /** `.refs` metadata twin: graft_iceberg_refs('/dir'). */
  def refsPlan(args: Seq[Expression]): LogicalPlan = {
    val (dir, _) = dirAndSnap("graft_iceberg_refs", args)
    graft.io.IcebergImport.refsRelation(SparkSession.active, dir)
      .queryExecution.analyzed
  }

  /** `.partitions` metadata twin:
    * graft_iceberg_partitions('/dir'[, snap]) — one row per live
    * partition value with file count and manifest record-count sum. */
  def partitionsPlan(args: Seq[Expression]): LogicalPlan = {
    val (dir, snap) = dirAndSnap("graft_iceberg_partitions", args)
    graft.io.IcebergImport.partitionsRelation(SparkSession.active, dir, snap)
      .queryExecution.analyzed
  }

  /** Incremental append scan: graft_iceberg_appends('/dir', from[, to])
    * — rows appended strictly AFTER `from` up to (inclusive) snapshot
    * `to` (default: the head). `from` is an integer snapshot id
    * (`0` = the beginning of the lineage; ids are positive) OR a
    * `'yyyy-MM-dd HH:mm:ss[.f]'` timestamp string — the range then
    * starts after the newest snapshot committed at or before that
    * wall-clock time (the `TIMESTAMP AS OF` clock; the reference's
    * "what landed since yesterday's run" consumption). The SQL face of
    * [[graft.io.IcebergImport.appendsBetween]]/`appendsSince`:
    * `replace` snapshots in the range are skipped (no rows added),
    * `overwrite`/`delete` refuse loudly. */
  def appendsPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_iceberg_appends(table_dir, from[, to_snapshot]) takes 2-3 arguments, " +
        s"got ${args.length}")
    val dir = args.head match {
      case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"graft_iceberg_appends: table_dir must be a string literal, got $other")
    }
    val spark = SparkSession.active
    def snapLit(e: Expression, what: String): Long = e match {
      case l: Literal if (l.dataType == LongType || l.dataType == IntegerType) && l.value != null =>
        l.value match { case i: Int => i.toLong; case v: Long => v }
      case other => throw new IllegalArgumentException(
        s"graft_iceberg_appends: $what must be an integer snapshot id, got $other")
    }
    val from: Option[Long] = args(1) match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        val ts = l.value.toString
        val millis =
          try java.sql.Timestamp.valueOf(ts).getTime
          catch {
            case _: IllegalArgumentException => throw new IllegalArgumentException(
              s"graft_iceberg_appends: from '$ts' is neither a snapshot id nor a " +
                "'yyyy-MM-dd HH:mm:ss[.f]' timestamp literal")
          }
        graft.io.IcebergImport.snapshotAtTimestamp(spark, dir, millis)
      case other =>
        val s = snapLit(other, "from")
        if (s == 0L) None else Some(s)
    }
    val to = args.lift(2).map(snapLit(_, "to_snapshot"))
    graft.io.IcebergImport.appendsBetween(spark, dir, from, to).queryExecution.analyzed
  }

  /** Changelog scan: graft_iceberg_changes('/dir', from[, to]) — the
    * CDC face of [[graft.io.IcebergChanges.changesBetween]]: the same
    * range arguments as `graft_iceberg_appends` (integer snapshot id,
    * `0` = the lineage root, or a timestamp string on the `TIMESTAMP
    * AS OF` clock), but `overwrite`/`delete` snapshots emit
    * `_change_type` insert/delete ROWS instead of refusing. */
  def changesPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      s"graft_iceberg_changes(table_dir, from[, to_snapshot]) takes 2-3 arguments, " +
        s"got ${args.length}")
    val dir = args.head match {
      case l: Literal if l.dataType == StringType && l.value != null => l.value.toString
      case other => throw new IllegalArgumentException(
        s"graft_iceberg_changes: table_dir must be a string literal, got $other")
    }
    val spark = SparkSession.active
    def snapLit(e: Expression, what: String): Long = e match {
      case l: Literal if (l.dataType == LongType || l.dataType == IntegerType) && l.value != null =>
        l.value match { case i: Int => i.toLong; case v: Long => v }
      case other => throw new IllegalArgumentException(
        s"graft_iceberg_changes: $what must be an integer snapshot id, got $other")
    }
    val from: Option[Long] = args(1) match {
      case l: Literal if l.dataType == StringType && l.value != null =>
        val ts = l.value.toString
        val millis =
          try java.sql.Timestamp.valueOf(ts).getTime
          catch {
            case _: IllegalArgumentException => throw new IllegalArgumentException(
              s"graft_iceberg_changes: from '$ts' is neither a snapshot id nor a " +
                "'yyyy-MM-dd HH:mm:ss[.f]' timestamp literal")
          }
        graft.io.IcebergImport.snapshotAtTimestamp(spark, dir, millis)
      case other =>
        val s = snapLit(other, "from")
        if (s == 0L) None else Some(s)
    }
    val to = args.lift(2).map(snapLit(_, "to_snapshot"))
    graft.io.IcebergChanges.changesBetween(spark, dir, from, to).queryExecution.analyzed
  }
}
