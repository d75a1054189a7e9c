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
  * isolation). Retention deletes snapshots older than
  * `previousVersionsMax` behind the current one AFTER the flip, so no
  * reader holding the old pointer within the retention window ever
  * loses its files — the same contract Iceberg's metadata retention
  * gives the reference.
  *
  * Concurrency (multi-writer safe): the commit point is an EXCLUSIVE
  * create (`overwrite=false`) of the version's metadata file — atomic
  * on HDFS and the jar-free CAS primitive log-store implementations
  * use. Two writers racing for v+1 cannot both win: the loser gets a
  * [[SnapshotTables.ConcurrentCommitException]] with its temp data
  * cleaned up, and retries on top of the winner's commit. Data is
  * staged in a unique `.tmp-*` directory and renamed into place only
  * after winning the CAS, so `history`/readers never see a
  * half-written snapshot. The pointer file is a monotonic-advance
  * cache of max(history) — it only moves forward, and
  * [[currentVersion]] always takes max(pointer, newest snapshot dir),
  * so a stale, regressed, or missing pointer can never mask a
  * committed snapshot. A winner that crashes between the CAS and the
  * data rename leaves an orphan metadata file; later writers reclaim
  * it after `orphanGraceMs` (see [[casWithOrphanReclaim]]) so a crash
  * cannot wedge the table. The exclusive create is atomic on HDFS
  * (namenode-side) and on local filesystems (POSIX O_EXCL via
  * CREATE_NEW — Hadoop's local `create(overwrite=false)` is only
  * check-then-create, which two racing writers can both pass).
  * Caveat: on S3A, exclusive create remains check-then-create; real
  * S3 multi-writer needs a conditional-PUT or DynamoDB-style log
  * store, the Iceberg/Delta swap-in seam of SURVEY §7.
  *
  * COMMIT LAYOUTS (`graft.commit.layout`, default "rename" — pinnable
  * per table as a TBLPROPERTY, [[setCommitLayout]], with the session
  * conf governing unpinned tables and serving as the catalog's
  * CREATE-time default): the stage-then-rename protocol above is atomic and
  * cheap on HDFS and local filesystems, but on S3-family object
  * stores RENAME IS A SERVER-SIDE COPY — publishing a staged snapshot
  * is O(data), the exact cliff Iceberg's write-once-files +
  * file-listing-manifests design exists to avoid. The "direct" layout
  * is that design on this format: data files are written ONCE into
  * their final location under the table's shared pool
  * (`<table>/data/<writerUUID>/`), the version metadata records that
  * location (`"data_dir"`, an absolute URI, before the schema like
  * every commit field), and the metadata CAS **is the entire
  * commit** — no rename, no orphan window (data precedes the CAS, so
  * a won CAS is instantly complete), and publish/WAP/fold/rollback
  * never move a data byte: publish adopts the branch commit's pool
  * dir by reference (branch commits write into the MAIN table's pool
  * precisely so the reference survives `dropBranch`). Every version
  * meta is self-describing, so a table may freely mix layouts across
  * versions. Garbage collection is REACHABILITY-based, as in Iceberg:
  * a pool dir referenced by no retained meta (main or branch) is
  * debris — CAS losers delete their own dirs eagerly; hard-crashed
  * writers' dirs wait for [[removeOrphans]], Iceberg's own
  * `remove_orphan_files` contract.
  */
final class SnapshotTables(
    spark: SparkSession,
    root: String,
    previousVersionsMax: Int = 10,
    orphanGraceMs: Long = 60000L,
    stagingGraceMs: Long = 3600000L,
    heartbeatMs: Long = 15000L,
    sketchBits: Int = 1 << 17,
    sketchHashes: Int = 4,
    // branch instances write direct-layout data into the PARENT
    // table's pool (see the class doc's publish-by-reference design)
    dataPoolRoot: Option[String] = None
) extends TableFormat {

  // readPrunedIn's codegen'd bloomHit unrolls at most 8 hash positions;
  // a larger sketchHashes would silently test only the first 8,
  // degrading the configured false-positive rate with no error.
  require(sketchHashes >= 1 && sketchHashes <= 8,
    s"sketchHashes must be in [1, 8], got $sketchHashes")

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String) = new Path(root, table)
  private def metaDir(table: String) = new Path(tableDir(table), "metadata")
  private def snapDir(table: String, v: Int) =
    new Path(tableDir(table), f"snapshots/v$v%05d")
  private def pointer(table: String) = new Path(metaDir(table), "current")

  /** Write-once data pool of the direct layout: `<table>/data/`, one
    * subdir per commit attempt. Branch instances override it with the
    * PARENT table's pool so a published branch commit's dir survives
    * `dropBranch` (see the class doc). */
  private def dataPoolDir(table: String): Path =
    dataPoolRoot.map(new Path(_)).getOrElse(new Path(tableDir(table), "data"))

  private def commitLayoutPath(table: String): Path =
    new Path(metaDir(table), "commit_layout")

  private def validatedLayout(raw: String): String = {
    val m = raw.trim
    require(m == "rename" || m == "direct",
      s"graft.commit.layout must be 'rename' or 'direct', got '$raw'")
    m
  }

  /** The table's standing commit layout — "rename" (default: stage
    * under `.tmp-*`, rename into the version line after the CAS) or
    * "direct" (write-once files in the pool; the metadata CAS is the
    * entire commit — the shape object stores need, where rename is a
    * copy). Resolution: the per-table pin (TBLPROPERTY
    * `graft.commit.layout`, [[setCommitLayout]]) wins; tables without
    * a pin follow the `graft.commit.layout` SESSION conf, then
    * "rename". The pin is the point: where a table lives (an object
    * store vs a rename-capable FS) is a property of the TABLE, and a
    * default-conf writer touching a pinned-direct 100 TB table must
    * not silently revert it to O(data) rename commits. */
  def commitLayoutFor(table: String): String = {
    val p = commitLayoutPath(table)
    if (fs(p).exists(p)) validatedLayout(readSmallFile(p))
    else spark.conf.getOption("graft.commit.layout")
      .map(validatedLayout).getOrElse("rename")
  }

  /** The session conf's layout, validated, if set — what catalog
    * CREATE pins onto new tables that gave no explicit TBLPROPERTY. */
  def sessionCommitLayoutDefault: Option[String] =
    spark.conf.getOption("graft.commit.layout").map(validatedLayout)

  /** The table's pinned layout, if any — None means "follow the
    * session conf" (the pre-pin behavior). */
  def pinnedCommitLayout(table: String): Option[String] = {
    val p = commitLayoutPath(table)
    if (fs(p).exists(p)) Some(validatedLayout(readSmallFile(p))) else None
  }

  /** Pin (or with None unpin) the table's commit layout. Validation is
    * eager and the write is all-or-nothing: an invalid value raises
    * with zero on-disk side effects. Metadata-only — existing versions
    * keep the layout their metas record (metas are self-describing, so
    * mixing layouts across a table's history is always safe). */
  def setCommitLayout(table: String, mode: Option[String]): Unit = mode match {
    case Some(m) => replaceSmallFile(commitLayoutPath(table), validatedLayout(m))
    case None =>
      val p = commitLayoutPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
  }

  /** The `data_dir` a version's commit metadata records (direct
    * layout), None for rename-layout versions or unreadable/missing
    * metas. Commit fields are parsed only BEFORE the embedded schema
    * json, like every meta field. */
  private def metaDataDirString(table: String, v: Int): Option[String] = {
    val m = new Path(metaDir(table), f"v$v%05d.json")
    try {
      if (!fs(m).exists(m)) None
      else {
        val raw = readSmallFile(m)
        val json = raw.indexOf("\"schema\":") match {
          case -1 => raw
          case i => raw.substring(0, i)
        }
        "\"data_dir\":\"([^\"]+)\"".r.findFirstMatchIn(json).map(_.group(1))
      }
    } catch { case _: java.io.IOException => None }
  }

  /** A version's data directory: the commit metadata's recorded
    * write-once pool location (direct layout) or the version-line dir
    * the rename layout moved data into. EVERY data read, byte count
    * and delete resolves through here — the version meta is
    * authoritative, never the directory convention. */
  private def dataDirOf(table: String, v: Int): Path =
    metaDataDirString(table, v).map(new Path(_)).getOrElse(snapDir(table, v))

  private[io] def dataDirOfMeta(table: String, m: SnapshotTables.VersionMeta): Path =
    m.dataDir.map(new Path(_)).getOrElse(snapDir(table, m.v))

  private def writeSmallFile(p: Path, content: String): Unit = {
    val f = fs(p)
    val out = f.create(p, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  /** Overwrite a small metadata file WITHOUT a torn-read window: write
    * to a unique sibling temp, then move it over the destination. On
    * the local FS the move is POSIX-atomic (ATOMIC_MOVE); elsewhere it
    * degrades to delete+rename — a reader can then briefly see the
    * file absent (and fall back to its documented no-file behavior)
    * but can never see half the content. */
  private def replaceSmallFile(p: Path, content: String): Unit =
    AtomicFs.replaceSmall(fs(p), p, content)

  /** Exclusive create — the commit CAS ([[AtomicFs.createExclusive]]:
    * POSIX O_EXCL locally, create(overwrite=false) on cluster
    * filesystems). Returns false ONLY when `p` already exists (another
    * writer won the version); other I/O failures propagate. */
  private def createExclusive(p: Path, content: String): Boolean =
    AtomicFs.createExclusive(fs(p), p, content)

  /** The commit CAS with FENCED crash-orphan recovery. A writer that
    * won the CAS for `next` but crashed before renaming its staged
    * data leaves a metadata file with no snapshot directory — without
    * recovery, every future commit targets the same `next`, loses the
    * CAS, and the table wedges permanently. When the lost CAS turns
    * out to be against such an orphan (meta present, snapshot dir
    * absent) that is older than `orphanGraceMs` (a live winner may
    * still be mid-rename — renames of a staged directory are fast, so
    * the grace period only needs to cover scheduling jitter), the
    * orphan meta is deleted and the CAS retried once.
    *
    * Fencing: every meta carries its writer's attempt UUID, and a
    * reclaimer re-reads the meta IMMEDIATELY before deleting it — if
    * the content no longer matches what was statted as orphaned
    * (another reclaimer already swept it and re-won with its own
    * meta), the reclaim is abandoned instead of deleting the new
    * winner's commit record. The original winner, if merely paused
    * rather than crashed, discovers the theft when it re-reads the
    * meta around its data rename (see [[overwriteTable]]) and backs
    * off — the reclaim grace is a lease, the UUID is the fence token. */
  private def casWithOrphanReclaim(table: String, next: Int, meta: Path, metaJson: String): Boolean =
    createExclusive(meta, metaJson) || {
      val f = fs(meta)
      val orphanContent =
        if (!f.exists(snapDir(table, next)) && f.exists(meta) &&
          (System.currentTimeMillis - f.getFileStatus(meta).getModificationTime) >= orphanGraceMs)
          try Some(readSmallFile(meta)) catch { case _: java.io.IOException => None }
        else None
      orphanContent.exists { statted =>
        // a DIRECT-layout meta is NEVER an orphan: its data was staged
        // before the CAS, so meta presence is a complete commit — it
        // has no snapshot dir by design, and reclaiming it would
        // delete a live commit record. (Commit fields parse only
        // before the embedded schema json, as everywhere.)
        val prefix = statted.indexOf("\"schema\":") match {
          case -1 => statted
          case i => statted.substring(0, i)
        }
        val isDirect = prefix.contains("\"data_dir\":\"")
        // re-read right before the delete: if the meta changed hands
        // since we statted it, another reclaimer re-won — back off.
        val still = try f.exists(meta) && readSmallFile(meta) == statted
                    catch { case _: java.io.IOException => false }
        !isDirect && still && !f.exists(snapDir(table, next)) &&
          { f.delete(meta, false); createExclusive(meta, metaJson) }
      }
    }

  private def readSmallFile(p: Path): String = AtomicFs.readSmall(fs(p), p)

  /** Current committed version, 0 when the table does not exist yet.
    * Always the max of the pointer cache and the newest committed
    * snapshot directory: a stale pointer (crash between the data
    * rename and the pointer flip, or interleaved multi-writer pointer
    * writes) can therefore never mask a committed snapshot — the
    * pointer is a fast-path hint, never load-bearing for correctness. */
  def currentVersion(table: String): Int = {
    val p = pointer(table)
    val viaPointer =
      if (fs(p).exists(p))
        try readSmallFile(p).toInt
        catch { case _: NumberFormatException => 0 }
      else 0
    math.max(viaPointer, history(table).lastOption.getOrElse(0))
  }

  /** All retained versions, ascending: version-line dirs (rename
    * layout) plus direct-layout commits, whose ONLY on-disk footprint
    * under the version line is the metadata file — for those, a
    * version is committed iff its meta exists AND records a
    * `data_dir` (data is staged before the CAS, so meta presence is
    * completion). A meta with neither dir nor data_dir is a
    * rename-layout commit inside its CAS→rename window, or a crash
    * orphan — not history, exactly as before. */
  def history(table: String): Seq[Int] = {
    val d = new Path(tableDir(table), "snapshots")
    val f = fs(d)
    val viaDirs: Seq[Int] =
      if (!f.exists(d)) Nil
      else
        f.listStatus(d).toSeq
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("v") => n.drop(1).toInt }
    val dirSet = viaDirs.toSet
    val md = metaDir(table)
    val mf = fs(md)
    val viaMeta: Seq[Int] =
      if (!mf.exists(md)) Nil
      else
        mf.listStatus(md).toSeq
          .map(_.getPath.getName)
          .collect {
            case n if n.startsWith("v") && n.endsWith(".json") &&
                n.stripPrefix("v").stripSuffix(".json").forall(_.isDigit) =>
              n.stripPrefix("v").stripSuffix(".json").toInt
          }
          .filterNot(dirSet)
          .filter(v => metaDataDirString(table, v).isDefined)
    (viaDirs ++ viaMeta).sorted
  }

  /** Commit `df` as the next version of `table`.
    *
    * @throws SnapshotTables.ConcurrentCommitException when another
    *         writer commits the same next version first; this writer's
    *         staged data is removed and the table is untouched — retry
    *         on top of the winner's commit. */
  override def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit =
    overwriteTable(df, table, partitionCols, Nil)

  def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String], statsCols: Seq[String]): Unit =
    overwriteTable(df, table, partitionCols, statsCols, Nil)

  /** Commit with a per-file stats manifest over `statsCols` (numeric or
    * string columns): after the data rename, parquet FOOTERS of the
    * staged files are read on executors (metadata-only — no data pages
    * touched, distributed, never collected to the driver) and written
    * as a small manifest parquet beside the version metadata.
    * [[readPruned]] then answers range predicates on a stats column by
    * scanning only the files whose [min,max] intersects — Iceberg's
    * manifest pruning, on nothing but parquet + a directory. A crash
    * between data rename and manifest write degrades cleanly: no
    * manifest → readPruned falls back to the full snapshot. */
  /** Commit with a stats manifest over `statsCols` AND per-file Bloom
    * membership sketches over `sketchCols` — the point-lookup sibling
    * of min/max pruning: [[readPrunedIn]] answers `col = v` / `col IN
    * (...)` by scanning only the files whose sketch claims a possible
    * hit (range stats can't skip for a point value inside every file's
    * [min,max], e.g. a high-cardinality id probed in an unsorted
    * table). Sketch building reads the committed files' DATA once
    * (distributed, bounded memory per file — the bitmap is fixed-size
    * regardless of cardinality); like `statsCols` it persists as a
    * table property so every later commit keeps maintaining it. */
  def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String], statsCols: Seq[String],
      sketchCols: Seq[String]): Unit =
    overwriteImpl(df, table, partitionCols, statsCols, sketchCols, applySortOrder = true)

  /** [[overwriteTable]] minus the standing sort-order redistribution —
    * for [[compact]]/[[optimize]], whose explicit file shaping
    * (size-targeted repartition, z-order clustering) must not be
    * re-shuffled away by the table's write sort order. */
  private[io] def overwriteShaped(df: DataFrame, table: String, partitionCols: Seq[String],
      statsCols: Seq[String] = Nil, sketchCols: Seq[String] = Nil,
      expectedNext: Option[Int] = None): Unit =
    overwriteImpl(df, table, partitionCols, statsCols, sketchCols, applySortOrder = false,
      expectedNext = expectedNext)

  private def overwriteImpl(df: DataFrame, table: String, partitionCols: Seq[String],
      statsCols: Seq[String], sketchCols: Seq[String], applySortOrder: Boolean,
      metaExtra: String = "", expectedNext: Option[Int] = None): Unit = {
    // statsCols is a persistent TABLE PROPERTY, not a per-write flag:
    // once set, every later commit — merge, delete, compact,
    // overwritePartitions all route through here — keeps maintaining
    // the manifest without the caller re-threading the columns. The
    // property is persisted only AFTER this writer wins the CAS (a
    // race loser must not overwrite the table's stats columns) and
    // atomically (see below), so a concurrent reader never sees a torn
    // column list.
    val effectiveStats =
      if (statsCols.nonEmpty) statsCols
      else {
        val p = statsColsPath(table)
        if (fs(p).exists(p)) readSmallFile(p).split(',').toSeq.filter(_.nonEmpty) else Nil
      }
    val effectiveSketch =
      if (sketchCols.nonEmpty) sketchCols
      else {
        val p = sketchColsPath(table)
        if (fs(p).exists(p)) readSmallFile(p).split(',').toSeq.filter(_.nonEmpty) else Nil
      }
    // A hidden-partitioned table re-derives its layout on every plain
    // commit: DML rewrites (merge/delete/compact/optimize) route
    // through here with no partition columns, and without this the
    // rewrite would silently flatten the directory layout. Derived
    // values are pure functions of the data, so re-application is
    // exact; an explicit partitionBy overrides the spec. A MIXED
    // table (identity columns AND derived transforms — Iceberg's
    // general spec, declared via `PARTITIONED BY (region, days(ts))`)
    // re-threads its identity columns too: currentPartitionCols is
    // the previous commit's identity list (the `__p_` names strip),
    // so the full layout survives every plain commit.
    val (df1, partitionCols1) = withTableLayout(df, table, partitionCols, applySortOrder)
    commitVersion(
      table,
      stage = tmp => {
        val w = df1.write.mode(SaveMode.Overwrite)
        (if (partitionCols1.nonEmpty) w.partitionBy(partitionCols1: _*) else w)
          .parquet(tmp.toString)
      },
      partitionCols1 = partitionCols1,
      schemaJson = df1.schema.json,
      metaExtra = metaExtra,
      expectedNext = expectedNext,
      afterWin = () => {
        if (statsCols.nonEmpty) replaceSmallFile(statsColsPath(table), statsCols.mkString(","))
        if (sketchCols.nonEmpty) replaceSmallFile(sketchColsPath(table), sketchCols.mkString(","))
      },
      manifestStats = effectiveStats,
      manifestSketch = effectiveSketch)
    ()
  }

  /** Apply the table's standing layout to a frame about to commit:
    * derived hidden-partition transforms re-apply from the persisted
    * spec (pure functions of the data), and empty `partitionCols`
    * INHERITS the current identity layout rather than flattening it —
    * so delete/update/merge/append callers (and bare overwrites) keep
    * the directory structure without re-threading it; an explicit
    * partitionBy still overrides. Returns (frame with derived columns,
    * effective partition columns). */
  private def withTableLayout(df: DataFrame, table: String,
      partitionCols: Seq[String], applySortOrder: Boolean = true): (DataFrame, Seq[String]) = {
    val transforms = if (partitionCols.isEmpty) effectiveTransforms(table) else Nil
    val (df1, pcols) =
      if (transforms.isEmpty)
        (df, if (partitionCols.nonEmpty) partitionCols
             else currentPartitionCols(table).filter(df.columns.contains))
      else (transforms.foldLeft(df)((d, t) =>
        if (d.columns.contains(t.name)) d else d.withColumn(t.name, t.expr)),
        currentPartitionCols(table) ++ transforms.map(_.name))
    // standing write sort order (Iceberg's range write distribution +
    // sort order): RANGE-partition the commit on the sort keys, then
    // sort within tasks — each staged file carries a DISJOINT [min,max]
    // run on the sort columns, which is what makes the per-file stats
    // manifest actually skip files (a within-task sort alone would
    // leave every file spanning the whole domain). One extra shuffle
    // per commit, width sized from the frame's own byte stats (a
    // streaming micro-batch lands in 1-2 files, a full snapshot takes
    // the session width) so small deltas never shatter into 32 shards.
    // Partition columns LEAD the keys: rows co-locate per directory
    // and FileFormatWriter's required ordering on them is already
    // satisfied, so it never re-sorts the data-column runs away.
    val so = if (applySortOrder) sortOrder(table).filter(df1.columns.contains) else Nil
    if (so.isEmpty) (df1, pcols)
    else {
      import org.apache.spark.sql.functions.col
      val bytes = df1.queryExecution.optimizedPlan.stats.sizeInBytes
      val configured = scala.util.Try(
        spark.conf.get("spark.sql.shuffle.partitions").toInt
      ).getOrElse(spark.sparkContext.defaultParallelism)
      val width = ((bytes / sortTargetFileBytes) + 1).min(BigInt(configured)).max(BigInt(1)).toInt
      val keys = (pcols ++ so).distinct.map(col)
      (df1.repartitionByRange(width, keys: _*).sortWithinPartitions(keys: _*), pcols)
    }
  }

  /** `graft.write.targetFileBytes` — target bytes per sorted-write
    * file (Iceberg's write.target-file-size-bytes; default 64 MB of
    * Catalyst-estimated input per file). Sizes the sort-order range
    * shuffle so a micro-batch stays in one or two files while a full
    * snapshot spreads across the session width. */
  private def sortTargetFileBytes: Long =
    spark.conf.getOption("graft.write.targetFileBytes") match {
      case None => 64L << 20
      case Some(raw) => raw.trim.toLongOption match {
        case Some(n) if n > 0 => n
        case _ => throw new IllegalArgumentException(
          s"graft.write.targetFileBytes must be a positive long, got '$raw'")
      }
    }

  /** The fenced commit machinery every commit shape shares — full
    * snapshots ([[overwriteTable]]) and delta commits ([[append]],
    * [[upsertMor]], [[deleteKeysMor]] and the patch-style MOR DML):
    * stage via `stage(tmpDir)` under a unique heartbeated temp dir, win
    * the version CAS, rename into the version line with the full
    * ownership re-check dance, then run post-commit bookkeeping
    * (stats/sketch property persistence via `afterWin`, manifest,
    * pointer advance, retention). `metaExtra` rides inside the version
    * metadata JSON — empty for a full snapshot; delta commits record
    * `"kind"`/`"base"`/`"key_cols"` there. `expectedNext` fences
    * content races for delta producers whose staged rows were computed
    * AGAINST a specific base version: if another writer committed since
    * the producer read that base, the commit fails with
    * [[SnapshotTables.ConcurrentCommitException]] instead of recording
    * a delta whose base no longer matches. Returns the committed
    * version. */
  private def commitVersion(
      table: String,
      stage: Path => Unit,
      partitionCols1: Seq[String],
      schemaJson: String,
      metaExtra: String,
      expectedNext: Option[Int],
      afterWin: () => Unit,
      manifestStats: Seq[String],
      manifestSketch: Seq[String]): Int = {
    val next = currentVersion(table) + 1
    expectedNext.foreach { e =>
      if (e != next) throw new SnapshotTables.ConcurrentCommitException(table, next)
    }
    // Stage the data under a unique writer-owned dir: a `.tmp-*`
    // sibling of the version line (rename layout — invisible to
    // history()/readers until the post-CAS rename) or the FINAL pool
    // location (direct layout — write-once, never moved; invisible
    // because no meta references it yet). A heartbeat marker inside
    // the dir is refreshed for as long as the write job runs, so
    // debris sweeps can tell a LIVE long write from abandonment
    // (task-output activity under _temporary/ does not refresh the
    // staging dir's own mtime).
    val direct = commitLayoutFor(table) == "direct"
    val writerId = java.util.UUID.randomUUID.toString
    val tmp =
      if (direct) new Path(dataPoolDir(table), writerId)
      else new Path(tableDir(table), s"snapshots/.tmp-$writerId")
    withHeartbeat(tmp) { stage(tmp) }
    val meta = new Path(metaDir(table), f"v$next%05d.json")
    // writer UUID = the fence token for orphan reclaim: ownership of
    // version `next` is decided by which attempt's content sits in the
    // meta file, not merely by the file existing.
    val dataDirJson =
      if (direct) s""""data_dir":"${fs(tmp).makeQualified(tmp)}",""" else ""
    val metaJson =
      s"""{"version":$next,"writer":"$writerId",""" +
        s""""partition_cols":${partitionCols1.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        dataDirJson +
        metaExtra +
        s""""schema":$schemaJson}"""
    def metaIsOurs: Boolean =
      try fs(meta).exists(meta) && readSmallFile(meta).contains(s""""writer":"$writerId"""")
      catch { case _: java.io.IOException => false }
    // The CAS: exclusive-create of the version metadata file decides
    // the winner of version `next`.
    if (!casWithOrphanReclaim(table, next, meta, metaJson)) {
      fs(tmp).delete(tmp, true)
      throw new SnapshotTables.ConcurrentCommitException(table, next)
    }
    if (!direct) {
      val dest = snapDir(table, next)
      // A winner paused (GC, suspension) past orphanGraceMs between the
      // CAS and this rename may have been reclaimed: its meta now
      // belongs to another writer and the version may already hold that
      // writer's data. Re-check ownership IMMEDIATELY before renaming —
      // a stale winner backs off instead of nesting its staged dir
      // inside the other winner's committed snapshot (HDFS rename onto
      // an existing dir nests the source).
      if (!metaIsOurs) {
        fs(tmp).delete(tmp, true)
        throw new SnapshotTables.ConcurrentCommitException(table, next)
      }
      if (!fs(tmp).rename(tmp, dest)) {
        // We own `next` but could not place its data: remove the staged
        // data and — only if it is still OURS (the rename may have
        // failed precisely because a reclaimer stole the version and
        // committed its own data) — our metadata file, so this failed
        // attempt neither wedges the version nor deletes the other
        // winner's commit record.
        fs(tmp).delete(tmp, true)
        if (metaIsOurs) fs(meta).delete(meta, false)
        throw new SnapshotTables.ConcurrentCommitException(table, next)
      }
      // Post-rename ownership audit: if the meta changed hands while the
      // rename was in flight, our data may have nested inside the other
      // winner's snapshot dir. Undo the nesting (delete only OUR staged
      // subtree, identified by the writer UUID in its name) and report
      // the lost race.
      if (!metaIsOurs) {
        val nested = new Path(dest, tmp.getName)
        if (fs(nested).exists(nested)) fs(nested).delete(nested, true)
        throw new SnapshotTables.ConcurrentCommitException(table, next)
      }
    }
    // Direct layout: the won CAS IS the commit — the data already sits
    // in its final write-once location and the meta records it. There
    // is no rename, no ownership re-check (direct metas are never
    // orphan-reclaimed — see casWithOrphanReclaim) and no orphan
    // window; everything below is post-commit bookkeeping.
    afterWin()
    if (manifestStats.nonEmpty || manifestSketch.nonEmpty)
      writeManifest(table, next, manifestStats, manifestSketch)
    advancePointer(table, next)
    expire(table, next)
    next
  }

  /** Run `body` (the staged write job) with a live-writer heartbeat: a
    * daemon thread re-writes a hidden marker file inside `dir` every
    * `heartbeatMs`, keeping its mtime fresh for vacuumStaging's age
    * check. The marker is removed once the write completes (the
    * staging dir is about to be renamed into a committed snapshot;
    * hidden files are invisible to readers anyway, but there is no
    * reason to carry it). */
  private def withHeartbeat(dir: Path)(body: => Unit): Unit = {
    val marker = new Path(dir, SnapshotTables.HeartbeatName)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      try {
        while (!stop.get()) {
          // Beat ONLY once the write job has created the staging dir.
          // The marker write would otherwise CREATE the dir before the
          // job starts, and the job's Overwrite mode then races its
          // clear-output step against the next beat re-creating the
          // marker — an intermittent "Unable to clear output directory"
          // job failure (observed live). An existing dir is never
          // cleared mid-write by the job again, so beating after
          // creation is race-free; a write that finishes before the
          // first beat simply never needed liveness marking (vacuum
          // falls back to dir mtime).
          try { if (fs(dir).exists(dir)) writeSmallFile(marker, System.currentTimeMillis.toString) }
          catch { case _: java.io.IOException => () } // transient: next beat retries
          val deadline = System.currentTimeMillis + heartbeatMs
          while (!stop.get() && System.currentTimeMillis < deadline) Thread.sleep(200)
        }
      } catch { case _: InterruptedException => () } // teardown interrupt (below)
    }, s"graft-staging-heartbeat-${dir.getName}")
    t.setDaemon(true)
    t.start()
    try body
    finally {
      // interrupt, don't just flag: the beat loop sleeps in 200 ms
      // slices, and a bare join here stalled EVERY staged commit an
      // average ~100 ms waiting the current slice out (driver-profiled
      // at ~10 % of q133's wall, r20 optimization round)
      stop.set(true); t.interrupt(); t.join(5000)
      try { val f = fs(marker); if (f.exists(marker)) f.delete(marker, false) }
      catch { case _: java.io.IOException => () }
    }
  }

  /** Advance the pointer cache, never regress it: a slower writer
    * finishing an older version after a newer one flipped must not
    * move readers backwards. */
  private def advancePointer(table: String, next: Int): Unit = {
    val p = pointer(table)
    val cur =
      if (fs(p).exists(p))
        try readSmallFile(p).toInt catch { case _: NumberFormatException => 0 }
      else 0
    if (next > cur) writeSmallFile(p, next.toString)
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
  def merge(table: String, updates: DataFrame, keyCols: Seq[String], partitionCols: Seq[String] = Nil): Unit =
    merge(table, updates, keyCols, partitionCols, evolveSchema = false)

  /** MERGE with optional SCHEMA EVOLUTION (Iceberg's
    * `mergeSchema`/add-column semantics): with `evolveSchema`, source
    * columns the table lacks are ADDED (existing rows read NULL — the
    * snapshot schema grows at the end, old versions untouched), and
    * table columns the source lacks are null-filled for the incoming
    * rows. Column ADD/DROP mismatches only — a same-name TYPE conflict
    * still fails the commit (silent coercion is how corrupt lakes are
    * made; route deliberate re-typing through an explicit cast in the
    * source frame). Without `evolveSchema`, any column mismatch fails
    * as before. */
  def merge(table: String, updates: DataFrame, keyCols: Seq[String], partitionCols: Seq[String],
      evolveSchema: Boolean): Unit = {
    require(keyCols.nonEmpty, "merge needs key columns")
    val cur = currentVersion(table)
    val merged =
      if (cur == 0) updates
      else {
        val keys = updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
        read(table).join(keys, keyCols, "left_anti")
          .unionByName(updates, allowMissingColumns = evolveSchema)
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
    // SQL DELETE semantics: only rows where the predicate is TRUE go;
    // rows where it evaluates NULL are KEPT (a bare `!predicate` would
    // silently delete them too)
    import org.apache.spark.sql.functions.{coalesce, lit}
    overwriteTable(read(table).filter(!coalesce(predicate, lit(false))), table, partitionCols)
  }

  /** Copy-on-write UPDATE — the third leg of the DML triad: rows where
    * `predicate` is TRUE take the `sets` assignments, every other row
    * is carried unchanged, one new committed version. All assignment
    * expressions evaluate against the OLD row (SQL semantics — `SET a
    * = b, b = a` swaps), which is why new values are materialized as
    * temporary columns before any column is replaced. */
  def update(table: String, sets: Seq[(String, org.apache.spark.sql.Column)],
      predicate: org.apache.spark.sql.Column, partitionCols: Seq[String] = Nil): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    require(sets.nonEmpty, "update needs at least one assignment")
    val cur = read(table)
    val unknown = sets.map(_._1).filterNot(cur.columns.contains)
    require(unknown.isEmpty, s"unknown columns in SET: ${unknown.mkString(", ")}")
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val hit = coalesce(predicate, lit(false))
    val tmp = sets.zipWithIndex.map { case ((c, v), i) => (c, s"__upd_$i", v) }
    val staged = tmp.foldLeft(cur)((d, t) => d.withColumn(t._2, when(hit, t._3).otherwise(col(t._1))))
    val out = cur.columns.toSeq.map(c => tmp.find(_._1 == c).map(t => col(t._2).as(c)).getOrElse(col(c)))
    overwriteTable(staged.select(out: _*), table, partitionCols)
  }

  // ------------------------------------------------------------------
  // Delta commits — the merge-on-read half of the table format (public
  // knowledge: Iceberg v2 row-level deletes and Delta's deletion
  // vectors both commit SMALL delta files and defer the rewrite to
  // compaction). A full-snapshot commit is O(table); at the 100 TB
  // point a daily append or a 0.01% DELETE must not rewrite the world,
  // so these commit O(delta) bytes: a version directory holding ONLY
  // the delta, with its kind and base recorded in the version
  // metadata. Readers resolve the chain (base full snapshot + deltas
  // in order) into one DataFrame plan — anti-joins and unions, fully
  // distributed, no driver materialization. Chains are bounded:
  // `graft.delta.maxChainLength` (default 16) triggers automatic
  // MINOR COMPACTION ([[compactDeltas]] — fold the deltas into one
  // equivalent segment at O(Σ deltas), the base untouched), escalating
  // to a materializing O(table) commit only when the deltas have grown
  // to rival the base (`graft.delta.materializeRatio`) or the chain is
  // unfoldable; compact()/optimize() always materialize.
  //
  // Commit kinds, each with its resolution rule:
  //  - "append":     dir holds new data rows (table layout applied) →
  //                  base ∪ delta. Stats manifests keep being written
  //                  per segment, so file pruning and fastCount stay
  //                  available on append-only chains.
  //  - "mor_upsert": dir holds replacement rows, meta carries key_cols
  //                  → (base ⟕̸ keys) ∪ delta. The streaming merge
  //                  sink's O(batch) commit path.
  //  - "mor_delete": dir holds deleted KEY rows (key_cols in meta) →
  //                  base anti-join keys. A GDPR purge writes only the
  //                  ids it purges.
  //  - "mor_patch":  dir holds del/ and add/ subdirs (full row images,
  //                  multiset semantics) → (base EXCEPT ALL del) ∪ add.
  //                  The shape predicate DELETE/UPDATE lower to when
  //                  the table's write mode is "mor".
  //  - "mor_revise": minor compaction's folded segment — del/ holds
  //                  KEY rows, add/ full rows (key_cols in meta) →
  //                  (base ⟕̸ keys) ∪ add. Only [[compactDeltas]]
  //                  commits it; its meta carries `fold:true` so CDC
  //                  knows the commit was content-preserving.
  // Time travel, diff/CDC, rollback, branches and the change feed all
  // read through [[readVersion]] and therefore resolve chains
  // transparently; retention protects every chain ancestor a retained
  // version still needs.
  // ------------------------------------------------------------------

  import SnapshotTables.VersionMeta

  private def versionMeta(table: String, v: Int): VersionMeta = {
    val m = new Path(metaDir(table), f"v$v%05d.json")
    require(fs(m).exists(m),
      s"version $v of $table is not retained (metadata missing) — its delta chain cannot be resolved")
    val raw = readSmallFile(m)
    // commit fields live BEFORE the embedded schema json — a column
    // whose field metadata happens to contain "kind"/"base"/"fold"
    // keys must never be read as commit metadata
    val json = raw.indexOf("\"schema\":") match {
      case -1 => raw
      case i => raw.substring(0, i)
    }
    val kind = "\"kind\":\"([^\"]+)\"".r.findFirstMatchIn(json).map(_.group(1)).getOrElse("full")
    val base = "\"base\":(\\d+)".r.findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(v - 1)
    val keys = "\"key_cols\":\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
      .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
      .getOrElse(Nil)
    val fold = json.contains("\"fold\":true")
    val txn = "\"txn\":\"([^\"]+)\"".r.findFirstMatchIn(json).map(_.group(1))
    val evolved = json.contains("\"schema_evolved\":true")
    val dataDir = "\"data_dir\":\"([^\"]+)\"".r.findFirstMatchIn(json).map(_.group(1))
    VersionMeta(v, kind, base, keys, fold, txn, evolved, dataDir)
  }

  /** The delta chain of `v`, ascending: a full base first, then every
    * delta up to and including `v`. A full version is its own
    * single-element chain. */
  private[io] def chainOf(table: String, v: Int): Seq[VersionMeta] = {
    val m = versionMeta(table, v)
    if (m.kind == "full") Seq(m)
    else {
      require(m.base > 0 && m.base < v,
        s"delta version $v of $table has invalid base ${m.base}")
      chainOf(table, m.base) :+ m
    }
  }

  /** Commit kinds along the current version's chain (diagnostics and
    * the V2 scan planner's append-only fast path). */
  private[graft] def chainKinds(table: String, v: Int): Seq[String] =
    chainOf(table, v).map(_.kind)

  /** A single version's commit kind ("full" / "append" / "mor_*") —
    * the `.history` metadata table's `kind` column. */
  private[graft] def commitKind(table: String, v: Int): String =
    versionMeta(table, v).kind

  /** Data directories of an APPEND-ONLY chain (base + append segment
    * dirs, ascending), or None when the chain contains a merge-on-read
    * segment — the SQL scan path reads Some(dirs) as a plain
    * multi-path parquet scan with full pushdown. */
  private[graft] def appendChainDirs(table: String, v: Int): Option[Seq[String]] = {
    val segs = chainOf(table, v)
    // a schema-evolved chain must read RESOLVED (the declared schema is
    // applied there; a raw multi-dir scan would expose file schemas)
    if (segs.forall(s => s.kind == "full" || s.kind == "append") &&
        !segs.exists(_.schemaEvolved))
      Some(segs.map(s => dataDirOfMeta(table, s).toString))
    else None
  }

  /** Upper bound on a delta chain before a delta commit materializes a
    * full snapshot first (every chain segment is one more scan + union
    * or anti-join in each read plan — unbounded chains would trade
    * write amplification for unbounded read cost). Tunable per session
    * via `graft.delta.maxChainLength`. */
  private def maxChainLength: Int =
    spark.conf.getOption("graft.delta.maxChainLength") match {
      case None => 16
      case Some(raw) => raw.trim.toIntOption match {
        case Some(n) if n > 0 => n
        case _ => throw new IllegalArgumentException(
          s"graft.delta.maxChainLength must be a positive int, got '$raw'")
      }
    }

  /** Materialize the current delta chain into one full snapshot
    * version (content unchanged — a maintenance commit like
    * [[compact]], but without re-bucketing the data). No-op on a table
    * whose head is already a full snapshot. */
  def materialize(table: String): Unit = {
    val cur = currentVersion(table)
    require(cur > 0, s"table $table has no committed version")
    // CONTENT-PRESERVING rewrite, so its commit slot is pinned to the
    // version whose content was read: without expectedNext a writer
    // landing between this read and the commit would be SILENTLY
    // REPLACED by the stale full snapshot (found by the catalog stress
    // fuzz) — last-writer-wins is correct for a user overwrite, never
    // for maintenance. A lost race throws ConcurrentCommitException;
    // callers retry, re-reading the winner's chain.
    if (chainOf(table, cur).length > 1)
      overwriteImpl(readVersion(table, cur), table, Nil, Nil, Nil,
        applySortOrder = true, expectedNext = Some(cur + 1))
  }

  /** MINOR COMPACTION (LSM-style): fold the current chain's DELTA
    * segments into ONE equivalent delta against the chain's base, at
    * O(Σ deltas) cost — the base is never read, let alone rewritten.
    * This is what keeps a streaming MOR sink viable on a huge table:
    * [[materialize]] is O(table), so a budget that only materializes
    * would rewrite the whole table every `maxChainLength` micro-batches.
    *
    * The fold is exact (content-identical to the unfolded chain) and
    * commits ONE new version whose meta records `base = <chain head>`
    * and `fold = true` (so CDC step diffs know it is content-preserving
    * and report empty at zero scans). Three foldable shapes:
    *
    *  - all-append → one combined "append" segment (layout re-derived,
    *    per-segment stats manifest kept, so the append-only fast scan
    *    path and fastCount/pruning survive the fold);
    *  - append/upsert/delete mixes sharing ONE key set → a
    *    "mor_revise" segment: del/ holds every key any upsert or
    *    delete touched, add/ the surviving replacement+appended rows.
    *    Derivation (⊎/∖ multiset, ⟕̸ key anti-join): maintaining the
    *    invariant state = (base ⟕̸ K) ⊎ R, an upsert U maps
    *    (K, R) → (K ∪ keys(U), (R ⟕̸ keys(U)) ⊎ U) and a delete D maps
    *    (K, R) → (K ∪ D, R ⟕̸ D) — both computed from delta segments
    *    only;
    *  - all-patch → one combined "mor_patch" via the multiset identity
    *    (P ⊎ Q) ∖ R = (Q ∖ R) ⊎ (P ∖ (R ∖ Q)): applying patch (d, a)
    *    to state (B ∖ D) ⊎ A gives D' = D ⊎ (d ∖ A), A' = (A ∖ d) ⊎ a,
    *    exact for every base B.
    *
    * Returns false (no commit) when there is nothing to fold (≤ 1
    * delta) or the chain is unfoldable: patch segments mixed with
    * keyed ones, or keyed segments with differing key sets — those
    * depend on base rows to reconcile and fall back to [[materialize]]
    * in the budget path. Fencing: like any delta commit, fails with
    * ConcurrentCommitException if a writer lands mid-fold. */
  /** SIZE-TIERED minor compaction (X115 — LSM size-tiering on the
    * delta chain): fold only the maximal NEWEST run of append segments
    * each smaller than `tierBytes` into ONE folded append, leaving
    * every larger segment (typically a previous fold's output)
    * physically untouched. [[compactDeltas]] re-reads the WHOLE delta
    * chain — the previous fold's segment included — on every call:
    * O(Σ deltas) per fold, quadratic over a long-lived streaming
    * chain's lifetime. The tiered fold pays O(bytes landed since the
    * last fold), so each byte is rewritten O(log(total/tier)) times as
    * folds graduate across the tier line — the LSM story a 100 TB
    * streaming table needs. Appends commute with everything below
    * them, so the top run folds correctly above ANY lower chain
    * (merge-on-read segments included); the run itself must be pure
    * append. Evolved chains refuse like the full fold. The fold's base
    * pointer jumps to the segment just below the run — the same
    * base-jump every fold commit already records — and the folded
    * segment keeps layout + stats/sketch manifests like any append.
    * Returns true when a fold committed. */
  def compactDeltasTiered(table: String, tierBytes: Long): Boolean = {
    require(tierBytes > 0, s"tierBytes must be positive, got $tierBytes")
    val cur = currentVersion(table)
    require(cur > 0, s"table $table has no committed version")
    val segs = chainOf(table, cur)
    if (segs.length <= 2) return false
    if (segs.exists(_.schemaEvolved)) return false
    // newest-first run of small appends; never the bottom segment
    val run = segs.tail.reverse.takeWhile { s =>
      s.kind == "append" && dirBytes(table, s.v) < tierBytes
    }.reverse
    if (run.length < 2) return false
    val baseV = segs(segs.length - run.length - 1).v
    val folded = run.flatMap(s => segRead(table, s.v)).reduceOption(_ unionByName _)
    folded match {
      case None => false // every run segment empty: nothing to write
      case Some(f) =>
        val sp = statsColsPath(table); val kp = sketchColsPath(table)
        val mStats =
          if (fs(sp).exists(sp)) readSmallFile(sp).split(',').toSeq.filter(_.nonEmpty) else Nil
        val mSketch =
          if (fs(kp).exists(kp)) readSmallFile(kp).split(',').toSeq.filter(_.nonEmpty) else Nil
        val (df1, pcols) = withTableLayout(f, table, Nil)
        commitVersion(table,
          stage = tmp => {
            val w = df1.write.mode(SaveMode.Overwrite)
            (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(tmp.toString)
          },
          partitionCols1 = currentPartitionCols(table),
          schemaJson = read(table).schema.json,
          metaExtra = s""""kind":"append","base":$baseV,"fold":true,""",
          expectedNext = Some(cur + 1),
          afterWin = () => (),
          manifestStats = mStats, manifestSketch = mSketch)
        true
    }
  }

  def compactDeltas(table: String): Boolean = {
    import org.apache.spark.sql.functions.col
    val cur = currentVersion(table)
    require(cur > 0, s"table $table has no committed version")
    val segs = chainOf(table, cur)
    if (segs.length <= 2) return false
    val head = segs.head.v
    val deltas = segs.tail
    // chains carrying a metadata-only schema evolution don't fold
    // (segments have heterogeneous file schemas; the budget's
    // materialize conforms everything and restores the fast paths)
    if (deltas.exists(_.schemaEvolved)) return false
    val kinds = deltas.map(_.kind).toSet
    val schemaJson = read(table).schema.json

    def unionOpt(a: Option[DataFrame], b: Option[DataFrame]): Option[DataFrame] = (a, b) match {
      case (Some(x), Some(y)) => Some(x.unionByName(y))
      case (x, None) => x
      case (None, y) => y
    }
    def commitFold(kindJson: String, stage: Path => Unit,
        mStats: Seq[String], mSketch: Seq[String]): Unit = {
      commitVersion(table, stage,
        partitionCols1 = currentPartitionCols(table),
        schemaJson = schemaJson,
        metaExtra = kindJson + s""""base":$head,"fold":true,""",
        expectedNext = Some(cur + 1),
        afterWin = () => (),
        manifestStats = mStats, manifestSketch = mSketch)
      ()
    }
    def layoutWrite(df: DataFrame, dest: Path): Unit = {
      val (df1, pcols) = withTableLayout(df, table, Nil)
      val w = df1.write.mode(SaveMode.Overwrite)
      (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(dest.toString)
    }

    if (kinds == Set("append")) {
      val folded = deltas.flatMap(s => segRead(table, s.v)).reduceOption(_ unionByName _)
      folded match {
        case None => false // every segment empty: nothing to write, chain is already trivial
        case Some(f) =>
          val sp = statsColsPath(table); val kp = sketchColsPath(table)
          val mStats =
            if (fs(sp).exists(sp)) readSmallFile(sp).split(',').toSeq.filter(_.nonEmpty) else Nil
          val mSketch =
            if (fs(kp).exists(kp)) readSmallFile(kp).split(',').toSeq.filter(_.nonEmpty) else Nil
          commitFold(s""""kind":"append",""", tmp => layoutWrite(f, tmp), mStats, mSketch)
          true
      }
    } else if (!kinds.contains("mor_patch")) {
      val keyed = deltas.filter(_.kind != "append")
      if (keyed.map(_.keyCols.toSet).distinct.length != 1) return false
      val kcols = keyed.head.keyCols
      var delKeys: Option[DataFrame] = None
      var add: Option[DataFrame] = None
      deltas.foreach { s =>
        s.kind match {
          case "append" => add = unionOpt(add, segRead(table, s.v))
          case "mor_upsert" =>
            segRead(table, s.v).foreach { u =>
              val uk = u.select(kcols.map(col): _*).distinct()
              add = unionOpt(add.map(_.join(uk, kcols, "left_anti")), Some(u))
              delKeys = unionOpt(delKeys, Some(uk))
            }
          case "mor_delete" =>
            segRead(table, s.v).foreach { d =>
              val dk = d.select(kcols.map(col): _*).distinct()
              add = add.map(_.join(dk, kcols, "left_anti"))
              delKeys = unionOpt(delKeys, Some(dk))
            }
          case "mor_revise" =>
            // a PREVIOUS fold's segment re-folding: apply its del keys
            // like a delete, then union its add rows — same invariant
            segRead(table, s.v, "del").foreach { d =>
              val dk = d.select(kcols.map(col): _*).distinct()
              add = add.map(_.join(dk, kcols, "left_anti"))
              delKeys = unionOpt(delKeys, Some(dk))
            }
            add = unionOpt(add, segRead(table, s.v, "add"))
          case other => throw new IllegalStateException(s"unexpected kind '$other' in keyed fold")
        }
      }
      val dk = delKeys.map(_.distinct())
      commitFold(
        s""""kind":"mor_revise","key_cols":${kcols.map("\"" + _ + "\"").mkString("[", ",", "]")},""",
        tmp => {
          dk.foreach(_.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "del").toString))
          add.foreach(a => layoutWrite(a, new Path(tmp, "add")))
        }, Nil, Nil)
      true
    } else if (kinds == Set("mor_patch")) {
      var d: Option[DataFrame] = None
      var a: Option[DataFrame] = None
      deltas.foreach { s =>
        val di = segRead(table, s.v, "del")
        val ai = segRead(table, s.v, "add")
        // D' = D ⊎ (dᵢ ∖ A);  A' = (A ∖ dᵢ) ⊎ aᵢ
        val dNew = di.map { x =>
          a match {
            case Some(aa) => graft.core.MapSafeSetOps.exceptAll(x, aa)
            case None => x
          }
        }
        val aAfterDel = a.map { aa =>
          di match {
            case Some(x) => graft.core.MapSafeSetOps.exceptAll(aa, x)
            case None => aa
          }
        }
        d = unionOpt(d, dNew)
        a = unionOpt(aAfterDel, ai)
      }
      commitFold(s""""kind":"mor_patch",""",
        tmp => {
          d.foreach(_.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "del").toString))
          a.foreach(_.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "add").toString))
        }, Nil, Nil)
      true
    } else false // patch segments mixed with keyed ones need base rows to reconcile
  }

  /** `graft.delta.minorCompaction` — whether the chain budget tries a
    * fold before falling back to the O(table) materialize (default on). */
  private def minorCompactionEnabled: Boolean =
    spark.conf.getOption("graft.delta.minorCompaction") match {
      case None => true
      case Some(raw) => raw.trim.toBooleanOption.getOrElse(
        throw new IllegalArgumentException(
          s"graft.delta.minorCompaction must be true/false, got '$raw'"))
    }

  /** `graft.delta.materializeRatio` — once the chain's accumulated
    * delta bytes exceed this fraction of the base's bytes, the budget
    * materializes instead of folding: repeated folds re-write the
    * folded segment (LSM write amplification on DELTA data), and past
    * this point one materialize costs about as much as the next fold
    * while resetting the chain's read cost to a single scan. */
  private def materializeRatio: Double =
    spark.conf.getOption("graft.delta.materializeRatio") match {
      case None => 0.5
      case Some(raw) => raw.trim.toDoubleOption match {
        case Some(r) if r > 0 => r
        case _ => throw new IllegalArgumentException(
          s"graft.delta.materializeRatio must be a positive number, got '$raw'")
      }
    }

  private def dirBytes(table: String, v: Int): Long = {
    val d = dataDirOf(table, v)
    fs(d).getContentSummary(d).getLength
  }

  /** LSM fold tier for the chain budget ([[compactDeltasTiered]]):
    * append segments below this many bytes are folded by the budget's
    * tiered pass, larger ones (previous folds' outputs) stay
    * physically untouched until a full fold/materialize is justified.
    * 0 disables tiering (the budget then always full-folds). */
  private def foldTierBytes: Long =
    spark.conf.getOption("graft.delta.foldTierBytes") match {
      case None => 256L << 20
      case Some(raw) => raw.trim.toLongOption match {
        case Some(n) if n >= 0 => n
        case _ => throw new IllegalArgumentException(
          s"graft.delta.foldTierBytes must be a non-negative byte count, got '$raw'")
      }
    }

  /** Pre-commit chain budget: when one more delta would push the chain
    * past [[maxChainLength]], FOLD the deltas — unless they have grown
    * to rival the base ([[materializeRatio]]) or the chain is
    * unfoldable, in which case materialize (O(table)). The fold is
    * SIZE-TIERED first ([[compactDeltasTiered]]): only the newest run
    * of small appends is rewritten, so a long-lived streaming chain
    * pays O(bytes since the last fold) per budget trip instead of
    * re-folding its whole delta history; the full fold
    * ([[compactDeltas]]) runs only when tiering alone cannot bound the
    * chain. Either way the next commit starts a near-empty chain, and
    * a 100 TB base is only ever rewritten when the delta volume itself
    * justifies it. */
  private def ensureChainBudget(table: String): Unit = {
    val cur = currentVersion(table)
    if (cur > 0 && chainOf(table, cur).length >= maxChainLength) {
      val segs = chainOf(table, cur)
      val tryFold = minorCompactionEnabled &&
        segs.tail.map(s => dirBytes(table, s.v)).sum <=
          dirBytes(table, segs.head.v) * materializeRatio
      val tier = foldTierBytes
      if (tryFold && tier > 0 && compactDeltasTiered(table, tier) &&
          chainOf(table, currentVersion(table)).length < maxChainLength) return
      val folded = tryFold && compactDeltas(table)
      if (!folded) materialize(table)
    }
  }

  /** The delta frame must cover exactly the table's columns — a delta
    * that silently dropped or invented a column would corrupt every
    * later read of the chain. (Schema evolution stays a FULL-commit
    * affair: route widening through merge(evolveSchema = true).) */
  private def requireSameColumns(table: String, df: DataFrame, what: String): Unit = {
    val cur = read(table).columns.toSet
    val got = df.columns.toSet
    require(cur == got,
      s"$what on $table needs the table's exact columns; " +
        s"missing ${(cur -- got).mkString(",")} extra ${(got -- cur).mkString(",")}")
  }

  /** IDEMPOTENT-COMMIT guard (Delta's `txn` appId/version shape, a
    * public design; Iceberg lacks it and retried batch jobs double-
    * append): when a commit carries a `txnId` and any RETAINED version
    * of the table already recorded it, the commit is a no-op. The CAS
    * serializes the race (two retries with one txn: the loser's
    * ConcurrentCommitException retry then SEES the winner's txn and
    * skips). Txn memory = the retention window — size retention to the
    * longest possible retry horizon, the same trade Delta documents
    * for its transaction identifiers. */
  private def txnAlreadyCommitted(table: String, txn: String): Boolean =
    history(table).exists { v =>
      try versionMeta(table, v).txn.contains(txn)
      catch { case _: Exception => false }
    }

  private def txnJson(txnId: Option[String]): String =
    txnId.map { tx =>
      require(tx.matches("[A-Za-z0-9._:\\-]+"),
        s"txnId must be [A-Za-z0-9._:-]+ (got '$tx')")
      s""""txn":"$tx","""
    }.getOrElse("")

  /** FAST APPEND — the O(delta) commit every ingestion pipeline leans
    * on (Iceberg's appendFiles): ONLY the new rows are written, as a
    * delta version whose resolution is base ∪ delta. The table's
    * layout (identity partition columns and hidden-partition
    * transforms) applies to the delta files, and the stats/sketch
    * manifest is maintained over the delta segment, so partition
    * pruning, file skipping and metadata-only counts keep working on
    * append-only chains. On an empty table this is the first full
    * commit. `txnId` makes a retried batch land exactly once (see
    * [[txnAlreadyCommitted]]). */
  def append(df: DataFrame, table: String, txnId: Option[String] = None): Unit = {
    if (txnId.exists(txnAlreadyCommitted(table, _))) return
    val cur = currentVersion(table)
    if (cur == 0) {
      // bootstrap commit records the txn in ITS version meta too
      overwriteImpl(df, table, Nil, Nil, Nil, applySortOrder = true, metaExtra = txnJson(txnId))
      return
    }
    requireSameColumns(table, df, "append")
    ensureChainBudget(table)
    commitDelta(table, df, s""""kind":"append",${txnJson(txnId)}""", withLayout = true, manifest = true)
  }

  /** Merge-on-read UPSERT: commit ONLY the replacement rows; readers
    * resolve `(base anti-join keys) ∪ delta`. The commit never reads
    * the base table at all — the O(batch) path a streaming merge sink
    * needs ([[graft.streaming.Streams.snapshotMergeSink]] `mor =
    * true`). Unmatched keys are inserts, matched keys full-row
    * replacements (same contract as [[merge]]). */
  def upsertMor(table: String, updates: DataFrame, keyCols: Seq[String],
      txnId: Option[String] = None): Unit = {
    require(keyCols.nonEmpty, "upsertMor needs key columns")
    if (txnId.exists(txnAlreadyCommitted(table, _))) return
    val cur = currentVersion(table)
    if (cur == 0) {
      overwriteImpl(updates, table, Nil, Nil, Nil, applySortOrder = true, metaExtra = txnJson(txnId))
      return
    }
    requireSameColumns(table, updates, "upsertMor")
    require(keyCols.forall(updates.columns.contains),
      s"upsertMor keys ${keyCols.mkString(",")} must be columns of the updates frame")
    requireJoinableKeys(updates, keyCols, "upsertMor")
    ensureChainBudget(table)
    commitDelta(table, updates,
      s""""kind":"mor_upsert","key_cols":${keyCols.map("\"" + _ + "\"").mkString("[", ",", "]")},${txnJson(txnId)}""",
      withLayout = true, manifest = false)
  }

  /** Merge-on-read keyed DELETE: commit ONLY the deleted keys (a
    * GDPR-style purge of n ids writes n rows, not the table); readers
    * anti-join the base on them. `keys`' columns ARE the key columns.
    * The physical data outlives in prior versions until retention
    * expires them — same auditable-purge semantics as the COW
    * [[delete]], at O(keys) write cost. */
  def deleteKeysMor(table: String, keys: DataFrame, txnId: Option[String] = None): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    if (txnId.exists(txnAlreadyCommitted(table, _))) return
    val keyCols = keys.columns.toSeq
    require(keyCols.nonEmpty, "deleteKeysMor needs at least one key column")
    val missing = keyCols.filterNot(read(table).columns.contains)
    require(missing.isEmpty, s"deleteKeysMor keys not in table: ${missing.mkString(",")}")
    requireJoinableKeys(keys, keyCols, "deleteKeysMor")
    ensureChainBudget(table)
    commitDelta(table, keys,
      s""""kind":"mor_delete","key_cols":${keyCols.map("\"" + _ + "\"").mkString("[", ",", "]")},${txnJson(txnId)}""",
      withLayout = false, manifest = false)
  }

  /** Merge-on-read predicate DELETE: the matching rows are computed
    * once (a scan — unavoidable for an arbitrary predicate) but only
    * THEY are written, as the `del/` side of a patch version; readers
    * resolve base EXCEPT ALL del. Same NULL semantics as [[delete]]:
    * only rows where the predicate is TRUE go. */
  def deleteWhereMor(table: String, predicate: org.apache.spark.sql.Column): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    import org.apache.spark.sql.functions.{coalesce, lit}
    ensureChainBudget(table)
    val matched = read(table).filter(coalesce(predicate, lit(false)))
    commitPatch(table, del = Some(matched), add = None)
  }

  /** Merge-on-read UPDATE: old images of matched rows go to `del/`,
    * their updated images to `add/` — one patch version, O(matched)
    * write. Assignment semantics identical to [[update]] (all values
    * evaluate against the OLD row). */
  def updateMor(table: String, sets: Seq[(String, org.apache.spark.sql.Column)],
      predicate: org.apache.spark.sql.Column): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    require(sets.nonEmpty, "updateMor needs at least one assignment")
    val cur = read(table)
    val unknown = sets.map(_._1).filterNot(cur.columns.contains)
    require(unknown.isEmpty, s"unknown columns in SET: ${unknown.mkString(", ")}")
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    ensureChainBudget(table)
    val hit = coalesce(predicate, lit(false))
    val old = read(table).filter(hit)
    val tmp = sets.zipWithIndex.map { case ((c, v), i) => (c, s"__upd_$i", v) }
    val staged = tmp.foldLeft(old)((d, t) => d.withColumn(t._2, t._3))
    val out = old.columns.toSeq.map(c => tmp.find(_._1 == c).map(t => col(t._2).as(c)).getOrElse(col(c)))
    commitPatch(table, del = Some(old), add = Some(staged.select(out: _*)))
  }

  /** Keyed MOR resolution joins / distincts ON the key columns, and
    * Spark cannot compare maps in join keys or grouping — a keyed
    * delta over a map-typed KEY would commit a version the resolver
    * can never analyze (bricked head). Refuse at commit time with the
    * same actionable shape the Iceberg export uses. Non-key map
    * columns are fine: resolution passes them through untouched, and
    * the content-addressed patch path canonicalizes them
    * ([[graft.core.MapSafeSetOps]]). */
  private def requireJoinableKeys(df: DataFrame, keyCols: Seq[String], op: String): Unit = {
    val mapped = df.schema.fields
      .filter(f => keyCols.contains(f.name) && graft.core.MapSafeSetOps.hasMap(f.dataType))
      .map(_.name)
    require(mapped.isEmpty,
      s"$op cannot key on map-typed column(s) ${mapped.mkString(", ")} — maps are not " +
        "comparable in joins; key on a scalar id or use map_entries-derived columns")
  }

  /** Stage-and-commit one delta version whose dir holds a single
    * frame. Base fencing: the commit fails (ConcurrentCommitException)
    * if any writer committed since `base` was read — a delta recorded
    * against a base that is no longer the predecessor would corrupt
    * resolution. */
  private def commitDelta(table: String, df: DataFrame, kindJson: String,
      withLayout: Boolean, manifest: Boolean): Unit = {
    val base = currentVersion(table)
    val (df1, pcols) =
      if (withLayout) withTableLayout(df, table, Nil) else (df, Seq.empty[String])
    val (mStats, mSketch) =
      if (!manifest) (Nil, Nil)
      else {
        val sp = statsColsPath(table); val kp = sketchColsPath(table)
        (if (fs(sp).exists(sp)) readSmallFile(sp).split(',').toSeq.filter(_.nonEmpty) else Nil,
          if (fs(kp).exists(kp)) readSmallFile(kp).split(',').toSeq.filter(_.nonEmpty) else Nil)
      }
    commitVersion(
      table,
      stage = tmp => {
        val w = df1.write.mode(SaveMode.Overwrite)
        (if (pcols.nonEmpty) w.partitionBy(pcols: _*) else w).parquet(tmp.toString)
      },
      // record the INHERITED identity layout so the next commit's
      // layout inheritance reads through delta heads unchanged
      partitionCols1 = if (withLayout) pcols else currentPartitionCols(table),
      schemaJson = read(table).schema.json,
      metaExtra = kindJson + s""""base":$base,""",
      expectedNext = Some(base + 1),
      afterWin = () => (),
      manifestStats = mStats,
      manifestSketch = mSketch)
    ()
  }

  /** Stage-and-commit one patch version: `del/` and `add/` subdirs
    * (either may be absent when its side is empty — an empty parquet
    * write leaves no data files and resolution skips it). */
  private def commitPatch(table: String, del: Option[DataFrame], add: Option[DataFrame]): Unit = {
    val base = currentVersion(table)
    commitVersion(
      table,
      stage = tmp => {
        // the two sides are independent tiny write jobs; overlapping
        // them on driver threads (guide §2.6) halves the staged-write
        // latency of every patch commit — Spark schedules concurrent
        // jobs from one session safely, and the dirs are disjoint
        (del, add) match {
          case (Some(d), Some(a)) =>
            import scala.concurrent.{Await, Future}
            import scala.concurrent.ExecutionContext.Implicits.global
            import scala.concurrent.duration.Duration
            val fd = Future(d.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "del").toString))
            val fa = Future(a.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "add").toString))
            Await.result(fd, Duration.Inf); Await.result(fa, Duration.Inf)
          case _ =>
            del.foreach(_.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "del").toString))
            add.foreach(_.write.mode(SaveMode.Overwrite).parquet(new Path(tmp, "add").toString))
        }
      },
      partitionCols1 = currentPartitionCols(table),
      schemaJson = read(table).schema.json,
      metaExtra = s""""kind":"mor_patch","base":$base,""",
      expectedNext = Some(base + 1),
      afterWin = () => (),
      manifestStats = Nil,
      manifestSketch = Nil)
    ()
  }

  /** Guarded raw read of one data directory (`__p_*` layout columns
    * KEPT — the hidden-partition readers filter on them): None when the
    * dir is absent or holds no data files. A zero-file segment is
    * committable (e.g. a dynamic-partition write of 0 rows emits only
    * _SUCCESS), and an unguarded `spark.read.parquet` on it throws
    * AnalysisException (unable to infer schema) — every multi-segment
    * reader must union only the non-empty segments. */
  private def readDirOpt(dir: String): Option[DataFrame] =
    cachedParquet(new Path(dir))

  /** One (modTime,len)-guarded resolve of a write-once parquet path
    * (segment data dir or stats manifest file) through the JVM-wide
    * [[SnapshotTables.relationCache]] — see its doc for why this can
    * never serve stale data. None = path absent or no data files.
    * Package-visible so the catalog face ([[graft.catalog.SnapshotTableV2]]
    * schema discovery) reuses the same cached relations. */
  private[graft] def cachedParquet(d: Path): Option[DataFrame] = {
    val f = fs(d)
    val st =
      try f.getFileStatus(d)
      catch { case _: java.io.FileNotFoundException => null }
    if (st == null) return None
    val key = s"${System.identityHashCode(spark)}|${f.makeQualified(d)}"
    val hit = SnapshotTables.relationCache.synchronized {
      Option(SnapshotTables.relationCache.get(key))
    }
    hit match {
      case Some((m, l, df)) if m == st.getModificationTime && l == st.getLen => df
      case _ =>
        val v =
          try {
            val df = spark.read.parquet(d.toString)
            if (df.schema.isEmpty) None else Some(df)
          } catch { case _: org.apache.spark.sql.AnalysisException => None }
        SnapshotTables.relationCache.synchronized {
          SnapshotTables.relationCache.put(key, (st.getModificationTime, st.getLen, v))
        }
        v
    }
  }

  /** Read one chain segment's dir (or subdir) as a frame, None when it
    * holds no data files (empty delta side) — `__p_*` layout columns
    * concealed like every read here. */
  private def segRead(table: String, v: Int, sub: String = ""): Option[DataFrame] = {
    val d0 = dataDirOf(table, v)
    val d = if (sub.isEmpty) d0 else new Path(d0, sub)
    readDirOpt(d.toString).map(df => df.drop(df.columns.filter(_.startsWith("__p_")): _*))
  }

  /** Fold a delta chain into one resolved DataFrame plan — unions and
    * anti-joins over per-segment parquet scans, fully distributed. */
  private def resolveChain(table: String, segs: Seq[VersionMeta]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // allowMissingColumns: chains carrying a metadata-only schema
    // evolution hold segments with heterogeneous file schemas (older
    // files lack added columns) — missing sides null-fill, exactly the
    // declared-schema semantics readVersion's conformance then orders.
    // On non-evolved chains every segment has identical columns
    // (requireSameColumns), so this is a no-op.
    def union(a: Option[DataFrame], b: Option[DataFrame]): Option[DataFrame] = (a, b) match {
      case (Some(x), Some(y)) => Some(x.unionByName(y, allowMissingColumns = true))
      case (None, y) => y
      case (x, None) => x
    }
    val out = segs.tail.foldLeft(segRead(table, segs.head.v)) { (acc, s) =>
      s.kind match {
        case "append" => union(acc, segRead(table, s.v))
        case "mor_upsert" =>
          val up = segRead(table, s.v)
          (acc, up) match {
            case (Some(a), Some(u)) =>
              Some(a.join(u.select(s.keyCols.map(col): _*).distinct(), s.keyCols, "left_anti")
                .unionByName(u, allowMissingColumns = true))
            case (None, u) => u
            case (a, None) => a
          }
        case "mor_delete" =>
          acc.map { a =>
            segRead(table, s.v) match {
              case None => a
              case Some(del) =>
                a.join(del.select(s.keyCols.map(col): _*).distinct(), s.keyCols, "left_anti")
            }
          }
        case "mor_patch" =>
          val afterDel = acc.map { a =>
            segRead(table, s.v, "del") match {
              case None => a
              case Some(d) => graft.core.MapSafeSetOps.exceptAll(a, d)
            }
          }
          union(afterDel, segRead(table, s.v, "add"))
        case "mor_revise" =>
          // minor compaction's folded segment: del/ holds KEY rows to
          // remove from the base, add/ the full replacement+appended
          // rows — (base ⟕̸ keys) ∪ add, the keyed generalization of
          // mor_upsert (add rows need not cover every deleted key)
          val afterDel = acc.map { a =>
            segRead(table, s.v, "del") match {
              case None => a
              case Some(d) =>
                a.join(d.select(s.keyCols.map(col): _*).distinct(), s.keyCols, "left_anti")
            }
          }
          union(afterDel, segRead(table, s.v, "add"))
        case other =>
          throw new IllegalStateException(s"unknown commit kind '$other' at $table v${s.v}")
      }
    }
    // a fully-empty chain reads like a plain empty version (same
    // error/empty behavior as the single-dir path)
    out.orElse(cachedParquet(dataDirOfMeta(table, segs.last)))
      .getOrElse(spark.read.parquet(dataDirOfMeta(table, segs.last).toString))
  }

  /** HIDDEN PARTITIONING (Iceberg's partition transforms): commit with
    * partition values DERIVED from data columns — days(ts),
    * bucket(n, key), truncate(len, s) — without the caller
    * materializing or ever seeing a partition column. The derived
    * `__p_*` columns exist only in the directory layout: [[read]]/
    * [[readVersion]] conceal them, so queries are written against the
    * source columns alone, and [[readPartitionRange]] turns a source-
    * column range back into partition-directory pruning (the
    * predicate-rewrite half of hidden partitioning).
    *
    * DML note: rewrite paths (merge/delete/compact/optimize) re-commit
    * through the plain overwrite and therefore drop the hidden layout;
    * re-apply it by routing the rewrite through this method — derived
    * values are pure functions of the data, so the layout is always
    * recomputable. */
  def overwriteTableTransformed(df: DataFrame, table: String,
      transforms: Seq[SnapshotTables.PartitionTransform],
      statsCols: Seq[String] = Nil, sketchCols: Seq[String] = Nil): Unit = {
    require(transforms.nonEmpty, "need at least one partition transform")
    val withP = transforms.foldLeft(df)((d, t) => d.withColumn(t.name, t.expr))
    overwriteTable(withP, table, transforms.map(_.name), statsCols, sketchCols)
    // the transform spec is a table property (like stats/sketch cols):
    // every later PLAIN commit re-derives the layout from it, so
    // merge/delete/compact/optimize keep the hidden partitioning
    // without the caller re-threading the transforms
    replaceSmallFile(transformSpecPath(table), SnapshotTables.PartitionTransform.formatSpec(transforms))
  }

  /** PARTITION-SPEC EVOLUTION (Iceberg's evolve-partitioning, a
    * metadata-only operation by design): replace the table's persisted
    * transform spec WITHOUT rewriting any data. Every commit from now
    * on derives the NEW hidden layout; every existing version keeps
    * the directory layout it was written with — reads are
    * layout-agnostic (resolution conceals `__p_*` everywhere), and
    * [[readPartitionRange]]/[[readPartitionValues]] already handle
    * mixed layouts per segment: directories written under the queried
    * transform prune, directories written under another spec fall back
    * to a row filter on the re-derived transform value — correct
    * either way, and pruning coverage grows as old versions age out or
    * OPTIMIZE rewrites them under the new spec. Pass Nil to drop
    * hidden partitioning entirely. The spec is validated against the
    * table's current columns so a typo fails here, not at the next
    * commit. */
  def evolvePartitioning(table: String,
      transforms: Seq[SnapshotTables.PartitionTransform]): Unit = {
    val cols: Seq[String] =
      if (currentVersion(table) > 0) read(table).columns.toSeq
      else declaredSchema(table).map(_.fieldNames.toSeq).getOrElse(Nil)
    transforms.foreach { t =>
      require(cols.isEmpty || cols.contains(t.srcCol),
        s"transform source column '${t.srcCol}' is not a column of $table " +
          s"(have: ${cols.mkString(", ")})")
    }
    require(transforms.map(_.name).distinct.length == transforms.length,
      s"duplicate transform names in ${transforms.map(_.name).mkString(", ")}")
    if (transforms.nonEmpty)
      replaceSmallFile(transformSpecPath(table),
        SnapshotTables.PartitionTransform.formatSpec(transforms))
    else {
      val p = transformSpecPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
    }
  }

  /** Range scan over a hidden-partitioned table: the [lo, hi] bound on
    * the TRANSFORM'S SOURCE column is rewritten into a bound on the
    * derived partition values (evaluated with the very transform
    * expression the write used — one 1-row driver job), so Spark's
    * partition-directory pruning applies before any file is opened.
    * The caller still filters rows: transform granularity is coarser
    * than the data (a day partition keeps whole days). Ordered
    * transforms only (days/truncate); buckets don't order — use
    * [[readPartitionValues]]. */
  def readPartitionRange(table: String, pt: SnapshotTables.PartitionTransform,
      lo: Any, hi: Any): DataFrame = {
    import org.apache.spark.sql.functions._
    require(pt.ordered, s"${pt.name} does not preserve order — use readPartitionValues")
    val v = currentVersion(table)
    val bounds = spark.range(1).select(pt.exprOf(lit(lo)), pt.exprOf(lit(hi))).head()
    appendChainDirs(table, v) match {
      case Some(dirs) =>
        // append-only chain: per-segment scans (each root discovers its
        // own partition dirs — Spark refuses mixed multi-root layouts),
        // filtered BEFORE the union so directory pruning applies per
        // segment, then unioned. Zero-file segments are skipped
        // (readDirOpt) — an unguarded read of one would fail the whole
        // table's range scans forever.
        val perSeg = dirs.flatMap { dir =>
          readDirOpt(dir).map { raw =>
            val filtered =
              if (raw.columns.contains(pt.name))
                raw.filter(col(pt.name) >= lit(bounds.get(0)) && col(pt.name) <= lit(bounds.get(1)))
              else raw.filter(pt.expr >= lit(bounds.get(0)) && pt.expr <= lit(bounds.get(1)))
            filtered.drop(raw.columns.filter(_.startsWith("__p_")): _*)
          }
        }
        if (perSeg.nonEmpty) perSeg.reduce(_ unionByName _)
        else emptyFrameOf(table, v)
      case None =>
        // merge-on-read chain: directory skipping would resurrect
        // deleted rows — filter the RESOLVED rows on the re-derived
        // transform value (same rows, no pruning until materialize)
        val d = pt.expr
        readVersion(table, v)
          .filter(d >= lit(bounds.get(0)) && d <= lit(bounds.get(1)))
    }
  }

  /** Point/IN scan over a hidden-partitioned table: each probe value
    * maps through the transform (any transform, buckets included) and
    * only matching partition directories are read. */
  def readPartitionValues(table: String, pt: SnapshotTables.PartitionTransform,
      values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(values.nonEmpty, "readPartitionValues needs at least one probe value")
    val v = currentVersion(table)
    val derived = spark.range(1).select(values.map(pv => pt.exprOf(lit(pv))): _*)
      .head().toSeq.distinct
    appendChainDirs(table, v) match {
      case Some(dirs) =>
        val perSeg = dirs.flatMap { dir =>
          readDirOpt(dir).map { raw =>
            val filtered =
              if (raw.columns.contains(pt.name)) raw.filter(col(pt.name).isin(derived: _*))
              else raw.filter(pt.expr.isin(derived: _*))
            filtered.drop(raw.columns.filter(_.startsWith("__p_")): _*)
          }
        }
        if (perSeg.nonEmpty) perSeg.reduce(_ unionByName _)
        else emptyFrameOf(table, v)
      case None =>
        readVersion(table, v).filter(pt.expr.isin(derived: _*))
    }
  }

  /** Zero-row frame with a version's declared data schema — the honest
    * answer when every chain segment turned out to hold no data files. */
  private def emptyFrameOf(table: String, v: Int): DataFrame =
    versionDataSchema(table, v) match {
      case Some(s) =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), s)
      case None => readVersion(table, v).where(org.apache.spark.sql.functions.lit(false))
    }

  /** ROLLBACK: re-commit a retained version's content as the NEW
    * current version (Iceberg's rollback semantics on a forward-only
    * version line — the pointer is monotonic here, so undo is a new
    * commit, which keeps the bad version in history for audit and
    * keeps concurrent-writer fencing intact). The rolled-back state
    * re-enters the normal manifest/stats machinery, so pruned reads
    * work immediately. */
  def rollback(table: String, toVersion: Int, partitionCols: Seq[String] = Nil): Unit = {
    require(history(table).contains(toVersion),
      s"version $toVersion of $table is not retained — cannot roll back to it")
    overwriteTable(readVersion(table, toVersion), table, partitionCols)
  }

  /** Multiset row diff between two retained versions — the CDC feed
    * the snapshot model supports without delta files: an incremental
    * consumer reads `diff(t, lastSeen, current)` instead of re-scanning
    * the table. Returns every row with `__change` = 'insert' (in `toV`
    * only) or 'delete' (in `fromV` only); an update surfaces as
    * delete+insert. exceptAll keeps duplicate multiplicity honest and
    * shuffles on the full row like any set difference — both sides
    * prune columns/partitions as normal parquet scans. */
  def diff(table: String, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    // O(delta) fast paths — the CDC cost model that survives 100 TB:
    // a single delta step diffs from its own segment (plus at most one
    // base scan), and an all-append range is just its segments as
    // inserts. Exact multiset semantics in both cases (proof sketch in
    // [[stepDiffFast]]); anything else falls back to the generic
    // two-resolution exceptAll.
    val fast: Option[DataFrame] =
      if (toV == fromV + 1) stepDiffFast(table, toV)
      else if (toV > fromV + 1 && (fromV + 1 to toV).forall { v =>
        // each step must be a plain append whose base IS the previous
        // version (a re-based fold segment REPEATS earlier segments'
        // rows — double-counting), or a content-preserving fold
        // commit, which contributes nothing and is skipped below. A
        // metadata-only schema evolution IS an (empty) append and
        // passes; cdcAligned below null-fills across an additive one
        // and raises loudly on a destructive one — Delta CDF semantics.
        val m = try Some(versionMeta(table, v)) catch { case _: Exception => None }
        m.exists(x => x.fold || (x.kind == "append" && x.base == v - 1))
      }) {
        // to = from ⊎ seg₁ ⊎ … ⊎ segₖ  ⇒  to∖from = ⊎segᵢ, from∖to = ∅
        val to = readVersion(table, toV)
        val segs = (fromV + 1 to toV)
          .filterNot(v => versionMeta(table, v).fold)
          .flatMap(v => segRead(table, v))
        Some(segs.reduceOption(_.unionByName(_, allowMissingColumns = true))
          .map(u => cdcAligned(u, to, table, fromV, toV))
          .getOrElse(to.where(lit(false)))
          .withColumn("__change", lit("insert")))
      } else None
    fast.getOrElse {
      val to = readVersion(table, toV)
      val from = cdcAligned(readVersion(table, fromV), to, table, fromV, toV)
      graft.core.MapSafeSetOps.exceptAll(to, from).withColumn("__change", lit("insert"))
        .unionByName(graft.core.MapSafeSetOps.exceptAll(from, to).withColumn("__change", lit("delete")))
    }
  }

  /** Align a CDC diff's FROM side to the TO side's schema across a
    * metadata-only schema evolution — Delta CDF's contract: an
    * ADDITIVE step (every from-column survives with an identical
    * type; new columns appended) null-fills pre-evolution rows in the
    * added columns; a DESTRUCTIVE step (drop / rename / type change)
    * fails LOUDLY — silently reporting "no changes" (or changes under
    * the wrong shape) would corrupt every downstream consumer. */
  private def cdcAligned(from: DataFrame, to: DataFrame,
      table: String, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    if (from.columns.toSeq == to.columns.toSeq &&
        from.schema.fields.map(_.dataType).toSeq == to.schema.fields.map(_.dataType).toSeq)
      return from
    val toS = to.schema
    val additive = from.schema.fields.forall(f =>
      toS.fields.exists(g => g.name == f.name && g.dataType == f.dataType))
    require(additive,
      s"CDC cannot cross a destructive schema change on $table between v$fromV and v$toV " +
        s"(from [${from.columns.mkString(",")}] to [${to.columns.mkString(",")}]): columns " +
        "were dropped, renamed or re-typed — read the versions directly instead")
    from.select(toS.fields.toSeq.map { f =>
      if (from.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** O(delta) MULTISET diff of one version STEP (base → v), computed
    * from the version's own delta segment. Exactness, per kind (⊎/∖
    * are multiset union/difference; `to = state(v)`, `from =
    * state(base)`):
    *  - append:     to = from ⊎ seg          ⇒ to∖from = seg, from∖to = ∅
    *  - mor_patch:  to = (from ∖ del) ⊎ add, del ⊑ from (del was
    *                computed FROM `from`)     ⇒ to∖from = add ∖ del,
    *                from∖to = del ∖ add — both O(delta), no base scan
    *  - mor_delete: to = from ∖ (from ⋉ keys) ⇒ from∖to = from ⋉ keys
    *                (ONE base scan, key-semi join), to∖from = ∅
    *  - mor_upsert: to = (from ∖ touched) ⊎ up, touched = from ⋉ keys
    *                ⇒ to∖from = up ∖ touched, from∖to = touched ∖ up
    *                (ONE base scan; the exceptAlls are delta-sized)
    * None for full commits (no delta to read from). */
  private[graft] def stepDiffFast(table: String, v: Int): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    val m = try versionMeta(table, v) catch { case _: Exception => return None }
    def ins(df: DataFrame) = df.withColumn("__change", lit("insert"))
    def del(df: DataFrame) = df.withColumn("__change", lit("delete"))
    def emptyDiff = ins(readVersion(table, v).where(lit(false)))
    def aligned(df: DataFrame, to: DataFrame) = df.select(to.columns.toSeq.map(col): _*)
    // a fold commit (minor compaction) is content-preserving BY
    // CONSTRUCTION — its step diff is empty, at zero scans
    if (m.fold) return Some(emptyDiff)
    // a schema-evolution step commits NO rows ([[commitSchemaEvolution]]
    // stages an empty dir): under Delta CDF semantics an ADDITIVE
    // evolution (ADD COLUMN) emits no change rows — empty diff, in the
    // NEW schema, at zero scans. A destructive one (DROP/re-type)
    // falls to the generic path, where [[cdcAligned]] raises loudly.
    if (m.schemaEvolved) {
      val additive = (for {
        fromS <- versionDataSchema(table, m.base)
        toS <- versionDataSchema(table, v)
      } yield fromS.fields.forall(f =>
        toS.fields.exists(g => g.name == f.name && g.dataType == f.dataType)))
        .getOrElse(false)
      return if (additive) Some(emptyDiff) else None
    }
    // every per-kind proof below assumes the step's meta base IS the
    // preceding version; a re-based segment (fold without the marker —
    // defensive) must take the generic two-resolution path
    if (m.kind != "full" && m.base != v - 1) return None
    m.kind match {
      case "append" =>
        Some(segRead(table, v).map(ins).getOrElse(emptyDiff))
      case "mor_patch" =>
        (segRead(table, v, "del"), segRead(table, v, "add")) match {
          case (None, None) => Some(emptyDiff)
          case (None, Some(a)) => Some(ins(a))
          case (Some(d), None) => Some(del(d))
          case (Some(d), Some(a)) =>
            Some(ins(graft.core.MapSafeSetOps.exceptAll(a, aligned(d, a)))
              .unionByName(del(graft.core.MapSafeSetOps.exceptAll(d, aligned(a, d)))))
        }
      case "mor_delete" =>
        segRead(table, v) match {
          case None => Some(emptyDiff)
          case Some(k) =>
            val keys = k.select(m.keyCols.map(col): _*).distinct()
            Some(del(readVersion(table, m.base).join(keys, m.keyCols, "left_semi")))
        }
      case "mor_upsert" =>
        segRead(table, v) match {
          case None => Some(emptyDiff)
          case Some(u) =>
            val keys = u.select(m.keyCols.map(col): _*).distinct()
            val touched = readVersion(table, m.base).join(keys, m.keyCols, "left_semi")
            Some(ins(graft.core.MapSafeSetOps.exceptAll(u, aligned(touched, u)))
              .unionByName(del(graft.core.MapSafeSetOps.exceptAll(touched, aligned(u, touched)))))
        }
      case _ => None
    }
  }

  /** Key-classified diff: with unique `keyCols`, resolves the raw
    * multiset diff into insert / update / delete per key (a delete+
    * insert pair on one key is reported once, as an update with both
    * images). Output: keyCols, __change, __old struct, __new struct. */
  def diffKeyed(table: String, fromV: Int, toV: Int, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffKeyed needs key columns")
    import org.apache.spark.sql.functions._
    val fast = if (toV == fromV + 1) stepDiffKeyedFast(table, toV, keyCols) else None
    fast.getOrElse {
      val to = readVersion(table, toV)
      // additive schema evolution in the range: pre-evolution rows
      // null-fill the added columns (Delta CDF); destructive raises
      val from = cdcAligned(readVersion(table, fromV), to, table, fromV, toV)
      val rest = to.columns.filterNot(keyCols.contains).toSeq
      def packed(df: DataFrame, as: String) =
        df.select(keyCols.map(col) :+ struct(rest.map(col): _*).as(as): _*)
      packed(from, "__old")
        .join(packed(to, "__new"), keyCols, "full_outer")
        .withColumn("__change",
          when(col("__old").isNull, "insert")
            .when(col("__new").isNull, "delete")
            .when(!(col("__old") <=> col("__new")), "update"))
        .filter(col("__change").isNotNull)
    }
  }

  /** O(delta) KEYED diff of one version step — [[stepDiffFast]]'s
    * sibling under diffKeyed's unique-key contract. Output shape is
    * identical to the generic path (keyCols…, __old, __new, __change):
    *  - append:     every segment row is an insert (a key appended
    *                over an existing one violates the keyed contract —
    *                exactly as it corrupts the generic full-outer)
    *  - mor_patch:  del(old images) ⟗ add(new images) on the keys —
    *                delete / insert / update classified with NO base
    *                scan at all
    *  - mor_delete: base ⋉ keys → deletes with their __old images
    *                (one base scan); requires the step's own key
    *                columns to match the requested ones
    *  - mor_upsert: (base ⋉ keys) ⟗ up → update/insert (an upsert
    *                never deletes); same key-match requirement
    * None otherwise (full commits; key mismatch). */
  private[graft] def stepDiffKeyedFast(table: String, v: Int, keyCols: Seq[String]): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val m = try versionMeta(table, v) catch { case _: Exception => return None }
    if (m.kind == "full") return None
    val cols = readVersion(table, v).columns.toSeq
    if (!keyCols.forall(cols.contains)) return None
    // fold commits are content-preserving: empty classified diff, zero
    // scans; any other re-based segment (defensive) → generic path
    if (m.fold) {
      val rest = cols.filterNot(keyCols.contains)
      val structDt = readVersion(table, v).select(struct(rest.map(col): _*)).schema.head.dataType
      return Some(readVersion(table, v).where(lit(false))
        .select(keyCols.map(col) :+ lit(null).cast(structDt).as("__old") :+
          lit(null).cast(structDt).as("__new"): _*)
        .withColumn("__change", lit("insert")).filter(lit(false)))
    }
    // additive evolution step: no rows committed, no change rows
    // (Delta CDF) — empty classified diff in the new schema; a
    // destructive step falls to the generic path's loud cdcAligned
    if (m.schemaEvolved) {
      val additive = (for {
        fromS <- versionDataSchema(table, m.base)
        toS <- versionDataSchema(table, v)
      } yield fromS.fields.forall(f =>
        toS.fields.exists(g => g.name == f.name && g.dataType == f.dataType)))
        .getOrElse(false)
      if (!additive) return None
      val rest = cols.filterNot(keyCols.contains)
      val structDt = readVersion(table, v).select(struct(rest.map(col): _*)).schema.head.dataType
      return Some(readVersion(table, v).where(lit(false))
        .select(keyCols.map(col) :+ lit(null).cast(structDt).as("__old") :+
          lit(null).cast(structDt).as("__new"): _*)
        .withColumn("__change", lit("insert")).filter(lit(false)))
    }
    if (m.base != v - 1) return None
    val rest = cols.filterNot(keyCols.contains)
    def packed(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+ struct(rest.map(col): _*).as(as): _*)
    val structDt = readVersion(table, v).select(struct(rest.map(col): _*)).schema.head.dataType
    def nul(as: String) = lit(null).cast(structDt).as(as)
    def classify(joined: DataFrame) = joined
      .withColumn("__change",
        when(col("__old").isNull, "insert")
          .when(col("__new").isNull, "delete")
          .when(!(col("__old") <=> col("__new")), "update"))
      .filter(col("__change").isNotNull)
    m.kind match {
      case "append" =>
        Some(segRead(table, v) match {
          case None =>
            packed(readVersion(table, v).where(lit(false)), "__new")
              .select((keyCols.map(col) :+ nul("__old")) :+ col("__new"): _*)
              .withColumn("__change", lit("insert")).filter(lit(false))
          case Some(seg) =>
            packed(seg, "__new")
              .select((keyCols.map(col) :+ nul("__old")) :+ col("__new"): _*)
              .withColumn("__change", lit("insert"))
        })
      case "mor_patch" =>
        val d = segRead(table, v, "del").map(packed(_, "__old"))
        val a = segRead(table, v, "add").map(packed(_, "__new"))
        (d, a) match {
          case (None, None) =>
            Some(packed(readVersion(table, v).where(lit(false)), "__new")
              .select((keyCols.map(col) :+ nul("__old")) :+ col("__new"): _*)
              .withColumn("__change", lit("insert")).filter(lit(false)))
          case (Some(dd), None) =>
            Some(dd.select((keyCols.map(col) :+ col("__old")) :+ nul("__new"): _*)
              .withColumn("__change", lit("delete")))
          case (None, Some(aa)) =>
            Some(aa.select((keyCols.map(col) :+ nul("__old")) :+ col("__new"): _*)
              .withColumn("__change", lit("insert")))
          case (Some(dd), Some(aa)) => Some(classify(dd.join(aa, keyCols, "full_outer")))
        }
      case "mor_delete" if m.keyCols == keyCols =>
        Some(segRead(table, v) match {
          case None =>
            packed(readVersion(table, v).where(lit(false)), "__old")
              .select((keyCols.map(col) :+ col("__old")) :+ nul("__new"): _*)
              .withColumn("__change", lit("delete"))
          case Some(k) =>
            val keys = k.select(keyCols.map(col): _*).distinct()
            packed(readVersion(table, m.base).join(keys, keyCols, "left_semi"), "__old")
              .select((keyCols.map(col) :+ col("__old")) :+ nul("__new"): _*)
              .withColumn("__change", lit("delete"))
        })
      case "mor_upsert" if m.keyCols == keyCols =>
        segRead(table, v).map { u =>
          val keys = u.select(keyCols.map(col): _*).distinct()
          val touched = readVersion(table, m.base).join(keys, keyCols, "left_semi")
          classify(packed(touched, "__old").join(packed(u, "__new"), keyCols, "full_outer"))
        }.orElse(Some(
          packed(readVersion(table, v).where(lit(false)), "__new")
            .select((keyCols.map(col) :+ nul("__old")) :+ col("__new"): _*)
            .withColumn("__change", lit("insert")).filter(lit(false))))
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  // Branches — the write-audit-publish (WAP) pattern on the snapshot
  // model (Iceberg's branch/fast-forward semantics, public knowledge):
  // stage commits on an isolated ref, audit them with any reader, then
  // publish atomically to main — or drop the branch and nothing ever
  // happened. A branch is its OWN nested version line under
  // <table>/branches/<name>/, so every mechanism of this class
  // (fenced CAS commits, manifests, retention, time travel) applies
  // verbatim on the branch; main's version line never even sees branch
  // snapshots, so the max(pointer, history) current-version invariant
  // holds untouched. Forking is zero-copy (the ref records main's
  // current version as its base; an uncommitted branch reads that
  // version), and publish is a fenced CAS on main plus an O(1) rename
  // of the branch's current snapshot into main's line (a copy on
  // object stores, like every rename here).
  // ------------------------------------------------------------------

  private def refsDir(table: String) = new Path(metaDir(table), "refs")
  private def refPath(table: String, branch: String) = new Path(refsDir(table), branch)

  /** Branch commits live in a nested table rooted at
    * <table>/branches/, named after the branch. Direct-layout branch
    * commits write their data into the PARENT table's pool, so a
    * published (adopted-by-reference) dir survives dropBranch and
    * unpublished dirs fall to the reachability sweep. */
  private def branchTables(table: String): SnapshotTables =
    new SnapshotTables(spark, new Path(tableDir(table), "branches").toString,
      previousVersionsMax, orphanGraceMs, stagingGraceMs, heartbeatMs, sketchBits, sketchHashes,
      dataPoolRoot = Some(dataPoolDir(table).toString))

  /** The nested branch store — the V2 catalog's seam for SQL branch
    * reads (`VERSION AS OF '<branch>'` scans the branch's latest
    * commit through the same table implementation main uses). */
  private[graft] def branchTablesFor(table: String): SnapshotTables = branchTables(table)

  private def requireBranchName(branch: String): Unit =
    require(branch.nonEmpty && !branch.contains('/') && !branch.startsWith("."),
      s"invalid branch name '$branch'")

  /** Fork a branch at main's current version. Zero-copy: only the ref
    * file is written (exclusive create — racing creators get one
    * winner). The base version is protected from retention for the
    * branch's lifetime. */
  def createBranch(table: String, branch: String): Unit = {
    requireBranchName(branch)
    val base = currentVersion(table)
    require(base > 0, s"table $table has no committed version to branch from")
    if (!createExclusive(refPath(table, branch), s"""{"base":$base}"""))
      throw new IllegalStateException(s"branch '$branch' already exists on table '$table'")
    // Table properties cross the fork seam: seed the branch's
    // stats/sketch columns and hidden-partition transform spec from
    // main's, so branch commits keep maintaining the same manifests
    // and directory layout main does (without this, a branch commit on
    // a stats-maintained or hidden-partitioned table would silently
    // drop the manifest and flatten the layout).
    val bt = branchTables(table)
    Seq(statsColsPath(table) -> bt.statsColsPath(branch),
        sketchColsPath(table) -> bt.sketchColsPath(branch),
        transformSpecPath(table) -> bt.transformSpecPath(branch),
        writeModePath(table) -> bt.writeModePath(branch),
        commitLayoutPath(table) -> bt.commitLayoutPath(branch))
      .foreach { case (src, dst) =>
        if (fs(src).exists(src)) replaceSmallFile(dst, readSmallFile(src)) }
  }

  /** The main version the branch forked from. */
  def branchBase(table: String, branch: String): Int = {
    val p = refPath(table, branch)
    require(fs(p).exists(p), s"no branch '$branch' on table '$table'")
    "\"base\":(\\d+)".r.findFirstMatchIn(readSmallFile(p)).get.group(1).toInt
  }

  // ------------------------------------------------------------------
  // TAGS (X116 — Iceberg's named immutable refs): a tag names ONE
  // retained version until dropped. Zero-copy (only the ref file is
  // written), version pinned forever: tagged versions are protected
  // from the retention pass AND age-based expire_snapshots for the
  // tag's lifetime, and `VERSION AS OF '<tag>'` resolves the tag in
  // SQL exactly like a branch name (branches shadow tags on a name
  // collision — a WAP audit must never silently read a stale pin).
  // Unlike a branch a tag takes no commits and needs no property
  // seam; dropping it releases the version to normal expiry.
  // ------------------------------------------------------------------

  private def tagsDir(table: String) = new Path(metaDir(table), "tags")
  private def tagPath(table: String, tag: String) = new Path(tagsDir(table), tag)

  /** Tag `version` (default: the current one). Numeric names are
    * refused — numbers always mean versions in time travel, so a
    * numeric tag would be unreachable. */
  def createTag(table: String, tag: String, version: Option[Int] = None): Unit = {
    requireBranchName(tag)
    require(tag.stripPrefix("v").toIntOption.isEmpty,
      s"tag name '$tag' would be unreachable — numeric names mean versions in time travel")
    val v = version.getOrElse(currentVersion(table))
    require(history(table).contains(v),
      s"version $v of table '$table' is not retained — cannot tag it")
    if (!createExclusive(tagPath(table, tag), s"""{"version":$v}"""))
      throw new IllegalStateException(s"tag '$tag' already exists on table '$table'")
  }

  /** The version a tag pins. */
  def tagVersion(table: String, tag: String): Int = {
    val p = tagPath(table, tag)
    require(fs(p).exists(p), s"no tag '$tag' on table '$table'")
    "\"version\":(\\d+)".r.findFirstMatchIn(readSmallFile(p)).get.group(1).toInt
  }

  /** Live (tag, version) pairs, sorted by name. */
  def tags(table: String): Seq[(String, Int)] = {
    val d = tagsDir(table)
    val f = fs(d)
    if (!f.exists(d)) Nil
    else f.listStatus(d).toSeq.map(_.getPath.getName).filterNot(_.startsWith("."))
      .sorted.map(t => (t, tagVersion(table, t)))
  }

  /** Drop a tag — the pinned version returns to normal expiry. */
  def dropTag(table: String, tag: String): Unit = {
    requireBranchName(tag)
    val p = tagPath(table, tag)
    require(fs(p).exists(p), s"no tag '$tag' on table '$table'")
    fs(p).delete(p, false)
    ()
  }

  /** Live branches of a table. */
  def branches(table: String): Seq[String] = {
    val d = refsDir(table)
    val f = fs(d)
    if (!f.exists(d)) Nil
    else f.listStatus(d).toSeq.map(_.getPath.getName).filterNot(_.startsWith(".")).sorted
  }

  /** Audit-side read: the branch's latest commit, or its base version
    * when nothing was committed yet (zero-copy fork). */
  def readBranch(table: String, branch: String): DataFrame = {
    val bv = branchTables(table).currentVersion(branch)
    if (bv > 0) branchTables(table).read(branch)
    else readVersion(table, branchBase(table, branch))
  }

  /** Overwrite-commit onto the branch (isolated from main; same
    * multi-writer CAS semantics as any commit). */
  def commitToBranch(table: String, branch: String, df: DataFrame,
      partitionCols: Seq[String] = Nil, statsCols: Seq[String] = Nil,
      sketchCols: Seq[String] = Nil): Unit = {
    branchBase(table, branch) // existence check
    branchTables(table).overwriteTable(df, branch, partitionCols, statsCols, sketchCols)
  }

  /** Upsert-commit onto the branch: updates replace branch rows by
    * key on top of the branch's CURRENT view (which is the base
    * version until the first branch commit). */
  def mergeToBranch(table: String, branch: String, updates: DataFrame, keyCols: Seq[String],
      partitionCols: Seq[String] = Nil): Unit = {
    require(keyCols.nonEmpty, "mergeToBranch needs key columns")
    val keys = updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
    val merged = readBranch(table, branch).join(keys, keyCols, "left_anti").unionByName(updates)
    commitToBranch(table, branch, merged, partitionCols)
  }

  /** Append-commit onto the branch — the O(delta) staging path of the
    * WAP flow (a multi-load audit session appends each load without
    * rewriting the branch). The branch's FIRST commit materializes the
    * base version plus the delta (the branch version line cannot
    * delta-chain into MAIN's line — publish moves one snapshot dir);
    * later appends are true delta commits on the branch, and
    * [[publish]] materializes a delta-headed branch before the move. */
  def appendToBranch(table: String, branch: String, df: DataFrame): Unit = {
    val bt = branchTables(table)
    if (bt.currentVersion(branch) == 0)
      commitToBranch(table, branch, readBranch(table, branch).unionByName(df))
    else bt.append(df, branch)
  }

  /** The audit tool of the WAP flow: what WOULD publishing this branch
    * change on main? Keyed diff of main's CURRENT content against the
    * branch's — (keyCols, __change ∈ insert/update/delete, __old,
    * __new) rows, same shape as [[diffKeyed]]. Review the delta (or
    * run [[graft.operators.Checks]] over it) before deciding to
    * publish or drop. */
  def branchDiff(table: String, branch: String, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "branchDiff needs key columns")
    import org.apache.spark.sql.functions._
    val from = read(table)
    val rest = from.columns.filterNot(keyCols.contains).toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+ struct(rest.map(col): _*).as(as): _*)
    packed(from, "__old")
      .join(packed(readBranch(table, branch), "__new"), keyCols, "full_outer")
      .withColumn("__change",
        when(col("__old").isNull, "insert")
          .when(col("__new").isNull, "delete")
          .when(!(col("__old") <=> col("__new")), "update"))
      .filter(col("__change").isNotNull)
  }

  /** Discard the branch: ref and every branch snapshot are deleted;
    * main never learns the branch existed. Direct-layout branch
    * commits keep their data in the PARENT pool, outside this subtree
    * — a published dir stays reachable from main's meta; unpublished
    * dirs become unreachable debris for [[removeOrphans]]' sweep. */
  def dropBranch(table: String, branch: String): Unit = {
    requireBranchName(branch)
    val p = refPath(table, branch)
    fs(p).delete(p, false)
    val bd = new Path(new Path(tableDir(table), "branches"), branch)
    fs(bd).delete(bd, true)
  }

  /** PUBLISH the audited branch to main — the fast-forward of WAP.
    * Succeeds only when main still sits at the branch's base version
    * (the audited state is exactly what main becomes); a main commit
    * since the fork raises [[SnapshotTables.ConcurrentCommitException]]
    * — re-audit on a fresh branch rather than silently dropping the
    * concurrent change. The branch's current snapshot (data AND its
    * stats/sketch manifest) moves into main's version line with the
    * same fenced CAS + ownership re-checks as a normal commit; data is
    * never rewritten. Publishing retires the branch. Returns main's
    * new version. */
  def publish(table: String, branch: String): Int = {
    val base = branchBase(table, branch)
    val bt = branchTables(table)
    val bv0 = bt.currentVersion(branch)
    require(bv0 > 0, s"branch '$branch' has no commits to publish")
    // A delta-headed branch materializes ON THE BRANCH first: publish
    // moves ONE snapshot directory into main's line, and a delta dir
    // alone is meaningless without its chain (whose base lives in the
    // branch's version line and would be dropped with the branch).
    if (bt.chainOf(branch, bv0).length > 1) bt.materialize(branch)
    val bv = bt.currentVersion(branch)
    val cur = currentVersion(table)
    if (cur != base) throw new SnapshotTables.ConcurrentCommitException(table, cur + 1)
    val next = cur + 1
    val writerId = java.util.UUID.randomUUID.toString
    // main's meta = branch's meta with version renumbered and this
    // publisher's fence token (same JSON we wrote at branch commit)
    val bMeta = readSmallFile(new Path(bt.metaDir(branch), f"v$bv%05d.json"))
    val metaJson = bMeta
      .replaceFirst("\"version\":\\d+", s""""version":$next""")
      .replaceFirst("\"writer\":\"[^\"]*\"", s""""writer":"$writerId"""")
    val meta = new Path(metaDir(table), f"v$next%05d.json")
    def metaIsOurs: Boolean =
      try fs(meta).exists(meta) && readSmallFile(meta).contains(s""""writer":"$writerId"""")
      catch { case _: java.io.IOException => false }
    if (!casWithOrphanReclaim(table, next, meta, metaJson))
      throw new SnapshotTables.ConcurrentCommitException(table, next)
    if (!metaIsOurs) throw new SnapshotTables.ConcurrentCommitException(table, next)
    if (bt.metaDataDirString(branch, bv).isDefined) {
      // DIRECT-layout branch head: main's meta (built from the
      // branch's meta above) carries the branch commit's `data_dir`
      // verbatim — an absolute pool path under THIS table's shared
      // pool, so publish is adoption by reference: ZERO data bytes
      // move, the CAS above was the entire commit. dropBranch below
      // only removes branch metadata; the adopted dir is now reachable
      // from main's meta and the reachability guard (dropVersion /
      // removeOrphans) protects it for main's retention lifetime.
    } else {
      val src = bt.snapDir(branch, bv)
      val dest = snapDir(table, next)
      if (!fs(src).rename(src, dest)) {
        if (metaIsOurs) fs(meta).delete(meta, false)
        throw new SnapshotTables.ConcurrentCommitException(table, next)
      }
      if (!metaIsOurs) {
        // reclaimed mid-rename: undo the nesting as overwriteTable does
        val nested = new Path(dest, src.getName)
        if (fs(nested).exists(nested)) fs(nested).delete(nested, true)
        throw new SnapshotTables.ConcurrentCommitException(table, next)
      }
    }
    val bmf = bt.manifestPath(branch, bv)
    if (fs(bmf).exists(bmf)) fs(bmf).rename(bmf, manifestPath(table, next))
    // Properties cross the publish seam too: stats/sketch columns and
    // the transform spec the audited branch carried (seeded at fork,
    // possibly changed by branch commits) become main's, so every
    // later main commit keeps maintaining them — the published
    // version's manifest and layout stay live, not a one-off.
    Seq(bt.statsColsPath(branch) -> statsColsPath(table),
        bt.sketchColsPath(branch) -> sketchColsPath(table),
        bt.transformSpecPath(branch) -> transformSpecPath(table),
        bt.writeModePath(branch) -> writeModePath(table))
      .foreach { case (src, dst) =>
        if (fs(src).exists(src)) replaceSmallFile(dst, readSmallFile(src)) }
    advancePointer(table, next)
    expire(table, next)
    dropBranch(table, branch)
    next
  }

  /** Base versions still referenced by live branches — retention must
    * not expire them while an uncommitted branch can still read them.
    * TAGGED versions (X116) are ref-protected the same way — a tag is
    * a promise the version stays readable until the tag is dropped. */
  private def branchProtectedVersions(table: String): Set[Int] =
    branches(table).flatMap { b =>
      try Some(branchBase(table, b)) catch { case _: Exception => None }
    }.toSet ++
      tags(table).map(_._2)

  private def manifestPath(table: String, v: Int): Path =
    new Path(metaDir(table), f"v$v%05d-manifest.parquet")

  private def statsColsPath(table: String): Path =
    new Path(metaDir(table), "stats_cols")

  private def sketchColsPath(table: String): Path =
    new Path(metaDir(table), "sketch_cols")

  private def transformSpecPath(table: String): Path =
    new Path(metaDir(table), "partition_transforms")

  private def writeModePath(table: String): Path =
    new Path(metaDir(table), "write_mode")

  /** The table's standing row-level-DML strategy — "cow" (default:
    * DELETE/UPDATE rewrite into a full snapshot) or "mor" (they commit
    * O(changed) patch versions, [[deleteWhereMor]]/[[updateMor]]). A
    * table property like stats/sketch columns: SQL DML through the
    * catalog consults it, so `ALTER`-ing a 100 TB table to "mor" flips
    * every later DELETE/UPDATE from O(table) to O(changed) writes. */
  def writeMode(table: String): String = {
    val p = writeModePath(table)
    if (fs(p).exists(p)) readSmallFile(p).trim else "cow"
  }

  def setWriteMode(table: String, mode: String): Unit = {
    require(mode == "cow" || mode == "mor", s"write mode must be 'cow' or 'mor', got '$mode'")
    replaceSmallFile(writeModePath(table), mode)
  }

  private def sortOrderPath(table: String): Path =
    new Path(metaDir(table), "sort_order")

  /** The table's standing WRITE SORT ORDER (Iceberg's sort-order table
    * property): columns every data-staging commit sorts by WITHIN each
    * write task before the parquet write — no extra shuffle, but each
    * file's [min,max] on these columns becomes a tight run instead of
    * spanning the whole domain, so the per-file stats manifest
    * actually skips files on range predicates ([[readPruned]]). Set it
    * once and full snapshots, appends AND merge-on-read delta segments
    * all keep the property — the difference between a streaming
    * append chain whose files prune and one whose files all intersect
    * every probe. */
  def sortOrder(table: String): Seq[String] = {
    val p = sortOrderPath(table)
    if (fs(p).exists(p)) readSmallFile(p).split(',').toSeq.map(_.trim).filter(_.nonEmpty) else Nil
  }

  /** The table's standing STATS COLUMNS — the columns every data
    * commit writes a per-file [min,max,nulls,rows] manifest over
    * (Iceberg records column bounds in its manifests the same way).
    * Persisted table metadata: set once (TBLPROPERTY
    * `graft.stats.columns`, or any commit's explicit `statsCols`),
    * every later commit keeps maintaining the manifest. */
  def statsColsFor(table: String): Seq[String] = {
    val p = statsColsPath(table)
    if (fs(p).exists(p)) readSmallFile(p).split(',').toSeq.map(_.trim).filter(_.nonEmpty) else Nil
  }

  /** Set (or with Nil clear) the standing stats columns. Validated
    * when the schema is known; applies to every LATER commit — same
    * metadata-only contract as [[setSortOrder]] (existing versions
    * keep whatever manifest they committed with). */
  def setStatsCols(table: String, cols: Seq[String]): Unit = {
    validateTableColumns(table, cols, "stats")
    if (cols.nonEmpty) replaceSmallFile(statsColsPath(table), cols.mkString(","))
    else {
      val p = statsColsPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
    }
  }

  /** The table's standing SKETCH COLUMNS — per-file Bloom membership
    * sketches maintained alongside the range stats, the point-lookup
    * half of file skipping ([[readPrunedIn]]). */
  def sketchColsFor(table: String): Seq[String] = {
    val p = sketchColsPath(table)
    if (fs(p).exists(p)) readSmallFile(p).split(',').toSeq.map(_.trim).filter(_.nonEmpty) else Nil
  }

  /** Set (or with Nil clear) the standing sketch columns — same
    * contract as [[setStatsCols]]. */
  def setSketchCols(table: String, cols: Seq[String]): Unit = {
    validateTableColumns(table, cols, "sketch")
    if (cols.nonEmpty) replaceSmallFile(sketchColsPath(table), cols.mkString(","))
    else {
      val p = sketchColsPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
    }
  }

  private def validateTableColumns(table: String, cols: Seq[String], what: String): Unit = {
    val have: Seq[String] =
      if (currentVersion(table) > 0) read(table).columns.toSeq
      else declaredSchema(table).map(_.fieldNames.toSeq).getOrElse(Nil)
    cols.foreach(c => require(have.isEmpty || have.contains(c),
      s"$what column '$c' is not a column of $table (have: ${have.mkString(", ")})"))
  }

  /** Set (or with Nil clear) the standing write sort order. Columns
    * are validated when known; the sort applies to every LATER commit
    * (existing files keep their layout until rewritten — same
    * metadata-only contract as [[evolvePartitioning]]). */
  def setSortOrder(table: String, cols: Seq[String]): Unit = {
    val have: Seq[String] =
      if (currentVersion(table) > 0) read(table).columns.toSeq
      else declaredSchema(table).map(_.fieldNames.toSeq).getOrElse(Nil)
    cols.foreach(c => require(have.isEmpty || have.contains(c),
      s"sort column '$c' is not a column of $table (have: ${have.mkString(", ")})"))
    if (cols.nonEmpty) replaceSmallFile(sortOrderPath(table), cols.mkString(","))
    else {
      val p = sortOrderPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
    }
  }

  /** The persisted transform spec, when the table is hidden-partitioned. */
  private def effectiveTransforms(table: String): Seq[SnapshotTables.PartitionTransform] = {
    val p = transformSpecPath(table)
    if (fs(p).exists(p)) SnapshotTables.PartitionTransform.parseSpec(readSmallFile(p)) else Nil
  }

  /** Build the per-file stats manifest for version `v`: list the data
    * files (recursively — partitioned layouts nest), then read each
    * file's parquet FOOTER on executors and reduce row-group stats to
    * one (min, max, nulls, rows) row per (file, column). The work is
    * O(files) metadata reads, fully distributed, and the result is
    * written as a manifest parquet without ever collecting stats to
    * the driver — at a 100k-file table the driver only handles the
    * file-name list. */
  private def writeManifest(table: String, v: Int, statsCols: Seq[String], sketchCols: Seq[String] = Nil): Unit = {
    val base = dataDirOf(table, v)
    val f = fs(base)
    // listFiles returns fully-qualified URIs (file:/..., hdfs://...);
    // qualify the base the same way or the relativization silently
    // no-ops and the manifest stores absolute paths
    val baseStr = f.makeQualified(base).toString.stripSuffix("/") + "/"
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = f.listFiles(base, true)
    while (it.hasNext) {
      val s = it.next()
      // hidden-ness applies to EVERY path component under the snapshot
      // root, not just the file name: a `.tmp-*` staging dir nested by
      // a racing rename must not leak its files into the manifest
      // (readPruned would then return rows a plain read does not see)
      val rel = s.getPath.toString.stripPrefix(baseStr)
      val hidden = rel.split('/').exists(c => c.startsWith("_") || c.startsWith("."))
      if (s.isFile && rel.endsWith(".parquet") && !hidden)
        files += s.getPath.toString
    }
    if (files.isEmpty) return
    val wanted = statsCols.toSet
    val confSer = new org.apache.spark.SerializableWritable(spark.sparkContext.hadoopConfiguration)
    val session = spark
    import session.implicits._
    // Small-commit fast path (r20 optimization, same budgeted-driver
    // rationale as the round-13 planning fast path): for a handful of
    // files, two distributed jobs (parallelize + footer reads, then
    // the manifest write's own scan of the RDD) cost more in
    // scheduling than the footer reads themselves — profiled at ~35 %
    // of q111's wall. Under the budget the same per-footer reduction
    // runs on the driver and the manifest writes from a LocalRelation
    // (one 1-task job); a 100k-file table still takes the distributed
    // path, so the driver never handles more than the budget.
    val driverFooterBudget = spark.conf.getOption("graft.manifest.driverFooterBudget")
      .map(_.toInt).getOrElse(64)
    def footerRows(abs: String, conf: org.apache.hadoop.conf.Configuration)
        : Seq[(String, Long, String, Option[Double], Option[Double], Option[String], Option[String], Long)] = {
        import scala.jdk.CollectionConverters._
        import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(abs), conf))
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          val rel = abs.stripPrefix(baseStr)
          blocks
            .flatMap(_.getColumns.asScala)
            .filter(c => wanted.contains(c.getPath.toDotString))
            .groupBy(_.getPath.toDotString)
            .toSeq
            .map { case (cname, chunks) =>
              var mnN: Option[Double] = None; var mxN: Option[Double] = None
              var mnS: Option[String] = None; var mxS: Option[String] = None
              var nulls = 0L
              chunks.foreach { c =>
                val st = c.getStatistics
                if (st != null) {
                  nulls += st.getNumNulls
                  if (st.hasNonNullValue) c.getPrimitiveType.getPrimitiveTypeName match {
                    case INT32 | INT64 | FLOAT | DOUBLE =>
                      val lo = st.genericGetMin.asInstanceOf[Number].doubleValue
                      val hi = st.genericGetMax.asInstanceOf[Number].doubleValue
                      mnN = Some(mnN.fold(lo)(math.min(_, lo)))
                      mxN = Some(mxN.fold(hi)(math.max(_, hi)))
                    case BINARY =>
                      val lo = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
                      val hi = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
                      mnS = Some(mnS.fold(lo)(a => if (a <= lo) a else lo))
                      mxS = Some(mxS.fold(hi)(a => if (a >= hi) a else hi))
                    case _ => () // other physical types: left statless (file kept conservatively)
                  }
                }
              }
              (rel, rows, cname, mnN, mxN, mnS, mxS, nulls)
            }
        } finally reader.close()
      }
    val statCols = Seq("file", "rows", "column", "min_num", "max_num", "min_str", "max_str", "nulls")
    val stats =
      if (files.size <= driverFooterBudget) {
        // footer opens are independent metadata reads — do them
        // concurrently (latency ≈ max, not sum), same shape as the
        // IcebergImport footer probe
        val rows =
          if (files.size > 4) {
            import scala.collection.parallel.CollectionConverters._
            val pc = files.toSeq.par
            pc.tasksupport = new scala.collection.parallel.ExecutionContextTaskSupport(
              scala.concurrent.ExecutionContext.global)
            pc.flatMap(footerRows(_, spark.sparkContext.hadoopConfiguration)).seq
          } else files.toSeq.flatMap(footerRows(_, spark.sparkContext.hadoopConfiguration))
        rows.toDF(statCols: _*)
      }
      else
        spark.sparkContext
          .parallelize(files.toSeq, math.max(1, math.min(files.size, 64)))
          .flatMap(abs => footerRows(abs, confSer.value))
          .toDF(statCols: _*)
    val manifest =
      if (sketchCols.isEmpty) withSketchSchema(stats)
      else {
        // Membership sketches need one DATA pass over the committed
        // files (footers don't carry value sets): one distributed scan
        // computes every sketch column's bitmap per file in a single
        // grouped aggregation — partial aggregation applies (the OR is
        // associative/commutative), so each task ships one fixed-size
        // bitmap per (file, column), never row data.
        import org.apache.spark.sql.functions._
        val bloom = udaf(new graft.functions.BloomSketchAggregator(sketchBits, sketchHashes),
          org.apache.spark.sql.Encoders.scalaLong)
        // input_file_name() may spell the scheme differently from
        // makeQualified (file:/ vs file:///): relativize against both
        val variants = Seq(baseStr, baseStr.replaceFirst("^file:/(?!/)", "file:///")).distinct
        val relExpr = variants.foldLeft(col("__file")) { (acc, p) =>
          when(col("__file").startsWith(p), col("__file").substr(lit(p.length + 1), lit(Int.MaxValue))).otherwise(acc)
        }
        val data = spark.read.parquet(files.toSeq: _*)
        val present = sketchCols.filter(data.columns.contains) // partition cols live in dir names, not file data
        if (present.isEmpty) withSketchSchema(stats)
        else {
          val grouped = data
            .select(input_file_name().as("__file") +: present.map(c => xxhash64(col(c)).as(s"__h_$c")): _*)
            .groupBy(relExpr.as("file"))
            .agg(bloom(col(s"__h_${present.head}")).as(s"__s_${present.head}"),
              present.tail.map(c => bloom(col(s"__h_$c")).as(s"__s_$c")): _*)
          val sketches = grouped.select(col("file"),
            explode(map(present.flatMap(c => Seq(lit(c), col(s"__s_$c"))): _*)).as(Seq("column", "sketch")))
            .withColumn("sketch_bits", lit(sketchBits))
            .withColumn("sketch_hashes", lit(sketchHashes))
          // one row per (file, column): stats and sketch merge where a
          // column carries both; a sketch-only column's row has null
          // stats (kept conservatively by every range read)
          withSketchSchema(stats).drop("sketch", "sketch_bits", "sketch_hashes")
            .join(sketches, Seq("file", "column"), "full_outer")
        }
      }
    // An all-empty manifest must not exist: statsCols naming only
    // partition columns (which live in dir names, not footers) would
    // otherwise write a manifest with ZERO rows, and a pruned read
    // over it would see no files AT ALL — returning empty results
    // instead of falling back to the full scan. No manifest = honest
    // "nothing to prune with".
    if (manifest.isEmpty) return
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(manifestPath(table, v).toString)
  }

  /** Align a stats-only frame to the full manifest schema (null sketch
    * columns) so manifests are uniform whether or not the table keeps
    * membership sketches. */
  private def withSketchSchema(stats: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    stats
      .withColumn("sketch", lit(null).cast("array<bigint>"))
      .withColumn("sketch_bits", lit(null).cast("int"))
      .withColumn("sketch_hashes", lit(null).cast("int"))
  }

  /** Upper bound on the pruned file-name list the pruned readers will
    * materialize on the driver and inline into the scan's path list.
    * At the 100 TB point a table can hold millions of files, and a
    * weak predicate can keep most of them — enumerating that as a
    * driver array + per-path scan entries costs more than it saves
    * (path-list planning is itself O(files)), and the driver list is
    * the only non-metadata-sized allocation in the read path. Past the
    * limit the readers fall back to the full snapshot scan, which is
    * never wrong: manifest pruning is a file-SKIPPING layer and the
    * caller always still applies its row-level predicate. Tunable per
    * session (specs set it low to exercise the fallback). */
  private def maxPrunedFileList: Int =
    spark.conf.getOption("graft.manifest.maxFileList") match {
      case None => 10000
      case Some(raw) => raw.trim.toIntOption match {
        case Some(n) if n > 0 => n
        case _ => throw new IllegalArgumentException(
          s"graft.manifest.maxFileList must be a positive int, got '$raw'")
      }
    }

  /** Scan of the current version restricted to the files whose
    * manifest stats MAY contain `column` ∈ [lo, hi] (numeric bounds
    * for numeric columns, string bounds for string columns). Files
    * with no stats for the column are kept conservatively; a version
    * without a manifest falls back to the full snapshot scan. The only
    * driver-side materialization is the pruned FILE-NAME list (same
    * deliberate trade as the LSH index's bucket IN-pushdown). The
    * caller still applies its row-level predicate — manifest pruning
    * is a file-skipping layer, not a filter. Temporal columns carry
    * stats in their parquet physical unit (DATE → days since epoch,
    * TIMESTAMP → micros), so bounds must be passed in that unit. */
  def readPruned(table: String, statColumn: String, lo: Any, hi: Any): DataFrame =
    readPrunedBox(table, Seq((statColumn, lo, hi)))

  /** Multi-predicate manifest pruning: a file survives only if its
    * stats intersect EVERY (column, lo, hi) bound — the read side of a
    * z-ordered snapshot commit, where per-file ranges are tight on all
    * cluster columns at once and a box predicate drops most files.
    * Same conservativeness and fallback rules as [[readPruned]]. */
  def readPrunedBox(table: String, bounds: Seq[(String, Any, Any)]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(bounds.nonEmpty, "readPrunedBox needs at least one bound")
    bounds.foreach { case (c, lo, hi) =>
      require(lo.isInstanceOf[String] == hi.isInstanceOf[String],
        s"bound on '$c' mixes string and numeric endpoints — it would mis-prune silently")
    }
    val v = currentVersion(table)
    val segs = chainOf(table, v)
    // merge-on-read segments rewrite/subtract rows at RESOLUTION time —
    // per-file skipping over the raw segments could resurrect deleted
    // rows; read resolved until materialize()/compact()
    if (segs.exists(s => (s.kind != "full" && s.kind != "append") || s.schemaEvolved))
      return readVersion(table, v)
    // append-only chain: each segment prunes independently against its
    // OWN manifest (appends keep writing them), results union — file
    // skipping survives O(delta) commits
    val perSeg = segs.flatMap(s => prunedBoxSegment(table, s.v, bounds))
    if (perSeg.isEmpty) readVersion(table, v).where(lit(false))
    else if (segs.length == 1) perSeg.head
    else perSeg.map(d => d.drop(d.columns.filter(_.startsWith("__p_")): _*)).reduce(_ unionByName _)
  }

  /** One chain segment's contribution to a pruned box read: the files
    * whose stats MAY intersect every bound, or the whole segment when
    * it has no usable manifest / the keep-list exceeds the driver
    * budget; None when nothing in the segment can match. */
  private def prunedBoxSegment(table: String, v: Int,
      bounds: Seq[(String, Any, Any)]): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val mp = manifestPath(table, v)
    if (!fs(mp).exists(mp)) return segRead(table, v)
    // the manifest is a single small parquet: re-reading it per branch
    // is cheaper than pinning checkpoint blocks for every pruned read
    val m = cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
    if (m.isEmpty) return segRead(table, v) // degenerate manifest (older writers): full scan, never empty answers
    val all = m.select("file").distinct()
    val keepDf = bounds
      .map { case (statColumn, lo, hi) =>
        val forCol = m.filter(col("column") === lit(statColumn))
        val overlapping = (lo, hi) match {
          case (l: String, h: String) =>
            forCol.filter(col("min_str").isNull || col("max_str").isNull ||
              !(col("min_str") > lit(h) || col("max_str") < lit(l)))
          case _ =>
            forCol.filter(col("min_num").isNull || col("max_num").isNull ||
              !(col("min_num") > lit(hi).cast("double") || col("max_num") < lit(lo).cast("double")))
        }
        // files the manifest has no row for under this column stay in scope
        overlapping.select("file").union(all.except(forCol.select("file")))
      }
      .reduce(_.intersect(_))
    // limit+1, not collect-all: when the predicate keeps more files
    // than the driver-list budget, stop enumerating and full-scan
    val lim = maxPrunedFileList
    val keep = keepDf.distinct().limit(lim + 1).collect().map(_.getString(0))
    val base = dataDirOf(table, v)
    if (keep.isEmpty) None
    else if (keep.length > lim) segRead(table, v)
    else
      Some(spark.read.option("basePath", base.toString)
        .parquet(keep.map(n => new Path(base, n).toString): _*))
  }

  /** Point-lookup pruned scan: `column IN (values)` answered by the
    * manifest's per-file Bloom membership sketches (plus min/max range
    * stats when present) — the file-skipping shape range stats cannot
    * give: a probe value inside every file's [min,max] (the normal
    * case for a high-cardinality key in an unsorted table) skips
    * nothing by range, while the sketch skips every file that never
    * saw the value, at ~(1−e^(−k·d/m))^k false-positive rate.
    *
    * The membership test runs as codegen'd column expressions over the
    * manifest rows (element_at / shiftright / bitwiseAND on the bitmap
    * words — no UDF); probe values are hashed once with the SAME
    * xxhash64-on-column-type the build pass used. Files with no sketch
    * and no stats for the column are kept conservatively; a version
    * with no manifest falls back to the full scan. As with every
    * pruning layer here, false positives only KEEP files and the
    * caller still applies the row-level predicate — pruning can never
    * change answers (oracle-pinned by the q113 corpus entry). */
  def readPrunedIn(table: String, statColumn: String, values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(values.nonEmpty, "readPrunedIn needs at least one probe value")
    val v = currentVersion(table)
    val segs = chainOf(table, v)
    // same rule as readPrunedBox: merge-on-read chains read resolved
    if (segs.exists(s => (s.kind != "full" && s.kind != "append") || s.schemaEvolved))
      return readVersion(table, v)
    val schema = readVersion(table, v).schema
    if (!schema.fieldNames.contains(statColumn)) return readVersion(table, v) // unknown column: conservative full scan
    val dt = schema(statColumn).dataType
    // hash each probe value exactly as the build pass hashed the
    // column (xxhash64 over the column type) — one driver-side job
    // over a 1-row frame, |values| hashes
    val hashes: Seq[Long] = spark.range(1)
      .select(values.map(pv => xxhash64(lit(pv).cast(dt))): _*)
      .head().toSeq.map(_.asInstanceOf[Long])
    val perSeg = segs.flatMap(s => prunedInSegment(table, s.v, statColumn, values, hashes, dt))
    if (perSeg.isEmpty) readVersion(table, v).where(lit(false))
    else if (segs.length == 1) perSeg.head
    else perSeg.map(d => d.drop(d.columns.filter(_.startsWith("__p_")): _*)).reduce(_ unionByName _)
  }

  /** Kirsch–Mitzenmacher position i of hash h, as column arithmetic
    * against a manifest row's OWN (sketch_bits, sketch_hashes) — a
    * table re-committed under a different sizing stays correct. h1/h2
    * are literals per probe value; only the bitmap words come from the
    * row. */
  private def bloomHit(h: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    val maxHashes = 8 // static unroll bound; rows with fewer hashes short-circuit via the when()
    (0 until maxHashes).map { i =>
      val p = pmod(lit(h1) + lit(i.toLong) * lit(h2), col("sketch_bits").cast("long"))
      when(lit(i) >= col("sketch_hashes"), lit(true))
        .otherwise(call_function("shiftright",
          element_at(col("sketch"), (p / 64).cast("int") + 1),
          (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L))
    }.reduce(_ && _)
  }

  private def prunedInSegment(table: String, v: Int, statColumn: String, values: Seq[Any],
      hashes: Seq[Long], dt: org.apache.spark.sql.types.DataType): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    val mp = manifestPath(table, v)
    if (!fs(mp).exists(mp)) return segRead(table, v)
    val m = cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
    if (!m.columns.contains("sketch")) return segRead(table, v) // pre-sketch-era manifest: full scan
    if (m.isEmpty) return segRead(table, v) // degenerate manifest (older writers): full scan, never empty answers
    val forCol = m.filter(col("column") === lit(statColumn))
    val all = m.select("file").distinct()
    val survivors = values.zip(hashes).map { case (pv, h) =>
      val range = dt match {
        case org.apache.spark.sql.types.StringType =>
          col("min_str").isNull || (lit(pv) >= col("min_str") && lit(pv) <= col("max_str"))
        case _: org.apache.spark.sql.types.NumericType =>
          col("min_num").isNull || (lit(pv).cast("double") >= col("min_num") && lit(pv).cast("double") <= col("max_num"))
        case _ => lit(true)
      }
      forCol
        .filter(range && when(col("sketch").isNull, lit(true)).otherwise(bloomHit(h)))
        .select("file")
    }.reduce(_ union _)
    val lim = maxPrunedFileList
    val keep = survivors.union(all.except(forCol.select("file")))
      .distinct().limit(lim + 1).collect().map(_.getString(0))
    val base = dataDirOf(table, v)
    if (keep.isEmpty) None
    else if (keep.length > lim) segRead(table, v)
    else
      Some(spark.read.option("basePath", base.toString)
        .parquet(keep.map(n => new Path(base, n).toString): _*))
  }

  /** File-skipping decision for a SQL scan of version `version` — the
    * planning-time half of X112 ([[graft.plans.ScanPruneRule]] calls
    * this at optimize time; Iceberg prunes data files against manifest
    * column bounds during scan planning the same way). `bounds` are
    * per-column closed ranges with optional endpoints, values in the
    * stats manifest's physical unit (DATE → days, TIMESTAMP → micros,
    * strings as String, numerics as-is); `probes` are per-column
    * IN-lists of (external lit()-compatible value, physical value)
    * pairs answered by the Bloom sketches AND per-value range checks —
    * so a probe on a stats-only column still range-prunes, and a
    * sketch column still prunes when the value sits inside every
    * file's [min,max]. Returns the pruned read ONLY when every chain
    * segment enumerated its keep-list under the driver budget and at
    * least one file is provably skipped; merge-on-read segments,
    * schema evolution, missing manifests or a zero-skip outcome return
    * None and the caller leaves the plan untouched — a None never
    * costs correctness, and a Some only drops files whose stats prove
    * no row can match (the caller keeps the row-level Filter above the
    * substituted scan, exactly like the Scala pruned reads). */
  def pruneForScan(table: String, ver: Int,
      bounds: Seq[(String, Option[Any], Option[Any])],
      probes: Seq[(String, Seq[(Any, Any)])]): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    if ((bounds.isEmpty && probes.isEmpty) || ver <= 0) return None
    val segs = chainOf(table, ver)
    if (segs.exists(s => (s.kind != "full" && s.kind != "append") || s.schemaEvolved)) return None
    val schema = readVersion(table, ver).schema
    // hash every probe value with the build pass's xxhash64-on-column-
    // type, evaluated DRIVER-SIDE (Literal + foldable Cast + XxHash64
    // interpreted eval — planning must not spawn a job per query)
    val typedProbes: Seq[(String, Seq[(Any, Any, Long)])] =
      probes.filter { case (c, vs) => vs.nonEmpty && schema.fieldNames.contains(c) }
        .map { case (c, vs) =>
          val dt = schema(c).dataType
          val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
          c -> vs.map { case (ext, phys) =>
            val le = org.apache.spark.sql.GraftSqlBridge.eagerExpression(lit(ext))
            val casted =
              if (le.dataType == dt) le
              else org.apache.spark.sql.catalyst.expressions.Cast(le, dt, tz)
            val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(casted), 42L)
              .eval(null).asInstanceOf[Long]
            (ext, phys, h)
          }
        }
    if (bounds.isEmpty && typedProbes.isEmpty) return None
    val contribs: Seq[(VersionMeta, Either[Option[DataFrame], (Seq[String], Long)])] =
      segs.map(s => s -> scanKeepForSegment(table, s.v, bounds, typedProbes))
    val skipped = contribs.exists {
      case (_, Right((keep, total))) => keep.length < total
      case _ => false
    }
    if (!skipped) return None
    val parts = contribs.flatMap {
      case (_, Left(full)) => full
      case (s, Right((keep, _))) if keep.nonEmpty =>
        val base = dataDirOf(table, s.v)
        val df = spark.read.option("basePath", base.toString)
          .parquet(keep.map(n => new Path(base, n).toString): _*)
        Some(df.drop(df.columns.filter(_.startsWith("__p_")).toSeq: _*))
      case _ => None // segment fully pruned
    }
    Some(
      if (parts.isEmpty) readVersion(table, ver).where(lit(false))
      else if (parts.length == 1) parts.head
      else parts.reduce(_ unionByName _))
  }

  /** Driver-row budget for the planning fast path: a segment manifest
    * at most this many rows is collected once (then LRU-cached — see
    * [[SnapshotTables.manifestCache]]) and every pruning / metadata-
    * aggregate decision on it is pure in-memory work; a bigger
    * manifest keeps the distributed evaluation (at that scale the
    * scan being saved dwarfs the planning jobs). */
  private def manifestDriverRows: Int =
    spark.conf.getOption("graft.scan.manifestDriverRows") match {
      case None => 65536
      case Some(raw) => raw.trim.toIntOption match {
        case Some(n) if n >= 0 => n
        case _ => throw new IllegalArgumentException(
          s"graft.scan.manifestDriverRows must be a non-negative int, got '$raw'")
      }
    }

  /** The segment manifest collected to the driver (budgeted + cached)
    * as a tri-state [[SnapshotTables.ManifestVerdict]]. Types
    * normalized via casts so era differences in the stored schema
    * can't bite. */
  private def collectedManifest(table: String, v: Int): SnapshotTables.ManifestVerdict = {
    import org.apache.spark.sql.functions.col
    val mp = manifestPath(table, v)
    if (!fs(mp).exists(mp)) return SnapshotTables.ManifestUnreadable
    val key = fs(mp).makeQualified(mp).toString
    val hit = SnapshotTables.manifestCache.synchronized(
      Option(SnapshotTables.manifestCache.get(key)))
    hit match {
      case Some(res) => res
      case None =>
        val lim = manifestDriverRows
        val res: SnapshotTables.ManifestVerdict =
          try {
            val m = cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
            val has = m.columns.toSet
            def c(name: String, t: String) =
              (if (has(name)) col(name) else org.apache.spark.sql.functions.lit(null)).cast(t)
            val taken = m.select(col("file").cast("string"), col("column").cast("string"),
                c("rows", "long"), c("nulls", "long"),
                c("min_num", "double"), c("max_num", "double"),
                c("min_str", "string"), c("max_str", "string"),
                c("sketch", "array<long>"), c("sketch_bits", "long"), c("sketch_hashes", "int"))
              .limit(lim + 1).collect()
            if (taken.length > lim) SnapshotTables.ManifestOverBudget
            else SnapshotTables.ManifestRows(taken.toSeq.map { r =>
              def lOpt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
              def dOpt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
              def sOpt(i: Int) = if (r.isNullAt(i)) None else Some(r.getString(i))
              SnapshotTables.MRow(r.getString(0), r.getString(1), lOpt(2), lOpt(3),
                dOpt(4), dOpt(5), sOpt(6), sOpt(7),
                if (r.isNullAt(8)) None else Some(r.getSeq[Long](8).toArray),
                if (r.isNullAt(9)) 0L else r.getLong(9),
                if (r.isNullAt(10)) 0 else r.getInt(10))
            })
          } catch { case _: Exception => SnapshotTables.ManifestUnreadable }
        SnapshotTables.manifestCache.synchronized(SnapshotTables.manifestCache.put(key, res))
        res
    }
  }

  /** In-memory twin of the JVM-side Kirsch–Mitzenmacher membership
    * test — bit-for-bit the column-expression [[bloomHit]] (same 8-
    * position unroll bound, same word/bit addressing); malformed rows
    * keep the file conservatively. */
  private def bloomHitMem(words: Array[Long], bits: Long, hashes: Int, h: Long): Boolean = {
    if (bits <= 0 || hashes <= 0 || words.isEmpty) return true
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    var i = 0
    val n = math.min(hashes, 8)
    while (i < n) {
      val m = (h1 + i.toLong * h2) % bits
      val p = if (m < 0) m + bits else m
      val wi = (p / 64).toInt
      if (wi >= words.length) return true // malformed sizing: keep
      if (((words(wi) >>> (p % 64).toInt) & 1L) != 1L) return false
      i += 1
    }
    true
  }

  /** In-memory segment keep-list — the exact file-keeping semantics of
    * the distributed evaluation below, over collected rows. */
  private def scanKeepInMemory(rs: Seq[SnapshotTables.MRow],
      bounds: Seq[(String, Option[Any], Option[Any])],
      probes: Seq[(String, Seq[(Any, Any, Long)])]): (Seq[String], Long) = {
    def toD(a: Any): Double = a match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    }
    // UTF-8 byte ordering, NOT Java String (UTF-16 code-unit) ordering:
    // the manifest min_str/max_str are byte-wise parquet binary stats and
    // the distributed twin compares with Spark's UTF8String (UTF-8 bytes).
    // The orderings disagree for non-BMP characters (e.g. "￿" sorts
    // AFTER an emoji in UTF-16 but BEFORE it in UTF-8), so Java ordering
    // here would wrongly prune files and silently lose rows.
    def cmpStr(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val byFile = rs.groupBy(_.file)
    def keepFile(rows: Seq[SnapshotTables.MRow]): Boolean = {
      def forCol(c: String) = rows.filter(_.column == c)
      val boundsOk = bounds.forall { case (c, lo, hi) =>
        val cr = forCol(c)
        cr.isEmpty || cr.exists { r => // no row for the column: stays in scope
          val isStr = lo.exists(_.isInstanceOf[String]) || hi.exists(_.isInstanceOf[String])
          if (isStr) (r.minStr, r.maxStr) match {
            case (Some(mn), Some(mx)) =>
              lo.forall(l => cmpStr(mx, l.asInstanceOf[String]) >= 0) &&
                hi.forall(h => cmpStr(mn, h.asInstanceOf[String]) <= 0)
            case _ => true
          } else (r.minNum, r.maxNum) match {
            case (Some(mn), Some(mx)) =>
              lo.forall(l => mx >= toD(l)) && hi.forall(h => mn <= toD(h))
            case _ => true
          }
        }
      }
      val probesOk = probes.forall { case (c, vh) =>
        val cr = forCol(c)
        cr.isEmpty || vh.exists { case (_, phys, h) => // ANY value may be present
          cr.exists { r =>
            val rangeOk = phys match {
              case s: String => (r.minStr, r.maxStr) match {
                case (Some(mn), Some(mx)) => cmpStr(s, mn) >= 0 && cmpStr(s, mx) <= 0
                case _ => true
              }
              case n => (r.minNum, r.maxNum) match {
                case (Some(mn), Some(mx)) => val d = toD(n); d >= mn && d <= mx
                case _ => true
              }
            }
            rangeOk && r.sketch.forall(w => bloomHitMem(w, r.sketchBits, r.sketchHashes, h))
          }
        }
      }
      boundsOk && probesOk
    }
    val keep = byFile.collect { case (f, rows) if keepFile(rows) => f }.toSeq.sorted
    (keep, byFile.size.toLong)
  }

  /** One segment's contribution to [[pruneForScan]]: Right((files
    * whose stats MAY satisfy every bound and every probe list, total
    * manifest files)), Left(full segment read) when the segment has no
    * usable manifest or the keep-list exceeds the driver budget. Files
    * the manifest has no row for under a queried column always stay in
    * scope — absence of stats can only keep, never skip. Small
    * manifests evaluate entirely on the driver (collected once,
    * cached); over-budget ones keep the distributed evaluation. */
  private def scanKeepForSegment(table: String, v: Int,
      bounds: Seq[(String, Option[Any], Option[Any])],
      probes: Seq[(String, Seq[(Any, Any, Long)])])
      : Either[Option[DataFrame], (Seq[String], Long)] = {
    import org.apache.spark.sql.functions._
    val mp = manifestPath(table, v)
    if (!fs(mp).exists(mp)) return Left(segRead(table, v))
    collectedManifest(table, v) match {
      case SnapshotTables.ManifestRows(rs) if rs.nonEmpty =>
        return Right(scanKeepInMemory(rs, bounds, probes))
      case SnapshotTables.ManifestRows(_) => // degenerate empty manifest
        return Left(segRead(table, v))
      case SnapshotTables.ManifestUnreadable => // corrupt/IO-failed, verdict cached:
        return Left(segRead(table, v)) // full read — never re-consult, never skip
      case SnapshotTables.ManifestOverBudget => () // distributed evaluation below
    }
    val m = cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
    if (m.isEmpty) return Left(segRead(table, v))
    val hasSketch = m.columns.contains("sketch")
    val all = m.select("file").distinct()
    val boundKeeps = bounds.map { case (statColumn, lo, hi) =>
      val forCol = m.filter(col("column") === lit(statColumn))
      val isStr = lo.exists(_.isInstanceOf[String]) || hi.exists(_.isInstanceOf[String])
      val overlapping =
        if (isStr) {
          val loOk = lo.map(l => !(col("max_str") < lit(l))).getOrElse(lit(true))
          val hiOk = hi.map(h => !(col("min_str") > lit(h))).getOrElse(lit(true))
          forCol.filter(col("min_str").isNull || col("max_str").isNull || (loOk && hiOk))
        } else {
          val loOk = lo.map(l => !(col("max_num") < lit(l).cast("double"))).getOrElse(lit(true))
          val hiOk = hi.map(h => !(col("min_num") > lit(h).cast("double"))).getOrElse(lit(true))
          forCol.filter(col("min_num").isNull || col("max_num").isNull || (loOk && hiOk))
        }
      overlapping.select("file").union(all.except(forCol.select("file")))
    }
    val probeKeeps = probes.map { case (statColumn, vh) =>
      val forCol = m.filter(col("column") === lit(statColumn))
      val survivors = vh.map { case (_, phys, h) =>
        val range = phys match {
          case s: String =>
            col("min_str").isNull || (lit(s) >= col("min_str") && lit(s) <= col("max_str"))
          case n =>
            col("min_num").isNull ||
              (lit(n).cast("double") >= col("min_num") && lit(n).cast("double") <= col("max_num"))
        }
        val sketchOk =
          if (hasSketch) when(col("sketch").isNull, lit(true)).otherwise(bloomHit(h))
          else lit(true)
        forCol.filter(range && sketchOk).select("file")
      }.reduce(_ union _)
      survivors.union(all.except(forCol.select("file")))
    }
    val keeps = (boundKeeps ++ probeKeeps).reduce(_ intersect _)
    val lim = maxPrunedFileList
    val total = all.count()
    val keep = keeps.distinct().limit(lim + 1).collect().map(_.getString(0)).toSeq
    if (keep.length > lim) Left(segRead(table, v)) else Right((keep, total))
  }

  /** METADATA-ONLY aggregates from the stats manifest — the
    * scan-less answers Iceberg serves from its manifests: row count,
    * numeric min/max, and null count per requested column, computed
    * from the manifest parquet alone (no data file is ever opened —
    * spec-asserted via inputFiles). One output row per column:
    * (column, n_rows, min_num, max_num, n_nulls), ordered.
    *
    * Honesty rules: row counts come from parquet footer row counts so
    * they are exact regardless of nulls; numeric min/max are exact
    * parquet column statistics; if ANY file lacks stats for a column,
    * its min/max are returned NULL rather than a silently-wrong bound
    * over the covered subset (n_rows/n_nulls likewise). String
    * columns' footer bounds may be truncated by parquet writers —
    * bounds, not extrema — so this surface is numeric-only by design;
    * use [[readPruned]] machinery for string range work. At a 100k-file
    * table this turns COUNT(*)/MIN/MAX from a table scan into a
    * manifest read. */
  /** The raw per-file stats manifest of the CURRENT version — one row
    * per (file, stats column): file, rows, column, min_num/max_num (or
    * min_str/max_str), nulls, plus membership-sketch columns when the
    * table commits with `sketchCols`. Iceberg's `files` metadata
    * relation, as a plain distributed DataFrame (manifest-sized —
    * metadata rows, never data). SQL face:
    * `graft_table_manifest('cat.ns.t')`. */
  def manifest(table: String): DataFrame = {
    val v = currentVersion(table)
    val segs = chainOf(table, v)
    // append-only chains union their per-segment manifests (file names
    // stay relative to each segment's own snapshot dir — disjoint by
    // construction since every segment writes fresh part files);
    // merge-on-read chains have no honest file-level story until the
    // rewrite, so they must materialize first.
    require(segs.forall(s => s.kind == "full" || s.kind == "append"),
      s"table $table v$v has merge-on-read deltas pending — materialize()/compact() before " +
        "reading the manifest")
    val perSeg = segs.flatMap { s =>
      val mp = manifestPath(table, s.v)
      if (fs(mp).exists(mp)) Some(cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString)))
      else if (segRead(table, s.v).forall(_.isEmpty)) None // zero-row segment: nothing to list
      else throw new IllegalArgumentException(
        s"table $table v${s.v} has no stats manifest — commit with statsCols/sketchCols first")
    }
    require(perSeg.nonEmpty,
      s"table $table v$v has no stats manifest — commit with statsCols/sketchCols first")
    perSeg.reduce(_ unionByName _)
  }

  /** (branch, forked-from main version, branch commits) for every live
    * branch — the data behind the `<table>.refs` metadata table
    * (Iceberg's refs relation). Branch count is operator-bounded;
    * driver-sized by construction. */
  def branchRefs(table: String): Seq[(String, Int, Int)] =
    branches(table).map { b =>
      (b, branchBase(table, b), branchTables(table).currentVersion(b))
    }

  /** Per-partition file/row/byte stats of the CURRENT version — the
    * data behind the `<table>.partitions` metadata relation (Iceberg's
    * partitions table). One entry per live partition directory value
    * ("" for an unpartitioned table), aggregated over every chain
    * segment, with merge-on-read DELETE content (tombstone keys /
    * deleted-row images awaiting resolution) reported in separate
    * columns — file-level truth before MOR resolution, exactly how
    * Iceberg's partitions relation reports a table carrying delete
    * files. Row counts come from parquet footers read in ONE
    * distributed job (footer I/O never runs on the driver), the
    * per-(partition, side) aggregation happens in that job, and only
    * the |partitions|-sized result is collected — same sizing contract
    * as `.history`/`.refs`. */
  def partitionStats(table: String): Seq[SnapshotTables.PartitionStat] = {
    val v = currentVersion(table)
    if (v == 0) return Nil
    // (absPath, bytes, isDelete, partition) per live data file; the
    // partition is the file's directory run under its segment root
    // (identity `col=value` dirs and hidden `__p_*` dirs alike), with
    // the mor del/ add/ routing component stripped first
    val entries = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean, String)]
    chainOf(table, v).foreach { m =>
      val base = dataDirOfMeta(table, m)
      val f = fs(base)
      if (f.exists(base)) {
        val baseStr = f.makeQualified(base).toString.stripSuffix("/") + "/"
        val it = f.listFiles(base, true)
        while (it.hasNext) {
          val s = it.next()
          val rel = s.getPath.toString.stripPrefix(baseStr)
          val comps = rel.split('/')
          // a component carrying '=' is a partition directory — hidden
          // transforms deliberately spell `__p_…=value` dirs, which
          // Spark's partition discovery reads despite the underscore
          val hidden = comps.exists(c =>
            (c.startsWith("_") || c.startsWith(".")) && !c.contains("="))
          if (s.isFile && rel.endsWith(".parquet") && !hidden) {
            val (isDel, pcomps) = (m.kind, comps.head) match {
              case ("mor_delete", _) => (true, comps.dropRight(1))
              case ("mor_patch" | "mor_revise", "del") => (true, comps.drop(1).dropRight(1))
              case ("mor_patch" | "mor_revise", "add") => (false, comps.drop(1).dropRight(1))
              case _ => (false, comps.dropRight(1))
            }
            entries += ((s.getPath.toString, s.getLen, isDel, pcomps.mkString("/")))
          }
        }
      }
    }
    if (entries.isEmpty) return Nil
    val confSer = new org.apache.spark.SerializableWritable(spark.sparkContext.hadoopConfiguration)
    spark.sparkContext
      .parallelize(entries.toSeq, math.max(1, math.min(entries.size, 64)))
      .map { case (abs, bytes, isDel, part) =>
        import scala.jdk.CollectionConverters._
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(abs), confSer.value))
        val rows = try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
                   finally reader.close()
        ((part, isDel), (1L, rows, bytes))
      }
      .reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      .collect() // |partitions|-sized
      .groupBy(_._1._1)
      .map { case (part, sides) =>
        val data = sides.collectFirst { case ((_, false), t) => t }.getOrElse((0L, 0L, 0L))
        val del = sides.collectFirst { case ((_, true), t) => t }.getOrElse((0L, 0L, 0L))
        SnapshotTables.PartitionStat(part, data._1, data._2, data._3, del._1, del._2)
      }
      .toSeq.sortBy(_.partition)
  }

  def manifestAgg(table: String, columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(columns.nonEmpty, "manifestAgg needs at least one column")
    val v = currentVersion(table)
    val mp = manifestPath(table, v)
    require(fs(mp).exists(mp), s"table $table v$v has no stats manifest — commit with statsCols first")
    // manifest-sized; the (modTime,len)-guarded relation cache makes
    // per-branch re-reads free without pinning checkpoint blocks
    val m = cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
    // a column absent from SOME files (schema evolution, sketch-only
    // rows) must answer NULL, not a bound over the covered subset —
    // compare each column's stats coverage against the table's full
    // file set
    val filesTotal = m.select(countDistinct(col("file"))).head().getLong(0)
    m.filter(col("column").isin(columns: _*))
      .groupBy(col("column"))
      .agg(
        sum(col("rows")).as("__rows"),
        min(col("min_num")).as("__min"),
        max(col("max_num")).as("__max"),
        sum(col("nulls")).as("__nulls"),
        count(col("min_num")).as("__files_with_stats"),
        count(col("rows")).as("__files_with_rows"))
      .select(
        col("column"),
        when(col("__files_with_rows") === filesTotal, col("__rows")).as("n_rows"),
        when(col("__files_with_stats") === filesTotal, col("__min")).as("min_num"),
        when(col("__files_with_stats") === filesTotal, col("__max")).as("max_num"),
        when(col("__files_with_rows") === filesTotal, col("__nulls")).as("n_nulls"))
      .orderBy(col("column"))
  }

  /** Version-pinned, never-throwing metadata COUNT for the SQL
    * metadata-aggregate rule ([[graft.plans.MetadataAggRule]], X113):
    * Some(rows) only when every chain segment is full/append,
    * unevolved, and either empty or fully row-counted by its manifest
    * — anything else answers None and the caller keeps the real scan. */
  private[graft] def fastCountForScan(table: String, ver: Int): Option[Long] =
    manifestRowsForScan(table, ver, Nil) // same coverage contract as fastCount, planning-fast-pathed

  /** The identity partition columns of version `ver`'s chain when
    * EVERY segment was committed under exactly that layout (no hidden
    * `__p_*` transforms anywhere, no mixed layouts from partition-spec
    * evolution) — Nil otherwise. Partition-scoped metadata aggregates
    * (X114) may only trust partition-directory tokens under a uniform
    * identity layout: a segment written under an older spec has no
    * dirs for the queried column and its rows would silently vanish
    * from a token-filtered count. */
  private[graft] def uniformIdentityLayout(table: String, ver: Int): Seq[String] = try {
    val per = chainOf(table, ver).map { s =>
      val m = new Path(metaDir(table), f"v${s.v}%05d.json")
      if (!fs(m).exists(m)) return Nil
      "\"partition_cols\":\\[([^\\]]*)\\]".r.findFirstMatchIn(readSmallFile(m))
        .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
        .getOrElse(Nil)
    }
    if (per.isEmpty || per.exists(_.exists(_.startsWith("__p_"))) || per.distinct.length != 1) Nil
    else per.head
  } catch { case _: Exception => Nil }

  /** Version-pinned metadata row count of the files under the given
    * partition-directory tokens (X114 — `count(*)` scoped by identity-
    * partition equalities): Some only when every in-scope file carries
    * a manifest row count. Caller must have verified the layout via
    * [[uniformIdentityLayout]]; an empty token list counts the whole
    * version. */
  private[graft] def manifestRowsForScan(table: String, ver: Int,
      partTokens: Seq[String]): Option[Long] = try {
    import org.apache.spark.sql.functions._
    chainManifestRows(table, ver) match {
      case None => return None
      case Some(Some(rows)) =>
        return if (rows.isEmpty) Some(0L) else rowsInMemory(rows, partTokens)
      case Some(None) => () // over budget: distributed path below
    }
    scanManifests(table, ver) match {
      case None => None
      case Some(Nil) => Some(0L)
      case Some(ms) =>
        val m = partTokenFilter(ms.reduce(_ unionByName _), partTokens)
        // (__seg, file) keys: relative file names repeat across segments
        val perFile = m.select(col("__seg"), col("file"), col("rows")).distinct()
        val a = perFile.agg(count(lit(1)), count(col("rows")),
          countDistinct(col("__seg"), col("file")), sum(col("rows"))).head()
        // one rows value per file, every file covered
        if (a.getLong(0) != a.getLong(1) || a.getLong(0) != a.getLong(2)) None
        else Some(if (a.isNullAt(3)) 0L else a.getLong(3))
    }
  } catch { case _: Exception => None }

  /** Every chain segment's manifest frame for a metadata-served scan,
    * each tagged with a `__seg` segment-version column — file names are
    * only unique WITHIN a segment (each segment writes its own
    * `part-*` files), so every per-file key downstream must be
    * (__seg, file) or two segments sharing a relative name would
    * collapse in distinct()/countDistinct and undercount. None when
    * any non-empty segment lacks a manifest (nothing provable) or the
    * chain has merge-on-read / evolved segments; Some(Nil) for a
    * zero-row version. */
  private def scanManifests(table: String, ver: Int): Option[Seq[DataFrame]] = {
    import org.apache.spark.sql.functions.lit
    val segs = chainOf(table, ver)
    if (segs.exists(s => (s.kind != "full" && s.kind != "append") || s.schemaEvolved)) return None
    val ms = segs.flatMap { s =>
      val mp = manifestPath(table, s.v)
      if (fs(mp).exists(mp))
        Some(cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
          .withColumn("__seg", lit(s.v)))
      else if (segRead(table, s.v).forall(_.isEmpty)) None // empty segment: zero rows
      else return None // rows with no manifest: nothing provable
    }
    Some(ms)
  }

  /** [[scanManifests]]'s driver fast-path twin: outer None = chain
    * ineligible / a non-empty segment without a manifest (caller
    * answers None); Some(None) = eligible but some manifest over the
    * driver budget (caller takes the distributed path); Some(Some) =
    * every segment's rows collected, keyed by segment index (file
    * names are only unique within a segment). */
  private def chainManifestRows(table: String, ver: Int)
      : Option[Option[Seq[(Int, SnapshotTables.MRow)]]] = {
    val segs = chainOf(table, ver)
    if (segs.exists(s => (s.kind != "full" && s.kind != "append") || s.schemaEvolved)) return None
    var overBudget = false
    val collected = segs.zipWithIndex.flatMap { case (s, i) =>
      val mp = manifestPath(table, s.v)
      if (fs(mp).exists(mp)) collectedManifest(table, s.v) match {
        case SnapshotTables.ManifestRows(rs) => Some(rs.map(r => (i, r)))
        case SnapshotTables.ManifestOverBudget => overBudget = true; Some(Nil)
        // unreadable manifest: nothing provable for the whole chain —
        // metadata answers must decline, not skip the segment
        case SnapshotTables.ManifestUnreadable => return None
      }
      else if (segRead(table, s.v).forall(_.isEmpty)) None // empty segment
      else return None // rows with no manifest: nothing provable
    }
    if (overBudget) Some(None) else Some(Some(collected.flatten))
  }

  private def tokenMatches(file: String, partTokens: Seq[String]): Boolean =
    partTokens.forall(t => file.split('/').contains(t))

  /** In-memory twin of [[manifestRowsForScan]]'s distributed
    * aggregation — identical coverage rules. */
  private def rowsInMemory(all: Seq[(Int, SnapshotTables.MRow)],
      partTokens: Seq[String]): Option[Long] = {
    val sub = all.filter(t => tokenMatches(t._2.file, partTokens))
    val perFile = sub.map(t => (t._1, t._2.file, t._2.rows)).distinct
    val files = perFile.map(t => (t._1, t._2)).distinct
    // one rows value per file, every file covered
    if (perFile.size != files.size || perFile.exists(_._3.isEmpty)) None
    else Some(perFile.flatMap(_._3).sum)
  }

  /** In-memory twin of [[manifestStatsForScan]]'s distributed
    * aggregation — identical coverage and honesty rules. */
  private def statsInMemory(all: Seq[(Int, SnapshotTables.MRow)], statColumn: String,
      partTokens: Seq[String]): SnapshotTables.ColStats = {
    val sub = all.filter(t => tokenMatches(t._2.file, partTokens))
    val filesTotal = sub.map(t => (t._1, t._2.file)).distinct.size
    if (filesTotal == 0) // no file in scope: zero rows, exactly
      return SnapshotTables.ColStats(Some(0L), Some(0L), Some(None), Some(None))
    val forCol = sub.filter(_._2.column == statColumn).map(_._2)
    val nf = sub.filter(_._2.column == statColumn).map(t => (t._1, t._2.file)).distinct.size
    val nrows = forCol.size
    if (nf != filesTotal || nf != nrows)
      return SnapshotTables.ColStats(None, None, None, None)
    val rows = if (forCol.forall(_.rows.isDefined)) Some(forCol.flatMap(_.rows).sum) else None
    val nulls = if (forCol.forall(_.nulls.isDefined)) Some(forCol.flatMap(_.nulls).sum) else None
    def allNull(r: SnapshotTables.MRow): Boolean =
      (for { n <- r.nulls; rw <- r.rows } yield n == rw).getOrElse(false)
    def ext(vals: Seq[Double], uncovered: Int, pick: Seq[Double] => Double): Option[Option[Double]] =
      if (uncovered != 0) None // some file has rows but no bounds
      else if (vals.isEmpty) {
        if (rows.isDefined && nulls.isDefined && rows == nulls) Some(None) else None
      } else Some(Some(pick(vals)))
    SnapshotTables.ColStats(rows, nulls,
      ext(forCol.flatMap(_.minNum), forCol.count(r => r.minNum.isEmpty && !allNull(r)), _.min),
      ext(forCol.flatMap(_.maxNum), forCol.count(r => r.maxNum.isEmpty && !allNull(r)), _.max))
  }

  /** Keep only manifest rows whose (partition-dir-bearing, segment-
    * relative) file path contains every token as an exact path
    * component — identity `col=value` dirs partition the file set
    * exactly, so the subset keeps full coverage semantics. */
  private def partTokenFilter(m: DataFrame, partTokens: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    partTokens.foldLeft(m)((acc, t) =>
      acc.filter(array_contains(split(col("file"), "/"), t)))
  }

  /** Version-pinned per-column manifest aggregate for the SQL
    * metadata-aggregate rule (X113): each field is present ONLY when
    * every file of every segment covers it, so a Some can never be a
    * bound over a subset. `min`/`max` are `Some(None)` when the column
    * is exactly all-NULL (provable from full rows+nulls coverage) and
    * `Some(Some(v))` when `v` is the exact extremum of the column's
    * non-null values; numeric physical units as in the manifest (DATE
    * days, TIMESTAMP micros). String bounds are never served — parquet
    * footer string stats may be truncated (bounds, not extrema).
    * `partTokens` (X114) scope every answer to the files under those
    * identity-partition directories — the caller must have verified
    * the layout via [[uniformIdentityLayout]]. */
  private[graft] def manifestStatsForScan(table: String, ver: Int, statColumn: String,
      partTokens: Seq[String] = Nil): Option[SnapshotTables.ColStats] = try {
    import org.apache.spark.sql.functions._
    chainManifestRows(table, ver) match {
      case None => return None
      case Some(Some(rows)) =>
        return Some(
          if (rows.isEmpty) // version with zero rows: everything is exact
            SnapshotTables.ColStats(Some(0L), Some(0L), Some(None), Some(None))
          else statsInMemory(rows, statColumn, partTokens))
      case Some(None) => () // over budget: distributed path below
    }
    val ms = scanManifests(table, ver) match {
      case None => return None
      case Some(Nil) => // version with zero rows: everything is exact
        return Some(SnapshotTables.ColStats(Some(0L), Some(0L), Some(None), Some(None)))
      case Some(seq) => seq
    }
    val m = partTokenFilter(ms.reduce(_ unionByName _), partTokens)
    // (__seg, file) keys: relative file names repeat across segments
    val filesTotal = m.select(countDistinct(col("__seg"), col("file"))).head().getLong(0)
    if (filesTotal == 0) // no file under these partition tokens: zero rows, exactly
      return Some(SnapshotTables.ColStats(Some(0L), Some(0L), Some(None), Some(None)))
    val forCol = m.filter(col("column") === lit(statColumn))
    // a file is min/max-covered when it has bounds OR is provably
    // all-null (nulls == rows); comparisons against null row/null
    // fields must count as NOT covered, hence the coalesce
    val allNull = coalesce(col("nulls") === col("rows"), lit(false))
    val a = forCol.agg(
      countDistinct(col("__seg"), col("file")).as("nf"),
      count(lit(1)).as("nrows"),
      sum(col("rows")).as("rows"),
      count(col("rows")).as("rows_cov"),
      sum(col("nulls")).as("nulls"),
      count(col("nulls")).as("nulls_cov"),
      min(col("min_num")).as("mn"),
      max(col("max_num")).as("mx"),
      sum(when(col("min_num").isNull && !allNull, 1).otherwise(0)).as("unc_min"),
      sum(when(col("max_num").isNull && !allNull, 1).otherwise(0)).as("unc_max")
    ).head()
    val nf = a.getLong(0); val nrows = a.getLong(1)
    // one manifest row per file AND every table file covered — the
    // precondition for every field below
    if (nf != filesTotal || nf != nrows) return Some(SnapshotTables.ColStats(None, None, None, None))
    val rows = if (a.getLong(3) == nrows) Some(a.getLong(2)) else None
    val nulls = if (a.getLong(5) == nrows) Some(a.getLong(4)) else None
    def ext(mIdx: Int, uncIdx: Int): Option[Option[Double]] =
      if (a.getLong(uncIdx) != 0) None // some file has rows but no bounds
      else if (a.isNullAt(mIdx)) { // every file all-null: NULL is exact iff coverage proves it
        if (rows.isDefined && nulls.isDefined && rows == nulls) Some(None) else None
      } else Some(Some(a.getDouble(mIdx)))
    Some(SnapshotTables.ColStats(rows, nulls, ext(6, 8), ext(7, 9)))
  } catch { case _: Exception => None }

  /** Metadata-only COUNT(*) of the current version (manifest row
    * counts summed over the file set). Requires every file to carry a
    * row count (i.e. at least one statsCols column) — a partial sum
    * would be silently wrong. */
  def fastCount(table: String): Long = {
    val v = currentVersion(table)
    val segs = chainOf(table, v)
    // merge-on-read segments subtract/replace rows — summing segment
    // manifests would over-count; append-only chains sum exactly
    require(segs.forall(s => s.kind == "full" || s.kind == "append"),
      s"table $table v$v has merge-on-read deltas pending — fastCount needs materialized rows; " +
        "run materialize()/compact() first")
    segs.map(s => fastCountOfVersion(table, s.v)).sum
  }

  private def fastCountOfVersion(table: String, v: Int): Long = {
    import org.apache.spark.sql.functions._
    val mp = manifestPath(table, v)
    if (!fs(mp).exists(mp)) {
      // an EMPTY segment (no files, or files with zero rows — footer
      // stats of a 0-row file are nothing to manifest) contributes
      // zero; a segment WITH rows but no manifest cannot be counted
      // from metadata
      require(segRead(table, v).forall(_.isEmpty),
        s"table $table v$v has no stats manifest — commit with statsCols first")
      return 0L
    }
    val m = cachedParquet(mp).getOrElse(spark.read.parquet(mp.toString))
    val filesTotal = m.select(countDistinct(col("file"))).head().getLong(0)
    val withRows = m.filter(col("rows").isNotNull).select(col("file"), col("rows")).distinct()
    require(withRows.count() == filesTotal,
      s"manifest of $table v$v lacks row counts for some files — fastCount would be wrong")
    val r = withRows.agg(sum(col("rows"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Read the current snapshot (partition discovery + pruning work as
    * on any partitioned parquet directory). */
  def read(table: String): DataFrame = readVersion(table, currentVersion(table))

  /** TableFormat read side — pipeline SQL resolves against the current
    * snapshot instead of a catalog entry. */
  override def read(spark: SparkSession, table: String): DataFrame = read(table)

  /** Time travel to any retained version. Hidden-partitioning columns
    * (`__p_*`, [[overwriteTableTransformed]]) are concealed — they are
    * directory layout, not data. */
  def readVersion(table: String, version: Int): DataFrame = {
    require(version > 0, s"table $table has no committed version")
    val segs = chainOf(table, version)
    val df0 =
      if (segs.length == 1) {
        val dd = dataDirOfMeta(table, segs.head)
        val df = cachedParquet(dd).getOrElse(spark.read.parquet(dd.toString))
        val hidden = df.columns.filter(_.startsWith("__p_"))
        if (hidden.isEmpty) df else df.drop(hidden: _*)
      } else resolveChain(table, segs)
    // metadata-only schema evolution: the version's DECLARED schema is
    // authoritative over what the files happen to carry — added
    // columns read NULL, dropped columns are projected away. Per
    // version, so prior versions keep their own schema.
    if (segs.exists(_.schemaEvolved)) conformToVersionSchema(df0, table, version) else df0
  }

  /** The data schema a version's commit metadata declares (hidden
    * `__p_*` layout columns stripped); None when unparseable. */
  private[graft] def versionDataSchema(table: String, v: Int): Option[org.apache.spark.sql.types.StructType] = {
    val m = new Path(metaDir(table), f"v$v%05d.json")
    if (!fs(m).exists(m)) return None
    val json = readSmallFile(m)
    val i = json.indexOf("\"schema\":")
    if (i < 0) return None
    try {
      val s = org.apache.spark.sql.types.DataType
        .fromJson(json.substring(i + "\"schema\":".length, json.length - 1))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      Some(org.apache.spark.sql.types.StructType(s.filterNot(_.name.startsWith("__p_"))))
    } catch { case _: Exception => None }
  }

  /** Whether any segment of `v`'s chain is a metadata-only schema
    * evolution — such chains read ONLY through the resolved
    * ([[readVersion]]) path, where the declared schema is applied;
    * multi-dir / pruned fast paths fall back until a full rewrite
    * (materialize/compact/optimize) re-aligns files with the schema. */
  private[graft] def chainSchemaEvolved(table: String, v: Int): Boolean =
    (try chainOf(table, v) catch { case _: Exception => Nil }).exists(_.schemaEvolved)

  private def conformToVersionSchema(df: DataFrame, table: String, v: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    versionDataSchema(table, v) match {
      case None => df
      case Some(want) =>
        if (want.fieldNames.toSeq == df.columns.toSeq) df
        else df.select(want.fields.toSeq.map { f =>
          if (df.columns.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }: _*)
    }
  }

  /** METADATA-ONLY ADD COLUMN (Iceberg's schema evolution, a pure
    * metadata operation by design — the COW alternative rewrites the
    * WHOLE table to add a column of nulls, an O(table) cliff at
    * 100 TB): commits one EMPTY version whose declared schema carries
    * the new nullable column; every read of this and later versions
    * null-fills it until real values arrive, prior versions keep their
    * narrower schema. While the chain carries an evolution segment,
    * reads route through the resolved path (fast multi-dir/pruned
    * scans would expose raw file schemas) — a materialize/compact/
    * optimize (or any full commit) re-aligns files and restores every
    * fast path. */
  def addColumn(table: String, name: String, dataType: org.apache.spark.sql.types.DataType): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    val s = read(table).schema
    require(!s.fieldNames.contains(name), s"column '$name' already exists on $table")
    // directory-partitioned convention: partition columns read LAST,
    // so the added column lands before them (same order the COW
    // evolution produced)
    val pcols = currentPartitionCols(table).toSet
    val (dataF, partF) = s.fields.partition(f => !pcols.contains(f.name))
    commitSchemaEvolution(table,
      org.apache.spark.sql.types.StructType((dataF :+
        org.apache.spark.sql.types.StructField(name, dataType, nullable = true)) ++ partF))
  }

  /** METADATA-ONLY DROP COLUMN — the projection dual of [[addColumn]]:
    * the declared schema stops naming the column and every read of
    * this and later versions projects it away (the bytes remain in
    * old files until a rewrite, exactly Iceberg's drop semantics).
    * Partition and transform-source columns are refused (layout
    * identity). */
  def dropColumn(table: String, name: String): Unit = {
    require(currentVersion(table) > 0, s"table $table has no committed version")
    val s = read(table).schema
    require(s.fieldNames.contains(name), s"no column '$name' on $table")
    require(s.fields.length > 1, "cannot drop the last column")
    require(!currentPartitionCols(table).contains(name), s"cannot drop partition column '$name'")
    require(!persistedTransforms(table).exists(_.srcCol == name),
      s"cannot drop '$name' — it is a partition-transform source column")
    require(!sortOrder(table).contains(name),
      s"cannot drop '$name' — it is in the write sort order (clear it first)")
    commitSchemaEvolution(table,
      org.apache.spark.sql.types.StructType(s.filterNot(_.name == name)))
  }

  private def commitSchemaEvolution(table: String, newSchema: org.apache.spark.sql.types.StructType): Unit = {
    val cur = currentVersion(table)
    ensureChainBudget(table)
    val base = currentVersion(table) // budget may have folded/materialized
    val _ = cur
    commitVersion(
      table,
      stage = tmp => { fs(tmp).mkdirs(tmp); () }, // an EMPTY version directory: pure metadata
      partitionCols1 = currentPartitionCols(table),
      schemaJson = newSchema.json,
      metaExtra = s""""kind":"append","base":$base,"schema_evolved":true,""",
      expectedNext = Some(base + 1),
      afterWin = () => (),
      manifestStats = Nil,
      manifestSketch = Nil)
    ()
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
    val bytes = chainBytes(table, cur)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = readVersion(table, cur)
    val compacted =
      if (partitionCols.nonEmpty)
        df.repartition(nFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    // content-preserving: pin the slot so a concurrent writer fails the
    // rewrite (ConcurrentCommitException) instead of being swallowed
    overwriteShaped(compacted, table, partitionCols, expectedNext = Some(cur + 1))
  }

  /** OPTIMIZE [ZORDER BY]: rewrite the current version's data into
    * ~`targetFileBytes` files, z-order-clustered on `zorderCols` with a
    * per-file stats manifest over them — compaction and multi-dim
    * clustering as ONE new committed version (the Delta/Iceberg
    * `OPTIMIZE … ZORDER BY` maintenance shape). Content is unchanged —
    * this is purely a layout rewrite; readers of prior versions are
    * unaffected, and subsequent [[readPrunedBox]] calls over the
    * clustered columns skip non-intersecting files. `statsCols`
    * defaults to the z-order columns; pass `zorderCols = Nil` for a
    * plain compaction with fresh stats. On an identity-partitioned
    * table the clustering is PER PARTITION ([[Sinks
    * .zorderClusterWithin]]): rows co-locate by the partition columns
    * and sort by (partition cols, z), so directory pruning and z-file
    * skipping compose — a global range partition would scatter each
    * directory across tasks and lose the z runs to the writer's own
    * partition re-sort. Hidden-transform layouts re-derive through the
    * shaped overwrite as always. */
  def optimize(
      table: String,
      zorderCols: Seq[String],
      targetFileBytes: Long = 128L << 20,
      statsCols: Seq[String] = Nil
  ): Unit = {
    val cur = currentVersion(table)
    require(cur > 0, s"table $table has no committed version")
    val bytes = chainBytes(table, cur)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = readVersion(table, cur)
    val idCols =
      if (persistedTransforms(table).nonEmpty) Nil else currentPartitionCols(table)
    val rewritten =
      if (zorderCols.nonEmpty && idCols.nonEmpty)
        Sinks.zorderClusterWithin(df, idCols, zorderCols, nFiles)
      else if (zorderCols.nonEmpty) Sinks.zorderCluster(df, zorderCols, nFiles)
      else if (idCols.nonEmpty)
        df.repartition(nFiles, idCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    val stats = if (statsCols.nonEmpty) statsCols else zorderCols
    // content-preserving: pin the slot so a concurrent writer fails the
    // rewrite (ConcurrentCommitException) instead of being swallowed
    overwriteShaped(rewritten, table, Nil, statsCols = stats, expectedNext = Some(cur + 1))
  }

  /** Total bytes across a version's chain segments — the sizing input
    * for compaction's file-count target (an upper bound on MOR chains:
    * deleted rows still occupy base bytes until the rewrite). */
  private def chainBytes(table: String, v: Int): Long =
    chainOf(table, v).map { s =>
      val d = dataDirOfMeta(table, s)
      fs(d).getContentSummary(d).getLength
    }.sum

  private def retentionPath(table: String): Path =
    new Path(metaDir(table), "retention")

  /** Per-TABLE retention override (Iceberg keeps expiry policy as
    * table properties): the number of predecessors kept behind the
    * current version — this table's value when set, the store-wide
    * `previousVersionsMax` otherwise. */
  def retentionFor(table: String): Int = {
    val p = retentionPath(table)
    if (!fs(p).exists(p)) previousVersionsMax
    else readSmallFile(p).trim.toIntOption match {
      case Some(n) if n >= 0 => n
      case _ => previousVersionsMax // unreadable override: fall back, never widen deletes
    }
  }

  /** Set (or with None clear) this table's retention window. Applies
    * from the NEXT commit's retention pass — nothing is expired here. */
  def setRetention(table: String, versions: Option[Int]): Unit = versions match {
    case Some(n) =>
      require(n >= 0, s"retention must be >= 0 predecessors, got $n")
      replaceSmallFile(retentionPath(table), n.toString)
    case None =>
      val p = retentionPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
  }

  /** Drop snapshots older than the retention window (keep the current
    * one plus [[retentionFor]] predecessors). */
  private def expire(table: String, current: Int): Unit = {
    val keep = retentionFor(table)
    val protectedV = branchProtectedVersions(table)
    val hist = history(table)
    // Delta-chain protection: every version a RETAINED version's chain
    // still walks through must outlive the window — expiring a chain's
    // full base would orphan every retained delta on top of it (the
    // current version included, when the head is a delta). The walk is
    // O(retained × chain length), metadata-sized.
    val chainProtected: Set[Int] =
      hist.filter(v => v >= current - keep || protectedV.contains(v))
        .flatMap { v =>
          try chainOf(table, v).map(_.v)
          catch { case _: Exception => Seq(v) } // unreadable meta: keep conservatively
        }.toSet
    hist.filter(v => v < current - keep && !protectedV.contains(v) &&
        !chainProtected.contains(v)).foreach(dropVersion(table, _))
    vacuumStaging(table)
  }

  /** Physically remove one version: data dir, metadata, manifest. The
    * data dir resolves through the version meta BEFORE the meta is
    * deleted; a write-once pool dir (direct layout) can be MULTIPLY
    * referenced — publish adopts a branch commit's dir into main by
    * reference — so it is deleted only when no other retained meta,
    * main's or any branch's, still points at it (reachability, the
    * Iceberg GC model). */
  private def dropVersion(table: String, v: Int): Unit = {
    val d = dataDirOf(table, v)
    val direct = metaDataDirString(table, v).isDefined
    if (!direct || !poolDirReferenced(d,
        excludeMeta = Some(new Path(metaDir(table), f"v$v%05d.json"))))
      fs(d).delete(d, true)
    val m = new Path(metaDir(table), f"v$v%05d.json")
    fs(m).delete(m, false)
    val mf = manifestPath(table, v)
    fs(mf).delete(mf, true)
  }

  /** Whether any retained version meta — the owning table's or any of
    * its branches' — records `d` as its data dir. The owning table dir
    * is the pool's parent (`<table>/data/<uuid>`), which holds for
    * main AND branch instances alike (branches write into the parent
    * table's pool). O(retained metas) small reads, and only ever run
    * for direct-layout versions on their way out. Unreadable metas
    * count as references (never widen a delete on bad reads). */
  private def poolDirReferenced(d: Path, excludeMeta: Option[Path]): Boolean = {
    val f = fs(d)
    val needle = "\"data_dir\":\"" + f.makeQualified(d).toString + "\""
    val self = excludeMeta.map(p => f.makeQualified(p).toString)
    val owner = d.getParent.getParent
    def metasUnder(md: Path): Seq[Path] =
      try {
        if (!f.exists(md)) Nil
        else f.listStatus(md).toSeq.map(_.getPath)
          .filter(_.getName.matches("v\\d+\\.json"))
      } catch { case _: java.io.IOException => Nil }
    val branchMetas = {
      val bd = new Path(owner, "branches")
      try {
        if (!f.exists(bd)) Nil
        else f.listStatus(bd).toSeq.filter(_.isDirectory)
          .flatMap(b => metasUnder(new Path(b.getPath, "metadata")))
      } catch { case _: java.io.IOException => Nil }
    }
    (metasUnder(new Path(owner, "metadata")) ++ branchMetas)
      .filterNot(p => self.contains(f.makeQualified(p).toString))
      .exists { p =>
        try {
          val raw = readSmallFile(p)
          val json = raw.indexOf("\"schema\":") match {
            case -1 => raw
            case i => raw.substring(0, i)
          }
          json.contains(needle)
        } catch { case _: java.io.IOException => true }
      }
  }

  /** ORPHAN-FILE removal (Iceberg's `remove_orphan_files`): delete
    * debris no commit references —
    *  - stale `.tmp-*` staging dirs (same liveness rules as the
    *    per-commit [[vacuumStaging]] pass, run eagerly here);
    *  - version DIRS with no metadata file, older than `graceMs`. A
    *    live commit always creates its metadata (the CAS) BEFORE the
    *    data rename, so a meta-less version dir can only be crash /
    *    lost-race debris — and it is actively harmful, not just waste:
    *    [[history]] lists dirs, so an orphan dir above the pointer
    *    inflates [[currentVersion]] and breaks reads;
    *  - per-version stats manifests whose version metadata is gone
    *    (a crash inside the retention pass can drop the meta but not
    *    the manifest);
    *  - write-once POOL dirs (direct layout) referenced by no retained
    *    meta — main's or any branch's — older than `graceMs` and with
    *    no live heartbeat: hard-crashed direct writers (a CAS loser
    *    deletes its own dir eagerly) and dropped branches' unpublished
    *    commits. This is reachability GC, exactly Iceberg's
    *    `remove_orphan_files` contract: debris waits for the
    *    procedure, never threatens a referenced file.
    * Returns (orphan dirs removed, orphan manifests removed). */
  def removeOrphans(table: String, graceMs: Long = 3600 * 1000L): (Int, Int) = {
    vacuumStaging(table)
    var dirsSwept = 0
    val pool = dataPoolDir(table)
    val pf = fs(pool)
    val now = System.currentTimeMillis
    if (pf.exists(pool))
      pf.listStatus(pool).foreach { s =>
        if (s.isDirectory) {
          // same liveness rules as vacuumStaging: a fresh heartbeat
          // marks a live pre-CAS staging write; no marker falls back
          // to dir mtime vs the grace window
          val hb = new Path(s.getPath, SnapshotTables.HeartbeatName)
          val hbMtime =
            try if (pf.exists(hb)) Some(pf.getFileStatus(hb).getModificationTime) else None
            catch { case _: java.io.IOException => None }
          val stale = hbMtime match {
            case Some(m) => now - m >= 4 * heartbeatMs
            case None => now - s.getModificationTime >= graceMs
          }
          if (stale && !poolDirReferenced(s.getPath, excludeMeta = None)) {
            pf.delete(s.getPath, true)
            dirsSwept += 1
          }
        }
      }
    val snaps = new Path(tableDir(table), "snapshots")
    val sf = fs(snaps)
    var dirs = 0
    if (sf.exists(snaps))
      sf.listStatus(snaps).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith("v") && n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit)) {
          val v = n.drop(1).toInt
          val meta = new Path(metaDir(table), f"v$v%05d.json")
          if (!fs(meta).exists(meta) &&
              System.currentTimeMillis - s.getModificationTime >= graceMs) {
            sf.delete(s.getPath, true)
            dirs += 1
          }
        }
      }
    var manifests = 0
    val md = metaDir(table)
    val mf = fs(md)
    if (mf.exists(md))
      mf.listStatus(md).foreach { s =>
        val n = s.getPath.getName
        if (n.matches("v\\d+-manifest\\.parquet")) {
          val v = n.stripPrefix("v").stripSuffix("-manifest.parquet").toInt
          val meta = new Path(md, f"v$v%05d.json")
          if (!mf.exists(meta)) {
            mf.delete(s.getPath, true)
            manifests += 1
          }
        }
      }
    (dirs + dirsSwept, manifests)
  }

  /** AGE-BASED snapshot expiry (Iceberg's `expire_snapshots(older_than,
    * retain_last)` — the count-based retention window can't express
    * "keep a week of history" when commit cadence varies). Expires
    * every retained version committed BEFORE `olderThanMillis`, except:
    * the newest `retainLast` versions, the current version, branch
    * bases, and every chain ancestor a surviving version still resolves
    * through (same protection the automatic retention pass applies —
    * expiring a chain's base would orphan the deltas on top of it).
    * An explicit maintenance call, not a policy: the per-commit
    * count-based window keeps running regardless. On a LOG-GOVERNED
    * catalog the same contract as the count window applies
    * ([[LakeCommits]] scaladoc): keep the cutoff behind however far
    * back log readers reach — expiring a version an old log commit
    * pins invalidates that commit's reads, exactly like Iceberg
    * snapshot expiry invalidating old Nessie refs. Returns the number
    * of versions expired. */
  def expireSnapshots(table: String, olderThanMillis: Long, retainLast: Int = 1): Int = {
    require(retainLast >= 1, "retainLast must be at least 1")
    val cur = currentVersion(table)
    require(cur > 0, s"table $table has no committed version")
    val protectedV = branchProtectedVersions(table)
    val times = versionHistory(table).toMap
    val hist = history(table)
    val keepByCount = hist.sorted.takeRight(retainLast).toSet
    val keep = hist.filter(v => keepByCount.contains(v) || v == cur ||
      protectedV.contains(v) || times.get(v).forall(_ >= olderThanMillis)).toSet
    val chainProtected: Set[Int] = keep.flatMap { v =>
      try chainOf(table, v).map(_.v)
      catch { case _: Exception => Seq(v) } // unreadable meta: keep conservatively
    }
    val doomed = hist.filterNot(v => keep.contains(v) || chainProtected.contains(v))
    doomed.foreach(dropVersion(table, _))
    vacuumStaging(table)
    doomed.length
  }

  /** Sweep `.tmp-*` staging directories abandoned by crashed or killed
    * writers. Staged data is invisible to readers, but at streaming /
    * multi-writer cadence the debris is a real storage leak (each
    * abandoned attempt holds a full table copy). Liveness is judged by
    * the writer's HEARTBEAT marker when present (a live write job
    * refreshes it every `heartbeatMs`, while task output lands under
    * `_temporary/` and does NOT refresh the staging dir's own mtime —
    * so dir mtime alone would misread any write longer than the grace
    * window as abandoned); a dir with no marker (writer died before
    * its first beat, or pre-heartbeat debris) falls back to the dir
    * mtime against the much coarser `stagingGraceMs` (default 1 h).
    * Runs piggybacked on every successful commit's retention pass, so
    * no separate maintenance job is needed. */
  private[io] def vacuumStaging(table: String): Unit = {
    val snaps = new Path(tableDir(table), "snapshots")
    val f = fs(snaps)
    val now = System.currentTimeMillis
    if (f.exists(snaps))
      f.listStatus(snaps)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp-"))
        .filter { s =>
          val hb = new Path(s.getPath, SnapshotTables.HeartbeatName)
          val hbMtime =
            try if (f.exists(hb)) Some(f.getFileStatus(hb).getModificationTime) else None
            catch { case _: java.io.IOException => None }
          hbMtime match {
            // beating writer: stale only once several beats were missed
            // (a crashed writer stops beating; 4 missed beats ≈ dead)
            case Some(m) => now - m >= 4 * heartbeatMs
            // no marker: pre-heartbeat debris or a writer that died
            // before its first beat — only the coarse grace applies
            case None => now - s.getModificationTime >= stagingGraceMs
          }
        }
        .foreach(s => f.delete(s.getPath, true))
  }

  // ------------------------------------------------------------------
  // V2-catalog seam (graft.catalog.SnapshotCatalog): the hooks a Spark
  // TableCatalog needs that aren't query operations — existence, DDL
  // declaration (schema before first data commit), listing, timestamp
  // time travel. All metadata-sized.
  // ------------------------------------------------------------------

  private[graft] def sparkSession: SparkSession = spark

  /** The table root this instance manages — identifies tables in
    * [[LakeCommits]]' catalog-level commit log. */
  private[graft] def rootPath: String = root

  private[graft] def snapshotDirString(table: String, v: Int): String =
    dataDirOf(table, v).toString

  private def declaredPath(table: String) = new Path(metaDir(table), "declared.json")

  /** DDL declaration (CREATE TABLE before any data): persists the
    * schema and identity partition columns so an empty table is
    * readable/insertable; derived transforms go straight into the
    * transform-spec property so every subsequent commit derives the
    * hidden layout exactly as [[overwriteTableTransformed]] would. */
  private[graft] def declareTable(table: String, schema: org.apache.spark.sql.types.StructType,
      partitionCols: Seq[String], transforms: Seq[SnapshotTables.PartitionTransform]): Unit = {
    replaceSmallFile(declaredPath(table),
      s"""{"partition_cols":${partitionCols.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""schema":${schema.json}}""")
    if (transforms.nonEmpty)
      replaceSmallFile(transformSpecPath(table), SnapshotTables.PartitionTransform.formatSpec(transforms))
    else {
      // re-declaration (REPLACE TABLE) may change the partitioning:
      // a stale transform spec would silently re-derive the OLD layout
      val p = transformSpecPath(table)
      if (fs(p).exists(p)) fs(p).delete(p, false)
    }
  }

  private[graft] def declaredSchema(table: String): Option[org.apache.spark.sql.types.StructType] = {
    val p = declaredPath(table)
    if (!fs(p).exists(p)) None
    else {
      val json = readSmallFile(p)
      val schemaJson = json.substring(json.indexOf("\"schema\":") + "\"schema\":".length, json.length - 1)
      Some(org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }

  private[graft] def declaredPartitionCols(table: String): Seq[String] = {
    val p = declaredPath(table)
    if (!fs(p).exists(p)) Nil
    else "\"partition_cols\":\\[([^\\]]*)\\]".r.findFirstMatchIn(readSmallFile(p))
      .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
      .getOrElse(Nil)
  }

  private[graft] def persistedTransforms(table: String): Seq[SnapshotTables.PartitionTransform] =
    effectiveTransforms(table)

  private[graft] def tableExists(table: String): Boolean =
    currentVersion(table) > 0 || fs(declaredPath(table)).exists(declaredPath(table))

  /** Tables under this root: dirs that carry a metadata dir (committed
    * or declared). Metadata-sized listing. */
  private[graft] def listTableNames(): Seq[String] = {
    val r = new Path(root)
    val f = fs(r)
    if (!f.exists(r)) Nil
    else f.listStatus(r).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
      .filter(t => f.exists(metaDir(t)))
      .sorted
  }

  private[graft] def dropTableDir(table: String): Boolean = {
    val d = tableDir(table)
    val f = fs(d)
    f.exists(d) && f.delete(d, true)
  }

  /** Identity partition columns in effect: the current version's
    * commit metadata (minus derived `__p_` transform columns — those
    * re-derive from the persisted spec), falling back to the declared
    * DDL columns before the first commit. A catalog write re-applies
    * these so INSERTs never flatten the layout. */
  private[graft] def currentPartitionCols(table: String): Seq[String] = {
    val v = currentVersion(table)
    if (v == 0) declaredPartitionCols(table)
    else {
      val m = new Path(metaDir(table), f"v$v%05d.json")
      if (!fs(m).exists(m)) Nil
      else "\"partition_cols\":\\[([^\\]]*)\\]".r.findFirstMatchIn(readSmallFile(m))
        .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty))
        .getOrElse(Nil)
        .filterNot(_.startsWith("__p_"))
    }
  }

  /** Retained versions with their commit times (millis; commit time =
    * version-metadata file mtime, the same clock `TIMESTAMP AS OF`
    * resolves against), ascending — the data behind the SQL-visible
    * `<table>.history` metadata table (Iceberg's DESCRIBE-HISTORY
    * shape). Versions whose metadata file is gone (expired mid-list)
    * are dropped rather than reported with a fake time. */
  def versionHistory(table: String): Seq[(Int, Long)] =
    history(table).flatMap { v =>
      val m = new Path(metaDir(table), f"v$v%05d.json")
      try
        if (fs(m).exists(m)) Some((v, fs(m).getFileStatus(m).getModificationTime)) else None
      catch { case _: java.io.IOException => None }
    }

  /** Latest version committed at or before `millis` (commit time =
    * version-metadata file mtime) — `TIMESTAMP AS OF` resolution. */
  private[graft] def versionAtTimestamp(table: String, millis: Long): Option[Int] =
    history(table).filter { v =>
      val m = new Path(metaDir(table), f"v$v%05d.json")
      try fs(m).exists(m) && fs(m).getFileStatus(m).getModificationTime <= millis
      catch { case _: java.io.IOException => false }
    }.lastOption
}

object SnapshotTables {
  /** Live-writer heartbeat marker inside a `.tmp-*` staging dir (name
    * starts with '.', so it is hidden from every reader). */
  private[io] val HeartbeatName = "._graft_heartbeat"

  /** One column's provably-exact manifest aggregates for
    * [[graft.io.SnapshotTables.manifestStatsForScan]] (X113). Every
    * None means "not provable from metadata", never zero; `min`/`max`
    * are `Some(None)` when the column is exactly all-NULL. */
  private[graft] final case class ColStats(
      rows: Option[Long], nulls: Option[Long],
      min: Option[Option[Double]], max: Option[Option[Double]])

  /** One collected manifest row for the driver-side PLANNING fast
    * path: SQL scan pruning and metadata aggregates run once per
    * query at optimize time, and for the common small-manifest case a
    * handful of distributed jobs per planning pass would dwarf the
    * scan they save — the manifest is collected ONCE (budgeted) and
    * every later planning decision on that version is in-memory. */
  private[io] final case class MRow(file: String, column: String,
      rows: Option[Long], nulls: Option[Long],
      minNum: Option[Double], maxNum: Option[Double],
      minStr: Option[String], maxStr: Option[String],
      sketch: Option[Array[Long]], sketchBits: Long, sketchHashes: Int)

  /** Driver-side manifest cache for the planning fast path. Version
    * manifests are written ONCE and never mutated (the commit CAS
    * creates them; expiry only deletes), so entries never go stale —
    * an expired version's entry is merely unreachable garbage, which
    * the LRU bound reclaims. The over-budget verdict (None) is cached
    * too, so a huge manifest is sized exactly once. */
  private val ManifestCacheMax = 64
  /** Driver-side verdict on a (immutable) segment manifest: its rows
    * when within the driver budget, over-budget (distributed
    * evaluation is the right path), or unreadable (corrupt/IO-failed —
    * cached so the fallback never re-reads a known-bad manifest on
    * every query; a transient failure sticks only until LRU eviction,
    * and the verdict only ever degrades to a FULL segment read, never
    * to a wrong skip). */
  private[io] sealed trait ManifestVerdict
  private[io] final case class ManifestRows(rows: Seq[MRow]) extends ManifestVerdict
  private[io] case object ManifestOverBudget extends ManifestVerdict
  private[io] case object ManifestUnreadable extends ManifestVerdict

  private[io] val manifestCache =
    new java.util.LinkedHashMap[String, ManifestVerdict](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ManifestVerdict]): Boolean =
        size() > ManifestCacheMax
    }

  /** Relation cache for WRITE-ONCE parquet inputs (r20 optimization —
    * guide §1/§6: the driver gap, not the data plane, dominated the
    * lifecycle queries; q133 sampled ~40 % of wall inside
    * `spark.read.parquet` re-listing + re-footer-reading the same
    * immutable segment dirs). Version data dirs (rename layout: the
    * renamed-into-place snapshot dir; direct layout: the staged-then-
    * adopted pool dir) and stats manifests are created by the commit
    * CAS and never mutated afterwards — expiry/rollback/orphan-sweep
    * only DELETE them — so a `(modTime, len)`-guarded entry can never
    * serve a stale relation: deletion fails the exists probe, and any
    * same-path re-creation (a re-created table line) lands a new
    * mtime. Values are the resolved `DataFrame` (its `FileIndex` and
    * inferred schema are the expensive part); `None` records the
    * no-data-files verdict (empty dynamic-partition write) so empty
    * segments are probed exactly once per state. Keys carry the owning
    * session's identity — a DataFrame is bound to its session and must
    * never leak across (tests and Bench run separate sessions).
    * This caches INPUT METADATA of immutable files, never query
    * results: every bench/oracle run re-executes the full read path. */
  private val RelationCacheMax = 256
  private[io] val relationCache =
    new java.util.LinkedHashMap[String, (Long, Long, Option[org.apache.spark.sql.DataFrame])](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Option[org.apache.spark.sql.DataFrame])])
          : Boolean = size() > RelationCacheMax
    }

  /** One link of a version's delta chain, parsed from the version
    * metadata ("kind" absent = a full snapshot). */
  private[io] final case class VersionMeta(v: Int, kind: String, base: Int, keyCols: Seq[String],
      fold: Boolean = false, txn: Option[String] = None, schemaEvolved: Boolean = false,
      dataDir: Option[String] = None)

  /** One `.partitions` relation row: a live partition directory value
    * ("" = unpartitioned) with its data-file and pending-MOR-delete
    * footprints in the current version's chain. */
  final case class PartitionStat(partition: String, fileCount: Long, recordCount: Long,
      totalBytes: Long, deleteFileCount: Long, deleteRecordCount: Long)

  /** A partition transform (Iceberg's hidden-partitioning vocabulary):
    * a pure function of one source column whose image becomes the
    * partition directory value. `ordered` transforms map source ranges
    * to partition ranges (days, truncate); buckets deliberately don't. */
  sealed abstract class PartitionTransform(val srcCol: String, label: String) {
    final val name: String = s"__p_${label}_$srcCol"
    def exprOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column
    final def expr: org.apache.spark.sql.Column =
      exprOf(org.apache.spark.sql.functions.col(srcCol))
    def ordered: Boolean
  }

  object PartitionTransform {
    import org.apache.spark.sql.functions._

    /** days(ts): UTC date of a timestamp/date/date-string. */
    def days(src: String): PartitionTransform = new PartitionTransform(src, "days") {
      def exprOf(c: org.apache.spark.sql.Column) = to_date(c).cast("string")
      def ordered = true
    }

    /** truncate(len, s): leading `len` characters of a string. */
    def truncate(len: Int, src: String): PartitionTransform = {
      require(len > 0, "truncate length must be positive")
      new PartitionTransform(src, s"trunc$len") {
        def exprOf(c: org.apache.spark.sql.Column) = substring(c.cast("string"), 1, len)
        def ordered = true
      }
    }

    /** bucket(n, key): xxhash64 mod n — spreads a high-cardinality key
      * over n directories (point lookups prune via
      * [[SnapshotTables.readPartitionValues]]). */
    def bucket(n: Int, src: String): PartitionTransform = {
      require(n > 0, "bucket count must be positive")
      new PartitionTransform(src, s"bucket$n") {
        def exprOf(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(n.toLong)).cast("int")
        def ordered = false
      }
    }

    /** bucketMurmur3(n, key): Iceberg's EXACT bucket[n] transform —
      * murmur3_x86_32 over the spec's value serialization
      * ([[graft.functions.IcebergMurmur3]]). Same spreading behavior
      * as [[bucket]], but because the hash matches what external
      * Iceberg readers compute, [[IcebergExport]] declares these as
      * REAL `bucket[n]` spec fields (xxhash64 buckets are honestly
      * omitted) and [[IcebergImport]] can scope bucket-partitioned
      * equality deletes. Prefer this flavor for tables that will cross
      * the bridge. */
    def bucketMurmur3(n: Int, src: String): PartitionTransform = {
      require(n > 0, "bucket count must be positive")
      new PartitionTransform(src, s"m3bucket$n") {
        def exprOf(c: org.apache.spark.sql.Column) =
          org.apache.spark.sql.GraftSqlBridge.column(
            graft.functions.IcebergBucketExpr(org.apache.spark.sql.GraftSqlBridge.expression(c), n))
        def ordered = false
      }
    }

    /** Table-property serialization of a transform list ("days:ts,
      * bucket8:id,trunc6:name") — column names cannot contain ':' or
      * ',' (enforced at format time, so a parse is always exact). */
    def formatSpec(ts: Seq[PartitionTransform]): String = {
      ts.foreach(t => require(!t.srcCol.contains(':') && !t.srcCol.contains(','),
        s"column '${t.srcCol}' cannot be serialized in a transform spec"))
      ts.map { t =>
        val label = t.name.stripPrefix("__p_").stripSuffix(s"_${t.srcCol}")
        s"$label:${t.srcCol}"
      }.mkString(",")
    }

    private val M3BucketRe = "m3bucket(\\d+)".r
    private val BucketRe = "bucket(\\d+)".r
    private val TruncRe = "trunc(\\d+)".r

    def parseSpec(spec: String): Seq[PartitionTransform] =
      spec.split(',').toSeq.filter(_.nonEmpty).map { part =>
        val Array(label, src) = part.split(":", 2)
        label match {
          case "days"        => days(src)
          case M3BucketRe(n) => bucketMurmur3(n.toInt, src)
          case BucketRe(n)   => bucket(n.toInt, src)
          case TruncRe(len)  => truncate(len.toInt, src)
          case other => throw new IllegalArgumentException(s"unknown partition transform '$other'")
        }
      }
  }

  /** Thrown by the losing writer of a version race: the table already
    * advanced past the version this writer staged. The loser's staged
    * data is cleaned up before the throw; re-reading and retrying the
    * commit is always safe. */
  final class ConcurrentCommitException(table: String, version: Int)
      extends RuntimeException(
        s"concurrent commit: version $version of table '$table' was committed by another writer")
}
