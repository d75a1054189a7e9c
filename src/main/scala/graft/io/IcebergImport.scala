package graft.io

import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Jar-free ICEBERG V2 TABLE READER — the other half of the interop
  * bridge ([[IcebergExport]] writes): a user migrating OFF an Iceberg
  * deployment (the reference's tables are `USING ICEBERG`,
  * `/root/reference/spark/jobs/job_silver.py:66-88`) first needs to
  * READ their existing tables. No Iceberg runtime ships here, so this
  * walks the PUBLIC spec's layout directly: resolve the current (or a
  * named) snapshot from the table metadata JSON, stream its Avro
  * manifest list and manifests, apply entry statuses, and hand the
  * surviving data-file set to Spark's own parquet reader — planning is
  * O(metadata), the scan is a stock distributed parquet read
  * (predicate pushdown, column pruning and codegen all intact).
  *
  * Honest refusals, never wrong answers:
  *  - position/equality DELETE files (v2 row-level deletes) refuse the
  *    read — resolving them without the runtime risks silent
  *    resurrection of deleted rows;
  *  - non-parquet data files (AVRO/ORC data) refuse;
  *  - a missing/ambiguous current snapshot refuses with the metadata
  *    path in the message.
  * Manifest entries with status DELETED (2) are excluded — that is
  * file-level pruning the spec REQUIRES, not an approximation.
  */
object IcebergImport {

  /** Read the table rooted at `tableDir` (containing `metadata/`), at
    * its current snapshot or at `snapshotId`.
    *
    * Hive-migrated identity-partitioned layouts (Iceberg's
    * add_files/migrate shape, and [[IcebergExport]]'s) keep the
    * partition column OUT of the data files — when the files carry
    * `col=value` directory components and the parquet schema lacks
    * those columns, partition discovery is re-enabled per directory
    * base so the columns come back typed; files that already CONTAIN
    * their partition columns (normal Iceberg writers) read plainly. */
  def read(spark: SparkSession, tableDir: String, snapshotId: Option[Long] = None): DataFrame = {
    val files = dataFiles(spark, tableDir, snapshotId)
    if (files.isEmpty) return spark.emptyDataFrame
    val partitioned = files.exists(_.split('/').init.exists(_.contains("=")))
    if (!partitioned) return spark.read.parquet(files: _*)
    // which columns do the files themselves carry?
    val fileCols = spark.read.parquet(files.head).schema.fieldNames.toSet
    val dirCols = files.head.split('/').init.filter(_.contains("="))
      .map(c => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(c.substring(0, c.indexOf('=')))).toSet
    if (dirCols.subsetOf(fileCols)) return spark.read.parquet(files: _*)
    // partition columns live only in the directory names: group files
    // by their pre-partition base and let Spark's partition discovery
    // type them; union across bases (one per exported segment)
    val byBase = files.groupBy { f =>
      val comps = f.split('/')
      val firstPart = comps.indexWhere(_.contains("="))
      comps.take(firstPart).mkString("/")
    }
    byBase.toSeq.sortBy(_._1).map { case (base, fs) =>
      spark.read.option("basePath", base).parquet(fs: _*)
    }.reduce(_ unionByName _)
  }

  /** The snapshot's surviving data-file paths — exposed so callers can
    * audit exactly what a read would scan. */
  def dataFiles(spark: SparkSession, tableDir: String, snapshotId: Option[Long] = None): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def fs(p: Path) = p.getFileSystem(hconf)

    val metaDir = new Path(tableDir, "metadata")
    val mdPath = latestMetadata(fs(metaDir), metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = {
      val in = fs(mdPath).open(mdPath)
      try om.readTree(in) finally in.close()
    }
    val fv = if (md.has("format-version")) md.get("format-version").asInt else 1
    require(fv == 1 || fv == 2, s"unsupported Iceberg format-version $fv at $mdPath")

    val wantSnap = snapshotId.getOrElse {
      require(md.hasNonNull("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1L,
        s"no current snapshot in $mdPath")
      md.get("current-snapshot-id").asLong
    }
    val snaps = md.get("snapshots")
    require(snaps != null && snaps.size > 0, s"no snapshots in $mdPath")
    val snap = (0 until snaps.size).map(snaps.get)
      .find(_.get("snapshot-id").asLong == wantSnap)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $wantSnap not found in $mdPath — have " +
          (0 until snaps.size).map(snaps.get(_).get("snapshot-id").asLong).mkString(", ")))

    // v1 snapshots may carry an inline "manifests" array instead of a list file
    val manifests: Seq[(String, Int)] =
      if (snap.hasNonNull("manifest-list")) {
        readAvro(fs _, resolve(tableDir, snap.get("manifest-list").asText)).map { r =>
          val content = Option(r.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          (r.get("manifest_path").toString, content)
        }
      } else if (snap.hasNonNull("manifests")) {
        val a = snap.get("manifests")
        (0 until a.size).map(i => (a.get(i).asText, 0))
      } else throw new IllegalArgumentException(s"snapshot $wantSnap has no manifest list in $mdPath")

    manifests.flatMap { case (mPathRaw, listContent) =>
      val mPath = resolve(tableDir, mPathRaw)
      val entries = readAvro(fs _, mPath)
      // the manifest's own Avro metadata also declares its content
      require(listContent == 0,
        s"manifest $mPath carries DELETE files (content=$listContent) — row-level deletes need " +
          "an Iceberg runtime to resolve; compact the source table first")
      entries.flatMap { e =>
        val status = Option(e.get("status")).map(_.asInstanceOf[Int]).getOrElse(1)
        if (status == 2) None // DELETED entry: the spec requires skipping it
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.get("content")).map(_.asInstanceOf[Int]).getOrElse(0)
          require(content == 0,
            s"data_file with content=$content (delete file) in $mPath — row-level deletes need " +
              "an Iceberg runtime to resolve; compact the source table first")
          val fmt = df.get("file_format").toString.toUpperCase
          require(fmt == "PARQUET", s"non-parquet data file ($fmt) in $mPath — only parquet data is supported")
          Some(resolve(tableDir, df.get("file_path").toString).toString)
        }
      }
    }
  }

  /** Snapshot ids available in the table's metadata, newest metadata
    * file wins — the time-travel surface. */
  def snapshots(spark: SparkSession, tableDir: String): Seq[Long] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val f = metaDir.getFileSystem(hconf)
    val mdPath = latestMetadata(f, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = f.open(mdPath); try om.readTree(in) finally in.close() }
    val snaps = md.get("snapshots")
    if (snaps == null) Nil
    else (0 until snaps.size).map(snaps.get(_).get("snapshot-id").asLong)
  }

  /** version-hint.text when present (HadoopCatalog convention), else
    * the lexically-greatest v*.metadata.json. */
  private def latestMetadata(f: org.apache.hadoop.fs.FileSystem, metaDir: Path): Path = {
    require(f.exists(metaDir), s"no metadata directory at $metaDir")
    val hint = new Path(metaDir, "version-hint.text")
    if (f.exists(hint)) {
      val in = f.open(hint)
      val v = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      // both spellings exist in the wild: v3.metadata.json and v00003.metadata.json
      val cands = Seq(new Path(metaDir, s"v$v.metadata.json")) ++
        v.toIntOption.map(n => new Path(metaDir, f"v$n%05d.metadata.json"))
      cands.find(f.exists).getOrElse(
        throw new IllegalArgumentException(s"version-hint says '$v' but no matching metadata in $metaDir"))
    } else {
      val all = f.listStatus(metaDir).map(_.getPath)
        .filter(_.getName.matches("v\\d+\\.metadata\\.json")).sortBy(_.getName)
      require(all.nonEmpty, s"no v*.metadata.json under $metaDir")
      all.last
    }
  }

  /** Manifest paths may be absolute URIs (`file:/...`, `s3a://...`),
    * absolute paths, or table-relative. */
  private def resolve(tableDir: String, p: String): Path =
    if (p.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") || p.startsWith("/")) new Path(p)
    else new Path(tableDir, p)

  private def readAvro(fs: Path => org.apache.hadoop.fs.FileSystem, p: Path): Seq[GenericRecord] = {
    val in = new org.apache.avro.file.DataFileStream[GenericRecord](
      fs(p).open(p), new GenericDatumReader[GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (in.hasNext) out += in.next()
      out.toSeq
    } finally in.close()
  }
}
