package graft.io

import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * ROW-LEVEL DELETES (v2 merge-on-read) are applied, not refused:
  *  - POSITION delete files (content=1): each data row is addressed by
  *    `(file_path, pos)`. Spark's parquet `_metadata.file_path` /
  *    `_metadata.row_index` reconstruct exactly those coordinates on
  *    the scan side, so application is one LEFT ANTI join against the
  *    delete set (tiny vs the data → AQE broadcasts it). Spec gating:
  *    a position delete applies to a data file when the delete's data
  *    sequence number is >= the data file's.
  *  - EQUALITY delete files (content=2): each delete row is a predicate
  *    over the `equality_ids` columns (field ids resolved through the
  *    table schema). Application is a LEFT ANTI join on null-safe
  *    equality of those columns, gated on the delete's sequence number
  *    being STRICTLY greater than the data file's (the spec: equality
  *    deletes never see rows committed at or after them). SCOPE comes
  *    from the delete manifest's own partition spec, per the public
  *    spec's scan-planning rules:
  *      - an UNPARTITIONED spec → the deletes are GLOBAL (this is how
  *        [[IcebergExport]] emits MOR chains over partitioned layouts,
  *        and how Flink CDC writers emit global deletes);
  *      - an IDENTITY-partitioned spec → each delete file applies only
  *        within its partition: the entry's partition struct values
  *        become additional null-safe equality conditions on the
  *        identity source columns;
  *      - non-identity transforms in a delete spec refuse (scoping by
  *        bucket/truncate values needs the transform function, whose
  *        hash Iceberg pins to murmur3 — silently approximating it
  *        could delete the wrong rows).
  *  Sequence numbers come from the manifest entries (inherited from
  *  the manifest-list entry when null on an ADDED entry, per the v2
  *  inheritance rule; v1 layouts have no deletes and sequence 0).
  *
  * Honest refusals, never wrong answers:
  *  - non-parquet DELETE files refuse (data files may be parquet, ORC
  *    — Spark's native reader + by-id projection, [[IcebergOrcData]] —
  *    or Avro — [[IcebergAvroData]]; ORC rows additionally refuse
  *    POSITION addressing, where parquet-only `row_index` would
  *    otherwise mis-address rows);
  *  - delete files missing the spec's columns refuse;
  *  - a delete entry under a partitioned spec whose partition struct
  *    misses a field refuses (scoping would be a guess);
  *  - a missing/ambiguous current snapshot refuses with the metadata
  *    path in the message.
  * Manifest entries with status DELETED (2) are excluded — that is
  * file-level pruning the spec REQUIRES, not an approximation.
  */
object IcebergImport {

  /** JVM-wide footer-class cache (r20 optimization): whether a data
    * file's parquet footer carries field ids, plus its column names.
    * Iceberg data files are write-once (compaction and DML write NEW
    * files), so a path's verdict never changes; without this, every
    * post-commit reload of a table re-opened every footer during
    * planning. Bounded LRU; entries for deleted files age out. */
  private val FooterClassCacheMax = 8192
  private[io] val footerClassCache =
    new java.util.LinkedHashMap[String, (Boolean, Seq[String])](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Boolean, Seq[String])]): Boolean =
        size() > FooterClassCacheMax
    }

  /** A live data file with its data sequence number. `raw` keeps the
    * manifest's own spelling — position-delete rows address files by
    * that exact string, so both spellings enter the lookup. `lower`/
    * `upper` are the manifest's per-field-id column bounds (raw
    * single-value-serialized bytes, decoded on demand for file
    * skipping); empty when the writer recorded none. */
  /** `scope`: the file's own partition-struct conditions (same repr as
    * delete scoping) — what bucket/identity/day pruning consults. */
  /** `partDisplay`: the file's FULL partition struct as rendered
    * (spec field name, value) pairs — unlike `scope` (best-effort,
    * pruning-only) this keeps every spec field so the `.partitions`
    * metadata table groups files exactly. */
  private final case class DataEntry(path: String, raw: String, seq: Long,
      lower: Map[Int, Array[Byte]] = Map.empty, upper: Map[Int, Array[Byte]] = Map.empty,
      recordCount: Long = -1L, scope: Seq[ScopeCond] = Nil, fmt: String = "PARQUET",
      partDisplay: Seq[(String, String)] = Nil,
      firstRowId: Option[Long] = None)
  /** One partition-scope condition of an equality delete: the SOURCE
    * column, the spec transform over it (`identity` or `bucket[N]` —
    * graft computes murmur3 buckets itself via
    * [[graft.functions.IcebergBucketExpr]]), and the partition value. */
  private final case class ScopeCond(col: String, transform: String, value: Any)
  /** `scope`: partition-scope conditions from the delete manifest's
    * partition spec + this entry's partition struct; Nil = global. */
  /** `dv`: the v3 DELETION-VECTOR addressing triple
    * (referenced_data_file, content_offset, content_size_in_bytes) —
    * set when this content=1 entry is a Puffin-stored DV rather than a
    * parquet position-delete file. */
  private final case class DeleteEntry(path: String, raw: String, seq: Long,
      content: Int, equalityIds: Seq[Int], scope: Seq[ScopeCond], recordCount: Long = -1L,
      dv: Option[(String, Long, Long)] = None)
  private final case class SpecField(name: String, transform: String, sourceId: Int)
  /** `loc`: the table root — partition-component detection must only
    * look at directory components BELOW it. `schema`: the metadata
    * JSON's current schema as a Spark type, when parseable — an empty
    * snapshot still reads with the table's columns; its fields carry
    * `parquet.field.id` metadata so id-carrying data files resolve
    * columns BY FIELD ID (Iceberg's projection rule — renames and
    * added columns come out right). `nameMapping`: the table's
    * `schema.name-mapping.default` property (field id → historical
    * names), the spec's fallback for data files written WITHOUT
    * parquet field ids. */
  private final case class ScanPlan(data: Seq[DataEntry], deletes: Seq[DeleteEntry],
      fieldNames: Map[Int, String], loc: String, schema: Option[StructType],
      fieldTypes: Map[Int, DataType] = Map.empty, snap: Option[Long] = None,
      nameMapping: Map[Int, Seq[String]] = Map.empty,
      formatVersion: Int = 2)

  // helper-column names used while delete application is in flight;
  // chosen to never collide with user schemas (and guarded anyway)
  private val FileCol = "__graft_ice_file"
  private val PosCol = "__graft_ice_pos"
  private val FidCol = "__graft_ice_fid"
  private val FseqCol = "__graft_ice_fseq"

  /** Read the table rooted at `tableDir` (containing `metadata/`), at
    * its current snapshot or at `snapshotId`, with row-level deletes
    * applied.
    *
    * Hive-migrated identity-partitioned layouts (Iceberg's
    * add_files/migrate shape, and [[IcebergExport]]'s) keep the
    * partition column OUT of the data files — when the files carry
    * `col=value` directory components and the parquet schema lacks
    * those columns, partition discovery is re-enabled per directory
    * base so the columns come back typed; files that already CONTAIN
    * their partition columns (normal Iceberg writers) read plainly. */
  def read(spark: SparkSession, tableDir: String, snapshotId: Option[Long] = None): DataFrame = {
    val plan = planScan(spark, tableDir, snapshotId)
    if (plan.data.isEmpty)
      // zero data files still reads as the TABLE's shape: an empty
      // frame with the metadata schema, so downstream column
      // references analyze instead of failing on a column-less frame
      return plan.schema
        .map(s => spark.createDataFrame(java.util.Collections.emptyList[Row](), s))
        .getOrElse(spark.emptyDataFrame)
    if (plan.deletes.isEmpty)
      mixedFrame(spark, plan.data.map(d => (d.path, d.fmt)), plan.fieldNames,
        plan.schema, plan.nameMapping, plan.loc, plan.snap, withMeta = false)
    else applyDeletes(spark, plan)
  }

  /** The data-file set as one frame, dispatched PER FILE FORMAT:
    * parquet files ride [[baseFrame]] (the pushdown/pruning scan
    * path), ORC files ride Spark's native ORC reader with the by-id
    * rename projection ([[IcebergOrcData]]), Avro files decode through
    * [[IcebergAvroData]] (the compatibility path). All sides emit the
    * lineage helper columns when `withMeta` — but ORC rows have NO row
    * position (`_metadata.row_index` is parquet-only), so a caller
    * that needs REAL positions sets `posRequired` and ORC refuses
    * loudly instead of mis-addressing rows. */
  private def mixedFrame(spark: SparkSession, refs: Seq[(String, String)],
      fieldNames: Map[Int, String], schema: Option[StructType],
      nameMapping: Map[Int, Seq[String]], loc: String, snap: Option[Long],
      withMeta: Boolean, posRequired: Boolean = false): DataFrame = {
    val (parq, rest) = refs.partition(_._2 == "PARQUET")
    val (avro, orc) = rest.partition(_._2 == "AVRO")
    def typedSchema(what: String): StructType = schema.getOrElse(
      throw new IllegalArgumentException(
        s"$what data files under $loc need a parseable table schema, and the " +
          "metadata JSON's schema could not be mapped"))
    val frames = Seq.newBuilder[DataFrame]
    if (parq.nonEmpty)
      frames += baseFrame(spark, parq.map(_._1), fieldNames.values.toSet,
        withMeta = withMeta, tableLoc = loc, snap = snap,
        idSchema = schema, nameMapping = nameMapping)
    if (avro.nonEmpty)
      frames += IcebergAvroData.read(spark, avro.map(_._1), typedSchema("Avro"),
        withPos = withMeta)
    if (orc.nonEmpty) {
      require(!posRequired,
        s"rows in ORC data files under $loc cannot be addressed BY POSITION " +
          "(Spark's _metadata.row_index is parquet-only) — position deletes and " +
          "position-delete DML need parquet; compact the table to parquet first")
      frames += IcebergOrcData.read(spark, orc.map(_._1), typedSchema("ORC"),
        nameMapping, withFile = withMeta)
    }
    frames.result().reduce(_ unionByName _)
  }

  /** [[read]] plus per-row lineage: two extra columns `__graft_ice_file`
    * (the data file's path as `_metadata.file_path` spells it) and
    * `__graft_ice_pos` (the row's ordinal in that file — exactly the
    * spec's position-delete `pos`). The write side of position deletes
    * ([[IcebergDml]]) consumes this; surviving rows only, like read. */
  private[graft] def readWithLineage(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None, keepFiles: Option[String => Boolean] = None): DataFrame = {
    val plan0 = planScan(spark, tableDir, snapshotId)
    // `keepFiles`: metadata-level file pruning (the changelog reader's
    // removed/added/delete-referenced slices) — the plan keeps its full
    // delete set (extra entries no-op on absent files), only the DATA
    // file list narrows, so the scan reads exactly the named files
    val plan = keepFiles.map(f => plan0.copy(data = plan0.data.filter(d => f(d.path))))
      .getOrElse(plan0)
    if (plan.data.isEmpty)
      return plan.schema
        .map(s => spark.createDataFrame(java.util.Collections.emptyList[Row](),
          s.add(FileCol, StringType).add(PosCol, LongType)))
        .getOrElse(spark.emptyDataFrame)
    if (plan.deletes.isEmpty)
      mixedFrame(spark, plan.data.map(d => (d.path, d.fmt)), plan.fieldNames,
        plan.schema, plan.nameMapping, plan.loc, plan.snap, withMeta = true,
        posRequired = true)
    else applyDeletes(spark, plan, keepLineage = true)
  }

  /** The lineage column names [[readWithLineage]] yields. */
  private[graft] val LineageFileCol: String = FileCol
  private[graft] val LineagePosCol: String = PosCol

  /** The v3 ROW-LINEAGE read (r20 — the r19 verdict's #4, opt-in): the
    * table's rows plus the spec's two lineage columns,
    *
    *   `_row_id`                        = data file's assigned
    *                                      first_row_id + row position
    *   `_last_updated_sequence_number`  = the file's data sequence
    *                                      number
    *
    * per the v3 inheritance rules: the manifest list assigns each data
    * manifest a `first_row_id` (spec id 520), entries inherit
    * manifest.first_row_id + preceding null-entry record counts, and a
    * row's id is its file's first_row_id + its ordinal. Rows from
    * PRE-UPGRADE history (v2-written manifest lists carry no
    * first_row_id) have NO lineage — both columns null, the spec's
    * upgraded-table posture. Surviving rows keep their ids across DV /
    * position deletes because positions are original file ordinals.
    * Refusals keep the read honest: v3 tables only; parquet data files
    * only (positions are `_metadata.row_index`); and data files that
    * MATERIALIZE a `_row_id` column refuse loudly — a rewrite that
    * preserved ids must be read from the materialized values, which
    * this inheritance-only face would silently contradict. */
  def readWithRowLineage(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, when}
    val plan = planScan(spark, tableDir, snapshotId)
    require(plan.formatVersion == 3,
      s"$tableDir is format-version ${plan.formatVersion} — row lineage is a v3 feature; " +
        "upgrade the table (PuffinDeletionVectors.upgradeToV3) first")
    require(plan.data.forall(_.fmt == "PARQUET"),
      s"row lineage needs parquet data files (row positions are _metadata.row_index); " +
        s"$tableDir carries ${plan.data.map(_.fmt).distinct.mkString(", ")}")
    // materialized-lineage guard: O(files) footer reads, the same
    // metadata class as scan planning itself
    val hconf = spark.sparkContext.hadoopConfiguration
    plan.data.map(_.path).distinct.foreach { p =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(p), hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val hasRowId =
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getFileMetaData.getSchema.getFields.asScala.exists(_.getName == "_row_id")
        } finally r.close()
      require(!hasRowId,
        s"data file $p materializes a _row_id column — this face computes lineage by " +
          "inheritance and would contradict preserved ids; read the materialized columns")
    }
    val base = readWithLineage(spark, tableDir, snapshotId)
    val userCols = base.columns.filterNot(c => c == FileCol || c == PosCol).toSeq
    if (plan.data.isEmpty)
      return base.drop(FileCol, PosCol)
        .withColumn("_row_id", lit(null).cast("long"))
        .withColumn("_last_updated_sequence_number", lit(null).cast("long"))
    // |data files|-sized lineage map, broadcast; every stored spelling
    // of each path enters so the join matches _metadata.file_path
    import spark.implicits._
    val info = plan.data.flatMap { d =>
      (spellings(d.path) ++ spellings(d.raw)).toSeq.map { sp =>
        (sp, d.firstRowId.map(java.lang.Long.valueOf).orNull: java.lang.Long, d.seq)
      }
    }.toDF("__graft_rl_file", "__graft_rl_first", "__graft_rl_seq")
    base.join(broadcast(info), col(FileCol) === col("__graft_rl_file"), "left")
      .select(userCols.map(col) ++ Seq(
        when(col("__graft_rl_first").isNotNull,
          col("__graft_rl_first") + col(PosCol)).cast("long").as("_row_id"),
        when(col("__graft_rl_first").isNotNull,
          col("__graft_rl_seq")).cast("long").as("_last_updated_sequence_number")): _*)
  }

  /** The snapshot's surviving data-file paths — exposed so callers can
    * audit exactly what a read would scan. (With row-level deletes
    * present, the read additionally filters rows; the FILE set is
    * still exactly this.) */
  def dataFiles(spark: SparkSession, tableDir: String, snapshotId: Option[Long] = None): Seq[String] =
    planScan(spark, tableDir, snapshotId).data.map(_.path)

  /** The snapshot's delete-file paths (position + equality) — the
    * audit twin of [[dataFiles]]. */
  def deleteFiles(spark: SparkSession, tableDir: String, snapshotId: Option[Long] = None): Seq[String] =
    planScan(spark, tableDir, snapshotId).deletes.map(_.path)

  /** Detailed delete-file inventory: (content, path, DV addressing
    * triple when the entry is a v3 deletion vector). Metadata-only —
    * the changelog reader's prune source. */
  private[graft] def deleteFileInfo(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None): Seq[(Int, String, Option[(String, Long, Long)])] =
    planScan(spark, tableDir, snapshotId).deletes.map(d => (d.content, d.path, d.dv))

  // ------------------------------------------------------------------
  // planning: metadata JSON → manifests → (data entries, delete entries)
  // ------------------------------------------------------------------

  private def planScan(spark: SparkSession, tableDir: String, snapshotId: Option[Long]): ScanPlan = {
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
    require(fv >= 1 && fv <= 3, s"unsupported Iceberg format-version $fv at $mdPath")
    // v3 feature triage, checked below once the schema node is in
    // hand: deletion vectors READ (the Puffin branch of applyDeletes);
    // row lineage is OPT-IN via [[readWithRowLineage]] (r20 — the
    // default read stays lineage-free: CDC alignment and plain reads
    // pay nothing); NON-NULL COLUMN DEFAULTS have no read semantics
    // here and refuse loudly.

    // field id → name from the current schema (v2 "schemas" +
    // "current-schema-id"; v1 single "schema") — resolves equality_ids
    val schemaNode = {
      val schemas = md.get("schemas")
      if (schemas != null && schemas.size > 0) {
        val want = if (md.has("current-schema-id")) md.get("current-schema-id").asInt else 0
        (0 until schemas.size).map(schemas.get)
          .find(s => s.has("schema-id") && s.get("schema-id").asInt == want)
          .getOrElse(schemas.get(0))
      } else md.get("schema")
    }
    if (fv == 3 && schemaNode != null && schemaNode.get("fields") != null) {
      val fields = schemaNode.get("fields")
      (0 until fields.size).map(fields.get).foreach { f =>
        require(!f.hasNonNull("initial-default"),
          s"v3 column '${f.get("name").asText}' of $mdPath carries initial-default " +
            s"${f.get("initial-default")} — non-null column defaults have no read " +
            "semantics here; materialize the default (rewrite the files) before migrating")
      }
    }
    val fieldNames: Map[Int, String] =
      if (schemaNode == null || schemaNode.get("fields") == null) Map.empty
      else {
        val fields = schemaNode.get("fields")
        (0 until fields.size).map(fields.get)
          .map(f => f.get("id").asInt -> f.get("name").asText).toMap
      }

    // every partition spec, by id (v2 "partition-specs"; v1 single
    // "partition-spec" = spec 0) — delete-file scoping resolves the
    // DELETE MANIFEST's own spec, not the table default
    def specFieldsOf(node: com.fasterxml.jackson.databind.JsonNode): Seq[SpecField] =
      if (node == null) Nil
      else (0 until node.size).map(node.get).map { f =>
        SpecField(f.get("name").asText, f.get("transform").asText,
          if (f.has("source-id")) f.get("source-id").asInt else -1)
      }
    val specsById: Map[Int, Seq[SpecField]] = {
      val specs = md.get("partition-specs")
      if (specs != null && specs.size > 0)
        (0 until specs.size).map(specs.get)
          .map(s => (if (s.has("spec-id")) s.get("spec-id").asInt else 0) ->
            specFieldsOf(s.get("fields"))).toMap
      else Map(0 -> specFieldsOf(md.get("partition-spec")))
    }

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

    // v1 snapshots may carry an inline "manifests" array instead of a
    // list file; (path, manifest sequence number for inheritance,
    // manifest's partition spec id)
    val manifests: Seq[(String, Long, Int, Option[Long])] =
      if (snap.hasNonNull("manifest-list")) {
        readAvro(fs _, resolve(tableDir, snap.get("manifest-list").asText))._1.map { r =>
          val seq = fieldOpt(r, "sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L)
          val specId = fieldOpt(r, "partition_spec_id").map(_.asInstanceOf[Int]).getOrElse(0)
          // v3 row lineage: the manifest's assigned first_row_id (spec
          // id 520); None on pre-v3 lists = those rows have no lineage
          val firstRowId = fieldOpt(r, "first_row_id").map(_.asInstanceOf[Long])
          (r.get("manifest_path").toString, seq, specId, firstRowId)
        }
      } else if (snap.hasNonNull("manifests")) {
        val a = snap.get("manifests")
        (0 until a.size).map(i => (a.get(i).asText, 0L, 0, Option.empty[Long]))
      } else throw new IllegalArgumentException(s"snapshot $wantSnap has no manifest list in $mdPath")

    val dataB = Seq.newBuilder[DataEntry]
    val delB = Seq.newBuilder[DeleteEntry]
    manifests.foreach { case (mPathRaw, listSeq, specId, mFirstRowId) =>
      val mPath = resolve(tableDir, mPathRaw)
      val entries = readAvro(fs _, mPath)._1
      val specFields = specsById.getOrElse(specId, throw new IllegalArgumentException(
        s"manifest $mPathRaw references partition spec $specId, absent from $mdPath"))
      // v3 row-id inheritance within one manifest (spec "Row Lineage"):
      // a data-file entry's explicit first_row_id wins; a null one is
      // assigned manifest.first_row_id + the record counts of the
      // null-first_row_id data entries before it, in manifest order.
      var rowIdRun = 0L
      entries.foreach { e =>
        val status = fieldOpt(e, "status").map(_.asInstanceOf[Int]).getOrElse(1)
        if (status != 2) { // DELETED entry: the spec requires skipping it
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val content = fieldOpt(df, "content").map(_.asInstanceOf[Int]).getOrElse(0)
          val fmt = df.get("file_format").toString.toUpperCase
          // DATA files: parquet (the scan path), ORC (Spark's native
          // columnar reader + by-id rename projection), or Avro
          // (decoded by [[IcebergAvroData]]). DELETE files: parquet
          // only — their application plan reads them columnar.
          // v3 deletion vector: a content=1 entry addressing a Puffin
          // blob via (referenced_data_file, content_offset, size)
          val dvTriple: Option[(String, Long, Long)] =
            for {
              off <- fieldOpt(df, "content_offset").map(_.asInstanceOf[Long])
              size <- fieldOpt(df, "content_size_in_bytes").map(_.asInstanceOf[Long])
              refFile <- fieldOpt(df, "referenced_data_file").map(_.toString)
            } yield (refFile, off, size)
          if (content == 0)
            require(fmt == "PARQUET" || fmt == "AVRO" || fmt == "ORC",
              s"data file format $fmt in $mPath is not supported — parquet, orc and avro only")
          else if (content == 1 && dvTriple.isDefined)
            require(fmt == "PUFFIN",
              s"deletion-vector entry in $mPath names format $fmt — the v3 spec stores DVs in PUFFIN")
          else
            require(fmt == "PARQUET",
              s"non-parquet delete file ($fmt) in $mPath — only parquet delete files " +
                "(and v3 Puffin deletion vectors) are supported")
          // v2 sequence inheritance: a null sequence on an ADDED entry
          // takes the manifest's; null on EXISTING/other must be
          // explicit. v1 manifests have no sequence_number field at all
          // and the spec assigns every v1 entry sequence 0 — EXISTING
          // entries (routine after v1 manifest rewrites) included.
          val seq = fieldOpt(e, "sequence_number").map(_.asInstanceOf[Long]).getOrElse {
            if (fv == 1) 0L
            else {
              require(status == 1,
                s"manifest entry with status=$status and no sequence_number in $mPath — cannot inherit")
              listSeq
            }
          }
          val raw = df.get("file_path").toString
          val abs = resolve(tableDir, raw).toString
          val rc = fieldOpt(df, "record_count").map(_.asInstanceOf[Long]).getOrElse(-1L)
          content match {
            case 0 =>
              val explicitFirst = fieldOpt(df, "first_row_id").map(_.asInstanceOf[Long])
              val assignedFirst = explicitFirst.orElse(mFirstRowId.map { mf =>
                val v = mf + rowIdRun
                rowIdRun += math.max(0L, rc)
                v
              })
              dataB += DataEntry(abs, raw, seq,
                kvBytesOf(df, "lower_bounds"), kvBytesOf(df, "upper_bounds"), rc,
                dataScope(specFields, df, fieldNames), fmt,
                partitionDisplay(specFields, df), assignedFirst)
            case 1 => delB += DeleteEntry(abs, raw, seq, 1, Nil, Nil, rc, dvTriple)
            case 2 =>
              val idsNode = fieldOpt(df, "equality_ids").orNull
              require(idsNode != null,
                s"equality delete file $raw in $mPath carries no equality_ids")
              import scala.jdk.CollectionConverters._
              val ids = idsNode.asInstanceOf[java.util.List[_]].asScala
                .map(_.asInstanceOf[Int]).toSeq
              require(ids.nonEmpty, s"equality delete file $raw in $mPath has empty equality_ids")
              delB += DeleteEntry(abs, raw, seq, 2, ids,
                deleteScope(specFields, df, fieldNames, raw, mPath.toString), rc)
            case other => throw new IllegalArgumentException(
              s"data_file with unknown content=$other in $mPath")
          }
        }
      }
    }
    val fieldTypes: Map[Int, DataType] =
      if (schemaNode == null || schemaNode.get("fields") == null) Map.empty
      else (0 until schemaNode.get("fields").size()).flatMap { i =>
        val f = schemaNode.get("fields").get(i)
        try Some(f.get("id").asInt -> icebergToSpark(f.get("type")))
        catch { case _: Exception => None }
      }.toMap
    // `schema.name-mapping.default` (spec: "Column Projection") — the
    // fallback mapping for data files with NO parquet field ids: each
    // entry lists the historical column names for a field id. Only
    // top-level entries are consulted (nested renames need ids).
    val nameMapping: Map[Int, Seq[String]] = {
      val props = md.get("properties")
      if (props == null || !props.hasNonNull("schema.name-mapping.default")) Map.empty
      else try {
        val arr = om.readTree(props.get("schema.name-mapping.default").asText)
        (0 until arr.size).map(arr.get).flatMap { e =>
          if (!e.hasNonNull("field-id") || !e.hasNonNull("names")) None
          else {
            val names = e.get("names")
            Some(e.get("field-id").asInt -> (0 until names.size).map(names.get(_).asText).toSeq)
          }
        }.toMap
      } catch { case _: Exception => Map.empty[Int, Seq[String]] }
    }
    ScanPlan(dataB.result(), delB.result(), fieldNames,
      fs(mdPath).makeQualified(new Path(tableDir)).toString, sparkSchemaOf(schemaNode),
      fieldTypes, snapshotId, nameMapping, fv)
  }

  /** Decode a logical-map-of-bytes manifest field (lower/upper bounds)
    * to (field id → raw bytes); empty when absent. */
  private def kvBytesOf(df: GenericRecord, field: String): Map[Int, Array[Byte]] =
    fieldOpt(df, field).map { v =>
      import scala.jdk.CollectionConverters._
      v.asInstanceOf[java.util.List[_]].asScala.map { e =>
        val r = e.asInstanceOf[GenericRecord]
        val bb = r.get("value").asInstanceOf[java.nio.ByteBuffer]
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b)
        r.get("key").asInstanceOf[Int] -> b
      }.toMap
    }.getOrElse(Map.empty)

  /** The metadata JSON's schema as a Spark StructType — None when the
    * schema is absent or carries a shape this mapping doesn't cover.
    * Type names per the public spec's primitive list; `uuid` surfaces
    * as string, `fixed[N]` as binary (what Spark's parquet reader
    * yields for those physical types anyway). */
  private def sparkSchemaOf(schemaNode: com.fasterxml.jackson.databind.JsonNode): Option[StructType] =
    try {
      if (schemaNode == null || schemaNode.get("fields") == null) None
      else Some(StructType((0 until schemaNode.get("fields").size()).map { i =>
        structFieldOf(schemaNode.get("fields").get(i))
      }))
    } catch { case _: Exception => None }

  /** One Iceberg schema field as a Spark StructField, carrying the
    * Iceberg field id as `parquet.field.id` metadata — the key Spark's
    * parquet reader consults (`spark.sql.parquet.fieldId.read.enabled`)
    * to resolve columns BY ID instead of by name, which is Iceberg's
    * projection rule for id-carrying data files. */
  private def structFieldOf(f: com.fasterxml.jackson.databind.JsonNode): StructField = {
    val meta =
      if (f.hasNonNull("id"))
        new MetadataBuilder().putLong("parquet.field.id", f.get("id").asLong).build()
      else Metadata.empty
    StructField(f.get("name").asText, icebergToSpark(f.get("type")),
      nullable = !(f.has("required") && f.get("required").asBoolean), meta)
  }

  private[io] def icebergToSpark(t: com.fasterxml.jackson.databind.JsonNode): DataType =
    if (t.isTextual) t.asText match {
      case "boolean"     => BooleanType
      case "int"         => IntegerType
      case "long"        => LongType
      case "float"       => FloatType
      case "double"      => DoubleType
      case "date"        => DateType
      case "timestamp"   => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string"      => StringType
      case "uuid"        => StringType
      case "binary"      => BinaryType
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")").split(',').map(_.trim.toInt)
        DecimalType(p, sc)
      case s if s.startsWith("fixed") => BinaryType
      case other => throw new IllegalArgumentException(s"unmapped Iceberg type $other")
    } else t.get("type").asText match {
      case "struct" =>
        StructType((0 until t.get("fields").size()).map { i =>
          structFieldOf(t.get("fields").get(i))
        })
      case "list" =>
        ArrayType(icebergToSpark(t.get("element")),
          containsNull = !(t.has("element-required") && t.get("element-required").asBoolean))
      case "map" =>
        MapType(icebergToSpark(t.get("key")), icebergToSpark(t.get("value")),
          valueContainsNull = !(t.has("value-required") && t.get("value-required").asBoolean))
      case other => throw new IllegalArgumentException(s"unmapped Iceberg nested type $other")
    }

  /** BEST-EFFORT partition scope of a DATA file — the pruning-side
    * twin of [[deleteScope]]: unknown transforms, a missing partition
    * struct, or an unresolvable source simply contribute nothing (the
    * file just doesn't prune), never a refusal — data-file scoping is
    * an optimization, delete scoping is correctness. */
  private def dataScope(specFields: Seq[SpecField], df: GenericRecord,
      fieldNames: Map[Int, String]): Seq[ScopeCond] = {
    if (specFields.isEmpty) return Nil
    val pRec = df.get("partition") match {
      case r: GenericRecord => r
      case _ => return Nil
    }
    specFields.flatMap { f =>
      for {
        colName <- fieldNames.get(f.sourceId)
        avroField <- Option(pRec.getSchema.getField(f.name))
      } yield {
        val rawV = pRec.get(f.name)
        val isDate = {
          val sc0 = avroField.schema()
          val concrete =
            if (sc0.getType == org.apache.avro.Schema.Type.UNION) {
              import scala.jdk.CollectionConverters._
              sc0.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL)
                .getOrElse(sc0)
            } else sc0
          concrete.getLogicalType != null && concrete.getLogicalType.getName == "date"
        }
        val v: Any = rawV match {
          case null => null
          case u: org.apache.avro.util.Utf8 => u.toString
          case i: java.lang.Integer if isDate => java.time.LocalDate.ofEpochDay(i.longValue())
          case other => other
        }
        ScopeCond(colName, f.transform, v)
      }
    }
  }

  /** The file's FULL partition struct rendered as (spec field name,
    * value string) — every spec field, every transform (bucket/
    * truncate images render as their stored integers/prefixes), date
    * logicals as ISO dates, null as "null". The `.partitions` display
    * surface; exact by construction (the struct IS the file's
    * partition). */
  private def partitionDisplay(specFields: Seq[SpecField],
      df: GenericRecord): Seq[(String, String)] = {
    if (specFields.isEmpty) return Nil
    val pRec = df.get("partition") match {
      case r: GenericRecord => r
      case _ => return specFields.map(f => (f.name, "null"))
    }
    specFields.map { f =>
      Option(pRec.getSchema.getField(f.name)) match {
        case None => (f.name, "null")
        case Some(avroField) =>
          val isDate = {
            val s0 = avroField.schema()
            val concrete =
              if (s0.getType == org.apache.avro.Schema.Type.UNION) {
                import scala.jdk.CollectionConverters._
                s0.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL)
                  .getOrElse(s0)
              } else s0
            concrete.getLogicalType != null && concrete.getLogicalType.getName == "date"
          }
          val v = pRec.get(f.name) match {
            case null => "null"
            case i: java.lang.Integer if isDate =>
              java.time.LocalDate.ofEpochDay(i.longValue()).toString
            case other => other.toString
          }
          (f.name, v)
      }
    }
  }

  /** Partition scope of one equality-delete entry: Nil under an
    * unpartitioned spec (global delete); (source column, transform,
    * partition value) conditions under an identity or bucket[N] spec
    * (graft computes the spec's murmur3 bucket function itself);
    * refusal for transforms it cannot evaluate. */
  private def deleteScope(specFields: Seq[SpecField], df: GenericRecord,
      fieldNames: Map[Int, String], raw: String, mPath: String): Seq[ScopeCond] = {
    if (specFields.isEmpty) return Nil
    val known = Set("identity", "day", "month", "year", "hour")
    val unsupported = specFields.filterNot(f => known(f.transform) ||
      f.transform.matches("bucket\\[\\d+\\]") || f.transform.matches("truncate\\[\\d+\\]"))
    require(unsupported.isEmpty,
      s"equality delete file $raw is scoped by unsupported partition transform(s) " +
        s"${unsupported.map(f => s"${f.transform}(${f.name})").mkString(", ")} — applying them " +
        "needs Iceberg's own transform functions; compact the source table first")
    val pRec = df.get("partition") match {
      case r: GenericRecord => r
      case _ => throw new IllegalArgumentException(
        s"equality delete file $raw under a partitioned spec carries no partition struct ($mPath)")
    }
    specFields.map { f =>
      val col = fieldNames.getOrElse(f.sourceId, throw new IllegalArgumentException(
        s"partition field '${f.name}' of delete file $raw references source id ${f.sourceId}, " +
          "not in the table schema"))
      val avroField = pRec.getSchema.getField(f.name)
      require(avroField != null,
        s"equality delete file $raw's partition struct lacks field '${f.name}' — cannot scope it")
      val rawV = pRec.get(f.name)
      val isDate = {
        val s = avroField.schema()
        val concrete =
          if (s.getType == org.apache.avro.Schema.Type.UNION) {
            import scala.jdk.CollectionConverters._
            s.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).getOrElse(s)
          } else s
        concrete.getLogicalType != null && concrete.getLogicalType.getName == "date"
      }
      val v: Any = rawV match {
        case null => null
        case u: org.apache.avro.util.Utf8 => u.toString
        case i: java.lang.Integer if isDate => java.time.LocalDate.ofEpochDay(i.longValue())
        case other => other
      }
      ScopeCond(col, f.transform, v)
    }
  }

  // ------------------------------------------------------------------
  // scan construction
  // ------------------------------------------------------------------

  /** `schemaCols`: the table schema's column names — directory-derived
    * partition columns outside it (e.g. a hidden-transform layout's
    * derived values) are dropped after discovery, never surfaced. */
  /** Reader options stamped onto every scan this importer builds —
    * the [[graft.plans.IcebergScanPruneRule]] recognizes relations by
    * them and re-plans the file set against the manifest bounds. */
  private[graft] val DirOption = "graft.iceberg.dir"
  private[graft] val SnapOption = "graft.iceberg.snapshot"

  /** Session conf bounding how many parquet footers scan planning
    * probes to classify files as id-carrying vs id-less (see
    * [[baseFrame]]); past it a stride sample decides per class. */
  private[graft] val ProbeBudgetConf = "graft.iceberg.footerProbeBudget"

  private def baseFrame(spark: SparkSession, files: Seq[String], schemaCols: Set[String],
      withMeta: Boolean, tableLoc: String, snap: Option[Long] = None,
      idSchema: Option[StructType] = None,
      nameMapping: Map[Int, Seq[String]] = Map.empty): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def tagged(r: org.apache.spark.sql.DataFrameReader) = {
      val r1 = r.option(DirOption, tableLoc)
      snap.fold(r1)(s => r1.option(SnapOption, s.toString))
    }

    // ---- per-file footer class: BY-ID vs BY-NAME resolution --------
    // Iceberg's projection rule is per FILE: a footer that carries
    // field ids resolves columns by id (renames, added and reordered
    // columns come out right); an id-less footer (Hive-migrated files,
    // graft's own exports) resolves through `schema.name-mapping
    // .default`, falling back to plain name match. Which path a file
    // needs only its footer knows, so planning probes footers —
    // metadata-only reads of the same order as the manifest walk,
    // budgeted by `graft.iceberg.footerProbeBudget` (default 1024).
    // Past the budget a deterministic stride sample is probed and
    // unprobed files inherit the sampled class; a misclassified
    // id-less file then FAILS LOUDLY under the id read (Spark refuses
    // id-resolution against an id-less footer) instead of silently
    // matching wrong columns — raise the budget to re-plan exactly.
    val idAware = idSchema.exists(_.fields.exists(_.metadata.contains("parquet.field.id")))
    // footer classes are cached JVM-wide ([[footerClassCache]]): data
    // files are write-once under the Iceberg contract, so a file's
    // id-carrying verdict never changes — without the shared cache
    // every post-commit reload of a table re-opened every footer
    // (driver-profiled at 3-5 % of the DML lifecycle queries, r20)
    // `footers` additionally records WHICH files this planning pass
    // probed (the byId derivation below distinguishes probed files
    // from budget-skipped ones), so the global hit still lands there.
    val footers = new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Seq[String])]()
    def footer(path: String): (Boolean, Seq[String]) = footers.computeIfAbsent(path, { _ =>
      val hit = IcebergImport.footerClassCache.synchronized {
        Option(IcebergImport.footerClassCache.get(path))
      }
      hit.getOrElse {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(path), hconf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        val v = try {
          import scala.jdk.CollectionConverters._
          val fs0 = r.getFooter.getFileMetaData.getSchema.getFields.asScala
          (fs0.exists(_.getId != null), fs0.map(_.getName).toSeq)
        } finally r.close()
        IcebergImport.footerClassCache.synchronized {
          IcebergImport.footerClassCache.put(path, v)
        }
        v
      }
    })
    val byId: Set[String] =
      if (!idAware) Set.empty
      else {
        val budget = spark.conf.getOption(ProbeBudgetConf).map(_.toInt).getOrElse(1024).max(1)
        val probeFiles =
          if (files.size <= budget) files
          else {
            val stride = files.size.toDouble / budget
            (0 until budget).map(i => files((i * stride).toInt)).distinct
          }
        // footer opens are independent metadata round trips (painful
        // sequentially against an object store) — probe concurrently
        if (probeFiles.size > 4) {
          import scala.collection.parallel.CollectionConverters._
          val pc = probeFiles.par
          pc.tasksupport = new scala.collection.parallel.ExecutionContextTaskSupport(
            scala.concurrent.ExecutionContext.global)
          pc.foreach(footer(_))
        } else probeFiles.foreach(footer(_))
        val allIds = probeFiles.forall(f => footer(f)._1)
        val anyIds = probeFiles.exists(f => footer(f)._1)
        files.filter(f => Option(footers.get(f)).map(_._1).getOrElse(allIds || anyIds)).toSet
      }
    // sticky by necessity: Spark captures this conf at ACTION time,
    // not when the lazy frame is built, so a set/restore around frame
    // construction would silently fall back to name matching at
    // execution. Enabling it is inert for read schemas without
    // `parquet.field.id` metadata (every non-Iceberg read).
    if (byId.nonEmpty) spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

    // ---- name-mapping resolution for id-LESS files -----------------
    // Fast path: every current column already present under its
    // current name AND type → exactly the legacy by-name read.
    // Otherwise each current field resolves to its mapped historical
    // name when the frame carries one, and to a typed NULL when the
    // file predates the column; types align to the table schema (a
    // PROMOTED column — int→long, float→double — casts up) so
    // mixed-vintage groups union cleanly.
    def resolvePlain(df: DataFrame, idResolved: Boolean): DataFrame = idSchema match {
      case Some(schema) =>
        // a physical column CLAIMED by some field's name-mapping entry
        // (as a current or historical spelling) belongs to THAT field
        // id alone — plain-name matching must not hand it to a
        // different field. This is the dropped-then-reused-name case:
        // a foreign engine drops `v` (id 2), later adds a NEW `v`
        // (id 3); id-less files still carry the OLD `v` column, and
        // resolving it to field 3 by bare name would resurrect dropped
        // data under the reused name (and double-resolve the column if
        // field 2 was renamed with a mapping entry). Spec rule: for
        // id-less files the name mapping assigns the ids; bare-name
        // match is only the default for columns the mapping never
        // speaks for. Frames already resolved BY ID are exempt: their
        // column names ARE canonical (Spark's field-id read projected
        // each column from its id), so the claim check would wrongly
        // null out a legitimately reused name.
        val claimed: Map[String, Int] =
          if (idResolved) Map.empty
          else nameMapping.toSeq.flatMap { case (id, names) => names.map(_ -> id) }
            .groupBy(_._1).view.mapValues(_.head._2).toMap
        def fieldId(f: StructField): Option[Int] =
          if (f.metadata.contains("parquet.field.id"))
            Some(f.metadata.getLong("parquet.field.id").toInt)
          else None
        def plainOk(f: StructField): Boolean =
          df.columns.contains(f.name) &&
            claimed.get(f.name).forall(owner => fieldId(f).contains(owner))
        // fast path: every current column present under its own
        // unclaimed name AND type (catalogString ignores nullability
        // and field metadata — exactly "same type modulo promotion")
        // → the legacy by-name read, untouched
        if (schema.fields.forall(f => plainOk(f) &&
            df.schema(df.columns.indexOf(f.name)).dataType.catalogString ==
              f.dataType.catalogString)) df
        else {
          val helperCols = Seq(FileCol, PosCol).filter(df.columns.contains)
          val cols = schema.fields.map { f =>
            if (plainOk(f)) df(f.name).cast(f.dataType).as(f.name)
            else {
              val aliases = fieldId(f).toSeq.flatMap(id => nameMapping.getOrElse(id, Nil))
              aliases.find(df.columns.contains) match {
                case Some(old) => df(old).cast(f.dataType).as(f.name)
                case None      => lit(null).cast(f.dataType).as(f.name)
              }
            }
          }
          df.select(cols.toSeq ++ helperCols.map(df(_)): _*)
        }
      case None => df
    }
    def finish(df: DataFrame, idResolved: Boolean): DataFrame = {
      // row-address helpers ride along BEFORE any rename projection —
      // `_metadata` is only addressable on the scan relation itself
      val withM =
        if (!withMeta) df
        else df.select(col("*"),
          col("_metadata.file_path").as(FileCol),
          col("_metadata.row_index").as(PosCol))
      val resolved = resolvePlain(withM, idResolved)
      // a v1 metadata file with no parseable schema drops nothing —
      // only a KNOWN schema authorizes projecting extras away
      val extras =
        if (schemaCols.isEmpty) Array.empty[String]
        else resolved.columns.filter(c => !schemaCols.contains(c) && c != FileCol && c != PosCol)
      if (extras.isEmpty) resolved else resolved.drop(extras.toSeq: _*)
    }

    // only components BELOW the table root can be partition dirs — an
    // '=' in an ancestor (a table rooted under /data/run=5/) must not
    // trigger Hive-discovery grouping
    val locPrefixes = spellings(tableLoc).map(p => if (p.endsWith("/")) p else p + "/")
    def rel(f: String): String =
      locPrefixes.collectFirst { case p if f.startsWith(p) => f.substring(p.length) }.getOrElse(f)
    def dirComps(f: String) = rel(f).split('/').init.filter(_.contains("="))

    /** Read one class of files (all by-id or all by-name), applying
      * the partition-dir grouping: files whose `col=value` components
      * carry columns the parquet lacks re-enable discovery per base. */
    def readClass(fset: Seq[String], withIds: Boolean): Seq[DataFrame] = {
      if (fset.isEmpty) return Nil
      def reader() = {
        val r = spark.read
        if (withIds) tagged(r.schema(idSchema.get)) else tagged(r)
      }
      val partitioned = fset.filter(f => dirComps(f).nonEmpty)
      val bare = fset.filterNot(f => dirComps(f).nonEmpty)
      if (partitioned.isEmpty) return Seq(finish(reader().parquet(fset: _*), withIds))
      // which columns do the files themselves carry?
      val fileCols = footer(partitioned.head)._2.toSet
      val dirCols = dirComps(partitioned.head)
        .map(c => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(c.substring(0, c.indexOf('=')))).toSet
      if (dirCols.subsetOf(fileCols)) return Seq(finish(reader().parquet(fset: _*), withIds))
      // partition columns live only in the directory names: group files
      // by their pre-partition base and let Spark's partition discovery
      // type them; union across bases (one per exported segment). Bare
      // files (e.g. a MOR segment's full-row images) carry every column
      // in the parquet and read plainly.
      val byBase = partitioned.groupBy { f =>
        val comps = f.split('/')
        // search for the first partition component below the table root
        // (ancestor '=' components are location, not layout)
        val from = comps.length - rel(f).split('/').length
        val firstPart = comps.indexWhere(_.contains("="), from)
        comps.take(firstPart).mkString("/")
      }
      val parts = byBase.toSeq.sortBy(_._1).map { case (base, fs) =>
        finish(reader().option("basePath", base).parquet(fs: _*), withIds)
      }
      parts ++ (if (bare.isEmpty) Nil else Seq(finish(reader().parquet(bare: _*), withIds)))
    }

    val all = readClass(files.filterNot(byId), withIds = false) ++
      readClass(files.filter(byId), withIds = true)
    all.reduce(_ unionByName _)
  }

  // ------------------------------------------------------------------
  // row-level delete application
  // ------------------------------------------------------------------

  /** Every spelling under which a file path may be addressed: the
    * manifest's raw string, Hadoop-normalized, URI form, and the
    * `file:/` / `file:///` variants — `_metadata.file_path` and delete
    * rows' `file_path` must both land in this set for the joins to
    * line up, and the data side is raise_error-guarded so a spelling
    * this misses fails LOUDLY instead of resurrecting deleted rows. */
  private[io] def spellings(s: String): Set[String] = {
    val p = new Path(s)
    val base = Set(s, p.toString, p.toUri.toString)
      // foreign manifests may spell local paths bare; `_metadata` never does
      .flatMap(x => if (x.startsWith("/")) Set(x, "file:" + x) else Set(x))
    base.flatMap { x =>
      if (x.startsWith("file:///")) Set(x, "file:/" + x.stripPrefix("file:///"))
      else if (x.startsWith("file:/") && !x.startsWith("file://")) Set(x, "file:///" + x.stripPrefix("file:/"))
      else Set(x)
    }
  }

  private def applyDeletes(spark: SparkSession, plan: ScanPlan,
      keepLineage: Boolean = false): DataFrame = {
    import spark.implicits._

    val eqDeletes = plan.deletes.filter(_.content == 2)
    eqDeletes.foreach { d =>
      d.equalityIds.foreach(id => require(plan.fieldNames.contains(id),
        s"equality_ids of ${d.path} references field id $id, not in the table schema"))
    }

    // ORC rows cannot take REAL positions: refuse when this plan needs
    // them (position deletes present, or the caller wants lineage for
    // a position-delete write); equality-only MOR over ORC is fine
    val base = mixedFrame(spark, plan.data.map(d => (d.path, d.fmt)), plan.fieldNames,
      plan.schema, plan.nameMapping, plan.loc, plan.snap, withMeta = true,
      posRequired = keepLineage || plan.deletes.exists(_.content == 1))
    val userCols = base.columns.filterNot(Set(FileCol, PosCol)).toSeq
    val helperNames = Set("__spelling", "__dspelling", "__dseq", "__self", "__target")
    require(!userCols.exists(c => c.startsWith("__graft_ice_") || c.startsWith("__graft_ed_") ||
        helperNames(c)),
      s"table columns collide with delete-application helpers: ${userCols.mkString(", ")}")
    // partition-scoped deletes condition on identity source columns —
    // they must exist on the scan side (reconstructed by partition
    // discovery for Hive layouts, in-file otherwise)
    eqDeletes.flatMap(_.scope.map(_.col)).distinct.foreach(c =>
      require(userCols.contains(c),
        s"partition-scoped equality delete conditions on column '$c', absent from the scan"))

    // (spelling → file id, data sequence number), tiny and broadcast
    val dataLookup = plan.data.zipWithIndex.flatMap { case (d, i) =>
      (spellings(d.raw) ++ spellings(d.path)).map(s => (s, i, d.seq))
    }.toDF("__spelling", FidCol, FseqCol)

    var df = base
      .join(broadcast(dataLookup), col(FileCol) === col("__spelling"), "left")
      .withColumn(FidCol, coalesce(col(FidCol),
        raise_error(concat(lit("scanned file missing from the manifest lookup: "), col(FileCol)))))
      .drop("__spelling", FileCol)

    // (spelling of a DELETE file → its sequence number): stamps each
    // delete ROW with its file's sequence via the scan's own _metadata
    def seqLookup(entries: Seq[DeleteEntry]): DataFrame = entries.flatMap { d =>
      (spellings(d.raw) ++ spellings(d.path)).map(s => (s, d.seq))
    }.toDF("__dspelling", "__dseq")

    val (dvDeletes, posDeletes) = plan.deletes.filter(_.content == 1).partition(_.dv.isDefined)
    // v3 DELETION VECTORS: each entry addresses one Puffin blob of
    // positions for ONE data file — decoded INSIDE executor tasks
    // (codec-boundary rule), then the same sequence-gated (file, pos)
    // anti-join as parquet position deletes
    if (dvDeletes.nonEmpty) {
      val conf = new IcebergAvroData.SerializableConf(spark.sparkContext.hadoopConfiguration)
      val dvInfo = dvDeletes.map(d => (d.path, d.dv.get._2, d.dv.get._3, d.dv.get._1, d.seq))
      val dvRdd = spark.sparkContext
        .parallelize(dvInfo, math.max(1, math.min(dvInfo.size, spark.sparkContext.defaultParallelism)))
        .flatMap { case (puffin, off, size, target, dseq) =>
          val p = new Path(puffin)
          val fsx = p.getFileSystem(conf.value)
          PuffinDeletionVectors.readPositions(fsx, p, off, size).map(pos => (target, pos, dseq))
        }
      val dv = dvRdd.toDF("__target", PosCol, "__dseq")
        // a DV addressing a file outside this snapshot (compacted
        // away) legitimately drops out in the inner join
        .join(broadcast(dataLookup), col("__target") === col("__spelling"), "inner")
        .where(col("__dseq") >= col(FseqCol)) // spec: applies at same-or-later sequence
        .select(col(FidCol), col(PosCol))
      df = df.join(dv, Seq(FidCol, PosCol), "left_anti")
    }
    if (posDeletes.nonEmpty) {
      val raw = spark.read.parquet(posDeletes.map(_.path): _*)
      Seq("file_path", "pos").foreach(c => require(raw.columns.contains(c),
        s"position delete files lack the spec's '$c' column (have: ${raw.columns.mkString(", ")})"))
      val pd = raw
        .select(col("file_path").cast("string").as("__target"),
          col("pos").cast("long").as(PosCol),
          col("_metadata.file_path").as("__self"))
        .join(broadcast(seqLookup(posDeletes)), col("__self") === col("__dspelling"), "left")
        .withColumn("__dseq", coalesce(col("__dseq"),
          raise_error(concat(lit("position-delete file missing from the lookup: "), col("__self")))))
        // a delete row addressing a file outside this snapshot
        // (compacted away) legitimately drops out in the inner join
        .join(broadcast(dataLookup), col("__target") === col("__spelling"), "inner")
        .where(col("__dseq") >= col(FseqCol)) // spec: applies at same-or-later sequence
        .select(col(FidCol), col(PosCol))
      df = df.join(pd, Seq(FidCol, PosCol), "left_anti")
    }

    // one anti-join per distinct (equality_ids, partition scope) pair:
    // null-safe equality on the resolved columns, strictly-greater
    // sequence gating, plus the scope's identity-column conditions
    eqDeletes.groupBy(d => (d.equalityIds.sorted, d.scope)).toSeq
      .sortBy { case ((ids, scope), _) => ids.mkString(",") + "|" + scope.mkString(",") }
      .foreach { case ((ids, scope), group) =>
        val names = ids.map(plan.fieldNames)
        // delete files follow the same projection rule as data files:
        // an id-carrying footer resolves the equality columns BY FIELD
        // ID (current names, even across renames); an id-less one
        // falls back to the name mapping, then plain names
        val paths = group.map(_.path)
        val headHasIds = {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(paths.head), spark.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            r.getFooter.getFileMetaData.getSchema.getFields.asScala.exists(_.getId != null)
          } finally r.close()
        }
        val idTyped = ids.flatMap(id => plan.fieldTypes.get(id).map(t => (id, t)))
        val edRaw =
          if (headHasIds && idTyped.size == ids.size) {
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
            val s = StructType(idTyped.map { case (id, t) =>
              StructField(plan.fieldNames(id), t, nullable = true,
                new MetadataBuilder().putLong("parquet.field.id", id.toLong).build())
            })
            spark.read.schema(s).parquet(paths: _*)
          } else {
            val plainDf = spark.read.parquet(paths: _*)
            ids.foldLeft(plainDf) { (acc, id) =>
              val n = plan.fieldNames(id)
              if (acc.columns.contains(n)) acc
              else plan.nameMapping.getOrElse(id, Nil).find(acc.columns.contains) match {
                case Some(old) => acc.withColumnRenamed(old, n)
                case None      => acc
              }
            }
          }
        names.foreach(n => require(edRaw.columns.contains(n),
          s"equality delete files lack column '$n' (have: ${edRaw.columns.mkString(", ")})"))
        val ed = edRaw
          .select(names.map(IcebergDml.qcol) :+ col("_metadata.file_path").as("__self"): _*)
          .join(broadcast(seqLookup(group)), col("__self") === col("__dspelling"), "left")
          .withColumn("__dseq", coalesce(col("__dseq"),
            raise_error(concat(lit("equality-delete file missing from the lookup: "), col("__self")))))
        val edR = names.foldLeft(ed)((acc, n) => acc.withColumnRenamed(n, s"__graft_ed_$n"))
        val scopeCond: Option[Column] = scope
          .map { sc =>
            val srcType = userCols.find(_ == sc.col)
              .map(c => base.schema(c).dataType)
              .getOrElse(throw new IllegalStateException(s"scope column ${sc.col} vanished"))
            val expr = transformExpr(df(sc.col), srcType, sc.transform).getOrElse(
              throw new IllegalArgumentException(
                s"equality delete scoped by ${sc.transform}(${sc.col}) over $srcType — " +
                  "transform not computable on that type; compact the source table first"))
            // partition values arrive in the manifest's own domain —
            // align date-logical values to the transform's integer
            // image before the null-safe compare
            val v: Any = (sc.transform, sc.value) match {
              case ("identity", x) => x
              case (_, d: java.time.LocalDate) => d.toEpochDay.toInt
              case (_, x) => x
            }
            expr <=> lit(v)
          }
          .reduceOption(_ && _)
        val cond: Column = (names.map(n => df(n) <=> edR(s"__graft_ed_$n")) ++ scopeCond)
          .reduce(_ && _) && edR("__dseq") > df(FseqCol)
        df = df.join(edR, cond, "left_anti")
      }

    if (!keepLineage) df.select(userCols.map(IcebergDml.qcol): _*)
    else {
      // restore the file PATH from the fid the delete pipeline joined
      // on (tiny broadcast — one row per data file)
      val fidPath = plan.data.zipWithIndex.map { case (d, i) => (i, d.path) }
        .toDF(FidCol, FileCol)
      df.join(broadcast(fidPath), FidCol)
        .select(userCols.map(IcebergDml.qcol) :+ col(FileCol) :+ col(PosCol): _*)
    }
  }

  /** The table's CURRENT schema per the metadata JSON alone — one
    * metadata file read, no manifest walk, no footer probe. The
    * analysis-time face for catalog mounts ([[graft.catalog
    * .IcebergWarehouseCatalog]]); falls back to the full read's schema
    * only for metadata shapes the direct mapping doesn't cover. */
  def tableSchema(spark: SparkSession, tableDir: String): StructType = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val f = metaDir.getFileSystem(hconf)
    val mdPath = latestMetadata(f, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = f.open(mdPath); try om.readTree(in) finally in.close() }
    val schemaNode = {
      val schemas = md.get("schemas")
      if (schemas != null && schemas.size > 0) {
        val want = if (md.has("current-schema-id")) md.get("current-schema-id").asInt else 0
        (0 until schemas.size).map(schemas.get)
          .find(s => s.has("schema-id") && s.get("schema-id").asInt == want)
          .getOrElse(schemas.get(0))
      } else md.get("schema")
    }
    sparkSchemaOf(schemaNode).getOrElse(read(spark, tableDir).schema)
  }

  /** The newest snapshot committed at or before `millis` — the
    * `TIMESTAMP AS OF` resolution for foreign tables. */
  def snapshotAtTimestamp(spark: SparkSession, tableDir: String, millis: Long): Option[Long] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val f = metaDir.getFileSystem(hconf)
    val mdPath = latestMetadata(f, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = f.open(mdPath); try om.readTree(in) finally in.close() }
    val snaps = md.get("snapshots")
    if (snaps == null) None
    else (0 until snaps.size).map(snaps.get)
      .map(s => (s.get("timestamp-ms").asLong, s.get("snapshot-id").asLong))
      .filter(_._1 <= millis)
      .sortBy(identity).lastOption.map(_._2)
  }

  /** The table's named refs (branches and tags): name → (snapshot id,
    * ref type). The `main` branch is included when declared. */
  def refs(spark: SparkSession, tableDir: String): Map[String, (Long, String)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val f = metaDir.getFileSystem(hconf)
    val mdPath = latestMetadata(f, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = f.open(mdPath); try om.readTree(in) finally in.close() }
    val r = md.get("refs")
    if (r == null) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      r.fieldNames().asScala.map { n =>
        val v = r.get(n)
        n -> (v.get("snapshot-id").asLong,
          if (v.hasNonNull("type")) v.get("type").asText else "branch")
      }.toMap
    }
  }

  /** Read the snapshot a named ref (tag or branch) points at — the
    * `VERSION AS OF 'name'` face for foreign tables. */
  def readRef(spark: SparkSession, tableDir: String, ref: String): DataFrame = {
    val all = refs(spark, tableDir)
    val (snap, _) = all.getOrElse(ref, throw new IllegalArgumentException(
      s"no ref '$ref' on $tableDir — have: ${all.keys.toSeq.sorted.mkString(", ")}"))
    read(spark, tableDir, Some(snap))
  }

  /** The table's CURRENT head snapshot id, None when the table has
    * never committed one. */
  def currentSnapshot(spark: SparkSession, tableDir: String): Option[Long] = {
    val (_, _, md) = readMeta(spark, tableDir)
    if (md.hasNonNull("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1L)
      Some(md.get("current-snapshot-id").asLong)
    else None
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
    * the highest-versioned metadata file under EITHER naming found in
    * the wild: HadoopTableOperations' `v<N>.metadata.json`, or the
    * catalog convention `<NNNNN>-<uuid>.metadata.json` (REST/Hive
    * catalogs — no hint file, the catalog itself is the pointer; for a
    * directory copy the embedded version number is the best-available
    * head). Catalog-named layouts are READ-ONLY here — the write side
    * refuses via [[writableVersionOf]]. */
  private[io] def latestMetadata(f: org.apache.hadoop.fs.FileSystem, metaDir: Path): Path = {
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
      def versionOf(name: String): Option[Int] =
        if (name.matches("v\\d+\\.metadata\\.json"))
          name.stripPrefix("v").stripSuffix(".metadata.json").toIntOption
        else if (name.matches("\\d+-[^/]+\\.metadata\\.json"))
          name.takeWhile(_.isDigit).toIntOption
        else None
      val all = f.listStatus(metaDir).map(_.getPath)
        .flatMap(p => versionOf(p.getName).map(v => (v, p.getName, p)))
      require(all.nonEmpty, s"no *.metadata.json under $metaDir " +
        "(expected v<N>.metadata.json or <NNNNN>-<uuid>.metadata.json)")
      all.maxBy(t => (t._1, t._2))._3
    }
  }

  /** `.files` metadata-table twin for a FOREIGN Iceberg table (the SQL
    * face is `graft_iceberg_files('/dir'[, snap])`): one row per live
    * data/delete file of the snapshot — content (0 data, 1 position
    * deletes, 2 equality deletes), path, data sequence number, the
    * manifest's record count, human-readable decoded column bounds,
    * and equality ids. Metadata-sized; the driver never opens a data
    * file. */
  def filesRelation(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import java.nio.{ByteBuffer, ByteOrder}
    val plan = planScan(spark, tableDir, snapshotId)
    def render(b: Array[Byte], id: Int): String = plan.fieldTypes.get(id).flatMap {
      case IntegerType if b.length == 4 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toString)
      case DateType if b.length == 4 =>
        Some(java.time.LocalDate.ofEpochDay(
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong).toString)
      case LongType if b.length == 8 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong.toString)
      case TimestampType | TimestampNTZType if b.length == 8 =>
        Some(java.time.Instant.ofEpochSecond(0,
          ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong * 1000L).toString)
      case FloatType if b.length == 4 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat.toString)
      case DoubleType if b.length == 8 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble.toString)
      case StringType => Some(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }.getOrElse("0x" + b.map("%02x".format(_)).mkString)
    def boundsMap(m: Map[Int, Array[Byte]]): Map[String, String] =
      m.flatMap { case (id, b) => plan.fieldNames.get(id).map(_ -> render(b, id)) }
    val rows =
      plan.data.map(d => (0, d.path, d.seq, d.recordCount,
        boundsMap(d.lower), boundsMap(d.upper), Seq.empty[Int])) ++
        plan.deletes.map(d => (d.content, d.path, d.seq, d.recordCount,
          Map.empty[String, String], Map.empty[String, String], d.equalityIds))
    import spark.implicits._
    rows.toDF("content", "file_path", "sequence_number", "record_count",
      "lower_bounds", "upper_bounds", "equality_ids")
  }

  /** `.snapshots` metadata-table twin for a FOREIGN Iceberg table (SQL
    * face `graft_iceberg_snapshots('/dir')`): snapshot id, parent,
    * sequence number, commit timestamp, operation, manifest list. */
  def snapshotsRelation(spark: SparkSession, tableDir: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val f = metaDir.getFileSystem(hconf)
    val mdPath = latestMetadata(f, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = f.open(mdPath); try om.readTree(in) finally in.close() }
    val snaps = md.get("snapshots")
    val rows =
      if (snaps == null) Nil
      else (0 until snaps.size).map(snaps.get).map { s =>
        (s.get("snapshot-id").asLong,
          if (s.hasNonNull("parent-snapshot-id")) Some(s.get("parent-snapshot-id").asLong) else None,
          if (s.hasNonNull("sequence-number")) s.get("sequence-number").asLong else 0L,
          if (s.hasNonNull("timestamp-ms")) s.get("timestamp-ms").asLong else 0L,
          if (s.hasNonNull("summary") && s.get("summary").hasNonNull("operation"))
            s.get("summary").get("operation").asText else null,
          if (s.hasNonNull("manifest-list")) s.get("manifest-list").asText else null)
      }
    import spark.implicits._
    rows.toDF("snapshot_id", "parent_id", "sequence_number", "timestamp_ms",
      "operation", "manifest_list")
  }

  /** `.partitions` metadata-table twin for a FOREIGN Iceberg table
    * (SQL face `graft_iceberg_partitions('/dir'[, snap])`): one row
    * per LIVE partition value — the partition rendered canonically
    * (`name=value`, '/'-joined, each file under its OWN spec so
    * evolved layouts stay exact), the number of live data files in
    * it, and their manifest record-count sum (null when any manifest
    * omitted a count). An unpartitioned table reports one row with
    * the empty partition. Row-level DELETE files are not attributed
    * (a global-scope equality delete has no partition); the counts
    * are the MANIFESTS' — post-MOR row counts come from a read, not
    * from metadata. Metadata-sized; no data file is opened. */
  def partitionsRelation(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val plan = planScan(spark, tableDir, snapshotId)
    def render(p: Seq[(String, String)]): String =
      p.map { case (k, v) => s"$k=$v" }.mkString("/")
    val rows = plan.data.groupBy(d => render(d.partDisplay)).toSeq
      .map { case (p, files) =>
        val counts = files.map(_.recordCount)
        (p, files.size.toLong,
          if (counts.exists(_ < 0)) None else Some(counts.sum))
      }
      .sortBy(_._1)
    import spark.implicits._
    rows.toDF("partition", "file_count", "record_count")
  }

  /** `.refs` metadata-table twin for a foreign Iceberg table (the SQL
    * face is `graft_iceberg_refs('/dir')`): one row per named ref —
    * branches and tags — with the snapshot it pins. Metadata-sized. */
  def refsRelation(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    refs(spark, tableDir).toSeq
      .map { case (name, (snap, tpe)) => (name, tpe, snap) }
      .sortBy(_._1)
      .toDF("name", "type", "snapshot_id")
  }

  // ------------------------------------------------------------------
  // incremental append scan — the READ-side twin of the append/merge
  // sinks: rows ADDED between two snapshots, per the public Iceberg
  // incremental-append-scan design (the reference's whole pipeline is
  // daily incremental consumption of Iceberg tables,
  // /root/reference/spark/jobs/job_gold.py:71-88)
  // ------------------------------------------------------------------

  /** One snapshot's contribution to an incremental append range: its
    * id, commit time, operation, and the data files it ADDED as
    * (path, file format) pairs (empty for `replace` — a compaction
    * rewrites existing rows, it adds none). */
  private[graft] final case class AppendStep(snapshotId: Long, timestampMs: Long,
      operation: String, files: Seq[(String, String)])

  /** Rows APPENDED to the table strictly after `fromSnapshot` and up
    * to (inclusive) `toSnapshot` — Iceberg's incremental append scan,
    * jar-free. `fromSnapshot=None` starts at the beginning of the
    * lineage; `toSnapshot=None` ends at the current head.
    *
    * Range semantics, stated precisely (the spec's own):
    *  - `append` snapshots contribute their ADDED data files, read
    *    from the snapshot's OWN manifest list (immutable — later
    *    manifest rewrites/compactions cannot lose an add); a
    *    PARENTLESS `overwrite` (the lineage root — every export
    *    starts with one) counts as an append too: it rewrote nothing;
    *  - `replace` snapshots are SKIPPED: a compaction rewrites
    *    existing rows into new files and adds no rows, so the
    *    incremental view reads the ORIGINAL pre-compaction files
    *    (still addressed by the older snapshots' own manifest lists)
    *    — Iceberg's streaming read skips rewrites the same way;
    *  - `overwrite`/`delete` (or unknown) snapshots REFUSE loudly: an
    *    append-only incremental view cannot represent removed or
    *    rewritten rows — read the full snapshot, or start the range
    *    after the offending snapshot. (Honest refusal, never a
    *    silently wrong answer.)
    *
    * Later row-level deletes (committed AFTER an appended row) are NOT
    * applied — the scan answers "what arrived", not "what survives",
    * exactly like the spec's incremental append scan. Planning is
    * O(metadata of the range); the read is a stock distributed parquet
    * scan with the same by-field-id / name-mapping resolution as
    * [[read]], so mixed-vintage files come out under the CURRENT
    * schema. */
  def appendsBetween(spark: SparkSession, tableDir: String,
      fromSnapshot: Option[Long], toSnapshot: Option[Long] = None): DataFrame = {
    val steps = appendSteps(spark, tableDir, fromSnapshot, toSnapshot)
    val (fieldNames, schema, nameMapping, loc) = schemaContext(spark, tableDir)
    val files = steps.flatMap(_.files)
    if (files.isEmpty)
      schema.map(s => spark.createDataFrame(java.util.Collections.emptyList[Row](), s))
        .getOrElse(spark.emptyDataFrame)
    else
      mixedFrame(spark, files, fieldNames, schema, nameMapping, loc, toSnapshot,
        withMeta = false)
  }

  /** Rows appended strictly AFTER `millis` (wall-clock commit time, the
    * `TIMESTAMP AS OF` clock): the range starts after the newest
    * snapshot committed at or before `millis` — snapshots committed
    * AFTER it stream out, exactly the reference's "what landed since
    * yesterday's run" consumption (`job_gold.py:71-88` reads the day's
    * partition; this reads the day's COMMITS). A `millis` predating the
    * whole lineage reads everything. */
  def appendsSince(spark: SparkSession, tableDir: String, millis: Long,
      toSnapshot: Option[Long] = None): DataFrame =
    appendsBetween(spark, tableDir,
      snapshotAtTimestamp(spark, tableDir, millis), toSnapshot)

  /** [[appendsBetween]] sliced per snapshot — the streaming face's
    * batch builder: one (step, frame) per range snapshot, empty frames
    * included so a `replace` still advances offsets. */
  private[graft] def appendStepFrames(spark: SparkSession, tableDir: String,
      fromSnapshot: Option[Long], toSnapshot: Option[Long]): Seq[(AppendStep, DataFrame)] = {
    val steps = appendSteps(spark, tableDir, fromSnapshot, toSnapshot)
    val (fieldNames, schema, nameMapping, loc) = schemaContext(spark, tableDir)
    def empty: DataFrame =
      schema.map(s => spark.createDataFrame(java.util.Collections.emptyList[Row](), s))
        .getOrElse(spark.emptyDataFrame)
    steps.map { st =>
      val df =
        if (st.files.isEmpty) empty
        else mixedFrame(spark, st.files, fieldNames, schema, nameMapping, loc,
          Some(st.snapshotId), withMeta = false)
      (st, df)
    }
  }

  /** The main-lineage ancestor chain of the table head, OLDEST first —
    * the streaming source's offset domain (an offset is an ordinal in
    * this chain; appends only ever extend its tail). */
  private[graft] def lineage(spark: SparkSession, tableDir: String): Seq[Long] = {
    val (_, mdPath, md) = readMeta(spark, tableDir)
    val snaps = md.get("snapshots")
    if (snaps == null || snaps.size == 0) return Nil
    if (!md.hasNonNull("current-snapshot-id") || md.get("current-snapshot-id").asLong == -1L)
      return Nil
    val byId = (0 until snaps.size).map(snaps.get)
      .map(s => s.get("snapshot-id").asLong -> s).toMap
    val chain = Seq.newBuilder[Long]
    var cur: Option[Long] = Some(md.get("current-snapshot-id").asLong)
    var guard = byId.size + 1
    while (cur.isDefined && guard > 0) {
      guard -= 1
      val node = byId.getOrElse(cur.get, throw new IllegalStateException(
        s"snapshot ${cur.get} referenced as an ancestor is missing from $mdPath — " +
          "expired by retention?"))
      chain += cur.get
      cur =
        if (node.hasNonNull("parent-snapshot-id")) Some(node.get("parent-snapshot-id").asLong)
        else None
    }
    require(guard > 0, s"snapshot parent chain of $mdPath does not terminate (cycle?)")
    chain.result().reverse
  }

  /** Resolve and validate an incremental range: walk `to`'s parent
    * chain back to (exclusive) `from`, classify each snapshot's
    * operation, and gather each append's ADDED data files from the
    * snapshot's own manifest list. Oldest step first. */
  private[graft] def appendSteps(spark: SparkSession, tableDir: String,
      fromSnapshot: Option[Long], toSnapshot: Option[Long]): Seq[AppendStep] = {
    val (fs, mdPath, md) = readMeta(spark, tableDir)
    val snaps = md.get("snapshots")
    require(snaps != null && snaps.size > 0, s"no snapshots in $mdPath")
    val byId = (0 until snaps.size).map(snaps.get)
      .map(s => s.get("snapshot-id").asLong -> s).toMap
    val to = toSnapshot.getOrElse {
      require(md.hasNonNull("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1L,
        s"no current snapshot in $mdPath")
      md.get("current-snapshot-id").asLong
    }
    require(byId.contains(to), s"snapshot $to not found in $mdPath — " +
      s"have ${byId.keys.toSeq.sorted.mkString(", ")}")
    fromSnapshot.foreach(f => require(byId.contains(f),
      s"snapshot $f not found in $mdPath — have ${byId.keys.toSeq.sorted.mkString(", ")}"))
    if (fromSnapshot.contains(to)) return Nil
    val chain = scala.collection.mutable.ArrayBuffer
      .empty[com.fasterxml.jackson.databind.JsonNode]
    var cur: Option[Long] = Some(to)
    while (cur.isDefined && cur != fromSnapshot) {
      val node = byId.getOrElse(cur.get, throw new IllegalArgumentException(
        s"snapshot ${cur.get} (an ancestor of $to) is missing from $mdPath — expired by " +
          "retention? start the range at a retained snapshot"))
      chain += node
      cur =
        if (node.hasNonNull("parent-snapshot-id")) Some(node.get("parent-snapshot-id").asLong)
        else None
    }
    require(fromSnapshot.isEmpty || cur == fromSnapshot,
      s"snapshot ${fromSnapshot.get} is not an ancestor of $to in $tableDir — an incremental " +
        "range must follow one lineage (branches diverge; pick bounds on the same branch)")
    chain.reverse.map { s =>
      val id = s.get("snapshot-id").asLong
      val ts = if (s.hasNonNull("timestamp-ms")) s.get("timestamp-ms").asLong else 0L
      val op =
        if (s.hasNonNull("summary") && s.get("summary").hasNonNull("operation"))
          s.get("summary").get("operation").asText
        else "unknown"
      op match {
        case "append"  => AppendStep(id, ts, op, addedDataFiles(fs, tableDir, s, mdPath))
        case "replace" => AppendStep(id, ts, op, Nil) // compaction adds no rows — skipped
        // a PARENTLESS overwrite is the lineage root: it rewrote
        // nothing (there was no prior content), so it is exactly an
        // initial append — the shape every exported table starts with
        case "overwrite" if !s.hasNonNull("parent-snapshot-id") =>
          AppendStep(id, ts, op, addedDataFiles(fs, tableDir, s, mdPath))
        case other => throw new IllegalArgumentException(
          s"incremental append scan over $tableDir cannot represent snapshot $id " +
            s"(operation=$other): the range removes or rewrites rows, which an append-only " +
            "view cannot express. Read the full snapshot (graft_iceberg_scan), or start " +
            s"the range after snapshot $id.")
      }
    }.toSeq
  }

  /** Data files ADDED by one snapshot, from the snapshot's OWN
    * manifest list: manifests recorded as added by this snapshot,
    * entries with status ADDED whose (possibly inherited) snapshot id
    * is this snapshot's. An append snapshot adding a DELETE file is a
    * contradiction and refuses. */
  private def addedDataFiles(fs: org.apache.hadoop.fs.FileSystem, tableDir: String,
      snap: com.fasterxml.jackson.databind.JsonNode, mdPath: Path): Seq[(String, String)] = {
    val sid = snap.get("snapshot-id").asLong
    // (manifest path, the manifest-list entry's added_snapshot_id)
    val manifests: Seq[(String, Option[Long])] =
      if (snap.hasNonNull("manifest-list")) {
        readAvro(_ => fs, resolve(tableDir, snap.get("manifest-list").asText))._1.map { r =>
          (r.get("manifest_path").toString,
            fieldOpt(r, "added_snapshot_id").map(_.asInstanceOf[Long]))
        }
      } else if (snap.hasNonNull("manifests")) {
        val a = snap.get("manifests")
        (0 until a.size).map(i => (a.get(i).asText, None))
      } else throw new IllegalArgumentException(
        s"snapshot $sid has no manifest list in $mdPath")
    val out = Seq.newBuilder[(String, String)]
    manifests.foreach { case (mPathRaw, listAdded) =>
      // a manifest carried forward from an earlier snapshot cannot
      // contain THIS snapshot's adds — entries inheriting a snapshot
      // id inherit the carried manifest's original adder
      if (listAdded.forall(_ == sid)) {
        val mPath = resolve(tableDir, mPathRaw)
        readAvro(_ => fs, mPath)._1.foreach { e =>
          val status = fieldOpt(e, "status").map(_.asInstanceOf[Int]).getOrElse(1)
          val eff = fieldOpt(e, "snapshot_id").map(_.asInstanceOf[Long])
            .orElse(listAdded).getOrElse(-1L)
          if (status == 1 && eff == sid) {
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            val content = fieldOpt(df, "content").map(_.asInstanceOf[Int]).getOrElse(0)
            require(content == 0,
              s"snapshot $sid of $tableDir added a delete file (content=$content) in " +
                s"$mPath — an append-range snapshot must add only data files")
            val fmt = df.get("file_format").toString.toUpperCase
            require(fmt == "PARQUET" || fmt == "AVRO" || fmt == "ORC",
              s"data file format $fmt added by snapshot $sid in $mPath is not supported — " +
                "parquet, orc and avro only")
            out += ((resolve(tableDir, df.get("file_path").toString).toString, fmt))
          }
        }
      }
    }
    out.result()
  }

  /** (fs, metadata path, parsed metadata JSON) of the table head —
    * shared parse for the metadata-only faces. */
  private[io] def readMeta(spark: SparkSession, tableDir: String)
      : (org.apache.hadoop.fs.FileSystem, Path, com.fasterxml.jackson.databind.JsonNode) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val fs = metaDir.getFileSystem(hconf)
    val mdPath = latestMetadata(fs, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = fs.open(mdPath); try om.readTree(in) finally in.close() }
    (fs, mdPath, md)
  }

  /** The read-construction context from the metadata JSON alone —
    * (field id → name, current schema, name mapping, qualified table
    * root); what [[baseFrame]] needs without a manifest walk. */
  private def schemaContext(spark: SparkSession, tableDir: String)
      : (Map[Int, String], Option[StructType], Map[Int, Seq[String]], String) = {
    val (fs, mdPath, md) = readMeta(spark, tableDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val schemaNode = {
      val schemas = md.get("schemas")
      if (schemas != null && schemas.size > 0) {
        val want = if (md.has("current-schema-id")) md.get("current-schema-id").asInt else 0
        (0 until schemas.size).map(schemas.get)
          .find(s => s.has("schema-id") && s.get("schema-id").asInt == want)
          .getOrElse(schemas.get(0))
      } else md.get("schema")
    }
    val fieldNames: Map[Int, String] =
      if (schemaNode == null || schemaNode.get("fields") == null) Map.empty
      else {
        val fields = schemaNode.get("fields")
        (0 until fields.size).map(fields.get)
          .map(f => f.get("id").asInt -> f.get("name").asText).toMap
      }
    val nameMapping: Map[Int, Seq[String]] = {
      val props = md.get("properties")
      if (props == null || !props.hasNonNull("schema.name-mapping.default")) Map.empty
      else try {
        val arr = om.readTree(props.get("schema.name-mapping.default").asText)
        (0 until arr.size).map(arr.get).flatMap { e =>
          if (!e.hasNonNull("field-id") || !e.hasNonNull("names")) None
          else {
            val names = e.get("names")
            Some(e.get("field-id").asInt -> (0 until names.size).map(names.get(_).asText).toSeq)
          }
        }.toMap
      } catch { case _: Exception => Map.empty[Int, Seq[String]] }
    }
    (fieldNames, sparkSchemaOf(schemaNode),
      nameMapping, fs.makeQualified(new Path(tableDir)).toString)
  }

  /** Spellings of data files whose manifest bounds PROVE no row can
    * match the given conjuncts — the metadata half of Iceberg scan
    * planning, consumed by [[graft.plans.IcebergScanPruneRule]].
    * `ranges`: (col, lo, hi) and `probes`: (col, values) carry
    * PHYSICAL-unit literals (days for dates, micros for timestamps —
    * [[graft.plans.ScanPruneRule]]'s extraction). Conservative by
    * construction: a file lacking decodable bounds for a referenced
    * column never skips, unknown types never compare. */
  private[graft] def skippableFiles(spark: SparkSession, tableDir: String,
      snapshotId: Option[Long],
      ranges: Seq[(String, Option[Any], Option[Any])],
      probes: Seq[(String, Seq[Any])]): Set[String] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val plan = planScan(spark, tableDir, snapshotId)
    val idByName = plan.fieldNames.map(_.swap)
    def decode(b: Array[Byte], dt: DataType): Option[Any] = dt match {
      case IntegerType | DateType if b.length == 4 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt)
      case LongType | TimestampType | TimestampNTZType if b.length == 8 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong)
      case FloatType if b.length == 4 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getFloat)
      case DoubleType if b.length == 8 =>
        Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble)
      case StringType => Some(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case _ => None
    }
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Int, y: Int)       => Some(x.compareTo(y))
      case (x: Long, y: Long)     => Some(x.compareTo(y))
      case (x: Int, y: Long)      => Some(x.toLong.compareTo(y))
      case (x: Long, y: Int)      => Some(x.compareTo(y.toLong))
      case (x: Float, y: Float) if !x.isNaN && !y.isNaN   => Some(x.compareTo(y))
      case (x: Double, y: Double) if !x.isNaN && !y.isNaN => Some(x.compareTo(y))
      case (x: String, y: String) => Some(x.compareTo(y))
      case _ => None
    }
    plan.data.iterator.filter { d =>
      def boundsOf(colName: String): Option[(Option[Any], Option[Any])] =
        idByName.get(colName).flatMap(id => plan.fieldTypes.get(id).map(dt =>
          (d.lower.get(id).flatMap(decode(_, dt)), d.upper.get(id).flatMap(decode(_, dt)))))
      val rangeSkip = ranges.exists { case (c, lo, hi) =>
        boundsOf(c).exists { case (lb, ub) =>
          lo.exists(l => ub.exists(u => cmp(l, u).exists(_ > 0))) ||
            hi.exists(h => lb.exists(l2 => cmp(h, l2).exists(_ < 0)))
        }
      }
      val probeSkip = probes.exists { case (c, vs) =>
        vs.nonEmpty && boundsOf(c).exists { case (lb, ub) =>
          vs.forall(v => lb.exists(l2 => cmp(v, l2).exists(_ < 0)) ||
            ub.exists(u => cmp(v, u).exists(_ > 0)))
        }
      }
      // PARTITION-VALUE pruning via the file's own partition struct —
      // the Iceberg scan-planning move column bounds can't make: a
      // point lookup on a bucket-partitioned column skips every file
      // whose bucket differs from bucket(v), however wide the per-file
      // value ranges are. Each transform image is computed driver-side;
      // anything uncomputable contributes false (no skip).
      val BucketT = "bucket\\[(\\d+)\\]".r
      def image(transform: String, v: Any): Option[Any] = (transform, v) match {
        case ("identity", x) => Some(x)
        case (BucketT(n), x) =>
          val h = x match {
            case i: Int => Some(graft.functions.IcebergMurmur3.hashLong(i.toLong))
            case l: Long => Some(graft.functions.IcebergMurmur3.hashLong(l))
            case s: String =>
              Some(graft.functions.IcebergMurmur3.hashUtf8(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
            case _ => None
          }
          h.map(graft.functions.IcebergMurmur3.bucket(_, n.toInt))
        case ("day", i: Int) => Some(i) // physical date = days already
        case _ => None
      }
      def partVal(sc0: ScopeCond): Any = sc0.value match {
        case d: java.time.LocalDate => d.toEpochDay.toInt
        case other => other
      }
      val partSkip = probes.exists { case (c, vs) =>
        vs.nonEmpty && d.scope.exists(sc0 => sc0.col == c && sc0.value != null &&
          vs.forall(v => image(sc0.transform, v).exists(img =>
            cmp(img, partVal(sc0)).exists(_ != 0))))
      } || ranges.exists { case (c, lo, hi) =>
        // identity (and day-over-DATE, where the transform is the
        // identity on epoch days) partition values are exact per-file
        // constants — a range conjunct excludes the file when the
        // constant falls outside it. Day over TIMESTAMP sources is NOT
        // comparable here (literals are micros, the value is days).
        d.scope.exists { sc0 =>
          sc0.col == c && sc0.value != null && {
            val pvOpt = sc0.transform match {
              case "identity" => Some(partVal(sc0))
              case "day" =>
                val pv = partVal(sc0)
                // only days-vs-days: the literal must be an Int too
                val litsInt = (lo ++ hi).forall(_.isInstanceOf[Int])
                if (litsInt) Some(pv) else None
              case _ => None
            }
            pvOpt.exists(pv =>
              lo.exists(l => cmp(pv, l).exists(_ < 0)) ||
                hi.exists(h => cmp(pv, h).exists(_ > 0)))
          }
        }
      }
      rangeSkip || probeSkip || partSkip
    }.flatMap(d => spellings(d.path) ++ spellings(d.raw)).toSet
  }

  /** Evaluate an Iceberg partition transform over a source column —
    * every transform computable jar-free (the spec pins each
    * function's semantics):
    *   - identity: the column itself
    *   - bucket[N]: murmur3_x86_32 bucket ([[graft.functions.IcebergBucketExpr]])
    *   - day/month/year: date parts as days/months/years from 1970-01-01
    *   - hour: hours from epoch (timestamps; session is pinned UTC)
    *   - truncate[W]: leading W chars (string) or `v - (v mod W)` with
    *     the spec's non-negative mod (int/long)
    * None = not computable for that (transform, source type). */
  private[io] def transformExpr(c: Column, srcType: DataType, transform: String): Option[Column] = {
    val BucketT = "bucket\\[(\\d+)\\]".r
    val TruncT = "truncate\\[(\\d+)\\]".r
    transform match {
      case "identity" => Some(c)
      case BucketT(n) => Some(org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.IcebergBucketExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(c), n.toInt)))
      case "day"   => Some(datediff(to_date(c), lit("1970-01-01")))
      case "month" => Some((year(to_date(c)) - lit(1970)) * lit(12) + month(to_date(c)) - lit(1))
      case "year"  => Some(year(to_date(c)) - lit(1970))
      case "hour" if srcType == TimestampType || srcType == TimestampNTZType =>
        Some(floor(c.cast("long") / lit(3600L)).cast("int"))
      case TruncT(w) => srcType match {
        case StringType => Some(substring(c, 1, w.toInt))
        case IntegerType | LongType => Some((c - pmod(c, lit(w.toLong))).cast(srcType))
        case _ => None
      }
      case _ => None
    }
  }

  /** Null-safe OPTIONAL-field access on an Avro record: real v1
    * manifests simply LACK the v2 fields (content, sequence_number,
    * partition_spec_id …), and `GenericRecord.get(name)` THROWS on an
    * unknown field rather than returning null. */
  private[io] def fieldOpt(r: GenericRecord, name: String): Option[AnyRef] =
    Option(r.getSchema.getField(name)).flatMap(f => Option(r.get(f.pos())))

  /** Manifest paths may be absolute URIs (`file:/...`, `s3a://...`),
    * absolute paths, or table-relative. Shared with the write side:
    * maintenance/commit path handling must match scan planning's, or a
    * relative-path table's live files would qualify differently in the
    * two walks (and e.g. be inventoried as orphans). */
  private[io] def resolve(tableDir: String, p: String): Path =
    if (p.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") || p.startsWith("/")) new Path(p)
    else new Path(tableDir, p)

  /** The integer version of a WRITABLE metadata file name. Only
    * HadoopTableOperations-style `v<N>.metadata.json` layouts can take
    * jar-free commits (the next version name derives from the current
    * one); catalog-convention names (`00001-<uuid>.metadata.json`)
    * refuse here with the module's honest-refusal style instead of a
    * raw NumberFormatException deep in a commit. */
  private[io] def writableVersionOf(mdPath: Path): Int =
    mdPath.getName.stripPrefix("v").stripSuffix(".metadata.json").toIntOption.getOrElse(
      throw new IllegalArgumentException(
        s"cannot derive the next metadata version from '${mdPath.getName}' — only " +
          "HadoopTableOperations-style v<N>.metadata.json layouts are writable here; " +
          "catalog-convention layouts (e.g. 00001-<uuid>.metadata.json) are read-only"))

  private[io] def readAvro(fs: Path => org.apache.hadoop.fs.FileSystem, p: Path)
      : (Seq[GenericRecord], Map[String, String]) = {
    val in = new org.apache.avro.file.DataFileStream[GenericRecord](
      fs(p).open(p), new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      val meta = in.getMetaKeys.asScala.toSeq.filterNot(_.startsWith("avro."))
        .map(k => k -> in.getMetaString(k)).toMap
      val out = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (in.hasNext) out += in.next()
      (out.toSeq, meta)
    } finally in.close()
  }
}
