package graft.io

import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Jar-free APPEND COMMIT to a FOREIGN Iceberg v2 table — the fourth
  * quadrant of the interop bridge (read foreign: [[IcebergImport]];
  * write own as Iceberg: [[IcebergExport]]; evolve foreign:
  * [[IcebergEvolve]]). A migrating user's tables stay `USING ICEBERG`
  * (the reference's are, `/root/reference/spark/jobs/job_silver.py:66-88`)
  * while graft lands new data into them, exactly per the public spec:
  *
  *  1. the rows conform to the table's CURRENT schema (reordered,
  *     cast; extras or missing columns refuse) and are written as
  *     parquet WITH Iceberg field ids in the footers — future readers
  *     resolve the new files BY ID across any later rename; under a
  *     PARTITIONED default spec the rows land IN their partitions
  *     (`partitionBy` over the spec's directory columns — the source
  *     column itself for identity, per the spec's identity-projection
  *     rule; a derived transform column otherwise: day/month/year/
  *     hour, murmur3 `bucket[N]`, `truncate[W]`), each manifest entry
  *     carrying its typed partition struct so scoped deletes and
  *     partition-value pruning stay exact; transforms this engine
  *     cannot compute refuse loudly;
  *  2. one new manifest lists the files as ADDED entries (status 1,
  *     null sequence → inherited from the manifest list per the v2
  *     rule) with record counts and per-field value/null counts +
  *     single-value-serialized bounds from the freshly written footers
  *     (external engines can file-skip the appended data);
  *  3. a new manifest list carries the previous snapshot's manifests
  *     (re-serialized field-by-field, so foreign writers' richer list
  *     schemas pass through) plus the new one at the next sequence;
  *  4. a new metadata version commits the snapshot (parent chain,
  *     `last-sequence-number`, snapshot-log, `refs.main`); the
  *     metadata file is created WITHOUT overwrite, so two racing
  *     appends conflict loudly on the version file instead of lost-
  *     writing (HadoopTableOperations' own optimistic pattern).
  *
  * Because appended rows take a sequence number strictly greater than
  * every existing delete file's, the table's equality deletes never
  * touch them — the spec's strictly-earlier gating, no special case.
  *
  * The load → write-manifest → commit pieces are shared (private[io])
  * with [[IcebergDml]] (row-level deletes/updates committing delete
  * manifests), [[IcebergMaintenance.compact]] (a REPLACE snapshot is
  * exactly an append whose manifest list drops the previous manifests
  * — built BEFORE the single commit, so no reader ever sees an
  * intermediate doubled head), and branch-targeted commits (`branch`
  * param: the snapshot parents off and advances the named branch ref,
  * leaving `main`/`current-snapshot-id` untouched — Iceberg's
  * write-audit-publish on foreign tables).
  *
  * Honest refusals: v1 tables (no sequence semantics to inherit),
  * spec transforms this engine cannot compute (landing rows in the
  * wrong partition would corrupt scoped-delete semantics), identity
  * partition values that don't path-encode losslessly, schema
  * mismatches, version-file collisions, and metadata layouts whose
  * version the writer cannot derive (catalog-style
  * `00001-<uuid>.metadata.json` names are read-only here).
  */
object IcebergAppend {

  /** Snapshot-summary property under which streaming appends record
    * their (checkpoint-scoped) transaction marker — the replay guard
    * [[committedTxnIds]] scans. */
  private[graft] val TxnKey = "graft-txn-id"

  /** Table-property prefix under which committed txn markers are ALSO
    * persisted (`graft.txn.<namespace>` = a compact range list of
    * batch ids). Snapshot summaries die with snapshot expiry
    * ([[IcebergMaintenance.expireSnapshots]]); table properties are
    * carried forward in every metadata version, so the streaming
    * replay guard survives expiry. */
  private[io] val TxnRangesPrefix = "graft.txn."
  private[io] val TxnRawKey = "graft.txn.raw"

  /** Every txn marker recorded on the table — the union of snapshot-
    * summary markers (live snapshots) and the expiry-proof
    * `graft.txn.*` table properties. What a streaming writer consults
    * to skip a replayed micro-batch (Iceberg's own streaming sinks use
    * the same summary-marker idempotence pattern). */
  def committedTxnIds(spark: SparkSession, tableDir: String): Set[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val fs = metaDir.getFileSystem(hconf)
    val mdPath = IcebergImport.latestMetadata(fs, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = fs.open(mdPath); try om.readTree(in) finally in.close() }
    val snaps = md.get("snapshots")
    val fromSummaries: Set[String] =
      if (snaps == null) Set.empty
      else (0 until snaps.size).map(snaps.get).flatMap { s =>
        val sm = s.get("summary")
        if (sm != null && sm.hasNonNull(TxnKey)) Some(sm.get(TxnKey).asText) else None
      }.toSet
    val props = md.get("properties")
    val fromProps: Set[String] =
      if (props == null) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        props.fieldNames().asScala.flatMap {
          case TxnRawKey =>
            val arr = om.readTree(props.get(TxnRawKey).asText)
            (0 until arr.size).map(arr.get(_).asText)
          case k if k.startsWith(TxnRangesPrefix) =>
            val ns = k.stripPrefix(TxnRangesPrefix)
            decodeRanges(props.get(k).asText).map(n => s"$ns.$n")
          case _ => Nil
        }.toSet
      }
    fromSummaries ++ fromProps
  }

  // ------------------------------------------------------------------
  // compact range-list codec for the expiry-proof txn property:
  // "0-17,19,21-23". Batch ids per checkpoint are near-contiguous, so
  // a 10k-batch stream persists as a handful of bytes, not 10k ids.
  // ------------------------------------------------------------------

  private[io] def decodeRanges(s: String): Seq[Long] =
    if (s.isEmpty) Nil
    else s.split(',').toSeq.flatMap { part =>
      part.split('-') match {
        case Array(one) => Seq(one.toLong)
        case Array(a, b) => a.toLong to b.toLong
        case _ => throw new IllegalArgumentException(s"bad txn range '$part' in '$s'")
      }
    }

  private[io] def encodeRanges(ids: Seq[Long]): String = {
    val sorted = ids.distinct.sorted
    val parts = Seq.newBuilder[String]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1) == sorted(j) + 1) j += 1
      parts += (if (j == i) sorted(i).toString else s"${sorted(i)}-${sorted(j)}")
      i = j + 1
    }
    parts.result().mkString(",")
  }

  /** Fold a committed txn marker into the metadata's expiry-proof
    * `graft.txn.*` properties (numeric-tailed markers range-compress;
    * anything else lands in the raw JSON list). */
  private def recordTxnProperty(om: com.fasterxml.jackson.databind.ObjectMapper,
      md: ObjectNode, txn: String): Unit = {
    val props =
      if (md.hasNonNull("properties")) md.get("properties").asInstanceOf[ObjectNode]
      else md.putObject("properties")
    val cut = txn.lastIndexOf('.')
    val numericTail = if (cut > 0) txn.substring(cut + 1).toLongOption else None
    numericTail match {
      case Some(n) =>
        val key = TxnRangesPrefix + txn.substring(0, cut)
        val prior = if (props.hasNonNull(key)) decodeRanges(props.get(key).asText) else Nil
        props.put(key, encodeRanges(prior :+ n))
      case None =>
        val arr =
          if (props.hasNonNull(TxnRawKey)) om.readTree(props.get(TxnRawKey).asText).asInstanceOf[ArrayNode]
          else om.createArrayNode()
        val have = (0 until arr.size).map(arr.get(_).asText).toSet
        if (!have.contains(txn)) arr.add(txn)
        props.put(TxnRawKey, om.writeValueAsString(arr))
    }
  }

  // ------------------------------------------------------------------
  // shared commit machinery (private[io]): load → write manifests →
  // one atomic metadata commit
  // ------------------------------------------------------------------

  /** One freshly written manifest awaiting commit. `content`: 0 = data
    * manifest, 1 = delete manifest (manifest_file vocabulary). */
  private[io] case class NewManifest(path: Path, content: Int, files: Int, rows: Long)

  /** A REWRITTEN carried-forward manifest: the DV supersede path
    * (v3 one-DV-per-data-file invariant) rewrites a prior delete
    * manifest — superseded entries marked DELETED, the rest EXISTING
    * with explicit sequence numbers — and [[commitSnapshot]] substitutes
    * it for the original in the new manifest list. `minSeq` = the
    * smallest explicit entry sequence (the list's pruning floor). */
  private[io] case class ReplacedManifest(path: Path, existingFiles: Int,
      existingRows: Long, deletedFiles: Int, deletedRows: Long, minSeq: Long)

  /** The parsed write-side view of a table head: current schema fields
    * `(id, name, spark type)`, the default partition spec as
    * `(name, transform, srcCol, srcType, avro kind, field id,
    * identity?)` tuples, and the next snapshot/sequence coordinates.
    * `parent` is the head of the TARGET BRANCH (`main` = the table
    * head). */
  private[io] case class Loaded(
      tableDir: String,
      fs: org.apache.hadoop.fs.FileSystem,
      metaDir: Path,
      mdPath: Path,
      md: ObjectNode,
      om: com.fasterxml.jackson.databind.ObjectMapper,
      fields: Seq[(Int, String, DataType)],
      specFields: Seq[(String, String, String, DataType, String, Int, Boolean)],
      defaultSpecId: Int,
      newSnap: Long,
      newSeq: Long,
      parent: Option[Long],
      branch: String)

  private[io] def load(spark: SparkSession, tableDir: String,
      branch: String = "main"): Loaded = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val fs = metaDir.getFileSystem(hconf)
    val mdPath = IcebergImport.latestMetadata(fs, metaDir)
    // refuse non-v<N> layouts up front — the commit could not derive
    // the next version name (A DML that writes data files first and
    // only then discovers it cannot commit would leave debris)
    IcebergImport.writableVersionOf(mdPath)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = {
      val in = fs.open(mdPath)
      try om.readTree(in).asInstanceOf[ObjectNode] finally in.close()
    }
    val fv = if (md.has("format-version")) md.get("format-version").asInt else 1
    require(fv == 2 || fv == 3,
      s"commit needs a v2/v3 table (sequence-number inheritance); $mdPath is format-version $fv")

    // ---- current schema: (id, name, spark type) in schema order ----
    val schemaNode = {
      val schemas = md.get("schemas")
      if (schemas != null && schemas.size > 0) {
        val want = if (md.has("current-schema-id")) md.get("current-schema-id").asInt else 0
        (0 until schemas.size).map(schemas.get)
          .find(s => s.has("schema-id") && s.get("schema-id").asInt == want)
          .getOrElse(schemas.get(0))
      } else md.get("schema")
    }
    require(schemaNode != null && schemaNode.get("fields") != null,
      s"no parseable current schema in $mdPath")
    val fieldsN = schemaNode.get("fields")
    val fields: Seq[(Int, String, DataType)] = (0 until fieldsN.size).map { i =>
      val f = fieldsN.get(i)
      (f.get("id").asInt, f.get("name").asText, IcebergImport.icebergToSpark(f.get("type")))
    }

    // ---- the default partition spec: rows must land IN their
    // partitions (scoped-delete semantics), so every spec transform
    // must be computable here — identity, day/month/year/hour,
    // bucket[N] (murmur3), truncate[W]; anything else refuses
    val defaultSpecId = if (md.has("default-spec-id")) md.get("default-spec-id").asInt else 0
    val specNode = {
      val specs = md.get("partition-specs")
      if (specs != null && specs.size > 0)
        (0 until specs.size).map(specs.get)
          .find(s => (if (s.has("spec-id")) s.get("spec-id").asInt else 0) == defaultSpecId)
          .map(_.get("fields")).orNull
      else md.get("partition-spec")
    }
    val specFields: Seq[(String, String, String, DataType, String, Int, Boolean)] =
      if (specNode == null) Nil
      else (0 until specNode.size).map(specNode.get).map { f =>
        val transform = f.get("transform").asText
        val srcId = if (f.has("source-id")) f.get("source-id").asInt else -1
        val src = fields.find(_._1 == srcId).getOrElse(throw new IllegalArgumentException(
          s"partition field '${f.get("name").asText}' sources field id $srcId, " +
            s"not in the current schema of $tableDir"))
        val fid = if (f.has("field-id")) f.get("field-id").asInt else 1000
        val name = f.get("name").asText
        val kind = transform match {
          case "identity" => src._3 match {
            case ByteType | ShortType | IntegerType => "int"
            case LongType => "long"
            case StringType => "string"
            case DateType => "date"
            case other => throw new IllegalArgumentException(
              s"append cannot path-encode identity partition values of type $other " +
                s"(field '$name' of $tableDir) — int/long/string/date only")
          }
          case "day" => "date"
          case "month" | "year" | "hour" => "int"
          case t if t.matches("bucket\\[\\d+\\]") => "int"
          case t if t.matches("truncate\\[\\d+\\]") => src._3 match {
            case StringType => "string"
            case IntegerType => "int"
            case LongType => "long"
            case other => throw new IllegalArgumentException(
              s"truncate over $other (field '$name' of $tableDir) is not computable here")
          }
          case other => throw new IllegalArgumentException(
            s"append cannot compute partition transform '$other' (field '$name' of " +
              s"$tableDir) — rows must land in their partitions; compact or evolve the spec first")
        }
        (name, transform, src._2, src._3, kind, fid, transform == "identity")
      }
    specFields.filterNot(_._7).foreach { f =>
      require(!fields.exists(_._2 == f._1),
        s"derived partition field '${f._1}' collides with a table column of $tableDir")
    }

    // ---- new snapshot / sequence coordinates; parent = branch head --
    val snaps = md.withArray[ArrayNode]("snapshots")
    val prevIds = (0 until snaps.size).map(snaps.get(_).get("snapshot-id").asLong)
    val parent: Option[Long] =
      if (branch == "main") {
        if (md.hasNonNull("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1L)
          Some(md.get("current-snapshot-id").asLong)
        else None
      } else {
        val refs = md.get("refs")
        require(refs != null && refs.hasNonNull(branch),
          s"no branch '$branch' on $tableDir — create it with IcebergEvolve.createBranch")
        val r = refs.get(branch)
        val tpe = if (r.hasNonNull("type")) r.get("type").asText else "branch"
        require(tpe == "branch",
          s"ref '$branch' on $tableDir is a $tpe — tags are immutable, only branches take commits")
        Some(r.get("snapshot-id").asLong)
      }
    val newSnap = (prevIds :+ 0L).max + 1
    val newSeq = (if (md.hasNonNull("last-sequence-number"))
      md.get("last-sequence-number").asLong else 0L) + 1
    Loaded(tableDir, fs, metaDir, mdPath, md, om, fields, specFields, defaultSpecId,
      newSnap, newSeq, parent, branch)
  }

  /** Conform `df` to the table's current schema, write it as
    * field-id-carrying parquet (landing IN its partitions under a
    * partitioned default spec), and write one ADDED data manifest with
    * footer stats. Nothing is committed — the returned manifest enters
    * a snapshot via [[commitSnapshot]]. */
  private[io] def writeDataManifest(spark: SparkSession, lt: Loaded, df: DataFrame): NewManifest = {
    import lt.{fs, fields, specFields, md, metaDir, tableDir, newSnap}
    val hconf = spark.sparkContext.hadoopConfiguration

    // ---- conform rows to the current schema, ids in the footers -----
    val names = fields.map(_._2)
    val missing = names.filterNot(df.columns.contains)
    val extras = df.columns.filterNot(names.contains)
    require(missing.isEmpty && extras.isEmpty,
      s"schema mismatch vs $tableDir: missing ${missing.mkString("[", ",", "]")}, " +
        s"extra ${extras.mkString("[", ",", "]")}")
    val conformed = df.select(fields.map { case (id, n, dt) =>
      IcebergDml.qcol(n).cast(dt).as(n,
        new MetadataBuilder().putLong("parquet.field.id", id.toLong).build())
    }: _*)
    val segId = java.util.UUID.randomUUID().toString.take(18)
    val dataDir = new Path(tableDir, s"data/append-$segId")
    // partitioned layouts: rows land in their partitions via
    // `partitionBy` over the spec's DIRECTORY columns — the source
    // column itself for identity (spec rule: identity-partitioned
    // columns may live only in partition metadata), a derived
    // transform column (never written into the files) otherwise
    val withDerived = specFields.filterNot(_._7).foldLeft(conformed) { (acc, f) =>
      val (name, transform, srcCol, srcType, _, _, _) = f
      val expr = IcebergImport.transformExpr(
        IcebergDml.qcol(srcCol), srcType, transform)
        .getOrElse(throw new IllegalArgumentException(
          s"partition transform '$transform' over $srcType (field '$name') is not computable"))
      acc.withColumn(name, expr)
    }
    val dirCols = specFields.map(f => if (f._7) f._3 else f._1)
    val writer = withDerived.write
    IcebergDml.withFieldIdWrites(spark) {
      (if (dirCols.isEmpty) writer else writer.partitionBy(dirCols: _*)).parquet(dataDir.toString)
    }
    val dataFiles: Seq[Path] = {
      val it = fs.listFiles(dataDir, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) b += st.getPath
      }
      b.result().sortBy(_.toString)
    }
    require(dataFiles.nonEmpty, s"wrote no parquet files under $dataDir" +
      (if (dirCols.nonEmpty) " — a partitioned write of zero rows has nothing to commit" else ""))

    /** This file's `dir=value` components below the segment root. */
    def rawParts(p: Path): Map[String, String] = {
      val rel = p.toString.stripPrefix(fs.makeQualified(dataDir).toString)
        .stripPrefix(dataDir.toString).stripPrefix("/")
      rel.split('/').init.filter(_.contains("=")).map { c =>
        val i = c.indexOf('=')
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(c.substring(0, i)) ->
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(c.substring(i + 1))
      }.toMap
    }
    /** Typed partition value for one spec field from the file's dirs:
      * identity DATE dirs are ISO strings, day-transform dirs are the
      * transform's integer image — both land as the logical-date int. */
    def partValue(p: Path, name: String, dirName: String, kind: String): AnyRef = {
      val raw = rawParts(p).getOrElse(dirName, throw new IllegalArgumentException(
        s"written file $p lacks a directory value for partition field '$name'"))
      if (raw == "__HIVE_DEFAULT_PARTITION__") null
      else kind match {
        case "int" => java.lang.Integer.valueOf(raw.toInt)
        case "long" => java.lang.Long.valueOf(raw.toLong)
        case "string" => raw
        case "date" => java.lang.Integer.valueOf(
          raw.toIntOption.getOrElse(java.time.LocalDate.parse(raw).toEpochDay.toInt))
        case other => throw new IllegalArgumentException(
          s"append to $tableDir cannot path-decode partition values of kind '$other' " +
            s"(field '$name') — int/long/string/date only")
      }
    }

    // ---- footer stats for the manifest (file-skipping surface) ------
    def statKind(dt: DataType): Option[String] = dt match {
      case IntegerType => Some("int")
      case DateType => Some("date")
      case LongType => Some("long")
      case TimestampType | TimestampNTZType => Some("ts")
      case FloatType => Some("float")
      case DoubleType => Some("double")
      case StringType => Some("string")
      case _ => None
    }
    val wanted: Map[String, String] =
      fields.flatMap { case (_, n, dt) => statKind(dt).map(n -> _) }.toMap
    val idByName = fields.map { case (id, n, _) => n -> id }.toMap
    val stats: Map[String, IcebergExport.FileStats] =
      dataFiles.map(p => p.toString ->
        IcebergExport.footerStats(p.toString, hconf, wanted)).toMap

    // ---- the data manifest -------------------------------------------
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      if (specFields.isEmpty) IcebergExport.ManifestEntryAvro
      else IcebergExport.manifestEntryAvro(specFields.map(f => (f._1, f._5, f._6))))
    val dfSchema = entrySchema.getField("data_file").schema()
    val manifestPath = new Path(metaDir, s"m-append-$newSnap-$segId.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("content", "data")
    w.setMeta("format-version", "2")
    w.setMeta("partition-spec-id",
      (if (md.has("default-spec-id")) md.get("default-spec-id").asInt else 0).toString)
    val out = fs.create(manifestPath, false)
    w.create(entrySchema, out)
    var totalRows = 0L
    def kvMap(fieldName: String, rec: GenericData.Record,
        vals: Seq[(Int, AnyRef)]): Unit = if (vals.nonEmpty) {
      val arrSchema = dfSchema.getField(fieldName).schema().getTypes.get(1)
      val item = arrSchema.getElementType
      val a = new GenericData.Array[GenericRecord](vals.size, arrSchema)
      vals.sortBy(_._1).foreach { case (k, v) =>
        val kv = new GenericData.Record(item)
        kv.put("key", k); kv.put("value", v); a.add(kv)
      }
      rec.put(fieldName, a)
    }
    dataFiles.foreach { p =>
      val st = stats(p.toString)
      totalRows += st.rows
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", 0)
      dfr.put("file_path", fs.makeQualified(p).toString)
      dfr.put("file_format", "PARQUET")
      val pRec = new GenericData.Record(dfSchema.getField("partition").schema())
      specFields.foreach { f =>
        pRec.put(f._1, partValue(p, f._1, if (f._7) f._3 else f._1, f._5))
      }
      dfr.put("partition", pRec)
      dfr.put("record_count", st.rows)
      dfr.put("file_size_in_bytes", fs.getFileStatus(p).getLen)
      val byId = st.cols.toSeq.flatMap { case (n, c) => idByName.get(n).map(_ -> c) }
      kvMap("value_counts", dfr,
        byId.map { case (id, c) => id -> java.lang.Long.valueOf(c.valueCount) })
      kvMap("null_value_counts", dfr,
        byId.flatMap { case (id, c) => c.nullCount.map(n => id -> java.lang.Long.valueOf(n)) })
      kvMap("lower_bounds", dfr,
        byId.flatMap { case (id, c) => c.lower.map(b => id -> java.nio.ByteBuffer.wrap(b)) })
      kvMap("upper_bounds", dfr,
        byId.flatMap { case (id, c) => c.upper.map(b => id -> java.nio.ByteBuffer.wrap(b)) })
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(newSnap))
      // null sequence numbers: inherited from the manifest list (v2)
      e.put("data_file", dfr)
      w.append(e)
    }
    w.close()
    NewManifest(manifestPath, content = 0, files = dataFiles.size, rows = totalRows)
  }

  /** Commit `manifests` as ONE new snapshot on `lt`'s branch: one new
    * manifest list (the branch parent's manifests — re-serialized
    * field-by-field so foreign richer list schemas pass through —
    * when `carryPrevious`, plus the new ones at the next sequence),
    * one snapshot node, ONE new metadata version created WITHOUT
    * overwrite (racing writers conflict loudly). Non-main branches
    * advance only their own ref — `current-snapshot-id`, `refs.main`
    * and the snapshot-log stay untouched (Iceberg's snapshot-log
    * records changes to the CURRENT snapshot only). */
  private[io] def commitSnapshot(spark: SparkSession, lt: Loaded,
      manifests: Seq[NewManifest], operation: String,
      summaryProps: Map[String, String] = Map.empty,
      carryPrevious: Boolean = true,
      replacePrev: Map[String, ReplacedManifest] = Map.empty): Long = {
    import lt.{fs, md, om, metaDir, mdPath, tableDir, newSnap, newSeq, parent, branch}
    require(manifests.nonEmpty, s"a snapshot commit on $tableDir needs at least one manifest")
    val now = System.currentTimeMillis()
    val snaps = md.withArray[ArrayNode]("snapshots")

    // ---- new manifest list: (previous manifests +) the new ones -----
    // v3 lists carry the row-lineage assignment field (first_row_id,
    // spec id 520): carried entries preserve theirs (null for
    // pre-upgrade history — those rows have no lineage), new data
    // manifests are assigned below from the table's next-row-id.
    val fv = if (md.has("format-version")) md.get("format-version").asInt else 2
    val listSchema = new org.apache.avro.Schema.Parser().parse(
      if (fv == 3) IcebergExport.ManifestFileV3Avro else IcebergExport.ManifestFileAvro)
    def putFirstRowId(r: GenericRecord, v: Option[Long]): Unit =
      if (fv == 3) r.put("first_row_id", v.map(java.lang.Long.valueOf).orNull)
    def listEntry(src: GenericRecord): GenericRecord = {
      def opt[T](n: String, dflt: T): T =
        IcebergImport.fieldOpt(src, n).map(_.asInstanceOf[T]).getOrElse(dflt)
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", src.get("manifest_path").toString)
      r.put("manifest_length", opt[Long]("manifest_length", 0L))
      r.put("partition_spec_id", opt[Int]("partition_spec_id", 0))
      r.put("content", opt[Int]("content", 0))
      val seq = opt[Long]("sequence_number", 0L)
      r.put("sequence_number", seq)
      r.put("min_sequence_number", opt[Long]("min_sequence_number", seq))
      r.put("added_snapshot_id", opt[Long]("added_snapshot_id", 0L))
      r.put("added_files_count", opt[Int]("added_files_count", 0))
      r.put("existing_files_count", opt[Int]("existing_files_count", 0))
      r.put("deleted_files_count", opt[Int]("deleted_files_count", 0))
      r.put("added_rows_count", opt[Long]("added_rows_count", 0L))
      r.put("existing_rows_count", opt[Long]("existing_rows_count", 0L))
      r.put("deleted_rows_count", opt[Long]("deleted_rows_count", 0L))
      putFirstRowId(r, IcebergImport.fieldOpt(src, "first_row_id").map(_.asInstanceOf[Long]))
      r
    }
    /** The list record for a REWRITTEN carried manifest: spec id and
      * content copy from the original; every entry carries an explicit
      * sequence, so the list-level sequence is the new snapshot's and
      * `min_sequence_number` is the entries' floor. */
    def replacedEntry(src: GenericRecord, r: ReplacedManifest): GenericRecord = {
      def opt[T](n: String, dflt: T): T =
        IcebergImport.fieldOpt(src, n).map(_.asInstanceOf[T]).getOrElse(dflt)
      val rec = new GenericData.Record(listSchema)
      rec.put("manifest_path", fs.makeQualified(r.path).toString)
      rec.put("manifest_length", fs.getFileStatus(r.path).getLen)
      rec.put("partition_spec_id", opt[Int]("partition_spec_id", 0))
      rec.put("content", opt[Int]("content", 0))
      rec.put("sequence_number", newSeq)
      rec.put("min_sequence_number", r.minSeq)
      rec.put("added_snapshot_id", newSnap)
      rec.put("added_files_count", 0)
      rec.put("existing_files_count", r.existingFiles)
      rec.put("deleted_files_count", r.deletedFiles)
      rec.put("added_rows_count", 0L)
      rec.put("existing_rows_count", r.existingRows)
      rec.put("deleted_rows_count", r.deletedRows)
      putFirstRowId(rec, IcebergImport.fieldOpt(src, "first_row_id").map(_.asInstanceOf[Long]))
      rec
    }
    val prevManifests: Seq[GenericRecord] =
      if (!carryPrevious) Nil
      else parent match {
        case None => Nil
        case Some(c) =>
          val snap = (0 until snaps.size).map(snaps.get).find(_.get("snapshot-id").asLong == c)
            .getOrElse(throw new IllegalArgumentException(
              s"parent snapshot $c not in the snapshot list of $mdPath"))
          require(snap.hasNonNull("manifest-list"),
            s"snapshot $c of $mdPath has no manifest-list (v1 inline layout?) — cannot commit")
          val listP = IcebergImport.resolve(tableDir, snap.get("manifest-list").asText)
          IcebergImport.readAvro(_ => fs, listP)._1.map { src =>
            replacePrev.get(src.get("manifest_path").toString)
              .map(r => replacedEntry(src, r)).getOrElse(listEntry(src))
          }
      }
    val newListPath = new Path(metaDir, s"snap-$newSnap-1-$operation.avro")
    val lw = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.setMeta("format-version", if (fv == 3) "3" else "2")
    lw.create(listSchema, fs.create(newListPath, false))
    prevManifests.foreach(lw.append)
    // v3 row-id assignment for THIS commit's data manifests: the first
    // gets the table's next-row-id, subsequent ones advance by row
    // count (the spec's cumulative assignment); delete manifests carry
    // no row ids. The snapshot-level first-row-id stamp below uses the
    // same base, so list and snapshot agree by construction.
    var rowIdCursor: Long =
      if (fv == 3 && md.has("next-row-id")) md.get("next-row-id").asLong else 0L
    manifests.foreach { m =>
      val lr = new GenericData.Record(listSchema)
      lr.put("manifest_path", fs.makeQualified(m.path).toString)
      lr.put("manifest_length", fs.getFileStatus(m.path).getLen)
      lr.put("partition_spec_id",
        if (m.content == 1) deleteSpecId(lt)
        else if (md.has("default-spec-id")) md.get("default-spec-id").asInt else 0)
      lr.put("content", m.content)
      lr.put("sequence_number", newSeq)
      lr.put("min_sequence_number", newSeq)
      lr.put("added_snapshot_id", newSnap)
      lr.put("added_files_count", m.files)
      lr.put("existing_files_count", 0)
      lr.put("deleted_files_count", 0)
      lr.put("added_rows_count", m.rows)
      lr.put("existing_rows_count", 0L)
      lr.put("deleted_rows_count", 0L)
      if (m.content == 0) {
        putFirstRowId(lr, if (fv == 3) Some(rowIdCursor) else None)
        rowIdCursor += m.rows
      } else putFirstRowId(lr, None)
      lw.append(lr)
    }
    lw.close()

    // ---- the new metadata version -------------------------------------
    val newSnapNode = snaps.addObject()
    newSnapNode.put("snapshot-id", newSnap)
    parent.foreach(c => newSnapNode.put("parent-snapshot-id", c))
    newSnapNode.put("sequence-number", newSeq)
    newSnapNode.put("timestamp-ms", now)
    val summary = newSnapNode.putObject("summary")
    summary.put("operation", operation)
    summaryProps.foreach { case (k, v) => summary.put(k, v) }
    newSnapNode.put("manifest-list", fs.makeQualified(newListPath).toString)
    if (md.has("current-schema-id"))
      newSnapNode.put("schema-id", md.get("current-schema-id").asInt)
    // v3 row lineage: the snapshot records the id range it assigns
    // (first-row-id + added-rows) and the table's next-row-id advances
    // — the spec's writer obligation; readers here null-fill lineage
    if (md.has("format-version") && md.get("format-version").asInt == 3) {
      val nextRowId = if (md.has("next-row-id")) md.get("next-row-id").asLong else 0L
      val added = manifests.filter(_.content == 0).map(_.rows).sum
      newSnapNode.put("first-row-id", nextRowId)
      newSnapNode.put("added-rows", added)
      md.put("next-row-id", nextRowId + added)
    }
    md.put("last-sequence-number", newSeq)
    md.put("last-updated-ms", now)
    summaryProps.get(TxnKey).foreach(txn => recordTxnProperty(om, md, txn))
    val refs =
      if (md.hasNonNull("refs")) md.get("refs").asInstanceOf[ObjectNode]
      else md.putObject("refs")
    val branchRef =
      if (refs.hasNonNull(branch)) refs.get(branch).asInstanceOf[ObjectNode]
      else refs.putObject(branch)
    branchRef.put("snapshot-id", newSnap)
    if (!branchRef.has("type")) branchRef.put("type", "branch")
    if (branch == "main") {
      md.put("current-snapshot-id", newSnap)
      val slog = md.withArray[ArrayNode]("snapshot-log")
      val sl = slog.addObject()
      sl.put("timestamp-ms", now); sl.put("snapshot-id", newSnap)
    }

    val hint = IcebergImport.writableVersionOf(mdPath)
    val newMdPath = new Path(metaDir, s"v${hint + 1}.metadata.json")
    // overwrite=false: a racing commit fails HERE, loudly — optimistic
    // concurrency on the version file, never a lost write
    val os = fs.create(newMdPath, false)
    try os.write(om.writeValueAsString(md).getBytes("UTF-8")) finally os.close()
    val hs = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hs.write((hint + 1).toString.getBytes("UTF-8")) finally hs.close()
    newSnap
  }

  /** The spec id DELETE manifests enter under: the first spec with NO
    * fields (global deletes live in an unpartitioned spec per the
    * public spec). [[IcebergDml]] registers one via [[ensureUnpartitionedSpec]]
    * before writing delete manifests; an unpartitioned table's default
    * spec qualifies directly. */
  private[io] def deleteSpecId(lt: Loaded): Int = {
    val specs = lt.md.get("partition-specs")
    val hit =
      if (specs != null && specs.size > 0)
        (0 until specs.size).map(specs.get).find { s =>
          val f = s.get("fields"); f == null || f.size == 0
        }.map(s => if (s.has("spec-id")) s.get("spec-id").asInt else 0)
      else if (lt.specFields.isEmpty) Some(0)
      else None
    hit.getOrElse(throw new IllegalStateException(
      s"no unpartitioned spec on ${lt.tableDir} — call ensureUnpartitionedSpec before " +
        "writing delete manifests"))
  }

  /** Make sure the metadata carries an unpartitioned spec for global
    * delete manifests, registering a fresh spec id when absent (spec
    * evolution is append-only; `default-spec-id` is untouched). The
    * edit rides the SAME metadata commit as the delete snapshot. */
  private[io] def ensureUnpartitionedSpec(lt: Loaded): Int = {
    val md = lt.md
    val specs = md.withArray[ArrayNode]("partition-specs")
    val existing = (0 until specs.size).map(specs.get).find { s =>
      val f = s.get("fields"); f == null || f.size == 0
    }
    existing match {
      case Some(s) => if (s.has("spec-id")) s.get("spec-id").asInt else 0
      case None =>
        val newId = ((0 until specs.size).map(s =>
          if (specs.get(s).has("spec-id")) specs.get(s).get("spec-id").asInt else 0) :+ 0).max + 1
        val node = specs.addObject()
        node.put("spec-id", newId)
        node.putArray("fields")
        newId
    }
  }

  /** Append `df` as a new snapshot on `branch` (default: the table
    * head); returns the new snapshot id. `summaryProps` land in the
    * snapshot summary (e.g. the streaming replay marker — also
    * persisted expiry-proof as a `graft.txn.*` table property). */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
      summaryProps: Map[String, String] = Map.empty,
      branch: String = "main"): Long = {
    val lt = load(spark, tableDir, branch)
    val m = writeDataManifest(spark, lt, df)
    commitSnapshot(spark, lt, Seq(m), operation = "append", summaryProps = summaryProps)
  }

  /** Replace the table's content with `df` in ONE atomic snapshot
    * (`operation=overwrite`, manifest list referencing only the new
    * files — prior snapshots stay time-travelable). The INSERT
    * OVERWRITE face of the bridge. */
  def overwrite(spark: SparkSession, tableDir: String, df: DataFrame,
      branch: String = "main"): Long = {
    val lt = load(spark, tableDir, branch)
    val m = writeDataManifest(spark, lt, df)
    commitSnapshot(spark, lt, Seq(m), operation = "overwrite", carryPrevious = false)
  }

  /** Register EXTERNALLY WRITTEN data files as one append snapshot —
    * Iceberg's own `add_files`/register shape: the files are adopted
    * BY REFERENCE (never read row-wise, never rewritten), entered as
    * ADDED manifest entries with their record counts (parquet/ORC
    * footer, avro container walk — metadata-sized reads) and byte sizes but NO
    * column bounds (the manifest simply cannot skip these files until
    * a compaction rewrites them with stats). The caller asserts the
    * files match the table's current schema — by parquet field ids or
    * Avro `field-id` props, which is how the read resolves them.
    * Restricted to an unpartitioned default spec: adopted files carry
    * no partition struct, and inventing one would corrupt
    * scoped-delete semantics. */
  def addFiles(spark: SparkSession, tableDir: String, files: Seq[String],
      format: String = "PARQUET", branch: String = "main",
      checkDuplicateFiles: Boolean = true): Long = {
    require(files.nonEmpty, "addFiles needs at least one file")
    val fmt = format.toUpperCase
    require(fmt == "PARQUET" || fmt == "AVRO" || fmt == "ORC",
      s"addFiles supports PARQUET, ORC and AVRO, got $format")
    val lt = load(spark, tableDir, branch)
    // partitioned adoption (r18 — add_files' primary real-world use
    // is adopting an existing Hive-partitioned tree; the reference's
    // bronze layout IS one, `sys_file_date=...` dirs): IDENTITY
    // partition values derive from the files' own `col=value` path
    // components, exactly the procedure's contract. Non-identity
    // transforms cannot be derived from a path and refuse.
    require(lt.specFields.forall(_._7),
      s"addFiles on $tableDir can only derive IDENTITY partition values from col=value " +
        s"path components; the default spec carries non-identity transforms: " +
        lt.specFields.filterNot(_._7).map(f => s"${f._2}(${f._3})").mkString(", "))
    // adopting a path a live manifest already references would
    // double-count its rows on every read — refuse by default, the
    // reference procedure's own contract (check_duplicate_files=true)
    if (checkDuplicateFiles && lt.parent.isDefined) {
      val live: Set[String] = IcebergImport.dataFiles(spark, tableDir, lt.parent)
        .flatMap { p0 =>
          val r = IcebergImport.resolve(tableDir, p0)
          Seq(p0, r.toString, lt.fs.makeQualified(r).toString)
        }.toSet
      val dups = files.filter { f =>
        val p = new Path(f)
        live.contains(f) || live.contains(p.toString) ||
          live.contains(lt.fs.makeQualified(p).toString)
      }
      require(dups.isEmpty,
        s"addFiles on $tableDir: ${dups.size} file(s) are already referenced by the " +
          s"current snapshot — adopting them again would double-count their rows: " +
          s"${dups.take(3).mkString(", ")}${if (dups.size > 3) ", …" else ""}. " +
          "Pass checkDuplicateFiles=false only if you know the manifests lie.")
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    def rowsOf(p: Path): Long = fmt match {
      case "PARQUET" =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      case "AVRO" =>
        val fs = p.getFileSystem(hconf)
        val s = new org.apache.avro.file.DataFileStream[GenericRecord](
          fs.open(p), new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try {
          // metadata-sized: sum the per-block record counts from the
          // container's block headers and SKIP the block bodies — no
          // per-record decode (the container framing carries counts)
          var n = 0L
          while (s.hasNext) { n += s.getBlockCount; s.nextBlock() }
          n
        } finally s.close()
      case "ORC" => IcebergOrcData.rows(spark, p.toString)
    }
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      if (lt.specFields.isEmpty) IcebergExport.ManifestEntryAvro
      else IcebergExport.manifestEntryAvro(lt.specFields.map(f => (f._1, f._5, f._6))))
    val dfSchema = entrySchema.getField("data_file").schema()
    /** The file's `name=value` path components (Hive layout), keys and
      * values path-unescaped. Scans the WHOLE parent chain: an adopted
      * tree lives wherever it lives, not under this table's root. */
    def pathParts(p: Path): Map[String, String] = {
      val b = Map.newBuilder[String, String]
      var cur = p.getParent
      while (cur != null) {
        val c = cur.getName
        val i = c.indexOf('=')
        if (i > 0)
          b += org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(c.substring(0, i)) ->
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(c.substring(i + 1))
        cur = cur.getParent
      }
      b.result()
    }
    /** One spec field's typed partition value from the file's dirs —
      * keyed by the partition-field name with the source column as the
      * fallback spelling; a file outside the expected layout refuses
      * (adopting it under a guessed partition would corrupt
      * scoped-delete semantics and partition pruning). */
    def partValue(p: Path, parts: Map[String, String],
        f: (String, String, String, org.apache.spark.sql.types.DataType, String, Int, Boolean))
        : AnyRef = {
      val (name, _, srcCol, _, kind, _, _) = f
      val raw = parts.get(name).orElse(parts.get(srcCol)).getOrElse(
        throw new IllegalArgumentException(
          s"addFiles on $tableDir: file $p carries no '$name='/'$srcCol=' path component " +
            "for the identity partition field — adopt Hive-layout trees only"))
      if (raw == "__HIVE_DEFAULT_PARTITION__") null
      else kind match {
        case "int" => java.lang.Integer.valueOf(raw.toInt)
        case "long" => java.lang.Long.valueOf(raw.toLong)
        case "string" => raw
        case "date" => java.lang.Integer.valueOf(
          raw.toIntOption.getOrElse(java.time.LocalDate.parse(raw).toEpochDay.toInt))
        // unreachable today (load() refuses identity partitions over
        // any other source type up front), but a bare MatchError here
        // would violate the module's loud-refusal contract if the kind
        // vocabulary ever widens
        case other => throw new IllegalArgumentException(
          s"addFiles on $tableDir cannot path-decode identity partition values of " +
            s"kind '$other' (field '$name') — int/long/string/date only")
      }
    }
    val segId = java.util.UUID.randomUUID().toString.take(18)
    val manifestPath = new Path(lt.metaDir, s"m-addfiles-${lt.newSnap}-$segId.avro")
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("content", "data")
    w.setMeta("format-version", "2")
    w.setMeta("partition-spec-id",
      (if (lt.md.has("default-spec-id")) lt.md.get("default-spec-id").asInt else 0).toString)
    w.create(entrySchema, lt.fs.create(manifestPath, false))
    var totalRows = 0L
    files.sorted.foreach { f =>
      val p = new Path(f)
      val rows = rowsOf(p)
      totalRows += rows
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", 0)
      dfr.put("file_path", lt.fs.makeQualified(p).toString)
      dfr.put("file_format", fmt)
      val pRec = new GenericData.Record(dfSchema.getField("partition").schema())
      if (lt.specFields.nonEmpty) {
        val parts = pathParts(p)
        lt.specFields.foreach(sf => pRec.put(sf._1, partValue(p, parts, sf)))
      }
      dfr.put("partition", pRec)
      dfr.put("record_count", rows)
      dfr.put("file_size_in_bytes", lt.fs.getFileStatus(p).getLen)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(lt.newSnap))
      e.put("data_file", dfr)
      w.append(e)
    }
    w.close()
    commitSnapshot(spark, lt,
      Seq(NewManifest(manifestPath, content = 0, files = files.size, rows = totalRows)),
      operation = "append")
  }
}
