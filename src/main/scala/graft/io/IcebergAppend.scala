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
  * Honest refusals: v1 tables (no sequence semantics to inherit),
  * spec transforms this engine cannot compute (landing rows in the
  * wrong partition would corrupt scoped-delete semantics), identity
  * partition values that don't path-encode losslessly, schema
  * mismatches, and version-file collisions.
  */
object IcebergAppend {

  /** Snapshot-summary property under which streaming appends record
    * their (checkpoint-scoped) transaction marker — the replay guard
    * [[committedTxnIds]] scans. */
  private[graft] val TxnKey = "graft-txn-id"

  /** Every `graft-txn-id` marker recorded in the table's snapshot
    * summaries — what a streaming writer consults to skip a replayed
    * micro-batch (Iceberg's own streaming sinks use the same
    * summary-marker idempotence pattern). */
  def committedTxnIds(spark: SparkSession, tableDir: String): Set[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val fs = metaDir.getFileSystem(hconf)
    val mdPath = IcebergImport.latestMetadata(fs, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = { val in = fs.open(mdPath); try om.readTree(in) finally in.close() }
    val snaps = md.get("snapshots")
    if (snaps == null) Set.empty
    else (0 until snaps.size).map(snaps.get).flatMap { s =>
      val sm = s.get("summary")
      if (sm != null && sm.hasNonNull(TxnKey)) Some(sm.get(TxnKey).asText) else None
    }.toSet
  }

  /** Append `df` as a new snapshot; returns the new snapshot id.
    * `summaryProps` land in the snapshot summary (e.g. the streaming
    * replay marker). */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
      summaryProps: Map[String, String] = Map.empty): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val metaDir = new Path(tableDir, "metadata")
    val fs = metaDir.getFileSystem(hconf)
    val mdPath = IcebergImport.latestMetadata(fs, metaDir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = {
      val in = fs.open(mdPath)
      try om.readTree(in).asInstanceOf[ObjectNode] finally in.close()
    }
    val fv = if (md.has("format-version")) md.get("format-version").asInt else 1
    require(fv == 2,
      s"append needs a v2 table (sequence-number inheritance); $mdPath is format-version $fv")

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
    /** (spec field name, transform, source column, source type, avro
      * kind of the partition VALUE, spec field id, identity?). */
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

    // ---- conform rows to the current schema, ids in the footers -----
    val names = fields.map(_._2)
    val missing = names.filterNot(df.columns.contains)
    val extras = df.columns.filterNot(names.contains)
    require(missing.isEmpty && extras.isEmpty,
      s"append schema mismatch vs $tableDir: missing ${missing.mkString("[", ",", "]")}, " +
        s"extra ${extras.mkString("[", ",", "]")}")
    val conformed = df.select(fields.map { case (id, n, dt) =>
      org.apache.spark.sql.functions.col(n).cast(dt).as(n,
        new MetadataBuilder().putLong("parquet.field.id", id.toLong).build())
    }: _*)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
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
        org.apache.spark.sql.functions.col(srcCol), srcType, transform)
        .getOrElse(throw new IllegalArgumentException(
          s"partition transform '$transform' over $srcType (field '$name') is not computable"))
      acc.withColumn(name, expr)
    }
    val dirCols = specFields.map(f => if (f._7) f._3 else f._1)
    val writer = withDerived.write
    (if (dirCols.isEmpty) writer else writer.partitionBy(dirCols: _*)).parquet(dataDir.toString)
    val dataFiles: Seq[Path] = {
      val it = fs.listFiles(dataDir, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) b += st.getPath
      }
      b.result().sortBy(_.toString)
    }
    require(dataFiles.nonEmpty, s"append wrote no parquet files under $dataDir" +
      (if (dirCols.nonEmpty) " — a partitioned append of zero rows has nothing to commit" else ""))

    /** This file's `dir=value` components below the append segment. */
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
        s"appended file $p lacks a directory value for partition field '$name'"))
      if (raw == "__HIVE_DEFAULT_PARTITION__") null
      else kind match {
        case "int" => java.lang.Integer.valueOf(raw.toInt)
        case "long" => java.lang.Long.valueOf(raw.toLong)
        case "string" => raw
        case "date" => java.lang.Integer.valueOf(
          raw.toIntOption.getOrElse(java.time.LocalDate.parse(raw).toEpochDay.toInt))
      }
    }

    // ---- new snapshot / sequence coordinates ------------------------
    val snaps = md.withArray[ArrayNode]("snapshots")
    val prevIds = (0 until snaps.size).map(snaps.get(_).get("snapshot-id").asLong)
    val cur: Option[Long] =
      if (md.hasNonNull("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1L)
        Some(md.get("current-snapshot-id").asLong)
      else None
    val newSnap = (prevIds :+ 0L).max + 1
    val newSeq = (if (md.hasNonNull("last-sequence-number"))
      md.get("last-sequence-number").asLong else 0L) + 1
    val now = System.currentTimeMillis()

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

    // ---- the append manifest -----------------------------------------
    val entrySchema = new org.apache.avro.Schema.Parser().parse(
      if (specFields.isEmpty) IcebergExport.ManifestEntryAvro
      else IcebergExport.manifestEntryAvro(specFields.map(f => (f._1, f._5, f._6))))
    val dfSchema = entrySchema.getField("data_file").schema()
    val manifestPath = new Path(metaDir, s"m-append-$newSnap.avro")
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

    // ---- new manifest list: previous manifests + the append one -----
    val listSchema = new org.apache.avro.Schema.Parser().parse(IcebergExport.ManifestFileAvro)
    def listEntry(src: GenericRecord): GenericRecord = {
      // rebuild field-by-field so FOREIGN list schemas (richer: partition
      // summaries, key metadata) re-serialize correctly under ours
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
      r
    }
    val prevManifests: Seq[GenericRecord] = cur match {
      case None => Nil
      case Some(c) =>
        val snap = (0 until snaps.size).map(snaps.get).find(_.get("snapshot-id").asLong == c)
          .getOrElse(throw new IllegalArgumentException(
            s"current snapshot $c not in the snapshot list of $mdPath"))
        require(snap.hasNonNull("manifest-list"),
          s"snapshot $c of $mdPath has no manifest-list (v1 inline layout?) — cannot append")
        val listP = {
          val p0 = snap.get("manifest-list").asText
          if (p0.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:/.*") || p0.startsWith("/")) new Path(p0)
          else new Path(tableDir, p0)
        }
        IcebergImport.readAvro(_ => fs, listP)._1.map(listEntry)
    }
    val newListPath = new Path(metaDir, s"snap-$newSnap-1-append.avro")
    val lw = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.setMeta("format-version", "2")
    lw.create(listSchema, fs.create(newListPath, false))
    prevManifests.foreach(lw.append)
    val lr = new GenericData.Record(listSchema)
    lr.put("manifest_path", fs.makeQualified(manifestPath).toString)
    lr.put("manifest_length", fs.getFileStatus(manifestPath).getLen)
    lr.put("partition_spec_id",
      if (md.has("default-spec-id")) md.get("default-spec-id").asInt else 0)
    lr.put("content", 0)
    lr.put("sequence_number", newSeq)
    lr.put("min_sequence_number", newSeq)
    lr.put("added_snapshot_id", newSnap)
    lr.put("added_files_count", dataFiles.size)
    lr.put("existing_files_count", 0)
    lr.put("deleted_files_count", 0)
    lr.put("added_rows_count", totalRows)
    lr.put("existing_rows_count", 0L)
    lr.put("deleted_rows_count", 0L)
    lw.append(lr)
    lw.close()

    // ---- commit the new metadata version -----------------------------
    val newSnapNode = snaps.addObject()
    newSnapNode.put("snapshot-id", newSnap)
    cur.foreach(c => newSnapNode.put("parent-snapshot-id", c))
    newSnapNode.put("sequence-number", newSeq)
    newSnapNode.put("timestamp-ms", now)
    val summary = newSnapNode.putObject("summary")
    summary.put("operation", "append")
    summaryProps.foreach { case (k, v) => summary.put(k, v) }
    newSnapNode.put("manifest-list", fs.makeQualified(newListPath).toString)
    if (md.has("current-schema-id"))
      newSnapNode.put("schema-id", md.get("current-schema-id").asInt)
    md.put("current-snapshot-id", newSnap)
    md.put("last-sequence-number", newSeq)
    md.put("last-updated-ms", now)
    val slog = md.withArray[ArrayNode]("snapshot-log")
    val sl = slog.addObject()
    sl.put("timestamp-ms", now); sl.put("snapshot-id", newSnap)
    val refs =
      if (md.hasNonNull("refs")) md.get("refs").asInstanceOf[ObjectNode]
      else md.putObject("refs")
    val mainRef =
      if (refs.hasNonNull("main")) refs.get("main").asInstanceOf[ObjectNode]
      else refs.putObject("main")
    mainRef.put("snapshot-id", newSnap)
    if (!mainRef.has("type")) mainRef.put("type", "branch")

    val hint = mdPath.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt
    val newMdPath = new Path(metaDir, s"v${hint + 1}.metadata.json")
    // overwrite=false: a racing append fails HERE, loudly — optimistic
    // concurrency on the version file, never a lost write
    val os = fs.create(newMdPath, false)
    try os.write(om.writeValueAsString(md).getBytes("UTF-8")) finally os.close()
    val hs = fs.create(new Path(metaDir, "version-hint.text"), true)
    try hs.write((hint + 1).toString.getBytes("UTF-8")) finally hs.close()
    newSnap
  }
}
