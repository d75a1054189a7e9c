package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** ICEBERG FORMAT-VERSION 3 DELETION VECTORS — Puffin-stored roaring
  * bitmaps, decoded and encoded FROM THE PUBLIC SPECS with no new
  * dependency (the same jar-free posture as the Avro manifest codec):
  *
  *  - Puffin file format (Iceberg's spec): `PFA1` magic, blobs,
  *    footer = magic + JSON payload + payload-size (4 LE) + flags (4)
  *    + magic. Readers of DVs never need the footer — the manifest's
  *    `content_offset`/`content_size_in_bytes` address the blob
  *    directly — but the writer emits a complete, spec-valid file.
  *  - `deletion-vector-v1` blob (Iceberg v3 spec): a 4-byte big-endian
  *    length of (magic + vector), the 4-byte magic `D1 D3 39 64`, the
  *    vector, and a 4-byte big-endian CRC-32 of (magic + vector).
  *  - The vector: the 64-bit RoaringBitmap "portable" serialization —
  *    an 8-byte little-endian map count, then per map a 4-byte
  *    little-endian high-32 key followed by a standard 32-bit roaring
  *    bitmap (cookie 12346/12347, array / bitmap / run containers).
  *    The decoder reads all three container kinds; the encoder emits
  *    array/bitmap containers under cookie 12346 (no runs) — always
  *    spec-legal, never wrong, at most suboptimal.
  *
  * Scale shape: DV decode happens INSIDE executor tasks (the
  * applyDeletes DV branch parallelizes over DV entries — one blob is
  * one referenced data file's positions), the same
  * mapPartitions-at-the-codec-boundary rule as the multimodal codecs.
  * Since r19 the WRITE side is executor-side too ([[writeDvDelete]]):
  * positions shuffle by file, tasks union prior DVs and encode/write
  * the Puffin blobs, and the driver sees only one address row per
  * touched data file — the production v3 DML path
  * ([[IcebergDml.deleteWhere]]'s position strategy routes here on v3
  * tables, honoring the spec's "position deletes must be DVs in v3"),
  * with prior DV entries SUPERSEDED in the same commit so the
  * at-most-one-DV-per-data-file invariant holds. */
object PuffinDeletionVectors {

  private val PuffinMagic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"
  private val DvMagic = Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)

  // ------------------------------------------------------------------
  // 64-bit roaring "portable" serialization
  // ------------------------------------------------------------------

  /** Encode sorted distinct positions as the portable 64-bit roaring
    * bitmap serialization. */
  private[io] def encodeRoaring64(positions: Seq[Long]): Array[Byte] = {
    require(positions.nonEmpty, "a deletion vector must delete at least one position")
    val sorted = positions.distinct.sorted
    sorted.foreach(p => require(p >= 0, s"negative position $p"))
    val byHigh = sorted.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    // 8-byte LE map count
    le32(byHigh.size); le32(0)
    byHigh.foreach { case (high, ps) =>
      le32(high)
      // one 32-bit roaring bitmap: cookie 12346 (no runs) + offsets
      val lows = ps.map(p => (p & 0xFFFFFFFFL).toInt)
      val byKey = lows.groupBy(v => (v >>> 16) & 0xFFFF).toSeq.sortBy(_._1)
      le32(12346) // SERIAL_COOKIE_NO_RUNCONTAINER
      le32(byKey.size)
      byKey.foreach { case (key, vs) => le16(key); le16(vs.size - 1) }
      // container byte offsets, relative to the start of this bitmap
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.size <= 4096) 2 * vs.size else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.size <= 4096) vs.foreach(v => le16(v & 0xFFFF))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val lo = v & 0xFFFF
            words(lo >>> 6) |= (1L << (lo & 63))
          }
          val bb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
          words.foreach(bb.putLong)
          out.write(bb.array())
        }
      }
    }
    out.toByteArray
  }

  /** Decode the portable 64-bit roaring serialization to sorted
    * positions. Reads array, bitmap AND run containers (cookies 12346
    * and 12347) — foreign writers use all three. */
  private[io] def decodeRoaring64(bytes: Array[Byte]): Seq[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val mapCount = bb.getLong
    require(mapCount >= 0 && mapCount <= Int.MaxValue, s"implausible roaring64 map count $mapCount")
    val out = Seq.newBuilder[Long]
    (0 until mapCount.toInt).foreach { _ =>
      val high = (bb.getInt.toLong & 0xFFFFFFFFL) << 32
      val cookie = bb.getInt
      val hasRuns = (cookie & 0xFFFF) == 12347
      require(hasRuns || cookie == 12346,
        s"not a roaring bitmap (cookie $cookie)")
      val n = if (hasRuns) (cookie >>> 16) + 1 else bb.getInt
      val runFlags: Array[Byte] =
        if (hasRuns) { val f = new Array[Byte]((n + 7) / 8); bb.get(f); f }
        else Array.emptyByteArray
      def isRun(i: Int): Boolean = hasRuns && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
      val keys = new Array[Int](n)
      val cards = new Array[Int](n)
      (0 until n).foreach { i =>
        keys(i) = bb.getShort & 0xFFFF
        cards(i) = (bb.getShort & 0xFFFF) + 1
      }
      // offsets present for cookie 12346 always; for 12347 only when
      // n >= 4 (the spec's NO_OFFSET_THRESHOLD) — skipped either way,
      // containers are laid out in key order right after
      if (!hasRuns || n >= 4) bb.position(bb.position() + 4 * n)
      (0 until n).foreach { i =>
        val base = high | ((keys(i).toLong & 0xFFFF) << 16)
        if (isRun(i)) {
          val nRuns = bb.getShort & 0xFFFF
          (0 until nRuns).foreach { _ =>
            val start = bb.getShort & 0xFFFF
            val len = bb.getShort & 0xFFFF
            (start to (start + len)).foreach(v => out += (base | v))
          }
        } else if (cards(i) <= 4096) {
          (0 until cards(i)).foreach(_ => out += (base | (bb.getShort & 0xFFFF)))
        } else {
          (0 until 1024).foreach { w =>
            val word = bb.getLong
            var bits = word
            while (bits != 0) {
              val b = java.lang.Long.numberOfTrailingZeros(bits)
              out += (base | (w * 64 + b))
              bits &= bits - 1
            }
          }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // deletion-vector-v1 blob + Puffin framing
  // ------------------------------------------------------------------

  /** The `deletion-vector-v1` blob bytes for sorted positions. */
  private[io] def encodeDvBlob(positions: Seq[Long]): Array[Byte] = {
    val vector = encodeRoaring64(positions)
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vector)
    val bb = ByteBuffer.allocate(4 + 4 + vector.length + 4).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(4 + vector.length) // combined length of magic + vector
    bb.put(DvMagic)
    bb.put(vector)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Decode one `deletion-vector-v1` blob (as [[encodeDvBlob]] and the
    * v3 spec lay it out) to sorted positions; verifies magic and CRC. */
  private[io] def decodeDvBlob(blob: Array[Byte]): Seq[Long] = {
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val len = bb.getInt
    require(len == blob.length - 8,
      s"deletion-vector blob length $len does not frame ${blob.length} bytes")
    val magic = new Array[Byte](4); bb.get(magic)
    require(java.util.Arrays.equals(magic, DvMagic),
      s"bad deletion-vector magic ${magic.map(b => f"$b%02x").mkString(" ")}")
    val vector = new Array[Byte](blob.length - 12); bb.get(vector)
    val stored = bb.getInt
    val crc = new java.util.zip.CRC32()
    crc.update(DvMagic); crc.update(vector)
    require(crc.getValue.toInt == stored,
      f"deletion-vector CRC mismatch: stored 0x$stored%08x computed 0x${crc.getValue.toInt}%08x")
    decodeRoaring64(vector)
  }

  /** Positions a manifest-addressed DV deletes: seek `offset`, read
    * `size` bytes, decode — never touches the Puffin footer (the
    * manifest coordinates are the fast path the spec designed). */
  private[io] def readPositions(fs: FileSystem, puffin: Path,
      offset: Long, size: Long): Seq[Long] = {
    val in = fs.open(puffin)
    try {
      in.seek(offset)
      val blob = new Array[Byte](size.toInt)
      in.readFully(blob)
      decodeDvBlob(blob)
    } finally in.close()
  }

  /** One written DV's addressing: where its blob landed. */
  private[io] final case class DvRef(referencedDataFile: String, offset: Long,
      length: Long, cardinality: Long)

  /** Write one spec-complete Puffin file holding one DV blob per
    * referenced data file; returns each blob's address. */
  private[io] def writePuffin(fs: FileSystem, path: Path,
      dvs: Seq[(String, Seq[Long])], snapshotId: Long, sequenceNumber: Long): Seq[DvRef] =
    writePuffinStreaming(fs, path, dvs.iterator, snapshotId, sequenceNumber)

  /** Streaming twin of [[writePuffin]]: consumes the per-file groups
    * one at a time so a TASK writing many files' blobs holds at most
    * ONE file's positions in memory (the executor-side DML path's
    * memory contract) plus the tiny address list. */
  private[io] def writePuffinStreaming(fs: FileSystem, path: Path,
      dvs: Iterator[(String, Seq[Long])], snapshotId: Long, sequenceNumber: Long): Seq[DvRef] = {
    val out = fs.create(path, false)
    try {
      out.write(PuffinMagic)
      var offset = 4L
      val refsB = Seq.newBuilder[DvRef]
      dvs.foreach { case (dataFile, positions) =>
        val blob = encodeDvBlob(positions)
        out.write(blob)
        refsB += DvRef(dataFile, offset, blob.length.toLong, positions.distinct.size.toLong)
        offset += blob.length
      }
      val refs = refsB.result()
      val blobsJson = refs.map { r =>
        s"""{"type":"deletion-vector-v1","fields":[],"snapshot-id":$snapshotId,""" +
          s""""sequence-number":$sequenceNumber,"offset":${r.offset},"length":${r.length},""" +
          s""""properties":{"referenced-data-file":"${LakeHttp.jesc(r.referencedDataFile)}",""" +
          s""""cardinality":"${r.cardinality}"}}"""
      }.mkString(",")
      val payload =
        s"""{"blobs":[$blobsJson],"properties":{"created-by":"graft"}}"""
          .getBytes("UTF-8")
      out.write(PuffinMagic)
      out.write(payload)
      val tail = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      out.write(tail.array())
      out.write(Array[Byte](0, 0, 0, 0)) // flags: footer payload uncompressed
      out.write(PuffinMagic)
      refs
    } finally out.close()
  }

  // ------------------------------------------------------------------
  // v3 fixture tooling
  // ------------------------------------------------------------------

  /** Upgrade a v2 table's metadata to format-version 3. Row lineage is
    * NOT materialized (`next-row-id` starts at 0 and this engine
    * null-fills lineage columns — the documented v3 posture; see the
    * import's scaladoc); everything else of v2 is already v3-legal. */
  def upgradeToV3(spark: SparkSession, tableDir: String): Unit = {
    val lt = IcebergAppend.load(spark, tableDir)
    require(lt.md.get("format-version").asInt <= 3, "already past v3")
    lt.md.put("format-version", 3)
    if (!lt.md.has("next-row-id")) lt.md.put("next-row-id", 0L)
    val hint = IcebergImport.writableVersionOf(lt.mdPath)
    val newMdPath = new Path(lt.metaDir, s"v${hint + 1}.metadata.json")
    val os = lt.fs.create(newMdPath, false)
    try os.write(lt.om.writeValueAsString(lt.md).getBytes("UTF-8")) finally os.close()
    val hs = lt.fs.create(new Path(lt.metaDir, "version-hint.text"), true)
    try hs.write((hint + 1).toString.getBytes("UTF-8")) finally hs.close()
  }

  /** Delete rows matching `predicate` by DELETION VECTOR — the v3 DML
    * face ([[IcebergDml.deleteWhere]] routes its position strategy here
    * on v3 tables). PRODUCTION-GRADE since r19: positions are grouped,
    * unioned with prior DVs, encoded and written INSIDE executor tasks
    * ([[writeDvDelete]]); the driver only ever sees one address row per
    * touched data file. Returns the snapshot id, or None when nothing
    * matched. */
  def writeDVDelete(spark: SparkSession, tableDir: String, predicate: String): Option[Long] = {
    val lt = IcebergAppend.load(spark, tableDir)
    require(lt.md.get("format-version").asInt == 3,
      s"deletion vectors are a format-version 3 feature; $tableDir is " +
        s"format-version ${lt.md.get("format-version").asInt} — upgradeToV3 first")
    val positions = IcebergImport.readWithLineage(spark, tableDir)
      .filter(predicate)
      .select(col(IcebergImport.LineageFileCol), col(IcebergImport.LineagePosCol))
    if (positions.isEmpty) return None
    val (m, replaced) = writeDvDelete(spark, lt, positions)
    Some(IcebergAppend.commitSnapshot(spark, lt, Seq(m),
      operation = "delete", replacePrev = replaced))
  }

  /** EXECUTOR-SIDE deletion-vector write — the v3 DML core. `positions`
    * is a (file, pos) frame (the lineage columns); nothing row-sized
    * ever reaches the driver:
    *
    *  1. positions repartition BY FILE and sort (file, pos) within
    *     partitions, so each task sees whole files as contiguous runs;
    *  2. each task streams its runs: per file it UNIONS the file's
    *     prior DV positions (decoded in the task — the v3 invariant is
    *     at most ONE DV per data file, and the new DV must carry every
    *     previously deleted position), encodes the roaring64 blob, and
    *     appends it to ONE Puffin file per task (memory: one file's
    *     positions at a time, [[writePuffinStreaming]]);
    *  3. the driver collects only the (puffin, file, offset, size,
    *     cardinality) address rows — O(touched files), metadata-sized —
    *     and writes the delete manifest;
    *  4. prior delete manifests still carrying a LIVE DV entry for a
    *     re-vectored file are REWRITTEN: that entry marked DELETED
    *     (status 2), every other entry carried EXISTING (status 0) with
    *     its effective sequence number made explicit (a rewritten
    *     manifest enters the list at the NEW sequence, so inheritance
    *     would mis-sequence them). Without this, two DV deletes
    *     touching one file leave two live DVs and Apache Iceberg
    *     readers reject the table (the r18 ADVICE medium finding).
    *
    * Returns the new delete manifest plus the original-path →
    * rewritten-manifest substitutions for
    * [[IcebergAppend.commitSnapshot]]'s `replacePrev`. */
  private[io] def writeDvDelete(spark: SparkSession, lt: IcebergAppend.Loaded,
      positions: org.apache.spark.sql.DataFrame)
      : (IcebergAppend.NewManifest, Map[String, IcebergAppend.ReplacedManifest]) = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // ---- prior delete inventory at the commit parent (metadata-sized)
    val priorDeletes: Seq[(Int, String, Option[(String, Long, Long)])] =
      if (lt.parent.isEmpty) Nil
      else IcebergImport.deleteFileInfo(spark, lt.tableDir, lt.parent)
    val priorDv: Seq[(String, String, Long, Long)] = priorDeletes.collect {
      case (1, puffin, Some((ref, off, size))) => (ref, puffin, off, size)
    }
    val priorBySpelling: Map[String, Seq[(String, Long, Long)]] =
      priorDv.groupBy(_._1).toSeq.flatMap { case (ref, blobs) =>
        IcebergImport.spellings(ref).map(_ -> blobs.map(b => (b._2, b._3, b._4)))
      }.toMap
    val conf = new IcebergAvroData.SerializableConf(spark.sparkContext.hadoopConfiguration)
    val dataDir = lt.fs.makeQualified(new Path(lt.tableDir, "data")).toString
    val snap = lt.newSnap
    val seqN = lt.newSeq
    val priorB = spark.sparkContext.broadcast(priorBySpelling)

    val fileC = IcebergImport.LineageFileCol
    val posC = IcebergImport.LineagePosCol
    // ---- v3 completeness: fold v2-vintage POSITION-DELETE parquet ----
    // The spec requires a DV to carry EVERY deleted position of its
    // data file — upstream v3 readers ignore position-delete files for
    // files that have a DV, so a DV missing the pre-upgrade parquet
    // positions would RESURRECT those rows there (graft's own
    // union-based reader masks the hole, which is exactly why it must
    // be closed at write time). Prior positions for TOUCHED files fold
    // in distributed: spellings normalize through a broadcast of the
    // parent's data-file lookup (driver-sized), the touched-file
    // restriction is a semi-join, never a collect.
    val priorPosFiles: Seq[String] = priorDeletes.collect { case (1, path, None) => path }
    val basePositions = positions
      .select(col(fileC).cast("string"), col(posC).cast("long"))
    val allPositions =
      if (priorPosFiles.isEmpty) basePositions
      else {
        val spellRows = IcebergImport.dataFiles(spark, lt.tableDir, lt.parent)
          .flatMap(p => IcebergImport.spellings(p).map(_ -> p))
        val spellDf = spark.createDataFrame(spellRows).toDF("__sp", "__canon")
        // BOTH sides normalize to the canonical resolved path, or a
        // `file:/` vs `file:///` spelling split would give one data
        // file two DV groups (and two entries — the invariant broken)
        val baseCanon = basePositions
          .join(org.apache.spark.sql.functions.broadcast(spellDf),
            col(fileC) === col("__sp"), "left")
          .select(org.apache.spark.sql.functions.coalesce(col("__canon"), col(fileC)).as(fileC),
            col(posC))
        val touched = baseCanon.select(col(fileC)).distinct()
        val priorPos = spark.read.parquet(priorPosFiles: _*)
          .select(col("file_path").cast("string").as("__sp"), col("pos").cast("long").as(posC))
          .join(org.apache.spark.sql.functions.broadcast(spellDf), Seq("__sp"))
          .select(col("__canon").as(fileC), col(posC))
          .join(touched, Seq(fileC), "left_semi")
        baseCanon.unionByName(priorPos)
      }

    // ---- 1+2: per-task Puffin writes over the shuffled positions ----
    val shaped = allPositions
      .repartition(col(fileC))
      .sortWithinPartitions(col(fileC), col(posC))
      .as[(String, Long)]
    val written: Seq[(String, String, Long, Long, Long)] = shaped.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        // the structural no-driver-materialization guarantee: this
        // closure refuses to run outside a task
        require(tc != null, "DV encode must run inside an executor task, never on the driver")
        val pPath = new Path(s"$dataDir/dv-$snap-p${tc.partitionId()}-" +
          s"${java.util.UUID.randomUUID().toString.take(8)}.puffin")
        val fsx = pPath.getFileSystem(conf.value)
        val buf = it.buffered
        val grouped: Iterator[(String, Seq[Long])] = new Iterator[(String, Seq[Long])] {
          def hasNext: Boolean = buf.hasNext
          def next(): (String, Seq[Long]) = {
            val f = buf.head._1
            val b = Seq.newBuilder[Long]
            while (buf.hasNext && buf.head._1 == f) b += buf.next()._2
            val prior = priorB.value.getOrElse(f, Nil).flatMap { case (pf, off, sz) =>
              val pp = new Path(pf)
              PuffinDeletionVectors.readPositions(pp.getFileSystem(conf.value), pp, off, sz)
            }
            (f, (b.result() ++ prior).distinct.sorted)
          }
        }
        val refs = PuffinDeletionVectors.writePuffinStreaming(fsx, pPath, grouped, snap, seqN)
        val q = fsx.makeQualified(pPath).toString
        refs.iterator.map(r => (q, r.referencedDataFile, r.offset, r.length, r.cardinality))
      }
    }.collect().toSeq // one address row per TOUCHED FILE — never positions
    require(written.nonEmpty, s"DV delete on ${lt.tableDir} wrote no blobs — caller must " +
      "check positions.isEmpty first")

    // ---- 3: the delete manifest over the collected addresses ---------
    val entrySchema = new org.apache.avro.Schema.Parser().parse(ManifestEntryV3Avro)
    val dfSchema = entrySchema.getField("data_file").schema()
    val manifestPath = new Path(lt.metaDir,
      s"m-dv-$snap-${java.util.UUID.randomUUID().toString.take(8)}.avro")
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](
        entrySchema))
    w.setMeta("content", "deletes")
    w.setMeta("format-version", "3")
    val specId = IcebergAppend.ensureUnpartitionedSpec(lt)
    w.setMeta("partition-spec-id", specId.toString)
    w.create(entrySchema, lt.fs.create(manifestPath, false))
    var total = 0L
    val puffinLen = scala.collection.mutable.Map.empty[String, Long]
    written.sortBy(w0 => (w0._1, w0._3)).foreach { case (puffin, refFile, off, len, card) =>
      val dfr = new org.apache.avro.generic.GenericData.Record(dfSchema)
      dfr.put("content", 1) // position deletes — a DV is their v3 carrier
      dfr.put("file_path", puffin)
      dfr.put("file_format", "PUFFIN")
      dfr.put("partition",
        new org.apache.avro.generic.GenericData.Record(dfSchema.getField("partition").schema()))
      dfr.put("record_count", card)
      dfr.put("file_size_in_bytes",
        puffinLen.getOrElseUpdate(puffin, lt.fs.getFileStatus(new Path(puffin)).getLen))
      dfr.put("referenced_data_file", refFile)
      dfr.put("content_offset", off)
      dfr.put("content_size_in_bytes", len)
      val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", java.lang.Long.valueOf(snap))
      e.put("data_file", dfr)
      w.append(e)
      total += card
    }
    w.close()
    val m = IcebergAppend.NewManifest(manifestPath, content = 1,
      files = written.size, rows = total)

    // ---- 4: supersede prior DV entries for re-vectored files ---------
    val touched: Set[String] = written.flatMap(w0 => IcebergImport.spellings(w0._2)).toSet
    (m, supersedePriorDvs(lt, touched))
  }

  /** Rewrite every carried-forward DELETE manifest that still holds a
    * LIVE DV entry for a file in `touched`: that entry → status 2
    * (deleted by this snapshot), all other entries → carried with their
    * effective sequence numbers made EXPLICIT (existing entries keep
    * status, added become EXISTING). Rewrites use each manifest's OWN
    * writer schema (deep copies), so foreign richer manifests pass
    * through field-for-field. Returns original-list-path → replacement. */
  private def supersedePriorDvs(lt: IcebergAppend.Loaded,
      touched: Set[String]): Map[String, IcebergAppend.ReplacedManifest] = {
    import IcebergImport.fieldOpt
    val parent = lt.parent.getOrElse(return Map.empty)
    val snaps = lt.md.get("snapshots")
    val snapNode = (0 until snaps.size).map(snaps.get)
      .find(_.get("snapshot-id").asLong == parent).getOrElse(return Map.empty)
    if (!snapNode.hasNonNull("manifest-list")) return Map.empty
    val listP = IcebergImport.resolve(lt.tableDir, snapNode.get("manifest-list").asText)
    val out = Map.newBuilder[String, IcebergAppend.ReplacedManifest]
    IcebergImport.readAvro(_ => lt.fs, listP)._1.foreach { lrec =>
      val content = fieldOpt(lrec, "content").map(_.asInstanceOf[Int]).getOrElse(0)
      if (content == 1) {
        val mPathRaw = lrec.get("manifest_path").toString
        val mPath = IcebergImport.resolve(lt.tableDir, mPathRaw)
        val listSeq = fieldOpt(lrec, "sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L)
        val (entries, meta) = IcebergImport.readAvro(_ => lt.fs, mPath)
        def refOf(e: org.apache.avro.generic.GenericRecord): Option[String] = {
          val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          for {
            _ <- fieldOpt(df, "content_offset")
            ref <- fieldOpt(df, "referenced_data_file").map(_.toString)
          } yield ref
        }
        def statusOf(e: org.apache.avro.generic.GenericRecord): Int =
          fieldOpt(e, "status").map(_.asInstanceOf[Int]).getOrElse(1)
        val hit = entries.exists(e => statusOf(e) != 2 &&
          refOf(e).exists(r => IcebergImport.spellings(r).exists(touched.contains)))
        if (hit) {
          val schema = entries.head.getSchema
          val newPath = new Path(lt.metaDir, s"m-dvsupersede-${lt.newSnap}-" +
            s"${java.util.UUID.randomUUID().toString.take(8)}.avro")
          val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
            new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](
              schema))
          meta.foreach { case (k, v) => w.setMeta(k, v) }
          w.create(schema, lt.fs.create(newPath, false))
          var (nEx, nDel) = (0, 0)
          var (rEx, rDel) = (0L, 0L)
          var minSeq = Long.MaxValue
          entries.foreach { e =>
            val copy = org.apache.avro.generic.GenericData.get()
              .deepCopy(schema, e).asInstanceOf[org.apache.avro.generic.GenericRecord]
            val st = statusOf(e)
            val effSeq = fieldOpt(e, "sequence_number").map(_.asInstanceOf[Long])
              .getOrElse(listSeq)
            val rows = fieldOpt(e.get("data_file")
              .asInstanceOf[org.apache.avro.generic.GenericRecord], "record_count")
              .map(_.asInstanceOf[Long]).getOrElse(0L)
            val supersede = st != 2 &&
              refOf(e).exists(r => IcebergImport.spellings(r).exists(touched.contains))
            // a rewritten manifest enters the list at the NEW sequence:
            // every entry's effective sequence must be explicit or the
            // v2 inheritance rule would re-stamp it wrongly — and the
            // spec scopes inheritance to ADDED entries only, so carried
            // EXISTING/DELETED rows need the FILE sequence explicit too
            // (field-id 4; null would read as undefined to strict readers)
            val effFileSeq = fieldOpt(e, "file_sequence_number")
              .map(_.asInstanceOf[Long]).getOrElse(listSeq)
            copy.put("sequence_number", java.lang.Long.valueOf(effSeq))
            copy.put("file_sequence_number", java.lang.Long.valueOf(effFileSeq))
            if (supersede) {
              copy.put("status", 2) // DELETED: superseded by the new DV
              copy.put("snapshot_id", java.lang.Long.valueOf(lt.newSnap))
              nDel += 1; rDel += rows
            } else if (st != 2) {
              copy.put("status", 0) // EXISTING
              nEx += 1; rEx += rows
              minSeq = math.min(minSeq, effSeq)
            } else { nDel += 1; rDel += rows }
            w.append(copy)
          }
          w.close()
          out += mPathRaw -> IcebergAppend.ReplacedManifest(newPath, nEx, rEx, nDel, rDel,
            if (minSeq == Long.MaxValue) listSeq else minSeq)
        }
      }
    }
    out.result()
  }

  /** [[IcebergExport.ManifestEntryAvro]] + the v3 DV addressing triple
    * (spec field ids 143/144/145). */
  private[io] val ManifestEntryV3Avro: String =
    IcebergExport.ManifestEntryAvro.replace(
      """{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}""",
      """{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135},
        |{"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
        |{"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
        |{"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}""".stripMargin)
}
