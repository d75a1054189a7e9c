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
  * [[writeDVDelete]] is FIXTURE/TEST tooling like the Avro/ORC
  * `writeDataFile`s: it collects matched positions driver-side —
  * fine for building v3 fixtures, not a production DML path. */
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
      dvs: Seq[(String, Seq[Long])], snapshotId: Long, sequenceNumber: Long): Seq[DvRef] = {
    val out = fs.create(path, false)
    try {
      out.write(PuffinMagic)
      var offset = 4L
      val refs = dvs.map { case (dataFile, positions) =>
        val blob = encodeDvBlob(positions)
        out.write(blob)
        val r = DvRef(dataFile, offset, blob.length.toLong, positions.distinct.size.toLong)
        offset += blob.length
        r
      }
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

  /** Delete rows matching `predicate` by DELETION VECTOR: one Puffin
    * file, one DV blob per touched data file, one manifest whose
    * entries carry the v3 addressing triple (`referenced_data_file`,
    * `content_offset`, `content_size_in_bytes`), one `delete`
    * snapshot. FIXTURE-GRADE (driver-side position collect) — builds
    * the v3 layouts the READ path and the witness must handle, the
    * same role as the Avro/ORC `writeDataFile`s. Returns the snapshot
    * id, or None when nothing matched. */
  def writeDVDelete(spark: SparkSession, tableDir: String, predicate: String): Option[Long] = {
    val lt = IcebergAppend.load(spark, tableDir)
    require(lt.md.get("format-version").asInt == 3,
      s"deletion vectors are a format-version 3 feature; $tableDir is " +
        s"format-version ${lt.md.get("format-version").asInt} — upgradeToV3 first")
    val lineage = IcebergImport.readWithLineage(spark, tableDir)
    val matched = lineage.filter(predicate)
      .select(col(IcebergImport.LineageFileCol), col(IcebergImport.LineagePosCol))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    if (matched.isEmpty) return None
    val byFile = matched.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toSeq.sortBy(_._1)
    val puffinPath = new Path(new Path(lt.tableDir, "data"),
      s"dv-${lt.newSnap}-${java.util.UUID.randomUUID().toString.take(8)}.puffin")
    val refs = writePuffin(lt.fs, puffinPath, byFile, lt.newSnap, lt.newSeq)

    // the delete manifest: v2's entry schema + the v3 DV addressing
    val entrySchema = new org.apache.avro.Schema.Parser().parse(ManifestEntryV3Avro)
    val dfSchema = entrySchema.getField("data_file").schema()
    val manifestPath = new Path(lt.metaDir,
      s"m-dv-${lt.newSnap}-${java.util.UUID.randomUUID().toString.take(8)}.avro")
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](
        entrySchema))
    w.setMeta("content", "deletes")
    w.setMeta("format-version", "3")
    val specId = IcebergAppend.ensureUnpartitionedSpec(lt)
    w.setMeta("partition-spec-id", specId.toString)
    w.create(entrySchema, lt.fs.create(manifestPath, false))
    var total = 0L
    refs.foreach { r =>
      val dfr = new org.apache.avro.generic.GenericData.Record(dfSchema)
      dfr.put("content", 1) // position deletes — a DV is their v3 carrier
      dfr.put("file_path", lt.fs.makeQualified(puffinPath).toString)
      dfr.put("file_format", "PUFFIN")
      dfr.put("partition",
        new org.apache.avro.generic.GenericData.Record(dfSchema.getField("partition").schema()))
      dfr.put("record_count", r.cardinality)
      dfr.put("file_size_in_bytes", lt.fs.getFileStatus(puffinPath).getLen)
      dfr.put("referenced_data_file", r.referencedDataFile)
      dfr.put("content_offset", r.offset)
      dfr.put("content_size_in_bytes", r.length)
      val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", java.lang.Long.valueOf(lt.newSnap))
      e.put("data_file", dfr)
      w.append(e)
      total += r.cardinality
    }
    w.close()
    Some(IcebergAppend.commitSnapshot(spark, lt,
      Seq(IcebergAppend.NewManifest(manifestPath, content = 1, files = refs.size, rows = total)),
      operation = "delete"))
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
