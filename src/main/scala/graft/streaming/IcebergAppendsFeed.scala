package graft.streaming

import graft.io.{IcebergChanges, IcebergImport}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

/** STREAMING READ of a FOREIGN Iceberg table's appends — the read-side
  * twin of the foreign sinks (`icebergAppendSink`/`icebergMergeSink`)
  * and the foreign-table counterpart of [[ChangeFeed]]: a Structured
  * Streaming SOURCE that tails an Iceberg table's snapshot lineage and
  * emits each new APPEND snapshot's added rows as a micro-batch —
  * Iceberg's own Spark streaming-read design, jar-free. The
  * reference's whole pipeline is daily incremental consumption of
  * Iceberg tables (`/root/reference/spark/jobs/job_gold.py:71-88`
  * reads what silver landed today); a consumer migrating that pattern
  * to push-based consumption reads exactly this source.
  *
  * Built on Spark's V1 [[Source]] contract (like `FileStreamSource`
  * and [[ChangeFeedSource]]), so the stock micro-batch engine does all
  * offset bookkeeping, checkpointing, recovery, and
  * `Trigger.AvailableNow` semantics. An OFFSET is a PAIR: an ordinal
  * into the main-branch ancestor chain ([[IcebergImport.lineage]],
  * oldest first) PLUS the snapshot id AT that ordinal — the anchor.
  * Appends only ever extend the chain's tail, so within one history
  * the ordinal is stable; but `expireSnapshots` trims the chain's
  * FRONT (dropping expired snapshots and clearing dangling parent
  * pointers), which shifts every retained ordinal down. The anchor id
  * makes that safe: each offset RE-RESOLVES against the live chain by
  * snapshot id (Iceberg's own SparkMicroBatchStream anchors offsets to
  * snapshot ids the same way) — routine expiry of already-consumed
  * history re-anchors transparently, while a genuinely rewritten or
  * over-expired history (the anchor id is gone) fails loudly, never
  * silently re-reading different data.
  *
  * The CONFIGURED START is pinned durably: on first creation the
  * source persists its resolved starting position (ordinal + anchor)
  * under the stream's checkpoint metadata dir, and every later
  * incarnation reads it back. Without this, a default-start
  * (head-at-start) stream restarted from a checkpoint would recompute
  * "head" as the CURRENT head and silently skip every snapshot
  * committed while the stream was down.
  *
  * Range semantics are [[IcebergImport.appendsBetween]]'s, stated
  * there: `append` snapshots emit their added rows, `replace`
  * (compaction) snapshots emit nothing and advance the offset,
  * `overwrite`/`delete` fail the stream loudly — an append-only view
  * cannot represent removed rows; restart the stream past the
  * offending snapshot (`startingSnapshot`) after auditing it.
  * For a stream that must survive DML snapshots as row-level diffs,
  * read the CHANGELOG source instead: `format("graft-iceberg-changes")`
  * ([[IcebergChangesProvider]]) — same offsets, same options, but
  * `overwrite`/`delete` snapshots become `_change_type` insert/delete
  * rows per [[graft.io.IcebergChanges]].
  *
  * Output schema = the table's CURRENT columns plus
  *   `_snapshot_id` LONG      — the snapshot whose commit added the row
  *   `_commit_timestamp` TS   — that snapshot's commit time
  *
  * Options (both sources):
  *   `dir`               — the table root (contains `metadata/`). Required.
  *   `startingSnapshot`  — `"earliest"` (the whole retained lineage),
  *                         an explicit snapshot id (changes strictly
  *                         AFTER it), or the default: the head at
  *                         FIRST stream start (only new commits). All
  *                         three are durable across restarts on the
  *                         same checkpoint (persisted at first start).
  *   `maxSnapshotsPerBatch` — cap snapshots per micro-batch during
  *                         catch-up (rate limit; default unbounded).
  */
object IcebergAppendsFeed {
  val SnapshotIdCol = "_snapshot_id"
  val CommitTimestampCol = "_commit_timestamp"

  /** Anchor id of ordinal 0 — "before the whole retained lineage";
    * there is no snapshot there to anchor to. */
  private[streaming] val OriginAnchor: Long = -1L

  /** The table schema STRIPPED of `parquet.field.id` field metadata:
    * the feed emits engine rows, not Iceberg data files — leaking
    * field ids into a downstream parquet sink would make its landing
    * dir a mix of id-carrying and id-less footers, which an
    * id-resolving reader then refuses. */
  private[streaming] def dataSchema(spark: SparkSession, dir: String): StructType =
    StructType(IcebergImport.tableSchema(spark, dir).fields
      .map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))

  private[streaming] def feedSchema(data: StructType): StructType =
    StructType(data.fields)
      .add(SnapshotIdCol, LongType, nullable = false)
      .add(CommitTimestampCol, TimestampType, nullable = true)
}

/** An offset into an Iceberg lineage: `ordinal` snapshots of the main
  * chain are consumed, the newest of them being snapshot
  * `snapshotId` (or [[IcebergAppendsFeed.OriginAnchor]] at ordinal 0).
  * The id is the durable half — ordinals are re-derived from it after
  * retention trims the chain (see the class doc). */
private[streaming] final case class AppendsOffset(ordinal: Int, snapshotId: Long)
    extends OffsetV1 {
  override def json: String = s"""{"ordinal":$ordinal,"snapshotId":$snapshotId}"""
}

private[streaming] object AppendsOffset {
  /** Decode any offset the engine can hand back: this source's pair
    * json, a replayed [[AppendsOffset]] instance, or a legacy plain
    * long (pre-anchor checkpoints — ordinal trusted as-is). */
  def decode(o: OffsetV2): AppendsOffset = o match {
    case a: AppendsOffset => a
    case other =>
      val s = other.json.trim
      if (s.startsWith("{")) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
        AppendsOffset(node.get("ordinal").asInt, node.get("snapshotId").asLong)
      } else AppendsOffset(s.toInt, LegacyAnchor)
  }

  /** "No anchor recorded" — a legacy long offset; resolution trusts
    * the ordinal (the pre-r18 behavior) instead of refusing. */
  val LegacyAnchor: Long = Long.MinValue
}

/** `spark.readStream.format("graft-iceberg-appends")` provider
  * (registered via META-INF/services). */
final class IcebergAppendsProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-appends"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("dir", throw new IllegalArgumentException(
      s"${shortName()} needs dir=<iceberg table root>"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      s"${shortName()} derives its schema from the table; don't supply one")
    val dir = dirOf(parameters)
    (s"${shortName()}[$dir]",
      IcebergAppendsFeed.feedSchema(IcebergAppendsFeed.dataSchema(sqlContext.sparkSession, dir)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergAppendsSource(sqlContext.sparkSession, dirOf(parameters), parameters, metadataPath)
}

/** `spark.readStream.format("graft-iceberg-changes")` provider — the
  * CHANGELOG twin: DML snapshots stream as `_change_type` rows instead
  * of failing (see [[graft.io.IcebergChanges]]). */
final class IcebergChangesProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-changes"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("dir", throw new IllegalArgumentException(
      s"${shortName()} needs dir=<iceberg table root>"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      s"${shortName()} derives its schema from the table; don't supply one")
    val dir = dirOf(parameters)
    (s"${shortName()}[$dir]",
      IcebergChanges.feedSchema(IcebergChanges.dataSchema(sqlContext.sparkSession, dir)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergChangesSource(sqlContext.sparkSession, dirOf(parameters), parameters, metadataPath)
}

/** The shared lineage-tailing machinery of the appends and changelog
  * sources: id-anchored offsets, the persisted configured start,
  * admission control, AvailableNow draining (see the module doc).
  * Subclasses supply only the schema and the rows a consumed ordinal
  * range emits. */
private[streaming] abstract class LineageTailSource(
    spark: SparkSession,
    dir: String,
    parameters: Map[String, String],
    metadataPath: String
) extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  import IcebergAppendsFeed.OriginAnchor

  /** Rows of the half-open ordinal range (fromOrd, toOrd] against the
    * given live chain. Must be deterministic for a fixed chain slice
    * (replayed batches re-read the same snapshots' files). */
  protected def emitRange(chain: Seq[Long], fromOrd: Int, toOrd: Int): DataFrame

  protected final def emptyFeed: DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)

  private val maxSnapshotsPerBatch: Int =
    parameters.get("maxSnapshotsPerBatch").map { s =>
      val n = s.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"maxSnapshotsPerBatch must be a positive int, got '$s'"))
      require(n > 0, s"maxSnapshotsPerBatch must be positive, got $n")
      n
    }.getOrElse(Int.MaxValue)

  /** The position the feed starts AFTER (those snapshots' rows are
    * not emitted) — computed from `startingSnapshot` on the FIRST
    * start, persisted under the checkpoint's source-metadata dir, and
    * read back by every restart: a default (head-at-start) floor must
    * not re-pin to the head current at RESTART time, or every snapshot
    * committed during downtime would be skipped silently. */
  private val starting: AppendsOffset = {
    val startFile = new Path(metadataPath, "graft-appends-start.json")
    val fs = startFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(startFile)) {
      val in = fs.open(startFile)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      AppendsOffset.decode(new OffsetV2 { override def json: String = s })
    } else {
      val configured: AppendsOffset = parameters.get("startingSnapshot") match {
        case Some("earliest") => AppendsOffset(0, OriginAnchor)
        case Some(s) =>
          val id = s.toLongOption.getOrElse(throw new IllegalArgumentException(
            s"startingSnapshot must be 'earliest' or a snapshot id, got '$s'"))
          val chain = IcebergImport.lineage(spark, dir)
          val i = chain.indexOf(id)
          require(i >= 0,
            s"startingSnapshot $id is not on the main lineage of $dir " +
              s"(have: ${chain.mkString(", ")})")
          AppendsOffset(i + 1, id)
        case None =>
          val chain = IcebergImport.lineage(spark, dir)
          if (chain.isEmpty) AppendsOffset(0, OriginAnchor)
          else AppendsOffset(chain.length, chain.last)
      }
      val out = fs.create(startFile, false) // one writer per checkpoint — the engine's contract
      try out.write(configured.json.getBytes("UTF-8")) finally out.close()
      configured
    }
  }

  /** Highest position handed to the engine THIS RUN — intra-run pacing
    * only (catch-up advances batch by batch); the durable floor is the
    * checkpointed offset / the persisted start, never this. Kept as an
    * ANCHORED offset, not a raw ordinal: `expireSnapshots` trimming the
    * chain's front mid-run shifts every retained ordinal down, and a
    * raw ordinal stamped against the old chain would sit above the new
    * head forever — the source would emit nothing until the chain
    * regrew past the stale value (a silent stall). The anchor re-resolves
    * like the checkpointed offsets do. */
  @volatile private var lastEnd: Option[AppendsOffset] = None

  /** `lastEnd`'s ordinal in the LIVE chain: re-resolved by anchor id;
    * -1 when unset OR when the anchor has been expired — in that case
    * the durable floor (checkpointed offset / persisted start) governs
    * alone, which is exactly the reset ADVICE asks for (an expired
    * anchor means the engine has long since checkpointed past it or
    * the checkpointed offset itself will refuse loudly). */
  private def lastEndOrdinal(chain: Seq[Long]): Int = lastEnd match {
    case None => -1
    case Some(o) =>
      if (o.snapshotId == OriginAnchor) 0
      else {
        val i = chain.indexOf(o.snapshotId)
        if (i >= 0) i + 1 else -1
      }
  }

  /** `Trigger.AvailableNow`: the target head is PINNED here — the
    * stream drains up to it (paced by `maxSnapshotsPerBatch`) and
    * terminates, exactly the `FileStreamSource` contract. */
  @volatile private var availableNowTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(IcebergImport.lineage(spark, dir).length)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Re-anchor an offset against the LIVE chain: the ordinal is valid
    * only for the history it was stamped in; the snapshot id is the
    * durable identity. Returns the offset's ordinal in `chain`. */
  private def resolve(chain: Seq[Long], o: AppendsOffset, what: String): Int =
    o.snapshotId match {
      case OriginAnchor => 0
      case AppendsOffset.LegacyAnchor => // pre-anchor checkpoint: length check only
        require(chain.length >= o.ordinal,
          s"the lineage of $dir has ${chain.length} snapshots but this stream's $what " +
            s"references ordinal ${o.ordinal} — the table's history was rewritten " +
            "(rollback?); restart the stream with a fresh checkpoint")
        o.ordinal
      case id =>
        val i = chain.indexOf(id)
        require(i >= 0,
          s"this stream's $what is anchored at snapshot $id of $dir, which is no longer " +
            s"on the main lineage (have: ${chain.mkString(", ")}) — either the history " +
            "was rewritten (rollback) or retention expired UNCONSUMED snapshots; " +
            "restart the stream with a fresh checkpoint after auditing the table")
        i + 1
    }

  private def anchored(chain: Seq[Long], ordinal: Int): AppendsOffset =
    AppendsOffset(ordinal, if (ordinal == 0) IcebergAppendsFeed.OriginAnchor
      else chain(ordinal - 1))

  /** The admission-control face the engine actually calls (getOffset
    * stays for direct V1 callers): floor = the checkpointed offset if
    * one exists, else the PERSISTED configured start — re-anchored
    * against the live chain; cap = maxSnapshotsPerBatch; head = the
    * pinned AvailableNow target or the live lineage. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val chain = IcebergImport.lineage(spark, dir)
    val base = Option(startOffset)
      .map(o => resolve(chain, AppendsOffset.decode(o), "checkpointed offset"))
      .getOrElse(resolve(chain, starting, "configured start"))
    val floor = math.max(lastEndOrdinal(chain), base)
    val head = math.min(availableNowTarget.getOrElse(chain.length), chain.length)
    val capped = math.min(head.toLong, floor.toLong + maxSnapshotsPerBatch).toInt
    if (capped <= floor) null else anchored(chain, capped)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val chain = IcebergImport.lineage(spark, dir)
    anchored(chain, chain.length)
  }

  override def getOffset: Option[OffsetV1] = {
    val chain = IcebergImport.lineage(spark, dir)
    val floor = math.max(lastEndOrdinal(chain), resolve(chain, starting, "configured start"))
    val capped = math.min(chain.length.toLong, floor.toLong + maxSnapshotsPerBatch).toInt
    if (capped <= floor) None else Some(anchored(chain, capped))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val chain = IcebergImport.lineage(spark, dir)
    val fromOrd = start.map(o => resolve(chain, AppendsOffset.decode(o), "batch start offset"))
      .getOrElse(resolve(chain, starting, "configured start"))
    val toOrd = resolve(chain, AppendsOffset.decode(end), "batch end offset")
    val hi = math.max(fromOrd, toOrd)
    if (hi > lastEndOrdinal(chain)) lastEnd = Some(anchored(chain, hi))
    val batch = if (toOrd <= fromOrd) emptyFeed else emitRange(chain, fromOrd, toOrd)
    org.apache.spark.sql.GraftSqlBridge.asStreamingBatch(batch)
  }

  override def commit(end: OffsetV1): Unit = () // retention is the table's own policy

  override def stop(): Unit = ()
}

private[streaming] final class IcebergAppendsSource(
    spark: SparkSession,
    dir: String,
    parameters: Map[String, String],
    metadataPath: String
) extends LineageTailSource(spark, dir, parameters, metadataPath) {
  import IcebergAppendsFeed._

  /** Pinned at stream start; a mid-stream schema change fails the feed
    * loudly rather than silently projecting or null-filling. */
  private val pinnedData: StructType = dataSchema(spark, dir)
  private val dataCols: Seq[String] = pinnedData.fields.map(_.name).toSeq

  override def schema: StructType = feedSchema(pinnedData)

  override protected def emitRange(chain: Seq[Long], fromOrd: Int, toOrd: Int): DataFrame = {
    val fromSnap = if (fromOrd == 0) None else Some(chain(fromOrd - 1))
    val steps = IcebergImport.appendStepFrames(spark, dir, fromSnap, Some(chain(toOrd - 1)))
    steps.map { case (st, df) =>
      val have = df.columns.toSeq
      require(have.sorted == dataCols.sorted,
        s"snapshot ${st.snapshotId} of $dir reads with columns {${have.sorted.mkString(", ")}} " +
          s"but this feed pinned {${dataCols.sorted.mkString(", ")}} — the schema changed " +
          "mid-stream; restart the feed to pick up the new schema")
      // re-alias with EMPTY metadata: the frames carry
      // `parquet.field.id` from the import's id-resolving read,
      // which must not leak into downstream sinks (see dataSchema)
      df.select(dataCols.map(c => IcebergAppendsSource.qcol(c)
          .as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
        .withColumn(SnapshotIdCol, lit(st.snapshotId))
        .withColumn(CommitTimestampCol,
          (if (st.timestampMs > 0) lit(new java.sql.Timestamp(st.timestampMs))
           else lit(null)).cast(TimestampType))
    }.reduceOption(_ unionByName _).getOrElse(emptyFeed)
  }
}

/** The changelog twin: each batch's ordinal range replays per-snapshot
  * change rows via [[IcebergChanges.stepFrame]], stamping
  * `_change_ordinal` from the snapshot's SEQUENCE NUMBER — the
  * RETENTION-STABLE commit order. A lineage ordinal is not: expiry
  * trims the chain's front and every retained ordinal shifts down, so
  * the same commit's rows would renumber across an expiry+restart and
  * break consumers that fold by ordinal. Sequence numbers are assigned
  * at commit and never rewritten, so the stamp survives both restarts
  * and retention. (The BATCH face `changesBetween` stamps 0-based
  * range positions instead — documented there.) DML snapshots emit
  * their diffs; only genuinely unclassifiable operations still fail. */
private[streaming] final class IcebergChangesSource(
    spark: SparkSession,
    dir: String,
    parameters: Map[String, String],
    metadataPath: String
) extends LineageTailSource(spark, dir, parameters, metadataPath) {

  /** Pinned at stream start; a mid-stream schema change fails the feed
    * loudly rather than silently projecting or null-filling. */
  private val pinnedData: StructType = IcebergChanges.dataSchema(spark, dir)

  override def schema: StructType = IcebergChanges.feedSchema(pinnedData)

  override protected def emitRange(chain: Seq[Long], fromOrd: Int, toOrd: Int): DataFrame = {
    val live = IcebergChanges.dataSchema(spark, dir)
    require(live.fields.map(_.name).sorted.sameElements(pinnedData.fields.map(_.name).sorted),
      s"the schema of $dir changed mid-stream (pinned " +
        s"{${pinnedData.fields.map(_.name).sorted.mkString(", ")}}, now " +
        s"{${live.fields.map(_.name).sorted.mkString(", ")}}); restart the feed to " +
        "pick up the new schema")
    val fromSnap = if (fromOrd == 0) None else Some(chain(fromOrd - 1))
    val steps = IcebergChanges.changeSteps(spark, dir, fromSnap, Some(chain(toOrd - 1)))
    // v1 tables (and the pre-upgrade history of v1→v2 tables) carry no
    // sequence numbers. Defaulting to 0 would collapse every such
    // snapshot in the batch to one ordinal — destroying the per-commit
    // ordering/dedup key the column exists for — so refuse loudly and
    // point at the batch face, whose 0-based range positions do not
    // need sequence numbers.
    steps.find(_.sequence.isEmpty).foreach { st =>
      throw new IllegalStateException(
        s"snapshot ${st.snapshotId} of $dir has no sequence-number (a v1 table, or " +
          "pre-upgrade v1 history) — the streaming changelog stamps _change_ordinal " +
          "from sequence numbers and cannot order these commits; upgrade the table to " +
          "format-version 2+, or use the batch face (iceberg_changes / changesBetween), " +
          "whose ordinals are range positions")
    }
    steps
      .flatMap(st => IcebergChanges.stepFrame(spark, dir, st, st.sequence.get.toInt))
      .reduceOption(_ unionByName _)
      .getOrElse(emptyFeed)
  }
}

private[streaming] object IcebergAppendsSource {
  private[streaming] def qcol(c: String) = col("`" + c.replace("`", "``") + "`")
}
