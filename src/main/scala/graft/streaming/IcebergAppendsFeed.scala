package graft.streaming

import graft.io.IcebergImport
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
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
  * `Trigger.AvailableNow` semantics. An OFFSET is an ordinal into the
  * main-branch ancestor chain ([[IcebergImport.lineage]], oldest
  * first): appends only ever extend the chain's tail, so ordinals are
  * stable and a replayed batch re-reads exactly the same snapshots'
  * ADDED files (immutable once committed — the determinism
  * exactly-once delivery needs). A history REWRITE (rollback) breaks
  * that premise and fails loudly on the next batch (the ordinal's
  * snapshot is gone or changed), never silently re-reading different
  * data.
  *
  * Range semantics are [[IcebergImport.appendsBetween]]'s, stated
  * there: `append` snapshots emit their added rows, `replace`
  * (compaction) snapshots emit nothing and advance the offset,
  * `overwrite`/`delete` fail the stream loudly — an append-only view
  * cannot represent removed rows; restart the stream past the
  * offending snapshot (`startingSnapshot`) after auditing it.
  *
  * Output schema = the table's CURRENT columns plus
  *   `_snapshot_id` LONG      — the snapshot whose commit added the row
  *   `_commit_timestamp` TS   — that snapshot's commit time
  *
  * Options:
  *   `dir`               — the table root (contains `metadata/`). Required.
  *   `startingSnapshot`  — `"earliest"` (the whole retained lineage),
  *                         an explicit snapshot id (appends strictly
  *                         AFTER it), or the default: the head at
  *                         stream start (only new commits). The
  *                         checkpoint pins the floor once the first
  *                         micro-batch commits; a default-start stream
  *                         stopped before ANY batch re-pins at its
  *                         next start's head — give an explicit
  *                         snapshot id for a durable floor from the
  *                         first start.
  *   `maxSnapshotsPerBatch` — cap snapshots per micro-batch during
  *                         catch-up (rate limit; default unbounded).
  */
object IcebergAppendsFeed {
  val SnapshotIdCol = "_snapshot_id"
  val CommitTimestampCol = "_commit_timestamp"

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

/** `spark.readStream.format("graft-iceberg-appends")` provider
  * (registered via META-INF/services). */
final class IcebergAppendsProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-appends"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("dir", throw new IllegalArgumentException(
      "graft-iceberg-appends needs dir=<iceberg table root>"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-iceberg-appends derives its schema from the table; don't supply one")
    val dir = dirOf(parameters)
    (s"graft-iceberg-appends[$dir]",
      IcebergAppendsFeed.feedSchema(IcebergAppendsFeed.dataSchema(sqlContext.sparkSession, dir)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergAppendsSource(sqlContext.sparkSession, dirOf(parameters), parameters)
}

private[streaming] final class IcebergAppendsSource(
    spark: SparkSession,
    dir: String,
    parameters: Map[String, String]
) extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  import IcebergAppendsFeed._

  private val maxSnapshotsPerBatch: Int =
    parameters.get("maxSnapshotsPerBatch").map { s =>
      val n = s.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"maxSnapshotsPerBatch must be a positive int, got '$s'"))
      require(n > 0, s"maxSnapshotsPerBatch must be positive, got $n")
      n
    }.getOrElse(Int.MaxValue)

  /** Ordinal in the lineage the feed starts AFTER (those snapshots'
    * appends are not emitted). */
  private val startingOrdinal: Int = parameters.get("startingSnapshot") match {
    case Some("earliest") => 0
    case Some(s) =>
      val id = s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"startingSnapshot must be 'earliest' or a snapshot id, got '$s'"))
      val chain = IcebergImport.lineage(spark, dir)
      val i = chain.indexOf(id)
      require(i >= 0,
        s"startingSnapshot $id is not on the main lineage of $dir " +
          s"(have: ${chain.mkString(", ")})")
      i + 1
    case None => IcebergImport.lineage(spark, dir).length
  }

  /** Pinned at stream start; a mid-stream schema change fails the feed
    * loudly rather than silently projecting or null-filling. */
  private val pinnedData: StructType = dataSchema(spark, dir)
  private val dataCols: Seq[String] = pinnedData.fields.map(_.name).toSeq

  /** Highest ordinal handed to the engine — the rate-limit floor;
    * post-restart replays advance it so catch-up paces from the
    * checkpoint. */
  @volatile private var lastEnd: Int = startingOrdinal

  override def schema: StructType = feedSchema(pinnedData)

  /** `Trigger.AvailableNow`: the target head is PINNED here — the
    * stream drains up to it (paced by `maxSnapshotsPerBatch`) and
    * terminates, exactly the `FileStreamSource` contract. */
  @volatile private var availableNowTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(IcebergImport.lineage(spark, dir).length)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The admission-control face the engine actually calls (getOffset
    * stays for direct V1 callers): floor = the checkpointed start (or
    * the configured starting ordinal), cap = maxSnapshotsPerBatch,
    * head = the pinned AvailableNow target or the live lineage. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val floor = math.max(lastEnd,
      Option(startOffset).map(o => ordinalOf(o)).getOrElse(startingOrdinal))
    val head = availableNowTarget.getOrElse(IcebergImport.lineage(spark, dir).length)
    val capped = math.min(head.toLong, floor.toLong + maxSnapshotsPerBatch).toInt
    if (capped <= floor) null else LongOffset(capped.toLong)
  }

  override def reportLatestOffset(): OffsetV2 =
    LongOffset(IcebergImport.lineage(spark, dir).length.toLong)

  override def getOffset: Option[OffsetV1] = {
    val head = IcebergImport.lineage(spark, dir).length
    val capped = math.min(head.toLong, lastEnd.toLong + maxSnapshotsPerBatch).toInt
    if (capped <= lastEnd) None else Some(LongOffset(capped.toLong))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromOrd = start.map(ordinalOf).getOrElse(startingOrdinal)
    val toOrd = ordinalOf(end)
    lastEnd = math.max(lastEnd, math.max(fromOrd, toOrd))
    val batch =
      if (toOrd <= fromOrd) emptyFeed
      else {
        val chain = IcebergImport.lineage(spark, dir)
        require(chain.length >= toOrd,
          s"the lineage of $dir has ${chain.length} snapshots but this stream's checkpoint " +
            s"references ordinal $toOrd — the table's history was rewritten (rollback?); " +
            "restart the stream with a fresh checkpoint")
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
    org.apache.spark.sql.GraftSqlBridge.asStreamingBatch(batch)
  }

  private def emptyFeed: DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)

  // OffsetV1 extends OffsetV2, so one decoder serves getBatch and
  // the admission-control face
  private def ordinalOf(o: OffsetV2): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt
  }

  override def commit(end: OffsetV1): Unit = () // retention is the table's own policy

  override def stop(): Unit = ()
}

private[streaming] object IcebergAppendsSource {
  private def qcol(c: String) = col("`" + c.replace("`", "``") + "`")
}
