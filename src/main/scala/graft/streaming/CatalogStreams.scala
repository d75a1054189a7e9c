package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** The SnapshotTables-backed streaming sinks of [[Streams]], addressed
  * by 3-level SQL catalog names (`silver.dw.events_latest`) instead of
  * a raw [[graft.io.SnapshotTables]] handle — so a stream's output
  * table is exactly as SQL-visible as the reference's batch tables
  * (its jobs write Iceberg tables any `spark.sql` reader resolves,
  * job_gold.py:50-58,71-88): query the standing state mid-stream with
  * `SELECT ... FROM silver.dw.t`, time-travel across micro-batch
  * commits with `VERSION AS OF n`, and join it against any other
  * catalog table, all while the stream keeps committing.
  *
  * Each method resolves the qualified name through the registered
  * [[graft.catalog.SnapshotCatalog]] once at sink-open time
  * ([[graft.catalog.CatalogTables.resolveSnapshotGoverned]]) and
  * delegates to the corresponding [[Streams]] sink — the exactly-once
  * / replay-skip contracts are unchanged, because resolution yields
  * the very same store the SQL layer reads: one commit log, two front
  * doors.
  *
  * LOG-GOVERNED catalogs (`spark.sql.catalog.<cat>.commitlog`): SQL
  * readers resolve each table's version from the commit log's HEAD,
  * so a sink that only committed snapshot versions would be invisible
  * to SQL once the table is pinned. These sinks therefore
  * publish-through — after every committed micro-batch the new version
  * is appended to the log (same read-your-writes contract as the SQL
  * DML path). Replay-skipped batches commit nothing and publish
  * nothing. */
object CatalogStreams {

  /** (store, bare table name, per-commit publish hook). The hook is a
    * no-op unless the catalog is log-governed. */
  private def resolved(stream: DataFrame, qualifiedTable: String)
      : (graft.io.SnapshotTables, String, () => Unit) = {
    val (t, name, lake) =
      graft.catalog.CatalogTables.resolveSnapshotGoverned(stream.sparkSession, qualifiedTable)
    val publish: () => Unit = lake match {
      case Some(lc) => () => { lc.publishExact(Seq((t, name, t.currentVersion(name)))); () }
      case None => () => ()
    }
    (t, name, publish)
  }

  /** [[Streams.snapshotAppendSink]] against a catalog-qualified name:
    * append-only fact/event ingestion into a SQL-visible snapshot
    * table (O(batch) delta commits, txn-id exactly-once, chain bounded
    * by folding). */
  def snapshotAppendSink(
      stream: DataFrame,
      qualifiedTable: String,
      checkpoint: String
  ): StreamingQuery = {
    val (t, name, publish) = resolved(stream, qualifiedTable)
    Streams.snapshotAppendSink(stream, t, name, checkpoint, afterCommit = publish)
  }

  /** [[Streams.snapshotMergeSink]] against a catalog-qualified name:
    * continuous upsert-by-key into a SQL-visible snapshot table. */
  def snapshotMergeSink(
      stream: DataFrame,
      qualifiedTable: String,
      keyCols: Seq[String],
      checkpoint: String,
      partitionCols: Seq[String] = Nil,
      orderCol: Option[String] = None,
      mor: Boolean = false
  ): StreamingQuery = {
    val (t, name, publish) = resolved(stream, qualifiedTable)
    Streams.snapshotMergeSink(stream, t, name, keyCols, checkpoint, partitionCols, orderCol,
      afterCommit = publish, mor = mor)
  }

  /** [[Streams.topKSketchSink]] against a catalog-qualified name. */
  def topKSketchSink(
      values: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qualifiedTable: String,
      checkpoint: String,
      maxItemsTracked: Int = 8192
  ): StreamingQuery = {
    val (t, name, publish) = resolved(values, qualifiedTable)
    Streams.topKSketchSink(values, groupCols, valueCol, t, name, checkpoint, maxItemsTracked,
      afterCommit = publish)
  }

  /** [[Streams.quantileSketchSink]] against a catalog-qualified name. */
  def quantileSketchSink(
      values: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qualifiedTable: String,
      checkpoint: String,
      capacity: Int = 8192
  ): StreamingQuery = {
    val (t, name, publish) = resolved(values, qualifiedTable)
    Streams.quantileSketchSink(values, groupCols, valueCol, t, name, checkpoint, capacity,
      afterCommit = publish)
  }

  /** [[Streams.lshIndexUpsertSink]] against a catalog-qualified name. */
  def lshIndexUpsertSink(
      stream: DataFrame,
      qualifiedTable: String,
      idCol: String,
      vecCol: String,
      checkpoint: String,
      bits: Int = 8,
      dim: Int = 64
  ): StreamingQuery = {
    val (t, name, publish) = resolved(stream, qualifiedTable)
    Streams.lshIndexUpsertSink(stream, t, name, idCol, vecCol, checkpoint, bits, dim,
      afterCommit = publish)
  }

  /** STREAMING CHANGE FEED on a catalog-qualified name — the READ side
    * of the catalog streaming story ([[ChangeFeed]]): a streaming
    * DataFrame tailing `cat.ns.t`'s commits, each micro-batch the
    * row-level changes of the versions it covers (Delta-CDF shape:
    * `_change_type`, `_commit_version`, `_commit_timestamp`). With
    * `keys`, a keyed changelog (update = pre+post image); without, the
    * multiset diff (update = delete+insert). On log-governed catalogs
    * the feed follows the PUBLISHED head — it streams exactly what SQL
    * readers see. `startingVersion`: None = only commits after stream
    * start, Some(-1) = "earliest" (the retained line from its first
    * version, opening with a full-snapshot insert batch), Some(v) =
    * changes strictly after version v. */
  def changeFeed(
      spark: org.apache.spark.sql.SparkSession,
      qualifiedTable: String,
      keys: Seq[String] = Nil,
      startingVersion: Option[Int] = None,
      maxVersionsPerBatch: Option[Int] = None
  ): DataFrame = {
    var r = spark.readStream.format("graft-changes").option("table", qualifiedTable)
    if (keys.nonEmpty) r = r.option("keys", keys.mkString(","))
    startingVersion.foreach(v =>
      r = r.option("startingVersion", if (v < 0) "earliest" else v.toString))
    maxVersionsPerBatch.foreach(n => r = r.option("maxVersionsPerBatch", n.toString))
    r.load()
  }

  /** [[Streams.pqIndexUpsertSink]] against a catalog-qualified name. */
  def pqIndexUpsertSink(
      stream: DataFrame,
      qualifiedTable: String,
      idCol: String,
      vecCol: String,
      codebooks: DataFrame,
      dim: Int,
      m: Int,
      numCells: Int,
      checkpoint: String,
      centroids: Option[DataFrame] = None
  ): StreamingQuery = {
    val (t, name, publish) = resolved(stream, qualifiedTable)
    Streams.pqIndexUpsertSink(stream, t, name, idCol, vecCol, codebooks, dim, m, numCells,
      checkpoint, centroids, afterCommit = publish)
  }
}
