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

  /** [[Streams.snapshotMergeSink]] against a catalog-qualified name:
    * continuous upsert-by-key into a SQL-visible snapshot table. */
  def snapshotMergeSink(
      stream: DataFrame,
      qualifiedTable: String,
      keyCols: Seq[String],
      checkpoint: String,
      partitionCols: Seq[String] = Nil,
      orderCol: Option[String] = None
  ): StreamingQuery = {
    val (t, name, publish) = resolved(stream, qualifiedTable)
    Streams.snapshotMergeSink(stream, t, name, keyCols, checkpoint, partitionCols, orderCol,
      afterCommit = publish)
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
