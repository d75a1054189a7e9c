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
  * ([[graft.catalog.CatalogTables.resolveSnapshot]]) and delegates to
  * the corresponding [[Streams]] sink — the exactly-once / replay-skip
  * contracts are unchanged, because resolution yields the very same
  * store the SQL layer reads: one commit log, two front doors. */
object CatalogStreams {

  private def resolved(stream: DataFrame, qualifiedTable: String): (graft.io.SnapshotTables, String) =
    graft.catalog.CatalogTables.resolveSnapshot(stream.sparkSession, qualifiedTable)

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
    val (t, name) = resolved(stream, qualifiedTable)
    Streams.snapshotMergeSink(stream, t, name, keyCols, checkpoint, partitionCols, orderCol)
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
    val (t, name) = resolved(values, qualifiedTable)
    Streams.topKSketchSink(values, groupCols, valueCol, t, name, checkpoint, maxItemsTracked)
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
    val (t, name) = resolved(values, qualifiedTable)
    Streams.quantileSketchSink(values, groupCols, valueCol, t, name, checkpoint, capacity)
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
    val (t, name) = resolved(stream, qualifiedTable)
    Streams.lshIndexUpsertSink(stream, t, name, idCol, vecCol, checkpoint, bits, dim)
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
    val (t, name) = resolved(stream, qualifiedTable)
    Streams.pqIndexUpsertSink(stream, t, name, idCol, vecCol, codebooks, dim, m, numCells,
      checkpoint, centroids)
  }
}
