package graft.catalog

import graft.io.TableFormat
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}

/** [[TableFormat]] over 3-level catalog names (`silver.dw.tab_brewery`)
  * — the pipeline's write seam routed through a registered
  * [[SnapshotCatalog]]: writes go to the SAME SnapshotTables root the
  * SQL layer resolves for reads (the catalog plugin is the single
  * source of truth for the root), so `spark.table`/`spark.sql` and the
  * pipeline always agree.
  *
  * This is the reference's architecture verbatim: jobs write with the
  * catalog-qualified name and every reader — including the gold SQL at
  * job_gold.py:71-88 — resolves through the catalog.
  *
  * 2-part (`db.table`) names have no lake catalog to route through and
  * delegate to [[graft.io.ParquetTables]] (session catalog) — the same
  * dual routing [[graft.pipeline.BreweryPipeline.goldQuery]] does on
  * the read side, so one `PipelineConf.format` serves both shapes. */
object CatalogTables extends TableFormat {

  private def split(table: String): (String, Array[String], String) = {
    val parts = table.split('.')
    (parts.head, parts.slice(1, parts.length - 1), parts.last)
  }

  private def isThreePart(table: String): Boolean = table.split('.').length >= 3

  /** Public resolver: a 3-level `catalog.ns.table` name registered via
    * [[SnapshotCatalog]] → (backing [[graft.io.SnapshotTables]], bare
    * table name). The seam that lets non-SQL writers — streaming sinks
    * above all ([[graft.streaming.CatalogStreams]]) — land commits in
    * the SAME store the SQL layer resolves, so their output is
    * immediately `spark.sql`-visible and time-travelable. */
  def resolveSnapshot(spark: SparkSession, table: String): (graft.io.SnapshotTables, String) = {
    val (st, t, _) = resolveSnapshotGoverned(spark, table)
    (st, t)
  }

  /** [[resolveSnapshot]] plus the catalog's commit log when it runs
    * LOG-GOVERNED (`spark.sql.catalog.<cat>.commitlog`). Writers that
    * bypass the V2 write path (the streaming sinks) must publish each
    * commit through the log themselves — the SQL DML path does
    * ([[SnapshotCatalog]] publish-through), and a sink that didn't
    * would leave every post-pin batch invisible to SQL readers. */
  private[graft] def resolveSnapshotGoverned(spark: SparkSession, table: String)
      : (graft.io.SnapshotTables, String, Option[graft.io.LakeCommits]) = {
    require(isThreePart(table),
      s"'$table' is not a 3-level catalog-qualified name (want catalog.namespace.table)")
    val (cat, ns, t) = split(table)
    GraftSqlBridge.catalogPlugin(spark, cat) match {
      case sc: SnapshotCatalog => (sc.tablesFor(ns), t, sc.lake)
      case other => throw new IllegalArgumentException(
        s"catalog '$cat' is ${other.getClass.getName}, not a graft SnapshotCatalog")
    }
  }

  private def resolve(spark: SparkSession, table: String): (graft.io.SnapshotTables, String) = {
    val (st, t, _) = resolveSnapshotGoverned(spark, table)
    (st, t)
  }

  override def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    if (!isThreePart(table)) graft.io.ParquetTables.overwriteTable(df, table, partitionCols)
    else {
      val (st, t) = resolve(df.sparkSession, table)
      st.overwriteTable(df, t, partitionCols)
    }

  override def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    if (!isThreePart(table)) graft.io.ParquetTables.overwritePartitions(df, table, partitionCols)
    else {
      val (st, t) = resolve(df.sparkSession, table)
      st.overwritePartitions(df, t, partitionCols)
    }

  override def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
