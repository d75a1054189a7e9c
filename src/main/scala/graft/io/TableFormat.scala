package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-format seam (SURVEY §7): the engine's write semantics —
  * overwrite-whole-table (reference parity) and overwrite-partitions
  * (the 100 TB mode) — behind one trait so an Iceberg/Delta
  * implementation drops in where those runtimes exist. This offline
  * environment ships only the builtin-catalog Parquet implementation;
  * Iceberg's metadata-retention knobs (job_silver.py:176-177) belong to
  * that future implementation, not here. */
trait TableFormat {
  def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit
  def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit

  /** Resolve a table for reading — catalog lookup by default; a
    * path/snapshot-based format (SnapshotTables) overrides this so the
    * pipeline's SQL layer can see its current version. */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}

/** Builtin-catalog partitioned-Parquet tables (the default). */
object ParquetTables extends TableFormat {
  override def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    Sinks.overwriteTable(df, table, partitionCols)
  override def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit =
    Sinks.overwritePartitions(df, table, partitionCols)
}
