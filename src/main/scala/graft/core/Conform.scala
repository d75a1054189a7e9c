package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spec-driven schema conformance — the engine's signature transform.
  *
  * Replaces the reference's four separate passes
  * (`remove_extra_columns` job_silver.py:8-19, `sort_columns_by_order`
  * job_silver.py:21-31, `cast_columns_types_by_schema`
  * decase/utils.py:168-267, partition stamp job_silver.py:166-168)
  * with ONE projection, which Catalyst keeps as a single `Project` over
  * the scan — columns not in the spec are never read (column pruning
  * reaches the parquet/JSON scan), and the whole thing stays inside
  * whole-stage codegen. At 100 TB this is the difference between one
  * pass and four.
  *
  * Semantics (all from the reference):
  *  - columns in the input but not the spec are dropped (utils.py:204-207)
  *  - columns in the spec but not the input appear as typed nulls
  *    (utils.py:193-201)
  *  - every column is cast to the spec type, with the float→double
  *    widening quirk (utils.py:217-222); uncastable values become null
  *    via `try_cast` (the reference ran PySpark 3.4 with ANSI off, where
  *    plain cast nulls; Spark 4 ANSI-on would throw instead)
  *  - output column order is the spec's `order` field (job_silver.py:21-31)
  *  - `'#'`-prefixed describe rows are ignored (utils.py:191)
  */
object Conform {

  /** Conform `df` to `spec` as a single select.
    *
    * Type pairs with no ANSI cast at all (e.g. an inferred TIMESTAMP
    * where the spec says BOOLEAN, or a struct where a scalar is
    * expected) conform to a typed NULL column rather than failing
    * analysis — schema drift in the input must never break the
    * pipeline, only null out the drifted column. */
  def apply(df: DataFrame, spec: Seq[ColumnSpec]): DataFrame = {
    val inputType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols: Seq[Column] = Schema.clean(spec).sortBy(_.order).map { c =>
      val base = inputType.get(c.name) match {
        case Some(from) if org.apache.spark.sql.catalyst.expressions.Cast.canAnsiCast(from, c.sparkType) =>
          col(c.name).try_cast(c.sparkType)
        case _ => lit(null).cast(c.sparkType)
      }
      base.as(c.name)
    }
    df.select(cols: _*)
  }

  /** One row of [[Conform.driftReport]]. */
  final case class ColumnDrift(col_name: String, status: String, input_type: String, spec_type: String)

  /** Schema-drift report for an input frame vs a spec — pure METADATA
    * (no scan, no action): per column, whether it conforms by cast,
    * is missing from the input (will become typed nulls), is extra in
    * the input (will be dropped), or has no ANSI cast at all (will be
    * nulled out — the silent-degradation case an operator wants
    * surfaced before, not after, a 100 TB run). Conform itself stays
    * permissive by design; this is the audit seam next to it. */
  def driftReport(df: DataFrame, spec: Seq[ColumnSpec]): Seq[ColumnDrift] = {
    val inputType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val specCols = Schema.clean(spec).sortBy(_.order)
    val specNames = specCols.map(_.name).toSet
    val fromSpec = specCols.map { c =>
      inputType.get(c.name) match {
        case None => ColumnDrift(c.name, "missing_in_input", "", c.sparkType.sql)
        case Some(from) if from == c.sparkType =>
          ColumnDrift(c.name, "exact", from.sql, c.sparkType.sql)
        case Some(from) if org.apache.spark.sql.catalyst.expressions.Cast.canAnsiCast(from, c.sparkType) =>
          ColumnDrift(c.name, "cast", from.sql, c.sparkType.sql)
        case Some(from) => ColumnDrift(c.name, "incompatible_nulled", from.sql, c.sparkType.sql)
      }
    }
    val extra = df.schema.fields.filterNot(f => specNames.contains(f.name))
      .map(f => ColumnDrift(f.name, "extra_dropped", f.dataType.sql, ""))
    fromSpec ++ extra
  }

  /** Conform + stamp the processing-date partition column
    * (reference: job_silver.py:166-168 — `lit(date)` then `to_date`). */
  def withPartitionStamp(
      df: DataFrame,
      spec: Seq[ColumnSpec],
      partitionCol: String,
      date: java.time.LocalDate
  ): DataFrame =
    apply(df, spec).withColumn(partitionCol, to_date(lit(date.toString), "yyyy-MM-dd"))
}
