package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over any frame — the dbt-style test
  * battery (not_null / unique / accepted_values / relationships) a
  * pipeline runs before promoting a landed batch (the natural audit
  * step between `commitToBranch` and `publish` in the WAP flow).
  *
  * Each check compiles to one aggregate over the frame (or one
  * anti-join for referential integrity) and reports a VIOLATION COUNT
  * — never row samples, so the audit output is tiny and safe to log.
  * Counts are exact and SQL-replayable (the q119 oracle recomputes
  * every rule verbatim).
  *
  * Scale shape: not_null / accepted_values are scan-local conditional
  * counts (one partial agg, no shuffle but the final reduce); unique
  * is one hash aggregation on the key; referencedIn is one join where
  * the parent side is broadcast when small (the usual dim case) —
  * nothing quadratic, nothing collected.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Violations: rows where `col` is null. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null($col)"
  }

  /** Violations: rows belonging to a key with multiplicity > 1 (every
    * row of a duplicated key counts — the number of rows you would
    * have to inspect, not the number of keys). Null keys group
    * together and DO count — deliberately stricter than dbt's
    * ignore-null convention: two null-keyed rows in a unique column
    * are a data smell, and the rule that hides them belongs next to a
    * [[NotNull]] check, not inside this one. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
  }

  /** Violations: non-null values outside the accepted set. */
  final case class AcceptedValues(col: String, values: Seq[Any]) extends Check {
    val name = s"accepted_values($col)"
  }

  /** Violations: non-null child values absent from the parent column
    * (dbt's `relationships` test). */
  final case class ReferencedIn(col: String, parent: DataFrame, parentCol: String) extends Check {
    val name = s"referenced_in($col)"
  }

  /** Run every check; returns (check, violations) ordered by check
    * name — all-zero means the batch is promotable. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val results = checks.map {
      case NotNull(c) =>
        df.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("violations"))
          .select(lit(s"not_null($c)").as("check"), coalesce(col("violations"), lit(0L)).as("violations"))
      case Unique(cols) =>
        df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(sum(col("__n")).as("violations"))
          .select(lit(s"unique(${cols.mkString(",")})").as("check"),
            coalesce(col("violations"), lit(0L)).as("violations"))
      case AcceptedValues(c, values) =>
        df.agg(sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L).otherwise(0L)).as("violations"))
          .select(lit(s"accepted_values($c)").as("check"), coalesce(col("violations"), lit(0L)).as("violations"))
      case ReferencedIn(c, parent, pc) =>
        df.filter(col(c).isNotNull)
          .join(parent.select(col(pc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(s"referenced_in($c)").as("check"), col("violations"))
    }
    results.reduce(_ unionByName _).orderBy(col("check"))
  }

  /** Convenience gate: true iff every check passes. */
  def passes(df: DataFrame, checks: Seq[Check]): Boolean =
    audit(df, checks).agg(sum(col("violations"))).head().getLong(0) == 0L

  /** The complete write-audit-publish step: run the battery against
    * the branch's staged content and publish ONLY when every check
    * passes. Returns Right(newVersion) on publish, Left(report) —
    * the per-rule violation counts — when the audit fails; the branch
    * is left intact either way (fix and re-audit, or dropBranch). */
  def auditAndPublish(
      tables: graft.io.SnapshotTables,
      table: String,
      branch: String,
      checks: Seq[Check]
  ): Either[DataFrame, Int] = {
    val report = audit(tables.readBranch(table, branch), checks).localCheckpoint(true)
    val clean = report.agg(sum(col("violations"))).head().getLong(0) == 0L
    if (clean) Right(tables.publish(table, branch)) else Left(report)
  }
}
