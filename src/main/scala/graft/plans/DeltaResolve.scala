package graft.plans

import graft.catalog.SnapshotTableV2
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Scan planning for delta-chained snapshot versions — the read half
  * of merge-on-read (Iceberg v2 readers merge delete files into the
  * scan; Delta readers apply deletion vectors — both public
  * knowledge). A [[SnapshotTableV2]] whose pinned version is a chain
  * that plain parquet paths cannot express (any merge-on-read segment,
  * or a partitioned append chain — multi-root scans of partitioned
  * layouts trip Spark's directory check) is substituted AT ANALYSIS
  * TIME with its resolved logical plan: per-segment parquet scans
  * combined with unions and anti-joins, re-aliased onto the relation's
  * own output attribute ids so every reference above stays resolved.
  * Filters and projections above the substituted plan push into the
  * per-segment scans through the normal optimizer.
  *
  * Write-side plans keep their target relation untouched (substituting
  * a Project for a write target would break the V1 write fallback):
  * DELETE/UPDATE pass through whole (SnapshotDmlRule claims them and
  * its commands read through the chain-resolving API), MERGE resolves
  * only its SOURCE side, INSERT/V2 writes only their query side. */
object DeltaResolveRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable => m.copy(sourceTable = resolveReads(m.sourceTable))
    case i: InsertIntoStatement => i.copy(query = resolveReads(i.query))
    case w: V2WriteCommand => w.withNewQuery(resolveReads(w.query))
    case c: Command => c // DDL etc.: no embedded reads to resolve
    case other => resolveReads(other)
  }

  private def needsResolve(r: DataSourceV2Relation): Boolean = r.table match {
    case t: SnapshotTableV2 => t.pinnedVersionNumber > 0 && t.directScanDirs.isEmpty
    case _ => false
  }

  private def resolveReads(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case r: DataSourceV2Relation if needsResolve(r) =>
        val t = r.table.asInstanceOf[SnapshotTableV2]
        val analyzed = t.tables.readVersion(t.tableName, t.pinnedVersionNumber)
          .queryExecution.analyzed
        val byName = analyzed.output.map(a => a.name -> a).toMap
        // preserve the relation's output exprIds so parents stay resolved
        val projections = r.output.map { o =>
          val src = byName.getOrElse(o.name, throw new IllegalStateException(
            s"resolved delta chain of ${t.name()} lacks column '${o.name}'"))
          Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        Project(projections, analyzed)
    }
}
