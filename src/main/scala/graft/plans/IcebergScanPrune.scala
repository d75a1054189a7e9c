package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MANIFEST FILE SKIPPING for `graft_iceberg_scan` — the import-side
  * twin of [[ScanPruneRule]] (X112): the Iceberg manifests the scan
  * was planned from carry per-file column bounds (the export writes
  * them precisely so engines can skip files), and until this rule the
  * importer handed Spark the FULL data-file set, leaving file-level
  * pruning to parquet footers at task time. On a 100 TB sorted table a
  * selective predicate must skip files at PLANNING time — opening a
  * million footers to discard a million files is the scan you were
  * trying to avoid.
  *
  * Shape: `Filter(cond, LogicalRelation(parquet))` where the relation
  * was built by [[graft.io.IcebergImport]] (recognized by the
  * `graft.iceberg.dir` reader option stamped on every scan it plans,
  * with the pinned snapshot in `graft.iceberg.snapshot`). The
  * conjuncts reuse [[ScanPruneRule]]'s extraction (ranges, equality/IN
  * probes); [[graft.io.IcebergImport.skippableFiles]] decodes the
  * manifests' single-value-serialized bounds and returns only files
  * PROVEN unable to match. Substitution keeps the Filter (pruning is a
  * file-skipping layer, never a row filter), preserves output
  * attribute ids via alias projection, and any doubt — partition-
  * discovery relations (partition columns live outside the data
  * schema), schema mismatch, zero provable skips, a throw during
  * consultation — leaves the plan untouched. The delete-application
  * plan never matches this shape (its scans sit under joins), which is
  * fine: row-level-delete reads stay exact and un-pruned. Disable with
  * `graft.iceberg.manifestPruning = false`.
  */
object IcebergScanPruneRule extends Rule[LogicalPlan] {

  private val Decided = TreeNodeTag[Boolean]("graft.iceberg.pruned")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.iceberg.manifestPruning", "true").toBoolean) plan
    else plan.transformUpWithSubqueries {
      case f @ Filter(cond, l: LogicalRelation)
          if f.getTagValue(Decided).isEmpty && dirOf(l).isDefined =>
        f.setTagValue(Decided, true)
        (try substitute(f, cond, l)
        catch { case scala.util.control.NonFatal(_) => None }).getOrElse(f)
    }

  private def dirOf(l: LogicalRelation): Option[String] = l.relation match {
    // partition-discovery relations (Hive-migrated / hidden layouts)
    // are prunable too, as long as the importer recorded the basePath
    // the rebuild needs to re-derive the partition columns
    case fsr: HadoopFsRelation
        if fsr.partitionSchema.isEmpty || fsr.options.contains("basePath") =>
      fsr.options.get(graft.io.IcebergImport.DirOption)
    case _ => None
  }

  private def substitute(f: Filter, cond: Expression, l: LogicalRelation): Option[LogicalPlan] = {
    val fsr = l.relation.asInstanceOf[HadoopFsRelation]
    val dir = dirOf(l).get
    val snap = fsr.options.get(graft.io.IcebergImport.SnapOption).map(_.toLong)
    val (ranges, probePairs) = ScanPruneRule.extract(cond, l.output.map(_.name).toSet)
    if (ranges.isEmpty && probePairs.isEmpty) return None
    val ranges2 = ranges.map { case (c, lo, hi) => (c, lo, hi) }
    val probes = probePairs.map { case (c, vs) => (c, vs.map(_._2)) }
    val spark = SparkSession.active
    val skippable =
      graft.io.IcebergImport.skippableFiles(spark, dir, snap, ranges2, probes)
    if (skippable.isEmpty) return None
    val files = fsr.location.inputFiles.toSeq
    val keep = files.filterNot(skippable)
    if (keep.length == files.length) return None
    val substituted: LogicalPlan =
      if (keep.isEmpty) LocalRelation(l.output)
      else {
        // plain relations rebuild under the pinned data schema; the
        // partition-discovery shape re-infers under its basePath so
        // the directory-derived columns come back — the output
        // name/type check below rejects any inference drift
        val rd =
          if (fsr.partitionSchema.isEmpty) spark.read.schema(fsr.dataSchema)
          else spark.read.option("basePath", fsr.options("basePath"))
        val pruned = rd.option(graft.io.IcebergImport.DirOption, dir)
          .parquet(keep: _*)
        val analyzed = pruned.queryExecution.analyzed
        val byName = analyzed.output.map(a => a.name -> a).toMap
        if (!l.output.forall(o => byName.get(o.name).exists(_.dataType == o.dataType))) return None
        val projections = l.output.map { o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        Project(projections, analyzed)
      }
    Some(Filter(cond, substituted))
  }
}
