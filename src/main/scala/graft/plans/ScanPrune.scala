package graft.plans

import graft.catalog.SnapshotTableV2
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** MANIFEST FILE SKIPPING for SQL scans (X112) — Iceberg's scan
  * planning: a query's data-file set is pruned against per-file column
  * bounds (and Bloom membership sketches) recorded in the table's
  * manifests BEFORE any task launches, so a selective predicate on a
  * sort-ordered / z-ordered 100 TB table opens thousands of files, not
  * millions. The Scala API had this ([[graft.io.SnapshotTables
  * .readPrunedBox]]/[[graft.io.SnapshotTables.readPrunedIn]]); this
  * rule gives SQL text the same skipping with zero query changes.
  *
  * Shape: `Filter(cond, scan of SnapshotTableV2)` — after the operator
  * batch has pushed predicates down to the relation — is rewritten to
  * `Filter(cond, pruned parquet scan)` when the table's stats/sketch
  * manifests PROVE some files cannot hold a matching row
  * ([[graft.io.SnapshotTables.pruneForScan]]). The original Filter
  * always stays above the substituted scan (pruning is a file-skipping
  * layer, never a row filter), the relation's output attribute ids are
  * preserved via an alias projection (the [[DeltaResolveRule]]
  * substitution pattern), and any doubt — merge-on-read chains, schema
  * evolution, missing manifests, over-budget keep-lists, a type
  * mismatch in the substituted scan, zero provable skips — leaves the
  * plan untouched. Disable with `graft.scan.manifestPruning = false`.
  *
  * What prunes: conjuncts of `=`, `<=>`, `<`, `<=`, `>`, `>=`,
  * `IN`/`InSet` and `BETWEEN` (already split into two comparisons by
  * the parser) on top-level columns carrying range stats
  * (`graft.stats.columns`) or sketches (`graft.sketch.columns`), with
  * literal operands of string / numeric / date / timestamp type.
  * Equality and IN go through the probe path — per-value range checks
  * AND Bloom membership — so a point lookup on a high-cardinality
  * column skips files even where every [min,max] covers the value.
  * Anything else is simply ignored for pruning (the Filter still
  * applies it row-level).
  *
  * Cost control: the manifest consultation is driver-side metadata
  * work (manifest parquets are file-count-sized, the keep-list is
  * budgeted), and the decision is memoized on the Filter node via a
  * tree tag so fixed-point re-runs of the operator batch don't repeat
  * it. Probe lists are capped at [[MaxProbeValues]] values — a wider
  * IN skips manifest work, not correctness. */
object ScanPruneRule extends Rule[LogicalPlan] {

  /** Decision memo: set once a Filter node has been examined, whatever
    * the outcome — optimizer batches run to fixed point and the
    * manifest consultation must not re-run each iteration. */
  private val Decided = TreeNodeTag[Boolean]("graft.scan.pruned")

  /** Widest IN-list consulted against the manifest; beyond it the
    * conjunct is ignored for pruning (never an error). */
  val MaxProbeValues = 64

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.scan.manifestPruning", "true").toBoolean) plan
    else plan.transformUpWithSubqueries {
      case f @ Filter(cond, r: DataSourceV2Relation)
          if f.getTagValue(Decided).isEmpty && prunable(r) =>
        f.setTagValue(Decided, true)
        // the documented contract is "any doubt leaves the plan
        // untouched" — that must include a corrupt/unreadable manifest
        // or an unexpected schema mismatch throwing out of the
        // consultation, not just the anticipated shape doubts
        (try substitute(f, cond, r)
        catch { case scala.util.control.NonFatal(_) => None }).getOrElse(f)
    }

  private def prunable(r: DataSourceV2Relation): Boolean = r.table match {
    case t: SnapshotTableV2 => t.pinnedVersionNumber > 0 && t.directScanDirs.isDefined
    case _ => false
  }

  private def substitute(f: Filter, cond: Expression,
      r: DataSourceV2Relation): Option[LogicalPlan] = {
    val t = r.table.asInstanceOf[SnapshotTableV2]
    val st = t.tables
    val stats = st.statsColsFor(t.tableName).toSet
    val sketch = st.sketchColsFor(t.tableName).toSet
    if (stats.isEmpty && sketch.isEmpty) return None
    val (bounds, probes) = extract(cond, stats ++ sketch)
    if (bounds.isEmpty && probes.isEmpty) return None
    st.pruneForScan(t.tableName, t.pinnedVersionNumber, bounds, probes).flatMap { pruned =>
      val analyzed = pruned.queryExecution.analyzed
      val byName = analyzed.output.map(a => a.name -> a).toMap
      // substitution is optional — any shape doubt keeps the stock scan
      if (!r.output.forall(o => byName.get(o.name).exists(_.dataType == o.dataType))) None
      else {
        // preserve the relation's output exprIds so parents stay resolved
        val projections = r.output.map { o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        Some(Filter(cond, Project(projections, analyzed)))
      }
    }
  }

  /** Internal literal → (external lit()-compatible value, value in the
    * manifest's physical unit); None for a null literal or an
    * untracked type — both simply don't prune. */
  private def litVals(l: Literal): Option[(Any, Any)] = Option(l.value).flatMap { v =>
    l.dataType match {
      case StringType => val s = v.toString; Some((s, s))
      case DateType =>
        val days = v.asInstanceOf[Int]
        Some((java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong)), days))
      case TimestampType =>
        val us = v.asInstanceOf[Long]
        Some((org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToInstant(us), us))
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => Some((v, v))
      case _: DecimalType =>
        val bd = v.asInstanceOf[Decimal].toJavaBigDecimal
        Some((bd, bd))
      case _ => None
    }
  }

  /** Pull (bounds, probes) out of a pushed-down predicate's conjuncts.
    * Conservative by construction: only shapes listed in the class doc
    * contribute; everything else is left to the row-level Filter. */
  private[plans] def extract(cond: Expression, cols: Set[String])
      : (Seq[(String, Option[Any], Option[Any])], Seq[(String, Seq[(Any, Any)])]) = {
    val bounds = Seq.newBuilder[(String, Option[Any], Option[Any])]
    val probes = Seq.newBuilder[(String, Seq[(Any, Any)])]

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def tracked(a: Attribute): Boolean = cols.contains(a.name)
    def probe(a: Attribute, ls: Seq[Literal]): Unit = if (tracked(a)) {
      val vs = ls.flatMap(litVals) // null IN-members match nothing; dropped
      if (vs.nonEmpty && vs.length == ls.count(_.value != null) && vs.length <= MaxProbeValues)
        probes += a.name -> vs
    }
    def lo(a: Attribute, l: Literal): Unit =
      if (tracked(a)) litVals(l).foreach { case (_, p) => bounds += ((a.name, Some(p), None)) }
    def hi(a: Attribute, l: Literal): Unit =
      if (tracked(a)) litVals(l).foreach { case (_, p) => bounds += ((a.name, None, Some(p))) }

    conjuncts(cond).foreach {
      case EqualTo(a: Attribute, l: Literal) => probe(a, Seq(l))
      case EqualTo(l: Literal, a: Attribute) => probe(a, Seq(l))
      case EqualNullSafe(a: Attribute, l: Literal) if l.value != null => probe(a, Seq(l))
      case EqualNullSafe(l: Literal, a: Attribute) if l.value != null => probe(a, Seq(l))
      case GreaterThan(a: Attribute, l: Literal) => lo(a, l)
      case GreaterThanOrEqual(a: Attribute, l: Literal) => lo(a, l)
      case LessThan(a: Attribute, l: Literal) => hi(a, l)
      case LessThanOrEqual(a: Attribute, l: Literal) => hi(a, l)
      case GreaterThan(l: Literal, a: Attribute) => hi(a, l) // lit > col  ⇔  col < lit
      case GreaterThanOrEqual(l: Literal, a: Attribute) => hi(a, l)
      case LessThan(l: Literal, a: Attribute) => lo(a, l)
      case LessThanOrEqual(l: Literal, a: Attribute) => lo(a, l)
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        probe(a, vs.map(_.asInstanceOf[Literal]))
      case InSet(a: Attribute, hset) =>
        probe(a, hset.toSeq.map(v => Literal(v, a.dataType))) // InSet holds INTERNAL values
      case _ => () // not a pruning shape; the Filter still applies it
    }
    (bounds.result(), probes.result())
  }
}
