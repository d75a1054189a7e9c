package graft.plans

import graft.catalog.IcebergForeignTable
import org.apache.spark.sql.{Column, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis-time resolution for [[graft.catalog
  * .IcebergWarehouseCatalog]] mounts — the 3-level-name SQL face of
  * the jar-free Iceberg bridge:
  *
  *  - READS: a `DataSourceV2Relation` over an [[IcebergForeignTable]]
  *    is substituted with [[graft.io.IcebergImport.read]]'s resolved
  *    plan (row-level deletes applied, by-id/name-mapping projection,
  *    pinned snapshot for time travel), re-aliased onto the relation's
  *    own output attribute ids so every reference above stays
  *    resolved — exactly the [[DeltaResolveRule]] shape. Filters and
  *    projections above push into the per-file parquet scans through
  *    the normal optimizer, and [[IcebergScanPruneRule]] recognizes
  *    the substituted scans for manifest-bounds file skipping.
  *  - `DELETE FROM` / `UPDATE`: claimed onto [[graft.io.IcebergDml]]
  *    — spec-shaped equality-delete / overwrite snapshots, the same
  *    commits as the Scala face. Resolved column references are
  *    re-anchored by name onto the fresh read inside IcebergDml.
  *  - Write-side plans keep their target relation untouched (the V1
  *    write fallback needs it); only their QUERY side resolves.
  *    `MERGE INTO` a foreign table is refused by Spark's own
  *    row-level-operation analysis (the table doesn't claim it) —
  *    loud, not silent.
  */
object IcebergForeignRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(ForeignRel(t), cond) if d.childrenResolved && cond.resolved =>
      IcebergForeignDeleteCommand(t, cond)
    case u @ UpdateTable(ForeignRel(t), assignments, cond)
        if u.childrenResolved && assignments.forall(_.resolved) && cond.forall(_.resolved) =>
      IcebergForeignUpdateCommand(t, assignments, cond)
    case i: InsertIntoStatement => i.copy(query = resolveReads(i.query))
    case w: V2WriteCommand => w.withNewQuery(resolveReads(w.query))
    case m @ MergeIntoTable(ForeignRel(t), _, cond, matched, notMatched, notMatchedBySource, _)
        if m.childrenResolved && cond.resolved &&
          (matched ++ notMatched ++ notMatchedBySource).forall(_.resolved) =>
      // the canonical keyed-upsert MERGE (unconditional UPDATE SET * /
      // INSERT *, same-named equality keys, full-column source) IS
      // Iceberg's own MOR merge commit — one equality delete + one
      // data manifest in one overwrite snapshot (IcebergDml.upsert).
      // Richer shapes refuse loudly: a silent fall-through would hit
      // Spark's row-level-operation analysis with a misleading error.
      requireWritable(t)
      canonicalUpsertKeys(m) match {
        case Some(keys) =>
          IcebergForeignMergeCommand(t, resolveReads(m.sourceTable), keys)
        case None => throw new UnsupportedOperationException(
          s"MERGE INTO ${t.name()}: only the canonical keyed upsert is supported on " +
            "foreign Iceberg tables (ON same-named key equality, one unconditional WHEN " +
            "MATCHED THEN UPDATE SET *, one unconditional WHEN NOT MATCHED THEN INSERT *, " +
            "source carrying exactly the table's columns) — it commits Iceberg's " +
            "merge-on-read shape; rewrite richer merges as DELETE + INSERT or " +
            "INSERT OVERWRITE")
      }
    case m: MergeIntoTable => m.copy(sourceTable = resolveReads(m.sourceTable))
    case c: Command => c
    case other => resolveReads(other)
  }

  /** The canonical keyed-upsert detection (the same shape
    * [[SnapshotDmlRule]] fast-paths): `ON` a conjunction of same-named
    * target=source column equalities, exactly one unconditional
    * full-row UPDATE and one unconditional full-row INSERT, and the
    * source carrying exactly the table's columns. Returns the keys. */
  private def canonicalUpsertKeys(m: MergeIntoTable): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    val targetIds = m.targetTable.output.map(_.exprId).toSet
    val targetNames = m.targetTable.output.map(_.name)
    def eqKeys(e: Expression): Option[Seq[String]] = e match {
      case And(l, r) => for { a <- eqKeys(l); b <- eqKeys(r) } yield a ++ b
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetIds.contains(a.exprId) != targetIds.contains(b.exprId) && a.name == b.name =>
        Some(Seq(a.name))
      case _ => None
    }
    def fullRowCopy(asgns: Seq[Assignment]): Boolean = {
      val byName = asgns.collect {
        case Assignment(k: AttributeReference, v: AttributeReference)
            if !targetIds.contains(v.exprId) && k.name == v.name => k.name
      }
      asgns.length == byName.length && byName.toSet == targetNames.toSet
    }
    val canonical =
      m.matchedActions.length == 1 && m.notMatchedActions.length == 1 &&
        m.notMatchedBySourceActions.isEmpty &&
        (m.matchedActions.head match {
          case UpdateStarAction(None) => true
          case UpdateAction(None, asgns, _) => fullRowCopy(asgns)
          case _ => false
        }) &&
        (m.notMatchedActions.head match {
          case InsertStarAction(None) => true
          case InsertAction(None, asgns) => fullRowCopy(asgns)
          case _ => false
        }) &&
        m.sourceTable.output.map(_.name).toSet == targetNames.toSet
    if (!canonical) None
    else eqKeys(m.mergeCondition).map(_.distinct).filter(_.nonEmpty)
  }

  private[plans] final case class IcebergForeignMergeCommand(
      t: IcebergForeignTable, source: LogicalPlan, keys: Seq[String])
      extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{count, lit}
      // pin the source ONCE: the cardinality check, the delete-key
      // tuples, and the data manifest must all see the SAME rows — a
      // nondeterministic source (rand(), a table mutated mid-command)
      // re-evaluated per consumer could write delete keys inconsistent
      // with the inserted rows, breaking the one-snapshot contract
      val src = GraftSqlBridge.ofRows(session, source).localCheckpoint(true)
      // SQL cardinality rule: a TARGET row matching several source rows
      // must raise. Duplicate source keys alone are legal (both
      // insert); only duplicates that hit the target violate it —
      // checked with one aggregate over the O(batch) source and, only
      // when duplicates exist at all, one semi-join against the table.
      // NULL-keyed duplicates are excluded: MERGE's null-rejecting ON
      // never matches them to a target row, so they always just insert.
      val dupKeys = src.na.drop("any", keys)
        .groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
        .agg(count(lit(1)).as("__n")).filter(org.apache.spark.sql.functions.col("__n") > 1L)
        .drop("__n")
      if (!dupKeys.isEmpty &&
          !graft.io.IcebergImport.read(session, t.dir).join(dupKeys, keys, "left_semi").isEmpty)
        throw new IllegalStateException("MERGE: a target row matched multiple source rows")
      // matchNullKeys = false: SQL MERGE's ON t.k = s.k is
      // null-rejecting — a NULL-keyed source row inserts ALONGSIDE
      // surviving NULL-keyed target rows, it must not delete them (the
      // null-safe behavior stays on the documented Scala/CALL face)
      graft.io.IcebergDml.upsert(session, t.dir, src, keys, matchNullKeys = false)
      Seq.empty
    }
  }

  /** The relation under any stack of aliases. */
  private object ForeignRel {
    @scala.annotation.tailrec
    def unapply(plan: LogicalPlan): Option[IcebergForeignTable] = plan match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[IcebergForeignTable] =>
        Some(r.table.asInstanceOf[IcebergForeignTable])
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  private def resolveReads(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithSubqueries {
      case r: DataSourceV2Relation if r.table.isInstanceOf[IcebergForeignTable] =>
        val t = r.table.asInstanceOf[IcebergForeignTable]
        val analyzed = graft.io.IcebergImport
          .read(SparkSession.active, t.dir, t.snapshotId)
          .queryExecution.analyzed
        val byName = analyzed.output.map(a => a.name -> a).toMap
        // preserve the relation's output exprIds so parents stay resolved
        val projections = r.output.map { o =>
          val src = byName.getOrElse(o.name, throw new IllegalStateException(
            s"resolved Iceberg scan of ${t.name()} lacks column '${o.name}'"))
          Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        Project(projections, analyzed)
    }

  /** Re-anchor a resolved expression onto the fresh read IcebergDml
    * does internally: attributes become UnresolvedAttribute by name
    * (unique within an Iceberg schema). */
  private def bare(e: Expression): Column =
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })

  private def requireWritable(t: IcebergForeignTable): Unit =
    require(!t.pinned, s"${t.name()} is pinned by time travel — DML is read-only there")

  private[plans] final case class IcebergForeignDeleteCommand(
      t: IcebergForeignTable, cond: Expression) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      requireWritable(t)
      graft.io.IcebergDml.deleteWhereC(session, t.dir, bare(cond))
      Seq.empty
    }
  }

  private[plans] final case class IcebergForeignUpdateCommand(
      t: IcebergForeignTable, assignments: Seq[Assignment], cond: Option[Expression])
      extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      requireWritable(t)
      val sets = assignments.map { a =>
        a.key match {
          case k: AttributeReference => k.name -> bare(a.value)
          case other => throw new UnsupportedOperationException(
            s"unsupported UPDATE target '$other' on a foreign Iceberg table — " +
              "SET top-level columns only")
        }
      }.toMap
      graft.io.IcebergDml.updateC(session, t.dir,
        cond.map(bare).getOrElse(org.apache.spark.sql.functions.lit(true)), sets)
      Seq.empty
    }
  }
}
