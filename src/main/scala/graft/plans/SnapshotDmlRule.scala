package graft.plans

import graft.catalog.SnapshotTableV2
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL `DELETE FROM` / `UPDATE` / `MERGE INTO` over [[graft.catalog
  * .SnapshotCatalog]] tables — the Delta-style architecture: an
  * injected analyzer rule claims the resolved DML plan and routes it
  * onto the snapshot layer's copy-on-write commits
  * ([[graft.io.SnapshotTables.delete]]/`update`/generalized merge)
  * instead of implementing DataSourceV2's row-level-operation write
  * protocol. What that buys, concretely: the rewrite re-enters
  * `overwriteTable`, so stats/sketch manifests keep being maintained,
  * hidden-partition layout re-derives, retention/branch fencing and
  * the concurrent-writer CAS all apply to SQL DML exactly as to API
  * calls — none of it would come for free from a raw `BatchWrite`.
  *
  * The rule fires only on a fully-RESOLVED command whose target is a
  * [[SnapshotTableV2]]; everything else passes through untouched.
  * Resolved column references are re-anchored by NAME (qualified
  * `__t`/`__s` for MERGE's two sides) onto fresh reads of the same
  * snapshot, which the DataFrame analyzer re-resolves — names are
  * unique within a snapshot schema, so the mapping is exact.
  */
object SnapshotDmlRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(SnapshotRel(rel), cond) if d.childrenResolved && cond.resolved =>
      SnapshotDeleteCommand(rel, cond)
    case u @ UpdateTable(SnapshotRel(rel), assignments, cond)
        if u.childrenResolved && assignments.forall(_.resolved) && cond.forall(_.resolved) =>
      SnapshotUpdateCommand(rel, assignments, cond)
    case m @ MergeIntoTable(SnapshotRelTarget(rel), source, cond, matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if m.childrenResolved && cond.resolved &&
          (matched ++ notMatched ++ notMatchedBySource).forall(_.resolved) =>
      // WITH SCHEMA EVOLUTION needs no handling here: the analyzer
      // already evolved the target through the catalog's alterTable
      // (ADD COLUMN commits a COW version) and re-resolved this plan
      // against the widened schema — the rewrite below sees a normal
      // MERGE whose star/explicit actions cover the new columns.
      SnapshotMergeCommand(rel, m.targetTable.output, source, cond, matched, notMatched, notMatchedBySource)
    case _ => plan
  }

  /** The relation under any stack of aliases — resolution wraps the
    * 3-part name in a SubqueryAlias and a user `AS t` adds another;
    * aliases keep the child's exprIds, so attribute anchoring holds. */
  private object SnapshotRel {
    @scala.annotation.tailrec
    def unapply(plan: LogicalPlan): Option[DataSourceV2Relation] = plan match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[SnapshotTableV2] => Some(r)
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  private object SnapshotRelTarget {
    def unapply(plan: LogicalPlan): Option[DataSourceV2Relation] = SnapshotRel.unapply(plan)
  }

  private def snapshotTable(rel: DataSourceV2Relation): SnapshotTableV2 = {
    val t = rel.table.asInstanceOf[SnapshotTableV2]
    require(!t.isPinned, s"${t.name()} is pinned to a version by time travel — DML is read-only there")
    t
  }

  /** Re-anchor a resolved expression onto fresh DataFrame reads: every
    * attribute becomes an UnresolvedAttribute the Dataset analyzer
    * re-resolves — qualified when the expression spans two relations
    * (MERGE), bare otherwise. */
  private def reanchor(e: Expression, qualifierOf: AttributeReference => Seq[String]): Column =
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(qualifierOf(a) :+ a.name)
    })

  private def bare(e: Expression): Column = reanchor(e, _ => Nil)

  // ------------------------------------------------------------------

  private[plans] final case class SnapshotDeleteCommand(
      rel: DataSourceV2Relation, cond: Expression) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val t = snapshotTable(rel)
      // write-mode table property: "mor" commits an O(deleted) patch
      // version instead of rewriting the snapshot (Iceberg v2's
      // merge-on-read DELETE; the read side resolves the chain)
      if (t.tables.writeMode(t.tableName) == "mor")
        t.tables.deleteWhereMor(t.tableName, bare(cond))
      else
        t.tables.delete(t.tableName, bare(cond), t.identityPartitionCols)
      t.notifyCommitted()
      Seq.empty
    }
  }

  private[plans] final case class SnapshotUpdateCommand(
      rel: DataSourceV2Relation, assignments: Seq[Assignment], cond: Option[Expression])
      extends LeafRunnableCommand {

    /** Assignment key → (root column, nested field path). `SET a = …`
      * is (a, []); `SET s.x.y = …` is (s, [x, y]). */
    private def keyPath(e: Expression): (String, Seq[String]) = e match {
      case ar: AttributeReference => (ar.name, Nil)
      case gsf: org.apache.spark.sql.catalyst.expressions.GetStructField =>
        val (root, p) = keyPath(gsf.child)
        (root, p :+ gsf.extractFieldName)
      case other => throw new UnsupportedOperationException(
        s"unsupported UPDATE target '$other' — SET columns or struct fields")
    }

    override def run(session: SparkSession): Seq[Row] = {
      val t = snapshotTable(rel)
      // nested-field SETs fold into ONE value per root column via
      // withField, applied in statement order over the OLD struct —
      // every value expression still evaluates against the OLD row
      // (the underlying update() stages all new values before any
      // column is replaced), so `SET s.a = s.b, s.b = s.a` swaps.
      val byRoot = assignments.map(a => (keyPath(a.key), a.value))
      val roots = byRoot.map(_._1._1).distinct
      val sets = roots.map { root =>
        val forRoot = byRoot.collect { case ((`root`, path), v) => (path, v) }
        val combined = forRoot.foldLeft(org.apache.spark.sql.functions.col(root)) {
          case (_, (Nil, v)) => bare(v) // whole-column SET replaces any prior field edits
          case (acc, (path, v)) => acc.withField(path.mkString("."), bare(v))
        }
        root -> combined
      }
      val pred = cond.map(bare).getOrElse(org.apache.spark.sql.functions.lit(true))
      // "mor" write mode: O(matched) patch commit (old images out, new
      // images in) instead of the full-snapshot rewrite
      if (t.tables.writeMode(t.tableName) == "mor")
        t.tables.updateMor(t.tableName, sets, pred)
      else
        t.tables.update(t.tableName, sets, pred, t.identityPartitionCols)
      t.notifyCommitted()
      Seq.empty
    }
  }

  /** Generalized COW MERGE: full-outer join target and source on the
    * merge condition, label every row with the FIRST action whose
    * (side, condition) applies, error if any target row matched
    * several source rows (the SQL cardinality rule), then rebuild each
    * output column with one chained CASE — a single shuffle join plus
    * one window pass, committed as one snapshot version. */
  private[plans] final case class SnapshotMergeCommand(
      rel: DataSourceV2Relation,
      targetOutput: Seq[Attribute],
      source: LogicalPlan,
      cond: Expression,
      matched: Seq[MergeAction],
      notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction]) extends LeafRunnableCommand {

    /** The canonical keyed-upsert MERGE shape, when write mode is
      * "mor": `ON` is a conjunction of same-named target=source column
      * equalities, the only actions are an unconditional `WHEN MATCHED
      * THEN UPDATE SET *` and an unconditional `WHEN NOT MATCHED THEN
      * INSERT *`, and the source carries exactly the table's columns.
      * That shape IS [[graft.io.SnapshotTables.upsertMor]] — an
      * O(source) merge-on-read delta commit instead of the O(table)
      * copy-on-write rewrite, so `ALTER ... ('graft.write.mode'='mor')`
      * flips the most common streaming/batch upsert statement to
      * O(changed) like it already flips DELETE and UPDATE. Returns the
      * key columns when the fast path applies. */
    private def morUpsertKeys(st: graft.io.SnapshotTables, table: String,
        srcColumns: Seq[String], targetIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId])
        : Option[Seq[String]] = {
      import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
      def eqKeys(e: Expression): Option[Seq[String]] = e match {
        case And(l, r) => for { a <- eqKeys(l); b <- eqKeys(r) } yield a ++ b
        case EqualTo(a: AttributeReference, b: AttributeReference)
            // one side target, one side source, SAME column name — a
            // cross-named key would make the source frame's key column
            // ambiguous for the keyed delta resolution
            if targetIds.contains(a.exprId) != targetIds.contains(b.exprId) && a.name == b.name =>
          Some(Seq(a.name))
        case _ => None
      }
      // the analyzer expands `SET *` / `INSERT *` into explicit
      // assignments before this rule fires: canonical = unconditional,
      // and every target column is assigned the SAME-NAMED source
      // attribute (a full-row replace — upsertMor's contract)
      val targetNames = targetOutput.map(_.name)
      def fullRowCopy(asgns: Seq[Assignment]): Boolean = {
        val byName = asgns.collect {
          case Assignment(k: AttributeReference, v: AttributeReference)
              if !targetIds.contains(v.exprId) && k.name == v.name => k.name
        }
        asgns.length == byName.length && byName.toSet == targetNames.toSet
      }
      val canonicalActions =
        matched.length == 1 && notMatched.length == 1 && notMatchedBySource.isEmpty &&
          (matched.head match {
            case UpdateStarAction(None) => true
            case UpdateAction(None, asgns, _) => fullRowCopy(asgns)
            case _ => false
          }) &&
          (notMatched.head match {
            case InsertStarAction(None) => true
            case InsertAction(None, asgns) => fullRowCopy(asgns)
            case _ => false
          })
      if (!canonicalActions) return None
      if (st.writeMode(table) != "mor" || st.currentVersion(table) == 0) return None
      val keys = eqKeys(cond).map(_.distinct).filter(_.nonEmpty)
      // upsertMor needs the table's exact column set on the source
      keys.filter(_ => srcColumns.toSet == st.read(table).columns.toSet)
    }

    override def run(session: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions._
      val t = snapshotTable(rel)
      val st = t.tables

      val targetIds = targetOutput.map(_.exprId).toSet

      morUpsertKeys(st, t.tableName, source.output.map(_.name), targetIds) match {
        case Some(keys) =>
          val src = GraftSqlBridge.ofRows(session, source)
          // SQL cardinality rule: a TARGET row matching several source
          // rows must raise. Duplicate source keys alone are legal
          // (both insert); only duplicates that hit the target violate
          // the rule — checked with one aggregate over the O(batch)
          // source and, only when duplicates exist at all, one semi-
          // join against the table. The table is never read otherwise.
          val dupKeys = src.groupBy(keys.map(col): _*)
            .agg(count(lit(1)).as("__n")).filter(col("__n") > 1L).drop("__n")
          if (!dupKeys.isEmpty &&
              !st.read(t.tableName).join(dupKeys, keys, "left_semi").isEmpty)
            throw new IllegalStateException(
              "MERGE: a target row matched multiple source rows")
          st.upsertMor(t.tableName, src, keys)
          t.notifyCommitted()
          return Seq.empty
        case None => () // general shape: copy-on-write rewrite below
      }
      // target attrs take precedence on exprId collision (self-merge);
      // genuine ambiguity then fails resolution loudly downstream
      def qualifierOf(a: AttributeReference): Seq[String] =
        if (targetIds.contains(a.exprId)) Seq("__t") else Seq("__s")
      def two(e: Expression): Column = reanchor(e, qualifierOf)

      val targetCols = st.read(t.tableName).columns.toSeq
      val target = st.read(t.tableName)
        .withColumn("__t_rid", monotonically_increasing_id())
        .withColumn("__t_exists", lit(true)).as("__t")
      val src = GraftSqlBridge.ofRows(session, source)
        .withColumn("__s_exists", lit(true)).as("__s")

      val joined = target.join(src, two(cond), "full_outer")
      val isMatched = col("__t_exists").isNotNull && col("__s_exists").isNotNull
      val isTargetOnly = col("__t_exists").isNotNull && col("__s_exists").isNull

      // SQL cardinality rule: a target row may match at most one
      // source row — counted with one window pass over the joined
      // relation. The window key spreads target-LESS rows: their
      // __t_rid is NULL and hashpartitioning sends every NULL to ONE
      // reducer — an INSERT-heavy merge (the daily-append pattern)
      // would serialize its entire unmatched side into a single window
      // task at scale. Each such row gets a unique key disjoint from
      // real rids (rids are non-negative), its count is never read
      // (the guard only fires where __t_exists is non-null), and the
      // hot key disappears.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__w_rid"))
      val guarded = joined
        // project the key first: nondeterministic expressions belong in
        // a Project, not inside the window's partition spec
        .withColumn("__w_rid", coalesce(col("__t_rid"), -monotonically_increasing_id() - 1))
        .withColumn("__m_cnt", sum(when(isMatched, 1L).otherwise(0L)).over(w))

      // first-applicable-action label: m<i> / n<i> / s<i>, 'keep'
      // (carry the target row), 'drop' (no insert action applied).
      // The cardinality raise rides INSIDE the label expression — the
      // label feeds the row filter and every output column, so the
      // optimizer can never prune the check away (a standalone guard
      // column would be pruned as dead and silently skipped).
      def label(actions: Seq[MergeAction], tag: String, default: String): Column =
        actions.zipWithIndex.foldRight(lit(default)) { case ((a, i), els) =>
          val hit = a.condition.map(c => coalesce(two(c), lit(false))).getOrElse(lit(true))
          when(hit, lit(s"$tag$i")).otherwise(els)
        }
      val action =
        when(col("__t_exists").isNotNull && col("__m_cnt") > 1L,
          raise_error(lit("MERGE: a target row matched multiple source rows")))
          .when(isMatched, label(matched, "m", "keep"))
          .when(isTargetOnly, label(notMatchedBySource, "n", "keep"))
          .otherwise(label(notMatched, "s", "drop"))

      def isDelete(a: MergeAction): Boolean = a.isInstanceOf[DeleteAction]
      val dropLabels = "drop" +:
        (matched.zipWithIndex.collect { case (a, i) if isDelete(a) => s"m$i" } ++
          notMatchedBySource.zipWithIndex.collect { case (a, i) if isDelete(a) => s"n$i" })

      /** The value action `tag+i` assigns to target column `c`; None =
        * carry the target value (unset column of an UPDATE). */
      def assigned(a: MergeAction, c: String): Option[Column] = a match {
        case UpdateAction(_, assignments, _) =>
          assignments.collectFirst {
            case Assignment(k: AttributeReference, v) if k.name == c => two(v)
          }
        case InsertAction(_, assignments) =>
          Some(assignments.collectFirst {
            case Assignment(k: AttributeReference, v) if k.name == c => two(v)
          }.getOrElse(lit(null))) // unspecified insert column -> NULL
        case UpdateStarAction(_) | InsertStarAction(_) => Some(col(s"__s.$c"))
        case _: DeleteAction => None
      }

      val labelled = guarded.withColumn("__action", action)
        .filter(!col("__action").isin(dropLabels: _*))
      val out = targetCols.map { c =>
        val branches: Seq[(String, Column)] =
          matched.zipWithIndex.flatMap { case (a, i) => assigned(a, c).map(v => s"m$i" -> v) } ++
            notMatchedBySource.zipWithIndex.flatMap { case (a, i) => assigned(a, c).map(v => s"n$i" -> v) } ++
            notMatched.zipWithIndex.flatMap { case (a, i) => assigned(a, c).map(v => s"s$i" -> v) }
        branches.foldRight(col(s"__t.$c")) { case ((l, v), els) =>
          when(col("__action") === l, v).otherwise(els)
        }.as(c)
      }
      st.overwriteTable(labelled.select(out: _*), t.tableName, t.identityPartitionCols)
      t.notifyCommitted()
      Seq.empty
    }
  }
}
