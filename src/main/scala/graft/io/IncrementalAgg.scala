package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregates (materialized views) over
  * versioned snapshot tables — the CDC consumer that makes the
  * versioning useful downstream: a grouped count/sum table stays in
  * sync with its source by applying only the rows that CHANGED between
  * the last applied version and the current one
  * ([[SnapshotTables.diffKeyed]]), never re-scanning the source.
  *
  * Why this matters at 100 TB: a daily ingest touches a sliver of a
  * petabyte-scale fact table; recomputing a rollup from scratch costs
  * a full scan, while the delta costs O(|changed rows|). Counts and
  * sums are the linear aggregates this is exact for — an update whose
  * row MOVES groups is handled as delete(old image) + insert(new
  * image) on the two group keys, so group migration is correct by
  * construction. Measure sums are DECIMAL — order-independent partial
  * aggregation and exact delta arithmetic (a double sum would drift
  * as deltas accumulate; decimal deltas are associative and exact).
  *
  * The aggregate table carries the last applied source version as a
  * constant `__src_v` column: refresh is IDEMPOTENT (re-running at the
  * same source version is a no-op) and self-describing (no side-channel
  * state file — the version rides the same atomic snapshot commit as
  * the data, so state and data can never disagree). Groups whose count
  * reaches zero are dropped, keeping the view identical to a
  * from-scratch GROUP BY — which is exactly what the spec and the
  * corpus oracle (q109) assert, delta-maintained vs recomputed,
  * hash-exact.
  */
object IncrementalAgg {

  /** Bring `aggTable` (= SELECT groupCols, count(*) AS n, sum(m) AS
    * sum_m … FROM source) up to date with `source`'s current version.
    * Bootstrap (aggTable missing) computes the full aggregate once;
    * afterwards only version deltas are read. Returns the source
    * version the view now reflects. */
  def refresh(
      tables: SnapshotTables,
      source: String,
      keyCols: Seq[String],
      aggTable: String,
      groupCols: Seq[String],
      measureCols: Seq[String],
      sumScale: Int = 2
  ): Int = {
    require(groupCols.nonEmpty && measureCols.nonEmpty)
    // sumScale: pick a scale the measure is EXACTLY representable at
    // (2 for money). Double measures carry binary noise ~1 ulp; at a
    // scale far inside that noise every engine's double->decimal
    // conversion rounds to the same digits, while a too-fine scale
    // (e.g. 10) preserves the noise and engines may round its last
    // digit differently — the delta arithmetic is exact either way,
    // but cross-engine replay (q109's oracle) needs identical digits.
    val curV = tables.currentVersion(source)
    require(curV > 0, s"source table $source does not exist")
    val sumType = s"decimal(28,$sumScale)"
    def sums(prefix: String => org.apache.spark.sql.Column) =
      measureCols.map(m => sum(prefix(m).cast(sumType)).as(s"sum_$m"))

    val lastV =
      if (tables.currentVersion(aggTable) == 0) 0
      else {
        val cur = tables.read(aggTable)
        if (cur.isEmpty) 0 else cur.select(max(col("__src_v"))).head.getInt(0)
      }
    if (lastV == curV && lastV > 0) return curV

    val next =
      if (lastV == 0) {
        // bootstrap: one full aggregate of the current version
        tables.readVersion(source, curV)
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n"), sums(m => col(m)): _*)
      } else {
        // delta: old images contribute negatively on their OLD group
        // key, new images positively on their NEW one — group migration
        // falls out. Union before the agg so the whole delta is one
        // partial-agg pass over O(|changed rows|).
        val d = tables.diffKeyed(source, lastV, curV, keyCols)
        // diffKeyed packs NON-key columns into the row images; a group
        // column that is itself a diff key sits at top level (and is
        // identical in both images by definition)
        def img(image: String, c: String) =
          if (keyCols.contains(c)) col(c) else col(s"$image.$c")
        val oldSide = d.filter(col("__change").isin("delete", "update"))
          .select((groupCols.map(g => img("__old", g).as(g)) :+ lit(-1L).as("dn")) ++
            measureCols.map(m => (img("__old", m) * -1).as(m)): _*)
        val newSide = d.filter(col("__change").isin("insert", "update"))
          .select((groupCols.map(g => img("__new", g).as(g)) :+ lit(1L).as("dn")) ++
            measureCols.map(m => img("__new", m).as(m)): _*)
        val delta = oldSide.unionByName(newSide)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("dn")).as("dn"), sums(m => col(m)): _*)
        val cur = tables.read(aggTable).drop("__src_v")
        val renamedDelta = delta.select((groupCols.map(col) :+ col("dn")) ++
          measureCols.map(m => col(s"sum_$m").as(s"d_$m")): _*)
        cur.join(renamedDelta, groupCols, "full_outer")
          .select((groupCols.map(col) :+
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n")) ++
            measureCols.map(m =>
              (coalesce(col(s"sum_$m"), lit(0).cast(s"decimal(28,$sumScale)")) +
                coalesce(col(s"d_$m"), lit(0).cast(s"decimal(28,$sumScale)")))
                .cast(s"decimal(28,$sumScale)").as(s"sum_$m")): _*)
          .filter(col("n") > 0)
      }
    // one eager cut: `next` may read the aggregate version this commit
    // supersedes, and the commit must see a settled frame
    tables.overwriteTable(next.withColumn("__src_v", lit(curV)).localCheckpoint(true), aggTable)
    curV
  }
}
