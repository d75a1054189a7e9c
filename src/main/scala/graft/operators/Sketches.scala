package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reaggregatable distinct-count sketches (Apache DataSketches HLL via
  * Spark's `hll_sketch_agg` family) — the rollup pattern a 100 TB
  * warehouse runs: distinct counts are pre-aggregated into mergeable
  * sketch BYTES at a fine grain (per day, per source), persisted, and
  * any coarser rollup is a cheap union of sketches — no re-scan of the
  * raw data, ever. A plain `COUNT(DISTINCT)` can't do this: distinct
  * counts don't add, sketches do.
  *
  * Shapes: the sketch build is one partial-agg groupBy (sketches merge
  * map-side, so shuffle = one sketch per group per mapper); rollups
  * aggregate over |fine groups| sketch rows, independent of raw row
  * count. Estimates carry the standard HLL error (~1.6% at the default
  * lgConfigK=12). */
object Sketches {

  /** Fine-grain sketch build: one HLL sketch (binary) per group over
    * `valueCol`, plus the exact row count for auditing. Persist this —
    * it is the reaggregatable fact table. */
  def hllSketches(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(valueCol)).as("distinct_sketch"),
        count(lit(1)).as("n_rows")
      )

  /** Roll sketches up to a coarser grain: union the sketch bytes per
    * `rollupCols` group and estimate. Runs over sketch rows only —
    * never the raw data. */
  def hllRollup(sketches: DataFrame, rollupCols: Seq[String]): DataFrame =
    sketches
      .groupBy(rollupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("distinct_sketch"))).as("distinct_est"),
        sum(col("n_rows")).as("n_rows")
      )

  /** Estimated distinct-value overlap of two corpora by
    * inclusion–exclusion over HLL: |A ∩ B| ≈ |A| + |B| − |A ∪ B|, where
    * the union estimate merges the two sketches (never re-scans either
    * side). The cheap first answer to "how much does source X overlap
    * source Y" before committing to an exact (and expensive) join —
    * error compounds from three estimates, so treat small overlaps as
    * "≈ 0", not as exact counts. Returns
    * (est_a, est_b, est_union, est_overlap). */
  def hllOverlap(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val sa = a.agg(hll_sketch_agg(col(valueCol)).as("sk")).select(col("sk").as("sk_a"))
    val sb = b.agg(hll_sketch_agg(col(valueCol)).as("sk")).select(col("sk").as("sk_b"))
    sa.crossJoin(sb).select(
      hll_sketch_estimate(col("sk_a")).as("est_a"),
      hll_sketch_estimate(col("sk_b")).as("est_b"),
      hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("est_union")
    ).withColumn("est_overlap",
      greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
  }
}
