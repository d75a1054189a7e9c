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

  /** Heavy hitters (approximate top-k) over `valueCol` — the corpus-
    * analysis primitive for "most frequent tokens/domains/urls at
    * 100 TB" without a full-vocabulary shuffle: Spark's `approx_top_k`
    * (an Apache DataSketches frequent-items sketch) tracks at most
    * `maxItemsTracked` candidates per partial aggregate and merges
    * map-side, so the shuffle carries one bounded sketch per mapper —
    * never |distinct values| rows. Estimates are EXACT whenever the
    * number of distinct values never exceeds the sketch capacity (no
    * purge ever occurs); beyond that, counts carry the standard
    * frequent-items over-estimate bound and rank order near ties is
    * approximate.
    *
    * The sketch's own output order near ties is engine-internal, so
    * the result is deterministically RE-RANKED by (count desc, item):
    * `fetch` items are drawn from the sketch (over-fetch a margin past
    * `k` so boundary ties cannot flip membership when counts are
    * exact), then the top `k` by the total order are kept. Returns
    * (rk, item, cnt). */
  def approxTopK(
      df: DataFrame,
      valueCol: String,
      k: Int,
      maxItemsTracked: Int = 8192,
      fetchMargin: Int = 50
  ): DataFrame = {
    val fetch = math.min(k + fetchMargin, maxItemsTracked)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("item"))
    df.agg(expr(s"approx_top_k(`$valueCol`, $fetch, $maxItemsTracked)").as("topk"))
      .select(explode(col("topk")).as("t"))
      .select(col("t.item").as("item"), col("t.count").as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("rk"), col("item"), col("cnt"))
      .orderBy(col("rk"))
  }

  /** Fine-grain top-k sketch build — the [[hllSketches]] pattern for
    * heavy hitters: one mergeable frequent-items sketch STATE per
    * group (`approx_top_k_accumulate`). Persist this; any coarser
    * rollup combines states without re-scanning raw data. */
  def topKSketches(df: DataFrame, groupCols: Seq[String], valueCol: String, maxItemsTracked: Int = 8192): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_top_k_accumulate(`$valueCol`, $maxItemsTracked)").as("topk_sketch"),
        count(lit(1)).as("n_rows"))

  /** Roll top-k sketches up to a coarser grain: combine the sketch
    * states per `rollupCols` group and estimate the top `k` — runs
    * over sketch rows only. The merge law (estimate ∘ combine over
    * parts ≡ estimate over the whole, when capacity is never
    * exceeded) is what makes the per-day/per-source build safe;
    * SketchesSpec pins it. Returns one row per group with the
    * re-ranked (rk, item, cnt) exploded, same total order as
    * [[approxTopK]]. */
  def topKRollup(sketches: DataFrame, rollupCols: Seq[String], k: Int, maxItemsTracked: Int = 8192): DataFrame = {
    val combined = sketches
      .groupBy(rollupCols.map(col): _*)
      .agg(expr(s"approx_top_k_combine(topk_sketch, $maxItemsTracked)").as("sk"),
        sum(col("n_rows")).as("n_rows"))
      .select(rollupCols.map(col) :+ col("n_rows") :+
        expr(s"approx_top_k_estimate(sk, ${math.min(k + 50, maxItemsTracked)})").as("topk"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(rollupCols.map(col): _*)
      .orderBy(col("cnt").desc, col("item"))
    combined
      .select(rollupCols.map(col) :+ col("n_rows") :+ explode(col("topk")).as("t"): _*)
      .select(rollupCols.map(col) :+ col("n_rows") :+
        col("t.item").as("item") :+ col("t.count").as("cnt"): _*)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(rollupCols.map(col) :+ col("rk") :+ col("item") :+ col("cnt") :+ col("n_rows"): _*)
  }

  /** Fine-grain quantile sketch build — the [[hllSketches]] pattern for
    * value DISTRIBUTIONS: one mergeable KLL-shaped sketch per group
    * over `valueCol` ([[graft.functions.QuantileSketchAggregator]] —
    * deterministic, and EXACT while a group's value count stays ≤
    * `capacity`), plus the exact row count. Persist this; any coarser
    * percentile question merges states without re-scanning raw data.
    * Nulls are excluded (as in any SQL quantile). */
  def quantileSketches(df: DataFrame, groupCols: Seq[String], valueCol: String, capacity: Int = 8192): DataFrame = {
    val acc = udaf(new graft.functions.QuantileSketchAggregator(capacity),
      org.apache.spark.sql.Encoders.scalaDouble)
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(acc(col(valueCol).cast("double")).as("quant_sketch"),
        count(lit(1)).as("n_rows"))
  }

  /** Roll quantile sketches up to a coarser grain and estimate disc
    * quantiles: combine the sketch states per `rollupCols` group, then
    * compute, for each (name, p) in `probs`, the weighted discrete
    * quantile — the smallest value whose cumulative weight reaches
    * ⌈p·W⌉ (with unit weights this IS the exact `quantile_disc`; after
    * compaction weights are 2^level and the answer carries the sketch's
    * rank-error bound). Estimation is plain DataFrame ops over the
    * EXPLODED sketch — |groups|·O(capacity·levels) rows, independent of
    * raw data size; the windows here run on sketch rows, never facts.
    * Pass binary-representable probabilities (0.25, 0.5, 0.875, …) so
    * ⌈p·W⌉ suffers no floating-point ambiguity against an oracle. */
  def quantileRollup(
      sketches: DataFrame,
      rollupCols: Seq[String],
      probs: Seq[(String, Double)],
      capacity: Int = 8192
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comb = udaf(new graft.functions.QuantileSketchCombine(capacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[graft.functions.QuantLevel]]())
    val combined = sketches
      .groupBy(rollupCols.map(col): _*)
      .agg(comb(col("quant_sketch")).as("sk"), sum(col("n_rows")).as("n_rows"))
    val exploded = combined
      .select(rollupCols.map(col) :+ col("n_rows") :+ explode(col("sk")).as("lv"): _*)
      .select(rollupCols.map(col) :+ col("n_rows") :+ col("lv.level").as("level") :+
        explode(col("lv.values")).as("v"): _*)
      .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), level)"))
    val grp = Window.partitionBy(rollupCols.map(col): _*)
    val cum = grp.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = exploded
      .withColumn("total_w", sum(col("w")).over(grp))
      .withColumn("cum_w", sum(col("w")).over(cum))
    val qCols = probs.map { case (name, p) =>
      min(when(col("cum_w") >= greatest(ceil(lit(p) * col("total_w")), lit(1L)), col("v"))).as(name)
    }
    ranked.groupBy(rollupCols.map(col): _*)
      .agg(first(col("n_rows")).as("n_rows"), qCols: _*)
  }

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
