package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for hot grouping keys.
  *
  * AQE's skew handling only splits SHUFFLE partitions (joins and
  * post-shuffle stages); a single pathological key inside one
  * aggregation task — the "empty document" / "null country" key that
  * owns 30% of a 100 TB corpus — still serializes its final merge onto
  * one reducer unless the aggregation itself is decomposed. Salting
  * splits each key into `saltBuckets` sub-keys for the first (heavy)
  * aggregation, then merges the per-salt partials in a second (tiny)
  * aggregation whose input is `|distinct keys| × saltBuckets` rows.
  *
  * Works for any algebraic aggregate (count/sum/min/max); the merge
  * function of each aggregate is applied in stage two. Results are
  * IDENTICAL to the unsalted aggregation — proven by the corpus oracle,
  * which runs the plain GROUP BY.
  */
object Skew {

  /** Salted grouped count + decimal sum: two-stage aggregation over a
    * deterministic salt (hash of a tiebreak column, not rand() — reruns
    * and retried tasks must salt identically). */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      sumCol: String,
      saltCol: Column,
      saltBuckets: Int = 16
  ): DataFrame = {
    val keyCols = keys.map(col)
    val stage1 = df
      .withColumn("__salt", pmod(hash(saltCol), lit(saltBuckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"), sum(col(sumCol).cast("decimal(18,2)")).as("__s"))
    stage1
      .groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("decimal(18,2)").as("sum_val"))
  }

  /** Salted equi-join for skewed join keys: each big-side row gets a
    * deterministic salt in [0, salts); the small side is replicated
    * `salts`× (an explode of literals — its rows must be small). The
    * join key becomes (keys…, salt), so one hot key's rows spread over
    * `salts` tasks instead of one.
    *
    * Output is IDENTICAL to the plain join — the salt never appears in
    * the result. This is the manual form of what AQE skew-join does
    * for sort-merge joins; it also covers the cases AQE can't touch
    * (broadcast-ineligible skew inside a shuffled hash join, or AQE
    * disabled). `saltOn` should be a high-cardinality big-side column
    * (a row id), hashed — never rand(), so task retries salt
    * identically. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltOn: Column,
      salts: Int = 16
  ): DataFrame = {
    val b = big.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val s = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
