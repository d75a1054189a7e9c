package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as primitives, composed from
  * shuffle-friendly building blocks (SURVEY.md §2.d "range/as-of via
  * inequality conditions", re-architected so neither ever degenerates
  * into a broadcast-nested-loop or per-key driver collect):
  *
  *  - as-of join: ONE shuffle on the key via the union+window trick —
  *    both sides are unioned, time-sorted within key, and the right
  *    side's payload is carried forward with `last(ignoreNulls)`.
  *    Cost is a single sort-shuffle of |L|+|R|, independent of match
  *    fan-out. This is how a 100 TB trade/quote as-of must run.
  *  - range join: right-side intervals are exploded into fixed-width
  *    time buckets and equi-joined on (keys…, bucket), then the exact
  *    range predicate filters. Turns an inequality join (which Spark
  *    plans as BNLJ when keyless) into a hash join whose cost scales
  *    with interval coverage, not |L|×|R|.
  */
object TemporalJoins {

  /** For each left row, attach `payloadCol` of the latest right row
    * with the same key and `rightTime <= leftTime` (null when none),
    * as a new column named `asOfAlias`.
    *
    * Deterministic: within a key, rows sort by (time, side, rightId) —
    * right before left at equal time (inclusive as-of), ties among
    * right rows broken by highest `rightId`.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      rightId: String,
      payloadCol: String,
      asOfAlias: String
  ): DataFrame = {
    val lCols = left.columns.toSeq
    val payloadType = right.schema(payloadCol).dataType
    // The carried value is a STRUCT wrapping the payload: right rows are
    // always non-null structs (even when the payload itself is null), so
    // `last(ignoreNulls)` selects the latest right ROW — a legitimately
    // null payload propagates as null instead of falling back to an
    // older row's non-null payload.
    val wrapType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("p", payloadType)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rid", lit(null).cast("long"))
      .withColumn("__payload", lit(null).cast(wrapType))
    val r = right.select(
      lCols.map(c =>
        if (c == keyCol) col(keyCol)
        else lit(null).cast(left.schema(c).dataType).as(c)
      ) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        col(rightId).cast("long").as("__rid"),
        struct(col(payloadCol).cast(payloadType).as("p")).as("__payload")
      ): _*
    )
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asOfAlias, last(col("__payload"), ignoreNulls = true).over(w).getField("p"))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__rid", "__payload")
  }

  /** Equi+range join: rows of `left` matched to interval rows of
    * `right` where keys match and `leftTime ∈ [startCol, endCol]`.
    * Intervals are exploded to `bucketSeconds`-wide buckets so the join
    * is a plain hash join on (keys, bucket); each (l,r) pair meets in
    * exactly one bucket (the left row's), so no dedup pass is needed.
    */
  def rangeJoin(
      left: DataFrame,
      leftTime: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      bucketSeconds: Long = 3600L
  ): DataFrame = {
    val bkt = (c: Column) => (unix_timestamp(c) / bucketSeconds).cast("long")
    val l = left.withColumn("__bkt", bkt(col(leftTime)))
    val r = right.withColumn("__bkt", explode(sequence(bkt(col(startCol)), bkt(col(endCol)))))
    l.join(r, keys :+ "__bkt")
      .filter(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .drop("__bkt")
  }
}
