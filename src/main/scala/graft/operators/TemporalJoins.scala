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

  /** For each left row, attach `payloadCol` of the matching right row
    * with the same key (null when none), as a new column named
    * `asOfAlias` — the full `merge_asof` direction surface:
    *
    *  - `backward` (default): latest right with `rightTime <= leftTime`
    *  - `forward`:  earliest right with `rightTime >= leftTime`
    *  - `nearest`:  whichever of the two is closer in time; exact-tie
    *    distances resolve BACKWARD (pandas semantics)
    *
    * `toleranceSeconds` nulls the match when |rightTime − leftTime|
    * exceeds it (applied after direction selection, as in pandas).
    *
    * Every direction is the same ONE-shuffle union+window shape:
    * `nearest` adds a second window over the opposite sort of the SAME
    * key partitioning — one extra in-partition sort, never a second
    * exchange. Deterministic: within a key, rows sort by (time, side,
    * rightId) — right before left at equal time (inclusive as-of in
    * both directions), ties among right rows broken by highest
    * `rightId` backward / lowest `rightId` forward (mirrored order).
    * Time distances compare exactly: microsecond-integer-valued
    * doubles, no epoch rounding can flip a decision. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      rightId: String,
      payloadCol: String,
      asOfAlias: String,
      direction: String = "backward",
      toleranceSeconds: Option[Double] = None
  ): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val lCols = left.columns.toSeq
    val payloadType = right.schema(payloadCol).dataType
    val rtType = right.schema(rightTime).dataType
    // The carried value is a STRUCT wrapping the payload (plus the
    // matched right time, for tolerance/nearest): right rows are always
    // non-null structs (even when the payload itself is null), so
    // `last(ignoreNulls)` selects the latest right ROW — a legitimately
    // null payload propagates as null instead of falling back to an
    // older row's non-null payload.
    val wrapType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p", payloadType),
      org.apache.spark.sql.types.StructField("rt", rtType)))
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
        struct(col(payloadCol).cast(payloadType).as("p"),
          col(rightTime).cast(rtType).as("rt")).as("__payload")
      ): _*
    )
    def pick(w: org.apache.spark.sql.expressions.WindowSpec): Column =
      last(col("__payload"), ignoreNulls = true).over(w)
    val wB = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").desc, col("__side").asc, col("__rid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dist(rt: Column): Column = abs(rt.cast("double") - col("__t").cast("double"))
    val u = l.unionByName(r)
    val withPick = direction match {
      case "backward" => u.withColumn("__pick", pick(wB))
      case "forward"  => u.withColumn("__pick", pick(wF))
      case "nearest" =>
        u.withColumn("__b", pick(wB)).withColumn("__f", pick(wF))
          .withColumn("__pick",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(dist(col("__b.rt")) <= dist(col("__f.rt")), col("__b"))
              .otherwise(col("__f")))
          .drop("__b", "__f")
    }
    val tolApplied = toleranceSeconds.fold(withPick)(tol =>
      withPick.withColumn("__pick", when(dist(col("__pick.rt")) <= tol, col("__pick"))))
    tolApplied
      .withColumn(asOfAlias, col("__pick").getField("p"))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__rid", "__payload", "__pick")
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

  /** INTERVAL-OVERLAP join — interval × interval where [[rangeJoin]]
    * is point × interval: every (left, right) pair whose numeric
    * ranges intersect (`lStart <= rEnd && rStart <= lEnd`), without a
    * nested-loop plan. Both sides explode into fixed-width grid cells
    * and candidates form only through the (keys…, cell) equi-join —
    * the genomic/session-correlation pattern.
    *
    * Duplicate elimination is FREE, not a distinct: a pair sharing
    * several cells is emitted only in the cell containing
    * max(lStart, rStart) — for overlapping intervals always a shared
    * cell, and exactly one — so no post-join shuffle exists at all.
    * Cost scales with Σ interval-width/cell per side plus true pair
    * count; pick `cellWidth` near the typical interval length (too
    * small → explode fan-out, too large → cell co-occupancy noise
    * filtered by the exact predicate).
    *
    * Bounds are NUMERIC (epoch seconds, positions); column names must
    * be distinct across the two sides (alias before the call). */
  def overlapJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      keys: Seq[String] = Nil,
      cellWidth: Long = 3600L
  ): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    def cellOf(c: String) = floor(col(c).cast("double") / cellWidth).cast("long")
    val l = left.withColumn("__cell", explode(sequence(cellOf(lStart), cellOf(lEnd))))
    val r = right.withColumn("__cell", explode(sequence(cellOf(rStart), cellOf(rEnd))))
    l.join(r, keys :+ "__cell")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__cell") === greatest(cellOf(lStart), cellOf(rStart)))
      .drop("__cell")
  }
}
