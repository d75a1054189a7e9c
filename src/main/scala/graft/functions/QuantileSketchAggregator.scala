package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One level of a quantile sketch: `values` each carry weight
  * 2^`level`. Levels are kept sorted (by level, values ascending) so
  * the sketch bytes are a canonical function of its logical content. */
final case class QuantLevel(level: Int, values: Seq[Double])

/** Mergeable deterministic quantile sketch — the third leg of the
  * reaggregatable-sketch trio next to HLL distinct counts
  * ([[graft.operators.Sketches.hllSketches]]) and frequent items
  * (`approx_top_k` states): pre-aggregate value DISTRIBUTIONS at a
  * fine grain (per day, per source), persist the sketch rows, and
  * answer any coarser-grain percentile question by merging sketches —
  * never re-scanning the raw data. Spark 4 ships no
  * `percentile_approx` accumulate/combine/estimate surface, so this is
  * a typed `Aggregator` (partial aggregation applies: each mapper
  * ships one ≤O(capacity·log(n/capacity)) sketch per local key).
  *
  * Structure is KLL-shaped (Karnin-Lang-Liberty, public algorithm):
  * level i holds values of weight 2^i; an overfull level is sorted and
  * every second element is promoted to level i+1 (weight doubles, the
  * unpaired max stays put). Unlike KLL's random coin, the promotion
  * offset is DETERMINISTIC (alternates by level parity), trading the
  * unbiasedness coin for exact reproducibility: the same multiset
  * reduced in the same grouping always yields the same sketch, and —
  * the property the correctness gate leans on — a sketch that never
  * compacts (total values per group ≤ capacity) is EXACT: it is just
  * the sorted value list at level 0, and its disc-quantile estimates
  * equal the engine-independent exact answer. Above capacity,
  * estimates carry a rank error of O(W·log(W/capacity)/capacity)
  * (each level-i compaction displaces ranks by ≤2^i, and level i
  * compacts ≤ W/(capacity·2^i) times) and become merge-order
  * dependent, like any sketch.
  */
object QuantileSketch {
  /** Enforce per-level capacity bottom-up; canonicalize (sorted levels,
    * sorted values). Weight-conserving: an overfull level of n values
    * promotes n/2 (weight doubled) and keeps the unpaired max. */
  def compact(levels: Iterable[QuantLevel], capacity: Int): Seq[QuantLevel] = {
    val m = scala.collection.mutable.Map.empty[Int, Vector[Double]]
    levels.foreach(l => m(l.level) = m.getOrElse(l.level, Vector.empty) ++ l.values)
    var l = 0
    var maxL = if (m.isEmpty) -1 else m.keys.max
    while (l <= maxL) {
      val vs = m.getOrElse(l, Vector.empty)
      if (vs.size > capacity) {
        val sorted = vs.sorted
        val off = l % 2 // deterministic alternating promotion offset
        val pairs = sorted.size / 2
        val promoted = Vector.tabulate(pairs)(i => sorted(2 * i + off))
        m(l) = if (sorted.size % 2 == 1) Vector(sorted.last) else Vector.empty
        m(l + 1) = m.getOrElse(l + 1, Vector.empty) ++ promoted
        maxL = math.max(maxL, l + 1)
      }
      l += 1
    }
    m.toSeq.filter(_._2.nonEmpty).sortBy(_._1)
      .map { case (lv, vs) => QuantLevel(lv, vs.sorted) }
  }
}

/** Sketch BUILD aggregator: doubles in, one mergeable sketch out
  * (the `accumulate` of the accumulate/combine/estimate triple —
  * estimate lives in [[graft.operators.Sketches.quantileRollup]] as
  * plain DataFrame ops over the exploded sketch). */
class QuantileSketchAggregator(capacity: Int)
    extends Aggregator[Double, Seq[QuantLevel], Seq[QuantLevel]] {
  require(capacity >= 2, "capacity must be at least 2")

  override def zero: Seq[QuantLevel] = Vector.empty

  override def reduce(buf: Seq[QuantLevel], v: Double): Seq[QuantLevel] = {
    val (l0, rest) = buf.partition(_.level == 0)
    // .toVector: O(1) when already a Vector; guards against an encoder
    // round-trip leaving an array-backed Seq whose :+ is a full copy
    val vs = l0.headOption.map(_.values.toVector).getOrElse(Vector.empty) :+ v
    val next = QuantLevel(0, vs) +: rest
    if (vs.size > capacity) QuantileSketch.compact(next, capacity) else next
  }

  override def merge(a: Seq[QuantLevel], b: Seq[QuantLevel]): Seq[QuantLevel] =
    QuantileSketch.compact(a ++ b, capacity)

  override def finish(buf: Seq[QuantLevel]): Seq[QuantLevel] =
    QuantileSketch.compact(buf, capacity)

  override def bufferEncoder: Encoder[Seq[QuantLevel]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[QuantLevel]] = ExpressionEncoder()
}

/** Sketch COMBINE aggregator: merges persisted sketch states (rollup
  * over sketch rows only — raw data never re-read). */
class QuantileSketchCombine(capacity: Int)
    extends Aggregator[Seq[QuantLevel], Seq[QuantLevel], Seq[QuantLevel]] {
  override def zero: Seq[QuantLevel] = Vector.empty
  override def reduce(buf: Seq[QuantLevel], in: Seq[QuantLevel]): Seq[QuantLevel] =
    QuantileSketch.compact(buf ++ in, capacity)
  override def merge(a: Seq[QuantLevel], b: Seq[QuantLevel]): Seq[QuantLevel] =
    QuantileSketch.compact(a ++ b, capacity)
  override def finish(buf: Seq[QuantLevel]): Seq[QuantLevel] =
    QuantileSketch.compact(buf, capacity)
  override def bufferEncoder: Encoder[Seq[QuantLevel]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[QuantLevel]] = ExpressionEncoder()
}
